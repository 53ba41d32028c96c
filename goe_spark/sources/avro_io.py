"""Pure-Python Avro Object Container File writer/reader — the jar-free
S10 staging path.

The reference stages offload transport data as Avro by default
(avro_staging_file.py; the schema rules live in
sources/avro_schema.py). The sandbox has no spark-avro jar, so this
module implements the Avro 1.x container format itself, from the
PUBLIC Apache Avro specification (binary encoding + object container
files) — no external library:

- header: magic ``Obj\\x01``, metadata map (``avro.schema`` JSON,
  ``avro.codec``), 16-byte sync marker;
- data blocks: row count (zigzag varint long), serialized byte size,
  block bytes (optionally deflate-compressed, RFC 1951 raw), sync
  marker after each block;
- values: zigzag varint ints/longs, little-endian IEEE float/double,
  length-prefixed UTF-8 strings / raw bytes, 1-byte booleans, unions
  as branch index + value (nullable staging fields are
  ``[type, "null"]``).

Only the 7 staging primitives (+ their nullable unions) are
supported — exactly what `avro_schema.avro_schema()` emits. The
encoder is deliberately NOT a general Avro implementation.

Scale design: `write_avro_staging_dir` runs the encoder INSIDE
`mapInArrow` — each task Arrow-batches its partition through the
pure-Python encoder and writes one container file, returning a
manifest row (path, rows, bytes). No collect, no driver funnel; the
file count equals the partition count, same as Spark's own writers.
REQUIRES ``path`` be a shared filesystem (local[], NFS, FUSE object
store) — tasks write via task-local open(); on a plain-HDFS cluster
prefer the native spark-avro jar path (sources/files.py probes and
prefers it when present). Encoding in Python is ~10x slower per byte than the JVM
avro writer — acceptable for staging (the reference's Sqoop/Avro
path was also CPU-bound on encode), and the blocks deflate-compress
so the bytes hitting disk are comparable.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker (any 16 bytes valid)

_PRIMS = ("string", "bytes", "int", "long", "float", "double", "boolean")


# --- primitive encoders -----------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-endian groups."""
    z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: io.BufferedIOBase) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _encode_value(avro_type: str, v, out: bytearray) -> None:
    if avro_type == "string":
        raw = str(v).encode("utf-8")
        out += zigzag_encode(len(raw))
        out += raw
    elif avro_type == "bytes":
        raw = bytes(v)
        out += zigzag_encode(len(raw))
        out += raw
    elif avro_type in ("int", "long"):
        out += zigzag_encode(int(v))
    elif avro_type == "float":
        out += struct.pack("<f", float(v))
    elif avro_type == "double":
        out += struct.pack("<d", float(v))
    elif avro_type == "boolean":
        out.append(1 if v else 0)
    else:
        raise NotImplementedError(f"unsupported staging type: {avro_type}")


def _decode_value(avro_type: str, buf: io.BufferedIOBase):
    if avro_type == "string":
        n = zigzag_decode(buf)
        return buf.read(n).decode("utf-8")
    if avro_type == "bytes":
        n = zigzag_decode(buf)
        return buf.read(n)
    if avro_type in ("int", "long"):
        return zigzag_decode(buf)
    if avro_type == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if avro_type == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if avro_type == "boolean":
        return buf.read(1) == b"\x01"
    raise NotImplementedError(f"unsupported staging type: {avro_type}")


# --- record encoding against a staging schema -------------------------------


def _field_plan(schema: dict) -> list[tuple[str, str, bool]]:
    """(name, primitive type, nullable) per field; validates the
    schema is a staging-shaped record."""
    if schema.get("type") != "record":
        raise ValueError("staging schema must be a record")
    plan = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):  # nullable union [type, "null"]
            branches = [b for b in t if b != "null"]
            if len(branches) != 1 or branches[0] not in _PRIMS:
                raise NotImplementedError(f"unsupported union: {t}")
            plan.append((f["name"], branches[0], True))
        else:
            if t not in _PRIMS:
                raise NotImplementedError(f"unsupported type: {t}")
            plan.append((f["name"], t, False))
    return plan


def _is_null(v) -> bool:
    # None / pandas.NA only. Float NaN is NOT null: it is a valid IEEE
    # double the Avro spec encodes like any other — conflating the two
    # (as pandas numeric dtypes force) would silently diverge from
    # parquet and jar-backed Avro staging. The distributed read/write
    # paths therefore move rows through Arrow (null bitmap distinct
    # from NaN payload), never through pandas numeric columns.
    if v is None:
        return True
    return type(v).__name__ == "NAType"  # pandas.NA without importing


def encode_record(plan, values, out: bytearray) -> None:
    for (name, t, nullable), v in zip(plan, values):
        if nullable:
            # union [type, "null"]: branch 0 = value, branch 1 = null
            if _is_null(v):
                out += zigzag_encode(1)
                continue
            out += zigzag_encode(0)
        elif _is_null(v):
            raise ValueError(f"NULL in non-nullable field {name}")
        _encode_value(t, v, out)


def decode_record(plan, buf: io.BufferedIOBase) -> dict:
    row = {}
    for name, t, nullable in plan:
        if nullable:
            branch = zigzag_decode(buf)
            if branch == 1:
                row[name] = None
                continue
        row[name] = _decode_value(t, buf)
    return row


# --- container files ---------------------------------------------------------


def write_avro_file(
    path: str,
    schema: dict,
    rows,
    codec: str = "deflate",
    rows_per_block: int = 4000,
) -> int:
    """Write rows (iterable of sequences, field order = schema order)
    to one Avro container file. Returns the row count."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec: {codec}")
    plan = _field_plan(schema)
    n_rows = 0
    with open(path, "wb") as f:
        f.write(MAGIC)
        meta = {
            "avro.schema": json.dumps(schema, separators=(",", ":")),
            "avro.codec": codec,
        }
        head = bytearray()
        head += zigzag_encode(len(meta))
        for k, v in meta.items():
            for part in (k.encode(), v.encode()):
                head += zigzag_encode(len(part))
                head += part
        head += zigzag_encode(0)  # end of metadata map
        f.write(head)
        f.write(SYNC)

        block = bytearray()
        block_rows = 0

        def flush():
            nonlocal block, block_rows
            if not block_rows:
                return
            payload = bytes(block)
            if codec == "deflate":
                # Avro deflate = RFC 1951 raw stream (no zlib header)
                co = zlib.compressobj(6, zlib.DEFLATED, -15)
                payload = co.compress(payload) + co.flush()
            f.write(zigzag_encode(block_rows))
            f.write(zigzag_encode(len(payload)))
            f.write(payload)
            f.write(SYNC)
            block = bytearray()
            block_rows = 0

        for row in rows:
            encode_record(plan, row, block)
            block_rows += 1
            n_rows += 1
            if block_rows >= rows_per_block:
                flush()
        flush()
    return n_rows


def _read_header(f) -> tuple[dict, str, bytes]:
    """(schema, codec, sync) from a container stream positioned at 0."""
    if f.read(4) != MAGIC:
        raise ValueError("not an Avro container file")
    meta = {}
    while True:
        count = zigzag_decode(f)
        if count == 0:
            break
        if count < 0:
            # Avro spec: a negative block count is followed by the
            # block's byte size (a long) before the entries — consume
            # it so spec-valid files from other writers parse.
            zigzag_decode(f)
            count = -count
        for _ in range(count):
            klen = zigzag_decode(f)
            k = f.read(klen).decode()
            vlen = zigzag_decode(f)
            meta[k] = f.read(vlen)
    sync = f.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    return schema, codec, sync


def _read_stream(f) -> tuple[dict, list[dict]]:
    schema, codec, sync = _read_header(f)
    plan = _field_plan(schema)
    rows = []
    while True:
        probe = f.read(1)
        if not probe:
            break
        f.seek(-1, os.SEEK_CUR)
        n = zigzag_decode(f)
        size = zigzag_decode(f)
        payload = f.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        buf = io.BytesIO(payload)
        for _ in range(n):
            rows.append(decode_record(plan, buf))
        if f.read(16) != sync:
            raise ValueError("sync marker mismatch — corrupt block")
    return schema, rows


def read_avro_file(path: str) -> tuple[dict, list[dict]]:
    """Read one container file back: (schema, rows as dicts)."""
    with open(path, "rb") as f:
        return _read_stream(f)


def read_avro_schema(path: str) -> dict:
    """Header-only read: the embedded schema without touching blocks."""
    with open(path, "rb") as f:
        return _read_header(f)[0]


def read_avro_dir(path: str) -> tuple[dict, list[dict]]:
    """Read every .avro file under a staging dir (sorted for
    determinism); schemas must agree."""
    schema, rows = None, []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".avro"):
            continue
        s, r = read_avro_file(os.path.join(path, name))
        if schema is None:
            schema = s
        elif s != schema:
            raise ValueError("mixed schemas in staging dir")
        rows.extend(r)
    if schema is None:
        raise ValueError(f"no .avro files under {path}")
    return schema, rows


# --- Spark schema bridging ----------------------------------------------------

# Spark simple types that stage natively; date/timestamp(_ntz) are
# formatted to strings first (the reference's string-staging rule —
# same formats functions/casts.staging_expr uses for parquet staging).
_SPARK_TO_AVRO = {
    "string": "string",
    "binary": "bytes",
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
}
_AVRO_TO_SPARK = {
    "string": "string",
    "bytes": "binary",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "boolean": "boolean",
}


def _arrow_type(avro_type: str):
    """pyarrow type for a staging primitive — the Arrow path keeps
    null (bitmap) distinct from float NaN (payload), which a pandas
    numeric column cannot."""
    import pyarrow as pa

    return {
        "string": pa.string(),
        "bytes": pa.binary(),
        "int": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "boolean": pa.bool_(),
    }[avro_type]


def staging_schema_from_spark(df, load_db: str, table: str):
    """(avro schema, projected df) for an arbitrary simple-typed
    DataFrame: date/timestamp columns are formatted to staging
    strings (matching the parquet staging path's formats); decimals
    must already be strings (the staging projection's job)."""
    from pyspark.sql import functions as F

    fields, proj = [], []
    for sf in df.schema.fields:
        t = sf.dataType.simpleString()
        col = F.col(sf.name)
        if t == "date":
            avro_t = "string"
            proj.append(F.date_format(col, "yyyy-MM-dd").alias(sf.name))
        elif t in ("timestamp", "timestamp_ntz"):
            avro_t = "string"
            proj.append(
                F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(sf.name)
            )
        elif t in _SPARK_TO_AVRO:
            avro_t = _SPARK_TO_AVRO[t]
            proj.append(col)
        else:
            raise ValueError(
                f"column {sf.name}: type {t} cannot stage to Avro — "
                "apply the staging projection (string-stage exotics) first"
            )
        ftype = [avro_t, "null"] if sf.nullable else avro_t
        fields.append({"name": sf.name, "type": ftype})
    schema = {
        "type": "record",
        "name": table,
        "namespace": load_db,
        "fields": fields,
        "tableName": f"{load_db}.{table}",
    }
    return schema, df.select(proj)


def spark_ddl_for(schema: dict) -> str:
    """Spark DDL string matching a staging Avro schema's fields."""
    parts = []
    for name, t, _nullable in _field_plan(schema):
        parts.append(f"`{name}` {_AVRO_TO_SPARK[t]}")
    return ", ".join(parts)


def read_avro_staging_dist(spark, path: str, schema: dict | None = None):
    """DISTRIBUTED jar-free read of a pure-Python Avro staging dir:
    ``binaryFile`` lists and ships each container file to a task,
    which decodes it through the pure-Python reader — per-file
    parallelism, no driver funnel (the inverse of
    `write_avro_staging_dir`, which creates one file per partition).

    Decoded rows travel back as Arrow RecordBatches built with
    explicit types, so NULL (Arrow validity bitmap) and float NaN
    (IEEE payload) stay distinct — a pandas numeric column would
    collapse both to NaN.

    ``schema`` may be omitted for local paths (sniffed from the first
    file's header, a metadata-only read); remote URIs must pass the
    schema since the output DataFrame type must be fixed before the
    job launches."""
    if schema is None:
        if "://" in path and not path.startswith("file:"):
            raise ValueError(
                "schema required for remote staging URIs (the header "
                "sniff reads a local file)"
            )
        local = path[len("file:") :] if path.startswith("file:") else path
        names = sorted(
            n for n in os.listdir(local) if n.endswith(".avro")
        )
        if not names:
            raise ValueError(f"no .avro files under {path}")
        schema = read_avro_schema(os.path.join(local, names[0]))
    ddl = spark_ddl_for(schema)
    schema_json = json.dumps(schema, separators=(",", ":"))
    plan = _field_plan(schema)

    def decode(batches):
        import pyarrow as pa

        sch = json.loads(schema_json)
        out_schema = pa.schema(
            [(name, _arrow_type(t)) for name, t, _null in plan]
        )
        for batch in batches:
            for content in batch.column(0).to_pylist():
                file_schema, rows = _read_stream(io.BytesIO(bytes(content)))
                if file_schema != sch:
                    raise ValueError("staging file schema mismatch")
                if not rows:
                    continue  # header-only file (zero-row staging)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(
                            [r[name] for r in rows], type=_arrow_type(t)
                        )
                        for name, t, _null in plan
                    ],
                    schema=out_schema,
                )

    files = (
        spark.read.format("binaryFile")
        .load(os.path.join(path, "*.avro"))
        .select("content")
    )
    return files.mapInArrow(decode, ddl)


# --- distributed write -------------------------------------------------------


def write_avro_staging_dir(
    df,
    path: str,
    schema: dict,
    codec: str = "deflate",
) -> list[dict]:
    """Distributed jar-free Avro staging: each task encodes its
    partition through the pure-Python writer into one container file
    under ``path``. Returns the manifest [(file, rows, bytes)].

    Rows reach the encoder as Arrow RecordBatches (``mapInArrow``),
    so NULL arrives as Python None and a genuine NaN double arrives
    as float('nan') and is encoded as the IEEE payload the Avro spec
    defines — matching parquet and jar-backed Avro staging. A pandas
    path would conflate the two.

    A zero-row slice (e.g. an incremental offload whose predicate
    matches nothing) still produces ONE header-only container file,
    so downstream readers see schema + rows=0 exactly like parquet
    staging — never a missing-directory error.

    SHARED-FS REQUIREMENT: tasks write through task-local ``open()``,
    which is correct on local[] and on clusters where ``path`` is a
    shared mount (NFS/FUSE-mounted object store). On a plain-HDFS
    cluster each executor would write to its own local disk — there
    the native spark-avro jar path is the deployment story
    (``sources/files.py`` probes for it and prefers it); this writer
    is the jar-free fallback.

    The input DataFrame must already BE staging-shaped (use
    `avro_schema.avro_staging_projection`) — column order and types
    must match the schema's fields."""
    os.makedirs(path, exist_ok=True)
    field_names = [f["name"] for f in schema["fields"]]
    if [c for c in df.columns] != field_names:
        raise ValueError(
            f"dataframe columns {df.columns} != schema fields {field_names}"
            " — apply avro_staging_projection first"
        )
    schema_bc = df.sparkSession.sparkContext.broadcast(
        json.dumps(schema, separators=(",", ":"))
    )

    def write_partition(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}.avro"
        fpath = os.path.join(path, fname)
        sch = json.loads(schema_bc.value)

        def rows():
            for batch in batches:
                # to_pylist: Arrow null -> None, NaN double -> nan —
                # the distinction pandas numeric columns erase.
                for rec in batch.to_pylist():
                    yield tuple(rec[c] for c in field_names)

        n = write_avro_file(fpath, sch, rows(), codec=codec)
        if n == 0:
            os.remove(fpath)  # empty partition: no file, no manifest row
            return
        size = os.path.getsize(fpath)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([fname], pa.string()),
                pa.array([n], pa.int64()),
                pa.array([size], pa.int64()),
            ],
            names=["file", "rows", "bytes"],
        )

    manifest = df.mapInArrow(
        write_partition, "file string, rows long, bytes long"
    ).collect()
    if not manifest:
        # All partitions empty: stage one header-only container file
        # driver-side so the directory is a valid, readable zero-row
        # staging set (parity with parquet's rows=0 behaviour).
        fname = "part-00000.avro"
        fpath = os.path.join(path, fname)
        write_avro_file(fpath, schema, [], codec=codec)
        return [
            {"file": fname, "rows": 0, "bytes": os.path.getsize(fpath)}
        ]
    return [r.asDict() for r in manifest]
