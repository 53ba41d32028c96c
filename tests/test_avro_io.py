"""Pure-Python Avro container I/O (sources/avro_io.py): binary
encoding pinned against spec-derived golden bytes (no Avro library
exists in this environment, so the spec is the authority), full
roundtrips for all 7 staging primitives + nullable unions + deflate,
and the distributed mapInPandas staging write.
"""

from __future__ import annotations

import io
import os

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from goe_spark.sources.avro_io import (
    MAGIC,
    SYNC,
    read_avro_dir,
    read_avro_file,
    write_avro_file,
    write_avro_staging_dir,
    zigzag_decode,
    zigzag_encode,
)


# --- golden bytes straight from the Avro spec --------------------------------


@pytest.mark.parametrize(
    "n,want",
    [
        (0, b"\x00"),
        (-1, b"\x01"),
        (1, b"\x02"),
        (-2, b"\x03"),
        (2, b"\x04"),
        (-64, b"\x7f"),
        (64, b"\x80\x01"),
        (-65, b"\x81\x01"),
    ],
)
def test_zigzag_spec_examples(n, want):
    """The worked examples from the Avro specification's binary
    encoding section."""
    assert zigzag_encode(n) == want
    assert zigzag_decode(io.BytesIO(want)) == n


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_roundtrip(n):
    assert zigzag_decode(io.BytesIO(zigzag_encode(n))) == n


def test_container_golden_bytes(tmp_path):
    """Byte-exact container: header layout, uncompressed block
    encoding, record bodies — each region derived by hand from the
    container-file spec."""
    schema = {
        "type": "record",
        "name": "t",
        "namespace": "db",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["string", "null"]},
        ],
        "tableName": "db.t",
    }
    p = str(tmp_path / "g.avro")
    write_avro_file(p, schema, [(3, "hi"), (-1, None)], codec="null")
    data = open(p, "rb").read()
    assert data[:4] == MAGIC
    # metadata map: 2 entries, then 0 terminator
    import json

    buf = io.BytesIO(data[4:])
    assert zigzag_decode(buf) == 2
    meta = {}
    for _ in range(2):
        k = buf.read(zigzag_decode(buf)).decode()
        meta[k] = buf.read(zigzag_decode(buf))
    assert zigzag_decode(buf) == 0
    assert json.loads(meta["avro.schema"]) == schema
    assert meta["avro.codec"] == b"null"
    assert buf.read(16) == SYNC
    # one block: count=2, size, then the records
    assert zigzag_decode(buf) == 2
    size = zigzag_decode(buf)
    body = buf.read(size)
    #   (3, "hi"): long 3 -> 0x06; union branch 0 -> 0x00;
    #              string len 2 -> 0x04; "hi"
    #   (-1, None): long -1 -> 0x01; union branch 1 (null) -> 0x02
    assert body == b"\x06\x00\x04hi" + b"\x01\x02"
    assert buf.read(16) == SYNC
    assert buf.read() == b""  # nothing after the last block


ALL_TYPES_SCHEMA = {
    "type": "record",
    "name": "allt",
    "namespace": "db",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "y", "type": ["bytes", "null"]},
        {"name": "i", "type": ["int", "null"]},
        {"name": "l", "type": "long"},
        {"name": "f", "type": ["float", "null"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": ["boolean", "null"]},
    ],
    "tableName": "db.allt",
}

ROWS = [
    ("héllo", b"\x00\xff", 42, -7, 1.5, 2.25, True),
    ("", None, None, 2**62, None, -0.0, None),
    ("x" * 5000, b"", -(2**31), -(2**63), -3.0, 1e300, False),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_roundtrip_all_staging_types(tmp_path, codec):
    p = str(tmp_path / f"all_{codec}.avro")
    n = write_avro_file(p, ALL_TYPES_SCHEMA, ROWS, codec=codec)
    assert n == 3
    schema, rows = read_avro_file(p)
    assert schema == ALL_TYPES_SCHEMA
    assert len(rows) == 3
    for want, got in zip(ROWS, rows):
        assert got["s"] == want[0]
        assert got["y"] == want[1]
        assert got["i"] == want[2]
        assert got["l"] == want[3]
        assert got["f"] == pytest.approx(want[4]) if want[4] is not None else got["f"] is None
        assert got["d"] == want[5]
        assert got["b"] is want[6] if want[6] is not None else got["b"] is None


def test_multi_block_files(tmp_path):
    p = str(tmp_path / "blocks.avro")
    schema = {
        "type": "record",
        "name": "t",
        "namespace": "db",
        "fields": [{"name": "a", "type": "long"}],
        "tableName": "db.t",
    }
    rows = [(i,) for i in range(10_001)]
    write_avro_file(p, schema, rows, rows_per_block=1000)
    _, back = read_avro_file(p)
    assert [r["a"] for r in back] == list(range(10_001))


def test_corrupt_sync_detected(tmp_path):
    p = str(tmp_path / "c.avro")
    schema = {
        "type": "record",
        "name": "t",
        "namespace": "db",
        "fields": [{"name": "a", "type": "long"}],
        "tableName": "db.t",
    }
    write_avro_file(p, schema, [(1,)], codec="null")
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # flip the last sync byte
    open(p, "wb").write(bytes(data))
    with pytest.raises(ValueError, match="sync"):
        read_avro_file(p)


def test_distributed_staging_write_roundtrip(spark, tmp_path):
    """End-to-end jar-free S10: canonical columns -> staging
    projection -> per-partition pure-Python container files ->
    read-back equals the projected rows."""
    import datetime
    from decimal import Decimal

    from goe_spark.sources.avro_schema import (
        avro_schema,
        avro_staging_projection,
    )
    from goe_spark.types import canonical as C
    from goe_spark.types.canonical import CanonicalColumn

    cols = [
        CanonicalColumn("id", C.INTEGER_8, nullable=False),
        CanonicalColumn("amount", C.DECIMAL, data_precision=12, data_scale=2),
        CanonicalColumn("payload", C.BINARY),
        CanonicalColumn("created", C.TIMESTAMP),
        CanonicalColumn("flag", C.BOOLEAN),
    ]
    df = spark.createDataFrame(
        [
            (i, Decimal(i) + Decimal("0.25"), bytes([i % 256, 255]),
             datetime.datetime(2024, 1, 1 + i % 28), i % 2 == 0)
            for i in range(500)
        ]
        + [(999, None, None, None, None)],
        "id long, amount decimal(12,2), payload binary, "
        "created timestamp_ntz, flag boolean",
    ).repartition(4)
    schema = avro_schema("db_load", "t1", cols)
    staged = avro_staging_projection(df, cols)
    out = str(tmp_path / "stage")
    manifest = write_avro_staging_dir(staged, out, schema)
    assert sum(m["rows"] for m in manifest) == 501
    assert all(m["bytes"] > 0 for m in manifest)
    assert len(manifest) <= 4
    back_schema, back_rows = read_avro_dir(out)
    assert back_schema == schema
    assert len(back_rows) == 501
    by_id = {r["id"]: r for r in back_rows}
    assert by_id[3]["amount"] == "3.25"  # decimal staged as string
    import base64

    # binary staged as base64 TEXT (the reference's base64 rule)
    assert base64.b64decode(by_id[3]["payload"]) == bytes([3, 255])
    assert by_id[3]["created"] == "2024-01-04 00:00:00.000000"
    assert by_id[999]["amount"] is None
    assert by_id[999]["flag"] is None
    # files on disk are real .avro container files
    for name in os.listdir(out):
        assert name.endswith(".avro")
        assert open(os.path.join(out, name), "rb").read(4) == MAGIC


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(max_size=40),
            st.one_of(st.none(), st.binary(max_size=30)),
            st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
            st.integers(-(2**63), 2**63 - 1),
            st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False, width=32)),
            st.floats(allow_nan=False, allow_infinity=False),
            st.one_of(st.none(), st.booleans()),
        ),
        max_size=25,
    )
)
def test_roundtrip_property(tmp_path_factory, rows):
    """Random rows over the full staging type surface roundtrip
    bit-exactly through the container encode/decode."""
    p = str(tmp_path_factory.mktemp("avro") / "prop.avro")
    n = write_avro_file(p, ALL_TYPES_SCHEMA, rows, codec="deflate")
    assert n == len(rows)
    if n == 0:
        _, back = read_avro_file(p)
        assert back == []
        return
    _, back = read_avro_file(p)
    for want, got in zip(rows, back):
        assert got["s"] == want[0]
        assert got["y"] == want[1]
        assert got["i"] == want[2]
        assert got["l"] == want[3]
        if want[4] is None:
            assert got["f"] is None
        else:
            import struct as _s

            assert _s.pack("<f", got["f"]) == _s.pack("<f", want[4])
        assert got["d"] == want[5]
        assert got["b"] is want[6] if want[6] is not None else got["b"] is None


def test_nan_double_preserved_not_nulled(spark, tmp_path):
    """Round-7 ADVICE: a genuine NaN double must stage as the IEEE NaN
    payload (like parquet and jar-backed Avro), NOT silently become
    null — and a real NULL must stay null. The Arrow read/write paths
    keep the two distinct."""
    from goe_spark.sources.avro_io import (
        read_avro_staging_dist,
        staging_schema_from_spark,
    )

    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, None)],
        "id bigint, v double",
    ).repartition(2)
    schema, projected = staging_schema_from_spark(df, "db_load", "nan_t")
    out = str(tmp_path / "stage_nan")
    manifest = write_avro_staging_dir(projected, out, schema)
    assert sum(m["rows"] for m in manifest) == 3

    # file-level check through the pure-Python reader
    _, rows = read_avro_dir(out)
    by_id = {r["id"]: r["v"] for r in rows}
    assert by_id[1] == 1.5
    assert by_id[2] != by_id[2], "NaN must stay NaN, not become null"
    assert by_id[3] is None, "NULL must stay null"

    # distributed read-back keeps the distinction too
    back = {
        r["id"]: r["v"]
        for r in read_avro_staging_dist(spark, out, schema).collect()
    }
    assert back[1] == 1.5
    assert back[2] != back[2]
    assert back[3] is None


def test_zero_row_staging_readable(spark, tmp_path):
    """Round-7 ADVICE: staging a zero-row slice (predicate matches
    nothing) must leave a valid header-only container file so both
    readers see schema + rows=0 — parity with parquet staging."""
    from goe_spark.sources.avro_io import (
        read_avro_staging_dist,
        staging_schema_from_spark,
    )

    df = spark.createDataFrame([(1, "a")], "id bigint, s string").where(
        "id < 0"
    )
    schema, projected = staging_schema_from_spark(df, "db_load", "empty_t")
    out = str(tmp_path / "stage_empty")
    manifest = write_avro_staging_dir(projected, out, schema)
    assert len(manifest) == 1 and manifest[0]["rows"] == 0
    back_schema, back_rows = read_avro_dir(out)
    assert back_schema == schema and back_rows == []
    dist = read_avro_staging_dist(spark, out, schema)
    assert dist.count() == 0
    assert [f.name for f in dist.schema.fields] == ["id", "s"]


def test_negative_metadata_map_count_parses(tmp_path):
    """Avro spec: a NEGATIVE map block count is followed by the
    block's byte size before the entries. Files from other spec-
    compliant writers that use this form must parse."""
    import json as _json

    from goe_spark.sources.avro_io import read_avro_file

    schema = {
        "type": "record",
        "name": "t",
        "namespace": "db",
        "fields": [{"name": "a", "type": "long"}],
        "tableName": "db.t",
    }
    meta_entries = {
        "avro.schema": _json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": b"null",
    }
    body = bytearray()
    for k, v in meta_entries.items():
        body += zigzag_encode(len(k)) + k.encode()
        body += zigzag_encode(len(v)) + v
    head = bytearray(MAGIC)
    head += zigzag_encode(-2)          # negative count form
    head += zigzag_encode(len(body))   # ...followed by byte size
    head += body
    head += zigzag_encode(0)
    head += SYNC
    # one block: count=1, record (long 7 -> 0x0e)
    head += zigzag_encode(1) + zigzag_encode(1) + b"\x0e" + SYNC
    p = str(tmp_path / "neg.avro")
    open(p, "wb").write(bytes(head))
    got_schema, rows = read_avro_file(p)
    assert got_schema == schema
    assert [r["a"] for r in rows] == [7]


def test_native_avro_path_preferred_when_jar_present(spark, tmp_path, monkeypatch):
    """Capability probe (round-7 VERDICT task 7): when the spark-avro
    jar IS on the classpath, write_staging/read_staging must route to
    Spark's native avro datasource, not the jar-free fallback. The
    sandbox has no jar, so we force the probe True and assert the
    attempt goes to the native format (which then fails with Spark's
    'Failed to find data source' — proof the fallback was bypassed)."""
    from goe_spark.sources import files as files_mod

    monkeypatch.setattr(files_mod, "avro_available", lambda s: True)
    df = spark.createDataFrame([(1, "a")], "id bigint, s string")
    out = str(tmp_path / "native_probe")
    with pytest.raises(Exception, match="Failed to find data source"):
        files_mod.write_staging(df, out, fmt="avro")
    with pytest.raises(Exception, match="Failed to find data source"):
        files_mod.read_staging(spark, out, fmt="avro")


def test_avro_available_probe_is_false_without_jar(spark):
    """In this environment the jar is absent: the probe must say so
    (the fallback engages off this exact signal)."""
    from goe_spark.sources.files import avro_available

    assert avro_available(spark) is False
