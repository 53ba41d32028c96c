"""`goe-avro`: a PySpark 4 Python DataSource over the pure-Python
Avro container codec (sources/avro_io.py) — the jar-free staging
format promoted to a FIRST-CLASS reader:

    spark.dataSource.register(GoeAvroDataSource)
    df = spark.read.format("goe-avro").load("/staging/dir")

Why this exists alongside `read_avro_staging_dist` (the
binaryFile + mapInArrow composition): the DataSource API is the
surface a reference user expects a storage format to live behind —
schema inference happens once at plan time (a header-only read of
the first file), each container file becomes one InputPartition (the
same per-file parallelism as the mapInArrow path, but visible to
Spark's scheduler as real partitions), and the format composes with
everything `spark.read` does (select pruning happens post-decode —
Avro containers are row-major, so column pruning cannot reach the
file; stated, not hidden).

Rows travel back as Arrow RecordBatches (the DataSource reader
yields pyarrow batches, Spark's arrow path consumes them zero-copy),
with explicit types so NULL keeps its validity bitmap — identical
decode discipline to avro_io.read_avro_staging_dist, pinned
row-identical in tests/test_avro_datasource.py.

Reference parity: the reference stages Avro through Sqoop/Spark jars
(goe.offload staging, SURVEY §2.1 S10); this keeps that surface
alive with zero external jars.
"""

from __future__ import annotations

import io
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

from goe_spark.sources.avro_io import (
    _arrow_type,
    _AVRO_TO_SPARK,
    _field_plan,
    _read_stream,
    read_avro_schema,
    spark_ddl_for,
)


class _AvroFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _resolve_dir(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError("goe-avro requires a path: .load('/dir')")
    if path.startswith("file:"):
        path = path[len("file:"):]
    return path


def _avro_files(d: str) -> list[str]:
    if os.path.isfile(d):
        return [d]
    names = sorted(n for n in os.listdir(d) if n.endswith(".avro"))
    if not names:
        raise ValueError(f"no .avro files under {d}")
    return [os.path.join(d, n) for n in names]


class GoeAvroReader(DataSourceReader):
    def __init__(self, options: dict, schema_json: str, want: list[str]):
        self._dir = _resolve_dir(options)
        self._schema_json = schema_json
        #: field names in the order Spark declared them — a user
        #: supplying an explicit subset/reordered schema gets a real
        #: projection, not an arrow/declared-schema mismatch error
        self._want = want

    def partitions(self):
        return [_AvroFilePartition(p) for p in _avro_files(self._dir)]

    def read(self, partition):
        import pyarrow as pa

        sch = json.loads(self._schema_json)
        by_name = {name: t for name, t, _null in _field_plan(sch)}
        with open(partition.path, "rb") as f:
            file_schema, rows = _read_stream(f)
        if file_schema != sch:
            raise ValueError(
                f"{partition.path}: schema differs from the directory's "
                "first file — mixed-schema staging dirs are corrupt"
            )
        if not rows:
            return  # header-only file (zero-row staging partition)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(
                    [r[name] for r in rows], type=_arrow_type(by_name[name])
                )
                for name in self._want
            ],
            schema=pa.schema(
                [(name, _arrow_type(by_name[name])) for name in self._want]
            ),
        )


class GoeAvroDataSource(DataSource):
    """Register with ``spark.dataSource.register(GoeAvroDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "goe-avro"

    def schema(self) -> str:
        # plan-time inference: header-only read of the first file
        first = _avro_files(_resolve_dir(self.options))[0]
        self._avro_schema = read_avro_schema(first)
        return spark_ddl_for(self._avro_schema)

    def reader(self, schema) -> GoeAvroReader:
        avro_schema = getattr(self, "_avro_schema", None)
        if avro_schema is None:  # explicit user schema path skips schema()
            first = _avro_files(_resolve_dir(self.options))[0]
            avro_schema = read_avro_schema(first)
        # Validate the Spark-declared schema against the file at PLAN
        # time: a subset / reordered user schema becomes a projection
        # (GoeAvroReader._want); an unknown field or a type mismatch
        # fails here with the file's actual type instead of surfacing
        # as an arrow/declared-schema error mid-job.
        file_types = {
            name: _AVRO_TO_SPARK[t] for name, t, _null in _field_plan(avro_schema)
        }
        want = []
        for f in schema.fields:
            declared = f.dataType.simpleString()
            actual = file_types.get(f.name)
            if actual is None:
                raise ValueError(
                    f"goe-avro: field {f.name!r} not in the avro file "
                    f"(has: {sorted(file_types)})"
                )
            if declared.lower() != actual.lower():
                raise ValueError(
                    f"goe-avro: field {f.name!r} declared {declared} but "
                    f"the avro file stores {actual} — the reader projects "
                    "and reorders, it does not cast"
                )
            want.append(f.name)
        return GoeAvroReader(
            self.options,
            json.dumps(avro_schema, separators=(",", ":")),
            want,
        )


def register(spark) -> None:
    spark.dataSource.register(GoeAvroDataSource)
