"""goe-avro Python DataSource: spark.read.format('goe-avro') over a
pure-Python staging dir must match the mapInArrow reader row for row,
expose one input partition per container file, and infer the schema
from the first file's header at plan time."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def staging_dir(spark, tmp_path):
    from goe_spark.sources.avro_io import write_avro_staging_dir
    from goe_spark.sources.avro_schema import (
        avro_schema,
        avro_staging_projection,
    )
    from goe_spark.types import canonical as C
    from goe_spark.types.canonical import CanonicalColumn

    cols = [
        CanonicalColumn("id", C.INTEGER_8, nullable=False),
        CanonicalColumn("amount", C.DECIMAL, data_precision=12, data_scale=2),
        CanonicalColumn("created", C.TIMESTAMP),
        CanonicalColumn("flag", C.BOOLEAN),
    ]
    df = spark.createDataFrame(
        [
            (i, Decimal(i) + Decimal("0.25"),
             datetime.datetime(2024, 1, 1 + i % 28), i % 2 == 0)
            for i in range(200)
        ]
        + [(999, None, None, None)],
        "id long, amount decimal(12,2), created timestamp_ntz,"
        " flag boolean",
    ).repartition(3)
    schema = avro_schema("db_load", "t1", cols)
    out = str(tmp_path / "stage")
    write_avro_staging_dir(avro_staging_projection(df, cols), out, schema)
    return out


def test_datasource_matches_mapinarrow_reader(spark, staging_dir):
    from goe_spark.sources.avro_datasource import register
    from goe_spark.sources.avro_io import read_avro_staging_dist

    register(spark)
    ds = spark.read.format("goe-avro").load(staging_dir)
    ref = read_avro_staging_dist(spark, staging_dir)
    assert ds.schema == ref.schema
    key = lambda rows: sorted(tuple(r) for r in rows)  # noqa: E731
    assert key(ds.collect()) == key(ref.collect())
    assert ds.count() == 201


def test_datasource_partition_per_file(spark, staging_dir):
    import os

    from goe_spark.sources.avro_datasource import register

    register(spark)
    n_files = len(
        [n for n in os.listdir(staging_dir) if n.endswith(".avro")]
    )
    ds = spark.read.format("goe-avro").load(staging_dir)
    n_parts = (
        ds.select(F.spark_partition_id().alias("p")).distinct().count()
    )
    assert n_parts == n_files >= 2


def test_datasource_null_fidelity(spark, staging_dir):
    from goe_spark.sources.avro_datasource import register

    register(spark)
    ds = spark.read.format("goe-avro").load(staging_dir)
    nulls = ds.where(F.col("amount").isNull()).collect()
    assert len(nulls) == 1 and nulls[0]["id"] == 999
    # projected read still decodes correctly (pruning is post-decode)
    assert ds.select("id").where(F.col("id") == 999).count() == 1


def test_datasource_user_schema_projection(spark, staging_dir):
    """An explicit subset / reordered user schema is a real projection
    (round-10 ADVICE): the reader reorders arrays to the declared
    schema instead of erroring on an arrow/schema mismatch."""
    from goe_spark.sources.avro_datasource import register

    register(spark)
    full = spark.read.format("goe-avro").load(staging_dir)
    ddl = dict(full.dtypes)
    sub = (
        spark.read.format("goe-avro")
        .schema(f"flag {ddl['flag']}, id {ddl['id']}")
        .load(staging_dir)
    )
    assert sub.columns == ["flag", "id"]
    key = lambda rows: sorted(  # noqa: E731
        (r["id"], r["flag"]) for r in rows
    )
    assert key(sub.collect()) == key(full.select("id", "flag").collect())


def test_datasource_user_schema_mismatch_raises(spark, staging_dir):
    from goe_spark.sources.avro_datasource import register

    register(spark)
    with pytest.raises(Exception, match="goe-avro"):
        spark.read.format("goe-avro").schema("id int").load(
            staging_dir
        ).collect()
    with pytest.raises(Exception, match="goe-avro"):
        spark.read.format("goe-avro").schema("nope bigint").load(
            staging_dir
        ).collect()
