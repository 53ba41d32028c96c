"""LIVE JDBC round-trip against embedded Derby (ships with pyspark's
jars for the Hive metastore), exercising the real
spark.read.format('jdbc') path that the unit tests only bind options
for: range-partitioned scans, predicate-array scans, and
column/where pushdown inside the dbtable subquery."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from goe_spark.sources.jdbc import read_jdbc
from goe_spark.sources.split_strategy import (
    SPLIT_BY_MOD,
    SplitPlan,
    id_range_split,
    mod_split_predicates,
)

N_ROWS = 100


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derbydb") / "goe"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._jvm
    jvm.Class.forName("org.apache.derby.jdbc.EmbeddedDriver").newInstance()
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE sales (id INT PRIMARY KEY, region VARCHAR(10), amount DECIMAL(10,2))")
    ps = conn.prepareStatement("INSERT INTO sales VALUES (?, ?, ?)")
    for i in range(N_ROWS):
        ps.setInt(1, i)
        ps.setString(2, f"R{i % 4}")
        ps.setBigDecimal(
            3, jvm.java.math.BigDecimal(f"{(i * 7) % 500}.25")
        )
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()
    return url


def test_id_range_partitioned_read(spark, derby_url):
    plan = id_range_split("id", 0, N_ROWS - 1, parallelism=4)
    df = read_jdbc(spark, derby_url, "sales", plan)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == N_ROWS
    assert df.agg(F.sum("ID")).collect()[0][0] == N_ROWS * (N_ROWS - 1) // 2


def test_mod_predicates_read(spark, derby_url):
    # Derby has no HASH(); MOD on the id column itself is the same
    # disjoint-and-complete contract the planner requires.
    preds = mod_split_predicates("id", 3, hash_template="MOD({col}, {n})")
    plan = SplitPlan(split_type=SPLIT_BY_MOD, predicates=tuple(preds))
    df = read_jdbc(spark, derby_url, "sales", plan)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == N_ROWS
    assert df.select("ID").distinct().count() == N_ROWS


def test_pushdown_columns_and_where(spark, derby_url):
    plan = id_range_split("id", 0, N_ROWS - 1, parallelism=2)
    df = read_jdbc(
        spark,
        derby_url,
        "sales",
        plan,
        columns=["id", "region"],
        where="region = 'R1'",
    )
    rows = df.collect()
    assert set(df.columns) == {"ID", "REGION"}
    assert len(rows) == N_ROWS // 4
    assert all(r.REGION == "R1" for r in rows)


def test_custom_schema_read(spark, derby_url):
    plan = id_range_split("id", 0, N_ROWS - 1, parallelism=2)
    df = read_jdbc(
        spark,
        derby_url,
        "sales",
        plan,
        custom_schema="AMOUNT DOUBLE",
    )
    assert dict(df.dtypes)["AMOUNT"] == "double"
    assert df.count() == N_ROWS


def test_sampling_pushdown_live_fallback(spark, derby_url):
    """sample_rdbms_data_types against live Derby: Derby has no
    TABLESAMPLE dialect entry, so the helper must fall back to a
    post-read df.sample — and at 100% the tightening must see every
    row, reproducing the exact all-rows answer."""
    from goe_spark.types.sampling import sample_rdbms_data_types

    cols = sample_rdbms_data_types(
        spark,
        derby_url,
        "sales",
        numeric_cols=["amount"],
        date_cols=[],
        dialect="derby",
        percent=100.0,
    )
    (amount,) = cols
    # max amount is 499.25 -> magnitude 3, scale 2 -> DECIMAL(5,2)
    assert amount.data_type == "DECIMAL"
    assert (amount.data_precision, amount.data_scale) == (5, 2)
    assert amount.safe_mapping is False  # sampled types are always unsafe


def test_sampling_pushdown_partial_sample_live(spark, derby_url):
    """A 20% fallback sample still classifies amount as a 2-dp decimal
    (every row shares the .25 fraction); magnitude may shrink but can
    never exceed the full-scan answer."""
    from goe_spark.types.sampling import sample_rdbms_data_types

    cols = sample_rdbms_data_types(
        spark,
        derby_url,
        "sales",
        numeric_cols=["amount"],
        date_cols=[],
        dialect="derby",
        percent=20.0,
    )
    (amount,) = cols
    assert amount.data_type == "DECIMAL"
    assert amount.data_scale == 2
    assert amount.data_precision <= 5


def test_mod_abs_null_safe_split_keeps_negative_and_null_keys(
    spark, derby_url
):
    """Round-8 ADVICE: SQL MOD keeps the dividend's sign, so the live
    offload's old MOD({col}, {n}) template silently dropped rows whose
    split key is negative — and any template drops NULL keys, since
    NULL = k matches no slice. The fixed template (MOD(ABS(col), n)
    with the IS NULL arm folded into slice 0) must recover every row
    from a table that has positive, negative and NULL keys."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(derby_url)
    st = conn.createStatement()
    st.execute("CREATE TABLE signed_keys (k INT, payload VARCHAR(10))")
    vals = list(range(-7, 8)) + [None, None, None]
    ps = conn.prepareStatement("INSERT INTO signed_keys VALUES (?, ?)")
    for i, v in enumerate(vals):
        if v is None:
            ps.setNull(1, jvm.java.sql.Types.INTEGER)
        else:
            ps.setInt(1, v)
        ps.setString(2, f"p{i}")
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()

    preds = mod_split_predicates(
        "k", 3, hash_template="MOD(ABS({col}), {n})", null_safe=True
    )
    plan = SplitPlan(split_type=SPLIT_BY_MOD, predicates=tuple(preds))
    df = read_jdbc(spark, derby_url, "signed_keys", plan)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == len(vals)
    # disjointness: every payload appears exactly once across slices
    assert df.select("PAYLOAD").distinct().count() == len(vals)
    # the old template provably loses the negatives and NULLs
    old = mod_split_predicates("k", 3, hash_template="MOD({col}, {n})")
    lossy = read_jdbc(
        spark,
        derby_url,
        "signed_keys",
        SplitPlan(split_type=SPLIT_BY_MOD, predicates=tuple(old)),
    )
    # Derby MOD keeps the dividend's sign (Java %): a negative key
    # only lands in a slice when its remainder is exactly 0 (negative
    # multiples of n); every other negative and all NULLs are lost.
    kept = [
        v
        for v in vals
        if v is not None and (v >= 0 or int(math.fmod(v, 3)) == 0)
    ]
    assert lossy.count() == len(kept)


def test_dialect_mod_template_survives_bigint_min_and_skew(
    spark, derby_url
):
    """Round-9 ADVICE: MOD(ABS(col), n) raises 22003 on Derby when col
    is the most-negative BIGINT (ABS(-2^63) overflows), aborting the
    whole parallel transport on ONE extreme key, and folds +k/-k onto
    the same slice (skew on sign-symmetric keys). The Derby dialect
    template — sign-free double-mod MOD(MOD(col, n) + n, n) — must
    (a) transport every row including BIGINT min/max and NULLs, and
    (b) keep +k and -k on DIFFERENT slices when n doesn't divide 2k."""
    from goe_spark.sources.jdbc import dialect_from_jdbc_url
    from goe_spark.sources.split_strategy import mod_hash_template

    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(derby_url)
    st = conn.createStatement()
    st.execute("CREATE TABLE extreme_keys (k BIGINT, payload VARCHAR(10))")
    lo, hi = -(2**63), 2**63 - 1
    vals = [lo, hi, lo + 1, hi - 1, -5, -4, -1, 0, 1, 4, 5, None]
    ps = conn.prepareStatement("INSERT INTO extreme_keys VALUES (?, ?)")
    for i, v in enumerate(vals):
        if v is None:
            ps.setNull(1, jvm.java.sql.Types.BIGINT)
        else:
            ps.setLong(1, v)
        ps.setString(2, f"p{i}")
        ps.addBatch()
    ps.executeBatch()

    tmpl = mod_hash_template(dialect_from_jdbc_url(derby_url))
    assert "ABS" not in tmpl.upper()
    preds = mod_split_predicates("k", 3, hash_template=tmpl, null_safe=True)
    plan = SplitPlan(split_type=SPLIT_BY_MOD, predicates=tuple(preds))
    df = read_jdbc(spark, derby_url, "extreme_keys", plan)
    assert df.count() == len(vals)
    assert df.select("PAYLOAD").distinct().count() == len(vals)
    # sign-symmetric keys land on python-% slices, NOT folded together:
    # +4 -> slice 1, -4 -> slice 2 (the ABS template put both on 1)
    by_slice = {
        r["K"]: r["S"]
        for r in df.select(
            "K", F.spark_partition_id().alias("S")
        ).collect()
        if r["K"] in (4, -4)
    }
    assert by_slice[4] != by_slice[-4]
    # the OLD ABS template fail-louds on BIGINT min — prove the edge is
    # real so the double-mod's value is pinned, not assumed
    abs_preds = mod_split_predicates(
        "k", 3, hash_template="MOD(ABS({col}), {n})", null_safe=True
    )
    lossy = read_jdbc(
        spark,
        derby_url,
        "extreme_keys",
        SplitPlan(split_type=SPLIT_BY_MOD, predicates=tuple(abs_preds)),
    )
    with pytest.raises(Exception, match="22003|[Oo]verflow|range"):
        lossy.count()
    st.close()
    conn.close()
