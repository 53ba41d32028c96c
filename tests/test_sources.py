"""Sources layer: split planner, JDBC option binding, staging sinks.

Planner tests are pure (the reference's transport-SQL-text test style,
tests/unit/offload/test_offload_transport*.py); the predicate-replay
tests prove each plan's batches are disjoint and complete by running
them as filters over the parquet fixtures.
"""

from __future__ import annotations

import pytest

from goe_spark.sources import (
    FileSource,
    choose_split_strategy,
    id_range_split,
    jdbc_reader_options,
    mod_split_predicates,
    partition_split_predicates,
    read_staging,
    write_staging,
)
from goe_spark.sources.split_strategy import (
    SPLIT_BY_ID_RANGE,
    SPLIT_BY_MOD,
    SPLIT_BY_NATIVE_RANGE,
    SPLIT_BY_PARTITION,
    SPLIT_BY_SUBPARTITION,
    TableScanMeta,
    subpartition_split_predicates,
)
from tests.conftest import SF_SMALL


class TestPlannerChoice:
    def test_partitioned_table_wins(self):
        meta = TableScanMeta(
            partition_names=("P1", "P2", "P3"),
            numeric_id_column="id",
            id_nullable=False,
            id_bounds=(1, 100),
        )
        plan = choose_split_strategy(meta, parallelism=2)
        assert plan.split_type == SPLIT_BY_PARTITION
        assert len(plan.predicates) == 2

    def test_id_range_when_bounds_known(self):
        meta = TableScanMeta(
            numeric_id_column="o_orderkey", id_nullable=False, id_bounds=(1, 6000)
        )
        plan = choose_split_strategy(meta, parallelism=4)
        assert plan.split_type == SPLIT_BY_ID_RANGE
        assert (plan.lower_bound, plan.upper_bound) == (1, 6001)  # +1 pad
        assert plan.num_partitions == 4

    def test_native_range_when_bounds_unknown(self):
        meta = TableScanMeta(numeric_id_column="id", id_nullable=False)
        plan = choose_split_strategy(meta, parallelism=4)
        assert plan.split_type == SPLIT_BY_NATIVE_RANGE
        assert plan.lower_bound is None

    def test_mod_fallback_for_nullable_id(self):
        # range striping drops NULL ids; MOD keeps them
        meta = TableScanMeta(numeric_id_column="id", id_nullable=True)
        plan = choose_split_strategy(meta, parallelism=3)
        assert plan.split_type == SPLIT_BY_MOD
        assert len(plan.predicates) == 3

    def test_no_splittable_column_raises(self):
        with pytest.raises(ValueError):
            choose_split_strategy(TableScanMeta())

    def test_subpartition_scoped_offload_splits_by_subpartition(self):
        # offload_by_subpartition: chunk records ARE subpartitions
        # (reference :693-699 stores their names as partition names)
        meta = TableScanMeta(
            partition_names=("P1_SP1", "P1_SP2", "P2_SP1", "P2_SP2"),
            offload_by_subpartition=True,
        )
        plan = choose_split_strategy(meta, parallelism=2)
        assert plan.split_type == SPLIT_BY_SUBPARTITION
        assert len(plan.predicates) == 2
        assert all("GOE_SUBPARTITION_NAME" in p for p in plan.predicates)

    def test_subpartitions_rescue_low_partition_count(self):
        # fewer partitions than parallelism, but plenty of
        # subpartitions (reference :583-593)
        meta = TableScanMeta(
            partition_names=("P1", "P2"),
            subpartition_names=tuple(
                f"P{p}_SP{s}" for p in (1, 2) for s in range(4)
            ),
        )
        plan = choose_split_strategy(meta, parallelism=4)
        assert plan.split_type == SPLIT_BY_SUBPARTITION
        assert len(plan.predicates) == 4

    def test_few_partitions_with_id_fall_to_range(self):
        # single partition + usable id: treated like non-partitioned
        # (the reference's IOT/EXTENT region, minus EXTENT)
        meta = TableScanMeta(
            partition_names=("P1",),
            numeric_id_column="id",
            id_nullable=False,
            id_bounds=(0, 99),
        )
        plan = choose_split_strategy(meta, parallelism=4)
        assert plan.split_type == SPLIT_BY_ID_RANGE

    def test_few_partitions_no_id_keep_partition_split(self):
        meta = TableScanMeta(partition_names=("P1",))
        plan = choose_split_strategy(meta, parallelism=4)
        assert plan.split_type == SPLIT_BY_PARTITION
        assert len(plan.predicates) == 1


class TestPredicateShapes:
    def test_partition_batches_round_robin(self):
        preds = partition_split_predicates(["a", "b", "c", "d", "e"], 2)
        assert preds[0].count("'") == 6  # a, c, e
        assert preds[1].count("'") == 4  # b, d
        assert all("GOE_PARTITION_NAME" in p for p in preds)

    def test_more_parallelism_than_partitions(self):
        preds = partition_split_predicates(["a"], 8)
        assert len(preds) == 1

    def test_mod_covers_all_residues(self):
        preds = mod_split_predicates("cust_id", 4)
        assert preds == [
            f"MOD(ABS(HASH(cust_id)), 4) = {k}" for k in range(4)
        ]


class TestJdbcBinding:
    def test_range_options(self):
        plan = id_range_split("o_orderkey", 1, 100, 4)
        opts = jdbc_reader_options(
            "jdbc:x", "sales.orders", plan, columns=["a", "b"], where="a > 0"
        )
        assert opts["partitionColumn"] == "o_orderkey"
        assert (opts["lowerBound"], opts["upperBound"]) == ("1", "101")
        assert opts["numPartitions"] == "4"
        assert opts["fetchsize"] == "5000"
        assert opts["dbtable"] == "(SELECT a, b FROM sales.orders WHERE a > 0) goe_src"

    def test_snapshot_clause_passthrough(self):
        meta = TableScanMeta(
            numeric_id_column="id", id_nullable=False, id_bounds=(0, 9)
        )
        plan = choose_split_strategy(meta, snapshot_clause="AS OF SCN 42")
        opts = jdbc_reader_options("jdbc:x", "t", plan)
        assert "t AS OF SCN 42" in opts["dbtable"]

    def test_unresolved_bounds_rejected(self):
        meta = TableScanMeta(numeric_id_column="id", id_nullable=False)
        plan = choose_split_strategy(meta)
        with pytest.raises(ValueError, match="unresolved"):
            jdbc_reader_options("jdbc:x", "t", plan)


class TestPredicateReplay:
    """Prove plans partition the data: disjoint batches, complete union.

    The predicates are written for the source database's SQL dialect;
    replaying them through Spark SQL filters over parquet checks the
    partitioning *algebra* (every row lands in exactly one batch).
    """

    def test_mod_split_partitions_orders(self, spark):
        orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        orders.createOrReplaceTempView("t_orders_split")
        n = 4
        # pmod(hash(col), n) is the Spark-dialect binding of the MOD
        # split template (hash() can return INT_MIN, where ABS is a
        # no-op — pmod sidesteps that).
        preds = mod_split_predicates(
            "o_custkey", n, hash_template="pmod(hash({col}), {n})"
        )
        total = orders.count()
        batch_counts = [
            spark.sql(f"SELECT count(*) c FROM t_orders_split WHERE {p}").first().c
            for p in preds
        ]
        assert sum(batch_counts) == total
        assert all(c > 0 for c in batch_counts)

    def test_subpartition_split_partitions_orders(self, spark):
        """Subpartition predicates are a partition of the table: model
        partitions as o_orderpriority and subpartitions as a 3-way
        hash within each, derive the composite subpartition name, and
        replay the IN-list batches — disjoint, complete, all
        non-empty."""
        orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        named = orders.selectExpr(
            "*",
            "concat('P_', substr(o_orderpriority, 1, 1), '_SP_', "
            "pmod(hash(o_orderkey), 3)) AS GOE_SUBPARTITION_NAME",
        )
        named.createOrReplaceTempView("t_orders_subpart")
        subpart_names = sorted(
            r[0]
            for r in named.select("GOE_SUBPARTITION_NAME").distinct().collect()
        )
        assert len(subpart_names) == 15  # 5 priorities x 3 hash buckets
        # backtick: Spark's identifier quote (double quotes are string
        # literals in Spark SQL)
        preds = subpartition_split_predicates(subpart_names, 4, quote="`")
        assert len(preds) == 4
        total = orders.count()
        batch_counts = [
            spark.sql(
                f"SELECT count(*) c FROM t_orders_subpart WHERE {p}"
            ).first().c
            for p in preds
        ]
        assert sum(batch_counts) == total
        assert all(c > 0 for c in batch_counts)

    def test_id_range_split_covers_orders(self, spark):
        orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        row = orders.selectExpr(
            "min(o_orderkey) lo", "max(o_orderkey) hi", "count(*) n"
        ).first()
        plan = id_range_split("o_orderkey", row.lo, row.hi, 4)
        # Replicate Spark's JDBC stripe arithmetic: stride-based, first
        # and last stripes unbounded.
        lo, hi, np_ = plan.lower_bound, plan.upper_bound, plan.num_partitions
        stride = (hi - lo) // np_
        bounds = [lo + stride * i for i in range(1, np_)]
        clauses = []
        prev = None
        for b in bounds:
            if prev is None:
                clauses.append(f"o_orderkey < {b}")
            else:
                clauses.append(f"o_orderkey >= {prev} AND o_orderkey < {b}")
            prev = b
        clauses.append(f"o_orderkey >= {prev}")
        orders.createOrReplaceTempView("t_orders_range")
        counts = [
            spark.sql(f"SELECT count(*) c FROM t_orders_range WHERE {cl}").first().c
            for cl in clauses
        ]
        assert sum(counts) == row.n


class TestStaging:
    def test_roundtrip_and_view(self, spark, tmp_path):
        src = FileSource(SF_SMALL)
        df = src.read(spark, "region")
        out = str(tmp_path / "stage_region")
        write_staging(df, out, fmt="parquet", max_records_per_file=2)
        back = read_staging(spark, out, view="load_region")
        assert back.count() == df.count()
        assert spark.table("load_region").columns == df.columns

    def test_partitioned_staging(self, spark, tmp_path):
        src = FileSource(SF_SMALL)
        df = src.read(spark, "nation")
        out = str(tmp_path / "stage_nation")
        write_staging(df, out, partition_by=["n_regionkey"])
        back = read_staging(spark, out)
        assert back.count() == 25
        # partition pruning: the filter resolves against the partition
        # directory, not row data
        assert back.where("n_regionkey = 0").count() == 5

    def test_bad_format_rejected(self, spark):
        src = FileSource(SF_SMALL)
        df = src.read(spark, "region")
        with pytest.raises(ValueError):
            write_staging(df, "/tmp/x", fmt="xml")


# --- DFS abstraction (sources/dfs) -----------------------------------------


def test_parse_uri_schemes():
    from goe_spark.sources.dfs import parse_uri

    import pytest

    p = parse_uri("gs://bucket/a/b")
    assert (p.scheme, p.container, p.path) == ("gs", "bucket", "/a/b")
    p = parse_uri("s3a://bkt/x")
    assert (p.scheme, p.container, p.path) == ("s3a", "bkt", "/x")
    p = parse_uri("abfss://fs@acct.dfs.core.windows.net/y")
    assert p.scheme == "abfss" and p.container == "fs@acct.dfs.core.windows.net"
    p = parse_uri("file:///tmp/z")
    assert (p.scheme, p.container, p.path) == ("file", None, "/tmp/z")
    p = parse_uri("/plain/local")
    assert (p.scheme, p.container, p.path) == (None, None, "/plain/local")
    with pytest.raises(ValueError):
        parse_uri("ftp://nope/path")


def test_hadoop_dfs_roundtrip(spark, tmp_path):
    """The control-plane ops the offload pipeline needs, through the
    Hadoop FileSystem API on a file:// URI (the only scheme with a
    live connector in-sandbox; hdfs/gs/s3a resolve through the same
    call given their jars)."""
    from goe_spark.sources.dfs import HadoopDfs
    from goe_spark.sources.files import staged_bytes

    dfs = HadoopDfs(spark)
    base = f"file://{tmp_path}/stage"
    assert not dfs.exists(base)
    assert dfs.mkdirs(base)
    assert dfs.exists(base)
    dfs.write_text(f"{base}/part-00000.txt", "hello dfs")
    dfs.write_text(f"{base}/_SUCCESS", "")
    assert dfs.read_text(f"{base}/part-00000.txt") == "hello dfs"
    assert dfs.file_size(f"{base}/part-00000.txt") == 9
    # markers excluded from byte accounting
    assert dfs.total_bytes(base) == 9
    assert staged_bytes(base, spark) == 9
    # local-walk fallback agrees
    assert staged_bytes(str(tmp_path / "stage")) == 9
    assert len(dfs.list_dir(base)) == 2
    assert dfs.rename(f"{base}/part-00000.txt", f"{base}/renamed.txt")
    assert dfs.read_text(f"{base}/renamed.txt") == "hello dfs"
    assert dfs.delete(base, recursive=True)
    assert not dfs.exists(base)


def test_avro_probe_reports_absence(spark):
    """The reference stages Avro by default (avro_staging_file.py:
    268-291); spark-avro is an external jar absent from this
    container, so the capability probe must report False (and the
    pipeline stages parquet instead) rather than failing mid-offload.
    With the jar present the same probe returns True and write_staging
    accepts fmt='avro' unchanged."""
    from goe_spark.sources.files import avro_available

    assert avro_available(spark) is False


class TestDialectModTemplate:
    def test_url_to_dialect(self):
        from goe_spark.sources.jdbc import dialect_from_jdbc_url

        assert dialect_from_jdbc_url("jdbc:derby:/tmp/x;create=true") == "derby"
        assert dialect_from_jdbc_url("jdbc:oracle:thin:@h:1521/s") == "oracle"
        assert (
            dialect_from_jdbc_url("jdbc:postgresql://h/db") == "postgresql"
        )
        assert dialect_from_jdbc_url("jdbc:sqlserver://h;db=x") == "mssql"
        assert dialect_from_jdbc_url("not-a-jdbc-url") == "ansi"

    def test_templates_are_hash_or_signfree(self):
        from goe_spark.sources.split_strategy import mod_hash_template

        # the reference semantics: hashed where the dialect has a hash
        assert "ORA_HASH" in mod_hash_template("oracle")
        assert "hashtext" in mod_hash_template("postgresql")
        assert "HASHROW" in mod_hash_template("teradata")
        # no dialect template may use ABS (64-bit-min raises 22003)
        for d in ("oracle", "postgresql", "mssql", "teradata", "derby", "??"):
            t = mod_hash_template(d)
            assert "ABS" not in t.upper()
            rendered = t.format(col="k", n=4)
            assert "k" in rendered and "4" in rendered

    def test_signfree_mod_matches_python_mod(self):
        # MOD(MOD(k, n) + n, n) == k % n in Python for every sign,
        # including the 64-bit extremes ABS() dies on
        for n in (2, 3, 7):
            for k in (-(2**63), 2**63 - 1, -5, -1, 0, 1, 5):
                m = ((k % n if k >= 0 else -((-k) % n)) + n) % n
                # inner MOD is dialect truncated-mod (sign of dividend)
                assert m == k % n
