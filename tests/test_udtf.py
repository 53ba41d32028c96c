"""Python UDTF surface: doc_chunks lateral table function pinned
against the pure-expression chunk formula (the scale path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from goe_spark.functions.udtf import DocChunks, register_udtfs
from tests.conftest import SF_SMALL

CHUNK, STRIDE = 32, 24


def test_doc_chunks_matches_expression_formula(spark):
    """Per-doc chunk count and effective tokens from the UDTF must
    equal the closed-form expression sliding_window_chunks uses."""
    from goe_spark.catalog import load_table
    from goe_spark.functions import text as T

    register_udtfs(spark)
    load_table(spark, SF_SMALL, "documents").limit(50).createOrReplaceTempView(
        "docs_head"
    )
    got = {
        r.doc_id: (r.n_chunks, r.eff)
        for r in spark.sql(
            f"""
            SELECT d.doc_id,
                   count(*) AS n_chunks,
                   sum(size(split(c.chunk_text, '\\\\s+'))) AS eff
            FROM docs_head d, LATERAL doc_chunks(d.text, {CHUNK}, {STRIDE}) c
            GROUP BY d.doc_id
            """
        ).collect()
    }
    n = F.col("n")
    n_chunks = F.when(n <= CHUNK, F.lit(1)).otherwise(
        F.ceil((n - CHUNK) / F.lit(float(STRIDE))) + 1
    )
    want_df = (
        spark.table("docs_head")
        .select("doc_id", T.token_count("text").alias("n"))
        .withColumn("k", n_chunks.cast("long"))
    )
    want = {}
    for r in want_df.collect():
        eff = sum(
            min(CHUNK, r.n - i * STRIDE) for i in range(r.k)
        )
        want[r.doc_id] = (r.k, eff)
    assert got == want


def test_doc_chunks_edges(spark):
    impl = DocChunks.func()  # the underlying class behind @udtf
    assert list(impl.eval("a b c", 2, 1)) == [
        (0, "a b"),
        (1, "b c"),
    ]
    assert list(impl.eval("a b", 5, 2)) == [(0, "a b")]
    assert list(impl.eval("", 5, 2)) == []
    assert list(impl.eval(None, 5, 2)) == []
