"""Segment-fingerprint index (operators/segment_index.py): O(batch)
append equals full rebuild, fingerprint-driven rebuilds, and the
probe's consistency with the all-corpus boilerplate accounting.
Oracle parity is covered by test_queries_oracle; these pin the
contracts the hash compare can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from goe_spark.catalog import load_table
from goe_spark.operators.segment_index import (
    append_segments,
    build_segment_index,
    ensure_segment_index,
    load_segments,
    segment_fp_frame,
)
from goe_spark.queries.pipeline_ops import (
    NEW_DOC_MOD,
    SEG_MIN_DOCS,
    segment_probe_new_docs,
)
from tests.conftest import SF_SMALL


def _rows(df):
    return sorted(
        (r["doc_id"], r["source"], r["fp"], r["n_seg"])
        for r in df.collect()
    )


def test_append_is_bit_identical_to_rebuild(spark, tmp_path):
    docs = load_table(spark, SF_SMALL, "documents")
    old = docs.where(F.col("doc_id") % 7 != 0)
    new = docs.where(F.col("doc_id") % 7 == 0)

    inc_dir = str(tmp_path / "inc")
    build_segment_index(spark, old, inc_dir)
    appended = append_segments(spark, inc_dir, new)
    assert appended > 0

    full_dir = str(tmp_path / "full")
    build_segment_index(spark, docs, full_dir)

    assert _rows(load_segments(spark, inc_dir)) == _rows(
        load_segments(spark, full_dir)
    )


def test_ensure_caches_and_rebuilds_on_change(spark, tmp_path, monkeypatch):
    import os

    import goe_spark.operators.segment_index as SI

    monkeypatch.setattr(SI, "INDEX_ROOT", str(tmp_path / "root"))
    d1 = ensure_segment_index(spark, SF_SMALL)
    meta1 = os.path.getmtime(os.path.join(d1, "_INDEX_META.json"))
    d2 = ensure_segment_index(spark, SF_SMALL)
    assert d1 == d2
    assert os.path.getmtime(os.path.join(d2, "_INDEX_META.json")) == meta1
    # poison the fingerprint: next ensure rebuilds
    import json

    mp = os.path.join(d1, "_INDEX_META.json")
    meta = json.load(open(mp))
    meta["fingerprint"] = "stale"
    json.dump(meta, open(mp, "w"))
    d3 = ensure_segment_index(spark, SF_SMALL)
    assert json.load(open(mp))["fingerprint"] != "stale"
    assert d3 == d1


def test_probe_is_restriction_of_full_accounting(spark):
    """Each new-batch segment the probe counts as boilerplate-vs-
    standing must also be boilerplate in the ALL-corpus accounting
    (standing frequency can only be <= total frequency, so the probe
    count is bounded by the full count for the same sources)."""
    probe = {r["source"]: r for r in segment_probe_new_docs(spark, SF_SMALL).collect()}
    assert probe, "fixture must produce a non-empty new batch"
    docs = load_table(spark, SF_SMALL, "documents")
    doc_fp = segment_fp_frame(docs)
    from pyspark.sql.window import Window

    full = doc_fp.withColumn(
        "doc_freq", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    )
    full_counts = {
        r["source"]: r["n"]
        for r in full.where(
            (F.col("doc_id") % NEW_DOC_MOD == 0)
            & (F.col("doc_freq") >= SEG_MIN_DOCS)
        )
        .groupBy("source")
        .agg(F.sum("n_seg").alias("n"))
        .collect()
    }
    for src, row in probe.items():
        assert row["n_boilerplate"] <= full_counts.get(src, 0)
        assert row["n_seen"] >= row["n_boilerplate"]
        assert row["n_segments"] >= row["n_seen"]


def test_streaming_ingest_maintains_index(spark, tmp_path):
    """Structured-Streaming maintenance: new document batches arrive
    as a file stream, a foreachBatch sink appends their fingerprints
    to the segment index (O(batch) per micro-batch), and the final
    index equals a full rebuild over everything ingested — the
    incremental contract holding under streaming delivery."""
    import json as _json
    import os

    docs = load_table(spark, SF_SMALL, "documents").limit(60).collect()
    in_dir = tmp_path / "incoming"
    in_dir.mkdir()
    # two "arrivals" of jsonl files
    for part, lo, hi in (("a", 0, 30), ("b", 30, 60)):
        with open(in_dir / f"{part}.jsonl", "w") as f:
            for r in docs[lo:hi]:
                f.write(
                    _json.dumps(
                        {
                            "doc_id": r["doc_id"],
                            "source": r["source"],
                            "text": r["text"],
                        }
                    )
                    + "\n"
                )

    idx_dir = str(tmp_path / "segidx")
    os.makedirs(idx_dir, exist_ok=True)

    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)  # force >= 2 micro-batches
        .json(str(in_dir))
    )

    def sink(batch_df, batch_id):
        append_segments(spark, idx_dir, batch_df)

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    full_dir = str(tmp_path / "full")
    build_segment_index(
        spark,
        spark.createDataFrame(
            [(r["doc_id"], r["source"], r["text"]) for r in docs],
            "doc_id long, source string, text string",
        ),
        full_dir,
    )
    assert _rows(load_segments(spark, idx_dir)) == _rows(
        load_segments(spark, full_dir)
    )
