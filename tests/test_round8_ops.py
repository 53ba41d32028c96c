"""Edge-case pins for the round-8 operators beyond the oracle hash:
int8 quantization error bounds, matryoshka recall bounds and the
identical-prefix degenerate case, DSIR selection invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_int8_quantization_error_bound(spark):
    """Symmetric int8 with per-dim abs-max scale: reconstruction error
    per in-range element is at most s/254 (half a quantization step),
    so each label's MSE must be <= (max_s/254)^2. Verified against
    the operator's own reported numbers on the real fixture."""
    from goe_spark.queries.similarity import embedding_int8_audit
    from goe_spark.catalog import load_table

    rows = embedding_int8_audit(spark, SF_SMALL).collect()
    assert rows, "no labels"
    dims = load_table(spark, SF_SMALL, "embeddings").select(
        F.posexplode("embedding").alias("i", "x")
    )
    max_s = dims.agg(F.max(F.abs(F.col("x").cast("double")))).first()[0]
    bound = (max_s / 254.0) ** 2
    for r in rows:
        assert 0.0 <= r["avg_mse"] <= r["worst_vec_mse"] <= bound * 1.000001
        # int8 at 64 dims preserves cosine almost perfectly
        assert r["avg_cos_recon"] > 0.999


def test_int8_handcrafted_values(spark):
    """Pin the quantizer arithmetic on exact handcrafted vectors:
    a vector exactly on the scale grid reconstructs perfectly."""
    from goe_spark.queries import similarity as S

    # one 4-dim corpus where dim scales are (127, 127, 127, 127)/127=1
    df = spark.createDataFrame(
        [(0, [127.0, -127.0, 0.0, 63.5], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    # reuse the operator's internals by monkey-free direct math:
    # q = round(x/s*127) -> (127, -127, 0, 64); dq = (127,-127,0,64)
    # only the 63.5 element has error 0.5
    import math

    s = 127.0
    errs = []
    for x in [127.0, -127.0, 0.0, 63.5]:
        q = max(-127, min(127, math.floor(x / s * 127 + 0.5)))
        errs.append((x - q * s / 127) ** 2)
    assert errs[:3] == [0.0, 0.0, 0.0]
    assert errs[3] == pytest.approx(0.25)


def test_matryoshka_recall_bounds_and_degenerate_case(spark):
    """recall_at_k is n_overlap/k in [0,1]; on the real fixture at
    least some overlap must survive truncation (queries are fixture
    vectors, the truncated space still separates labels)."""
    from goe_spark.queries.similarity import matryoshka_recall_audit, TOP_K

    rows = matryoshka_recall_audit(spark, SF_SMALL).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_overlap"] <= TOP_K
        assert r["recall_at_k"] == pytest.approx(r["n_overlap"] / TOP_K)
    assert sum(r["n_overlap"] for r in rows) > 0


def test_dsir_target_slice_scores_higher(spark):
    """The defining DSIR property: the target sources' own documents
    must average a HIGHER importance weight than the non-target
    corpus (they are, definitionally, more target-like)."""
    from goe_spark.queries.training import (
        DSIR_TARGET,
        dsir_importance_weights,
    )

    rows = {r["source"]: r for r in dsir_importance_weights(spark, SF_SMALL).collect()}
    tgt = [rows[s]["avg_weight"] for s in DSIR_TARGET if s in rows]
    rest = [v["avg_weight"] for k, v in rows.items() if k not in DSIR_TARGET]
    assert tgt and rest
    assert min(tgt) > max(rest) or (
        sum(tgt) / len(tgt) > sum(rest) / len(rest)
    )


def test_media_dimensions_groups_and_counts(spark):
    """The four header formats (JPEG joined in round 10 via the SOF
    marker walk) each appear with the fixture's round-robin share and
    plausible dimension ranges."""
    from goe_spark.queries.multimodal import media_dimensions

    rows = {r["fmt"]: r for r in media_dimensions(spark, SF_SMALL).collect()}
    assert set(rows) == {"png", "gif", "bmp", "jpeg"}
    total = sum(r["n_media"] for r in rows.values())
    for r in rows.values():
        assert 1 <= r["min_width"] <= r["max_width"] <= 1280
        assert 1 <= r["min_height"] <= r["max_height"] <= 720
        assert r["total_pixels"] > 0
        # round-robin by doc_id % 4: shares within 1 of each other
        assert abs(r["n_media"] - total / 4) <= 1
