"""Incremental MinHash probe + BPE merge-pair mining invariants.

Oracle parity is covered by test_queries_oracle; these pin the
semantic contracts the hash compare can't express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from goe_spark.queries.dedup import (
    NEW_DOC_MOD,
    PROBE_MIN_AGREEMENT,
    minhash_lsh_pairs,
    minhash_probe_new_docs,
)
from goe_spark.queries.training import bpe_merge_pair_counts
from tests.conftest import SF_SMALL


def test_probe_reports_only_new_docs_above_threshold(spark):
    out = minhash_probe_new_docs(spark, SF_SMALL).collect()
    assert out, "fixture is template-generated; some near-dup must cross slices"
    for r in out:
        assert r.doc_id % NEW_DOC_MOD == 0
        assert r.best_match_id % NEW_DOC_MOD != 0
        assert r.best_est_jaccard >= PROBE_MIN_AGREEMENT
        assert r.n_matches >= 1


def test_probe_agrees_with_full_lsh_cross_slice_pairs(spark):
    """Every probe hit must appear in the full all-pairs LSH output as
    a (new, indexed) pair at the same estimated Jaccard — the probe is
    a restriction of the full join, never a different similarity."""
    pairs = {
        (min(r.id1, r.id2), max(r.id1, r.id2)): r.est_jaccard
        for r in minhash_lsh_pairs(spark, SF_SMALL).collect()
        if (r.id1 % NEW_DOC_MOD == 0) != (r.id2 % NEW_DOC_MOD == 0)
        and r.est_jaccard >= PROBE_MIN_AGREEMENT
    }
    probe = minhash_probe_new_docs(spark, SF_SMALL).collect()
    for r in probe:
        key = (min(r.doc_id, r.best_match_id), max(r.doc_id, r.best_match_id))
        assert key in pairs
        assert abs(pairs[key] - r.best_est_jaccard) < 1e-9
    # and the probe found every cross-slice doc the full join knows of
    full_new_docs = {a if a % NEW_DOC_MOD == 0 else b for a, b in pairs}
    assert {r.doc_id for r in probe} == full_new_docs


def test_bpe_pairs_on_handcrafted_corpus(spark):
    import goe_spark.queries.training as TR

    df = spark.createDataFrame(
        [(0, "aba ab"), (1, "ab")], "doc_id long, text string"
    )
    orig = TR.load_table
    try:
        TR.load_table = lambda s, sf, name: df  # noqa: ARG005
        out = {r.pair: r.n_occurrences for r in
               bpe_merge_pair_counts(spark, SF_SMALL).collect()}
    finally:
        TR.load_table = orig
    # "aba": a b, b a ; "ab" x2: a b  -> a b: 3, b a: 1
    assert out == {"a b": 3, "b a": 1}


def test_bpe_topk_is_deterministic_and_weighted(spark):
    a = {(r.pair, r.n_occurrences) for r in
         bpe_merge_pair_counts(spark, SF_SMALL).collect()}
    b = {(r.pair, r.n_occurrences) for r in
         bpe_merge_pair_counts(spark, SF_SMALL).collect()}
    assert a == b and len(a) > 0


def test_signature_index_append_is_bit_identical_to_rebuild(spark, tmp_path):
    """Appending a batch's signatures must equal rebuilding over the
    grown corpus — signatures are per-doc pure functions."""
    from goe_spark.catalog import load_table
    from goe_spark.operators.minhash_index import (
        append_signatures,
        build_signature_index,
        load_signatures,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)

    inc_dir = str(tmp_path / "inc")
    build_signature_index(spark, old, inc_dir)
    n = append_signatures(spark, inc_dir, new)
    assert n == new.count()

    full_dir = str(tmp_path / "full")
    build_signature_index(spark, docs, full_dir)

    a = {(r.doc_id, tuple(r.mh)) for r in load_signatures(spark, inc_dir).collect()}
    b = {(r.doc_id, tuple(r.mh)) for r in load_signatures(spark, full_dir).collect()}
    assert a == b


def test_signature_index_rebuilds_on_fingerprint_change(spark, tmp_path, monkeypatch):
    """A fresh index is reused (meta fingerprint match); a source
    change forces a rebuild."""
    import os

    from goe_spark.operators import minhash_index as MI

    monkeypatch.setattr(MI, "INDEX_ROOT", str(tmp_path / "root"))
    d1 = MI.ensure_signature_index(spark, SF_SMALL)
    t1 = os.path.getmtime(os.path.join(d1, "signatures", "_SUCCESS"))
    d2 = MI.ensure_signature_index(spark, SF_SMALL)
    t2 = os.path.getmtime(os.path.join(d2, "signatures", "_SUCCESS"))
    assert d1 == d2 and t1 == t2  # reused, not rebuilt
    # poison the recorded fingerprint -> rebuild
    import json as _json

    meta = os.path.join(d1, "_INDEX_META.json")
    with open(meta) as f:
        m = _json.load(f)
    m["fingerprint"] = "stale"
    with open(meta, "w") as f:
        _json.dump(m, f)
    d3 = MI.ensure_signature_index(spark, SF_SMALL)
    t3 = os.path.getmtime(os.path.join(d3, "signatures", "_SUCCESS"))
    assert t3 > t2


def test_probe_cap_counts_total_bucket_occupancy(spark, monkeypatch, tmp_path):
    """A bucket whose INDEX side fits the cap but whose total
    occupancy (index + new batch) exceeds it must be dropped by the
    probe — the same rule the full join applies. Capping on the index
    side alone would emit pairs the full join never produces.

    5 identical docs collide in every band; cap=4. Index side holds 4
    (ids 1,11,21,31), the new batch adds 1 (id 10 % 10 == 0) -> total
    5 > 4 -> zero probe hits. With 3 index docs (total 4 <= cap) the
    same text must match."""
    import goe_spark.operators.minhash_index as MI
    import goe_spark.queries.dedup as DD

    text = "the quick brown fox jumps over the lazy dog again and again"

    schema = "doc_id long, text string, lang string, source string"

    def mkdocs(spark_):
        return spark_.createDataFrame(
            [(i, text, "en", "src") for i in sf_dir_docs], schema
        )

    def fake_index(spark_, sf_dir):
        d = str(tmp_path / f"idx{len(sf_dir_docs)}")
        MI.build_signature_index(spark_, mkdocs(spark_), d)
        return d

    def fake_load(spark_, sf_dir, name):
        assert name == "documents"
        return mkdocs(spark_)

    # the probe imports ensure_signature_index from the index module
    # at call time — patch it at the source
    monkeypatch.setattr(MI, "ensure_signature_index", fake_index)
    monkeypatch.setattr(DD, "load_table", fake_load)
    monkeypatch.setattr(DD, "LSH_BUCKET_CAP", 4)

    sf_dir_docs = [1, 11, 21, 31, 10]  # 4 index + 1 new = 5 > cap
    over = DD.minhash_probe_new_docs(spark, "unused")
    assert over.count() == 0, "straddling bucket must be dropped"

    sf_dir_docs = [1, 11, 21, 10]  # 3 index + 1 new = 4 <= cap
    under = DD.minhash_probe_new_docs(spark, "unused").collect()
    assert {r.doc_id for r in under} == {10}
    assert under[0].n_matches == 3


def test_bpe_train_sequential_composition_and_accounting(spark):
    """The training loop must be genuinely sequential: later merges may
    contain earlier merge OUTPUTS as operands, and per-step symbol
    accounting must be exact — each merge shrinks the weighted symbol
    total by the number of greedy (non-overlapping) replacements,
    which is at most the mined pair frequency and at least one."""
    from goe_spark.queries.training import (
        BPE_TRAIN_STEPS,
        bpe_train_merges,
    )

    rows = sorted(
        bpe_train_merges(spark, SF_SMALL).collect(), key=lambda r: r.step
    )
    assert [r.step for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) == BPE_TRAIN_STEPS
    for r in rows:
        assert r.merged == r.left + r.right
    # frequency of the chosen pair is non-increasing across steps
    # (the argmax over a shrinking statistic)
    freqs = [r.pair_freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    # exact accounting: 0 < (symbols_before - symbols_after) <= pair_freq
    for a, b in zip(rows, rows[1:]):
        dec = a.symbols_after - b.symbols_after
        assert 0 < dec <= b.pair_freq, (a, b)


def test_bpe_train_greedy_overlap_on_handcrafted_corpus(spark):
    """Handcrafted corpus pinning the two subtle merge semantics:
    greedy non-overlap ('aaaa' with pair (a,a) yields 'aa aa', not a
    cascade) and merged-token operands (step 2 merges (aa,aa))."""
    import goe_spark.queries.training as TR

    df = spark.createDataFrame(
        # 'aaaa' x3 dominates -> step1 pair (a,a) freq 9 (3 adjacencies
        # per word, overlaps counted in the STATISTIC), greedy apply
        # leaves 'aa aa'; step2 top pair becomes (aa,aa) freq 3.
        [(i, "aaaa") for i in range(3)] + [(3, "xy")],
        "doc_id long, text string",
    )
    orig = TR.load_table
    try:
        TR.load_table = lambda s, sf, name: df  # noqa: ARG005
        rows = sorted(
            TR.bpe_train_merges(spark, SF_SMALL).collect(),
            key=lambda r: r.step,
        )
    finally:
        TR.load_table = orig
    s1, s2 = rows[0], rows[1]
    assert (s1.left, s1.right, s1.pair_freq) == ("a", "a", 9)
    # greedy: 3 words x 2 replacements -> 12 weighted symbols - 6
    # replaced + 'xy' word (2 symbols): 3*2 + 2 = 8
    assert s1.symbols_after == 3 * 2 + 2
    assert (s2.left, s2.right, s2.merged, s2.pair_freq) == (
        "aa", "aa", "aaaa", 3,
    )
    assert s2.symbols_after == 3 * 1 + 2


def test_bpe_encode_compression_invariants(spark):
    """Encoding with learned merges can only shrink: symbols_total <=
    chars_total per language, compression >= 1, and the GLOBAL
    weighted symbol count across languages can never be smaller than
    the training query's final symbols_after restricted to its vocab
    (the encode table is a superset of the training vocabulary)."""
    from goe_spark.queries.training import bpe_encode_stats

    rows = bpe_encode_stats(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.symbols_total <= r.chars_total
        assert r.compression >= 1.0
        assert r.n_vocab_words <= r.n_word_occurrences


def test_split_leakage_partitions_the_pair_set(spark):
    """The leakage audit is a partition of the LSH pair set: per-split
    pair counts sum to the total candidate count, is_leak is exactly
    'splits differ', and split names come from the fixed vocabulary."""
    from goe_spark.queries.dedup import (
        minhash_lsh_pairs,
        split_leakage_audit,
    )

    rows = split_leakage_audit(spark, SF_SMALL).collect()
    assert rows
    total = minhash_lsh_pairs(spark, SF_SMALL).count()
    assert sum(r.n_pairs for r in rows) == total
    for r in rows:
        assert r.split_a in ("test", "train", "val")
        assert r.split_b in ("test", "train", "val")
        assert r.split_a <= r.split_b  # canonical unordered pair
        assert r.is_leak == (r.split_a != r.split_b)


def test_bigram_lm_report_invariants(spark):
    """Guaranteed properties of the bigram report: same language rows
    and doc counts as the unigram report (both score every document),
    every probability is a true log-probability (<= 0: conditionals
    have bc <= pc, unigram has c <= total), and the per-language worst
    score cannot beat the average. (Bigram-vs-unigram score ordering
    is data-dependent at tiny SF — backoff dominates — so it is NOT
    asserted.)"""
    from goe_spark.queries.text import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    uni = {r.lang: r for r in
           unigram_logprob_scores(spark, SF_SMALL).collect()}
    bi = {r.lang: r for r in
          bigram_logprob_scores(spark, SF_SMALL).collect()}
    assert set(bi) == set(uni) and bi
    for lang, r in bi.items():
        assert r.n_docs == uni[lang].n_docs
        assert r.avg_logprob < 0
        assert r.worst_logprob <= r.avg_logprob


def test_paragraph_index_append_is_bit_identical_to_rebuild(spark, tmp_path):
    """The paragraph index obeys the same append contract as the
    doc-grain signature index: per-paragraph rows are pure functions
    of their doc's text."""
    from goe_spark.catalog import load_table
    from goe_spark.operators.paragraph_index import (
        append_paragraphs,
        build_paragraph_index,
        load_paragraphs,
    )

    docs = load_table(spark, SF_SMALL, "documents")
    old = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)

    inc_dir = str(tmp_path / "inc")
    build_paragraph_index(spark, old, inc_dir)
    n = append_paragraphs(spark, inc_dir, new)
    assert n > 0

    full_dir = str(tmp_path / "full")
    build_paragraph_index(spark, docs, full_dir)

    def key(df):
        return {
            (r.doc_id, r.idx, tuple(r.mh) if r.mh is not None else None)
            for r in df.collect()
        }

    assert key(load_paragraphs(spark, inc_dir)) == key(
        load_paragraphs(spark, full_dir)
    )


def test_paragraph_index_upsert_and_merge_dispatch(spark, tmp_path):
    """upsert_for_index routes a documents batch to the paragraph
    maintainer (paragraphs/ layout); the upserted doc serves its NEW
    paragraph signatures, identical to a rebuild."""
    import os

    from goe_spark.catalog import load_table
    from goe_spark.operators.index_maintenance import upsert_for_index
    from goe_spark.operators.paragraph_index import (
        build_paragraph_index,
        load_paragraphs,
    )

    docs = load_table(spark, SF_SMALL, "documents").localCheckpoint(
        eager=True
    )
    idx_dir = str(tmp_path / "pidx")
    build_paragraph_index(spark, docs, idx_dir)
    os.makedirs(idx_dir, exist_ok=True)
    import json as _json

    with open(os.path.join(idx_dir, "_INDEX_META.json"), "w") as f:
        _json.dump({"source": None, "fingerprint": "x", "version": 1}, f)

    victim = docs.select("doc_id").orderBy("doc_id").first()[0]
    changed = docs.where(F.col("doc_id") == victim).withColumn(
        "text", F.concat(F.lit("rewritten paragraph body "), F.col("text"))
    ).localCheckpoint(eager=True)
    n = upsert_for_index(spark, idx_dir, changed)
    assert n > 0

    rebuilt_dir = str(tmp_path / "rebuilt")
    merged_docs = docs.where(F.col("doc_id") != victim).unionByName(changed)
    build_paragraph_index(spark, merged_docs, rebuilt_dir)

    def rows(df, did):
        return {
            (r.idx, tuple(r.mh) if r.mh is not None else None)
            for r in df.where(F.col("doc_id") == did).collect()
        }

    assert rows(load_paragraphs(spark, idx_dir), victim) == rows(
        load_paragraphs(spark, rebuilt_dir), victim
    )
