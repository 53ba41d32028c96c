"""Hypothesis property pins for the round-9 surfaces: the WAV header
parser round-trips arbitrary spec-legal field values, and the
null-safe MOD split is a PARTITION (disjoint + complete) of any
integer key population including negatives and NULLs."""

from __future__ import annotations

import struct

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from goe_spark.multimodal.media import (
    is_wav_sql,
    wav_bits_per_sample_sql,
    wav_channels_sql,
    wav_data_size_sql,
    wav_sample_rate_sql,
)
from goe_spark.sources.split_strategy import mod_split_predicates


def _wav_header(ch: int, rate: int, bits: int, dsize: int) -> bytes:
    bpf = max(1, ch * bits // 8)
    return (
        b"RIFF" + struct.pack("<I", 36 + dsize) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, rate, rate * bpf, bpf, bits)
        + b"data" + struct.pack("<I", dsize)
    )


@settings(max_examples=60, deadline=None)
@given(
    ch=st.integers(min_value=1, max_value=8),
    rate=st.integers(min_value=1, max_value=384_000),
    bits=st.sampled_from([8, 16, 24, 32]),
    dsize=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_header_roundtrip_any_legal_fields(ch, rate, bits, dsize):
    """parse(build(fields)) == fields for every spec-legal value —
    byte-offset arithmetic cannot be off-by-one anywhere in range."""
    con = duckdb.connect()
    got = con.execute(
        f"SELECT {is_wav_sql('c')}, {wav_channels_sql('c')},"
        f" {wav_sample_rate_sql('c')}, {wav_bits_per_sample_sql('c')},"
        f" {wav_data_size_sql('c')} "
        "FROM (SELECT from_hex(?) AS c)",
        [_wav_header(ch, rate, bits, dsize).hex().upper()],
    ).fetchone()
    assert got == (True, ch, rate, bits, dsize)


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(
        st.one_of(st.integers(min_value=-10**9, max_value=10**9), st.none()),
        min_size=0,
        max_size=60,
    ),
    n=st.integers(min_value=1, max_value=7),
)
def test_mod_abs_null_safe_is_a_partition(keys, n):
    """Every key (negative, zero, positive, NULL) matches EXACTLY ONE
    slice predicate — the completeness property the round-8 ADVICE
    template violated. Evaluated by an actual SQL engine (DuckDB MOD
    keeps the dividend's sign, same as Derby/Oracle), not a Python
    re-implementation."""
    preds = mod_split_predicates(
        "k", n, hash_template="MOD(ABS({col}), {n})", null_safe=True
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (rid INTEGER, k BIGINT)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(keys)) or [(0, 0)]
    )
    if not keys:
        con.execute("DELETE FROM t")
    match_count = con.execute(
        "SELECT coalesce(sum(m), 0), count(*) FROM (SELECT rid, "
        + " + ".join(
            f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in preds
        )
        + " AS m FROM t)"
    ).fetchone()
    # sum of per-row match counts == row count  <=>  exactly one slice
    # matches every row (none match 0 or 2+)
    assert match_count[0] == match_count[1] == len(keys)
    per_row = con.execute(
        "SELECT min(m), max(m) FROM (SELECT "
        + " + ".join(
            f"(CASE WHEN {p} THEN 1 ELSE 0 END)" for p in preds
        )
        + " AS m FROM t)"
    ).fetchone()
    if keys:
        assert per_row == (1, 1)
