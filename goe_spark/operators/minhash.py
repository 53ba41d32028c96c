"""MinHash + LSH and SimHash signature builders (cross-engine).

Everything is built-in column expressions over the cross-engine
md5-derived base hash (goe_spark.functions.hashing) so the DuckDB
oracle can recompute identical signatures. No Python in the row path:
at 100 TB the signature computation is map-side codegen; the only
shuffles are the LSH band bucketing and the candidate-pair distinct.

MinHash: h_i(doc) = min over shingles s of (a_i*hash31(s)+b_i) mod p.
LSH: split the K minhash values into B bands of R rows; docs sharing
any band signature become candidate pairs; estimated Jaccard =
matching minhash components / K.

SimHash: bit_j = [ sum over tokens of (2*bit_j(hash31(t))-1) >= 0 ];
near-dups have small hamming distance between signatures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from goe_spark.functions.hashing import MERSENNE_P, minhash_coeffs

K_MINHASH = 16
LSH_BANDS = 4
LSH_ROWS = 4

# 60-bit simhash split into 4 bands of 15 bits (Manku et al., WWW'07
# "Detecting Near-Duplicates for Web Crawling"): any pair within
# hamming distance SIMHASH_BANDS-1 agrees exactly on >= 1 band
# (pigeonhole), so (band, band-value) bucketing is a LOSSLESS
# candidate generator for hamming <= 3. 60 (not 64) keeps every
# band weight and the full signature inside a positive int64 in both
# engines. Token hashes are 31-bit, so the high 30 signature bits
# vote on a second affine permutation of the token hash.
SIMHASH_BITS = 60
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
SIMHASH_HALF = 30
SH2_A = 1_103_515_245
SH2_B = 12_345

COEFFS = minhash_coeffs(K_MINHASH)


def hash31_lambda(s: Column) -> Column:
    """hash31 usable inside higher-order-function lambdas."""
    return F.pmod(
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
        F.lit(MERSENNE_P),
    )


def hash31_lambda_sql(expr: str) -> str:
    return (
        f"(cast(concat('0x', substr(md5({expr}), 1, 15)) as bigint) % {MERSENNE_P})"
    )


def shingle_hashes(shingles: Column) -> Column:
    return F.transform(shingles, lambda s: hash31_lambda(s))


def shingle_hashes_sql(expr: str) -> str:
    return f"list_transform({expr}, s -> {hash31_lambda_sql('s')})"


# Token-combination coefficients for arithmetic 3-gram shingle hashes:
# h(shingle_i) = (th[i]*C1 + th[i+1]*C2 + th[i+2]) mod p. Small enough
# that th (< p ~ 2^31) times C stays well under 2^63 pre-mod.
SH_C1 = 1_000_003
SH_C2 = 19_349_663


def token_hashes(toks: Column) -> Column:
    """hash31 of every token. Alias the result to a real column before
    feeding it to arith_shingle_hashes — see that docstring."""
    return F.transform(toks, lambda t: hash31_lambda(t))


def token_hashes_sql(toks_expr: str) -> str:
    return f"list_transform({toks_expr}, t -> {hash31_lambda_sql('t')})"


def arith_shingle_hashes(th: Column) -> Column:
    """Word-3-gram shingle hashes combined arithmetically from a
    token-hash array — no 3-gram string materialization at all.

    No modulus: th < 2^31 and the coefficients keep the sum < 2^56,
    so the un-reduced value IS the shingle identity. A 31-bit (mod p)
    reduction here caused bucket-key collisions at tens of millions of
    shingles — unrelated docs merged into one LSH/join bucket and the
    in-bucket pair expansion went quadratic. Consumers that need
    mod-p inputs (the minhash permutations) reduce per-use.

    ``th`` MUST be a bound column reference (select the token hashes
    with an alias first, in a separate projection): an expression
    referenced several times here would be re-evaluated per use,
    turning this map into O(n^2) md5 calls. Catalyst keeps the
    producing projection separate because a non-cheap alias referenced
    more than once is not collapsed. Measured at sf0.1 this
    formulation is ~15x faster than concat_ws string shingles +
    array_distinct.

    TOTAL by construction (r12): the previous
    ``transform(sequence(0, size-3), i -> element_at(th, i+1..3))``
    indexed out of bounds for < 3 tokens — silent NULLs under
    non-ANSI, but the driver's ANSI-on session raises
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT, and callers' ``size >= 3``
    guards do NOT protect it: Catalyst's common-subexpression
    elimination in a collapsed Filter evaluates the shingle expression
    before the short-circuiting size conjunct. The slice/zip_with form
    cannot index out of range and yields [] for short docs — exactly
    what the DuckDB twin's ``range(len-2)`` produces.
    """
    n = F.greatest(F.size(th) - 2, F.lit(0))
    return F.zip_with(
        F.slice(th, 1, n),
        F.zip_with(
            F.slice(th, 2, n),
            F.slice(th, 3, n),
            lambda b, c: b * F.lit(SH_C2) + c,
        ),
        lambda a, bc: a * F.lit(SH_C1) + bc,
    )


def arith_shingle_hashes_sql(th: str) -> str:
    return (
        f"list_transform(range(len({th}) - 2), "
        f"i -> {th}[i+1] * {SH_C1} "
        f"+ {th}[i+2] * {SH_C2} "
        f"+ {th}[i+3])"
    )


def _perm(a: int, b: int):
    # Single-arg lambda factory: a default-arg closure would raise the
    # lambda arity and PySpark would bind extra lambda variables.
    # Inputs may be un-reduced ~2^56 shingle hashes, so reduce mod p
    # first to keep a*x inside int64.
    return lambda x: F.pmod(
        F.pmod(x, F.lit(MERSENNE_P)) * F.lit(a) + F.lit(b), F.lit(MERSENNE_P)
    )


def minhash_signature(hashes: Column) -> Column:
    """Array of K minhash values from an array of shingle hashes."""
    return F.array(
        *[F.array_min(F.transform(hashes, _perm(a, b))) for a, b in COEFFS]
    )


def minhash_signature_named(name: str) -> Column:
    """minhash_signature over a BOUND column reference, memoized per
    (column name, SparkContext) — the catalog.memo_exprs discipline:
    the K array_min/transform lambdas cost ~0.13 s of py4j round-trips
    to build, paid once per JVM instead of once per query call. The
    Column is an immutable unresolved tree, safe to reuse across
    frames that expose ``name``."""
    from goe_spark.catalog import memo_exprs

    return memo_exprs(
        f"minhash.signature:{name}", lambda: minhash_signature(F.col(name))
    )


def minhash_signature_sql(expr: str) -> str:
    mins = [
        f"list_min(list_transform({expr}, "
        f"x -> ((x % {MERSENNE_P}) * {a} + {b}) % {MERSENNE_P}))"
        for a, b in COEFFS
    ]
    return "[" + ", ".join(mins) + "]"


def band_structs(mh: Column) -> Column:
    """Array of (band, signature) structs for LSH bucketing. The
    signature is the RAW slice of the minhash array: it is only ever
    a grouping/join key (Spark hashes and compares array<long>
    natively), and the r12 ":"-joined string form built a ~40-char
    string per band per doc purely to be hashed — pure map-side CPU
    plus ~40 vs 32 shuffle bytes. Grouping by the slice is injective
    either way, so every consumer's buckets (and the DuckDB oracle's
    string-keyed buckets) are identical sets."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.slice(mh, b * LSH_ROWS + 1, LSH_ROWS).alias("sig"),
            )
            for b in range(LSH_BANDS)
        ]
    )


def band_rows_sql(mh_expr: str) -> str:
    """SQL rows (band, sig) via UNION ALL over the band index."""
    parts = [
        f"SELECT doc_id, {b} AS band, "
        f"array_to_string(list_slice({mh_expr}, {b * LSH_ROWS + 1}, {(b + 1) * LSH_ROWS}), ':') AS sig "
        "FROM sigs"
        for b in range(LSH_BANDS)
    ]
    return " UNION ALL ".join(parts)


def minhash_agreement(mh1: Column, mh2: Column) -> Column:
    """Fraction of matching minhash components (Jaccard estimate)."""
    return F.size(
        F.filter(F.zip_with(mh1, mh2, lambda x, y: x == y), lambda v: v)
    ) / F.lit(float(K_MINHASH))


def minhash_agreement_sql(a: str, b: str) -> str:
    return (
        f"(len(list_filter(list_zip({a}, {b}), p -> p[1] = p[2])) "
        f"/ cast({K_MINHASH} as double))"
    )


def _bit_vote(j: int):
    return lambda acc, x: acc + (
        F.shiftright(x, j).bitwiseAND(F.lit(1)) * 2 - 1
    )


def _vote_bits(hashes: Column, nbits: int, base: int) -> Column:
    """Signature bits [base, base+nbits) from per-bit majority votes."""
    out = None
    for j in range(nbits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), _bit_vote(j))
        term = F.when(vote >= 0, F.lit(2 ** (j + base))).otherwise(F.lit(0))
        out = term if out is None else out + term
    return out


def _remix(x: Column) -> Column:
    return F.pmod(x * F.lit(SH2_A) + F.lit(SH2_B), F.lit(MERSENNE_P))


def simhash_signature(token_hashes: Column) -> Column:
    """60-bit simhash from an array of 31-bit token hashes: low 30
    bits vote on the hash itself, high 30 on an affine remix of it
    (one 31-bit hash can't fill 60 independent signature bits).

    ``token_hashes`` must be a bound column (md5 already paid once);
    the remix is pure arithmetic so its per-aggregate re-evaluation
    is cheap.
    """
    th2 = F.transform(token_hashes, _remix)
    low = _vote_bits(token_hashes, SIMHASH_HALF, 0)
    high = _vote_bits(th2, SIMHASH_HALF, SIMHASH_HALF)
    return (low + high).cast("long")


def simhash_signature_named(name: str) -> Column:
    """simhash_signature over a BOUND column reference, memoized per
    (column name, SparkContext): the 60 per-bit aggregate HOFs cost
    ~0.95 s of py4j construction per call — by far the largest
    expression-build term in the repo (measured r13); memoization
    makes it once per JVM."""
    from goe_spark.catalog import memo_exprs

    return memo_exprs(
        f"minhash.simhash:{name}", lambda: simhash_signature(F.col(name))
    )


def simhash_signature_sql(hashes_expr: str) -> str:
    th2 = (
        f"list_transform({hashes_expr}, "
        f"x -> (x * {SH2_A} + {SH2_B}) % {MERSENNE_P})"
    )
    terms = []
    for base, src in ((0, hashes_expr), (SIMHASH_HALF, th2)):
        for j in range(SIMHASH_HALF):
            vote = (
                f"list_reduce(list_transform({src}, "
                f"x -> ((x >> {j}) & 1) * 2 - 1), (a, b) -> a + b)"
            )
            terms.append(f"(CASE WHEN {vote} >= 0 THEN {2 ** (j + base)} ELSE 0 END)")
    return "cast((" + " + ".join(terms) + ") as bigint)"


def simhash_band_structs(sig: Column) -> Column:
    """Array of (band, 15-bit band value) structs for lossless
    hamming<=SIMHASH_BANDS-1 candidate bucketing."""
    mask = (1 << SIMHASH_BAND_BITS) - 1
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(sig, b * SIMHASH_BAND_BITS)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for b in range(SIMHASH_BANDS)
        ]
    )


def hamming(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


def hamming_sql(a: str, b: str) -> str:
    return f"cast(bit_count(xor({a}, {b})) as int)"
