"""Broadcast linear quality-classifier inference — the fastText /
logistic-regression scoring stage of a production curation pipeline
(the "quality classifier" that CCNet/Gopher-style pipelines run after
rule filters), reduced to its inference shape: a dot product of
hashed-unigram features against a FIXED weight vector.

Design (100 TB first):

- the model is a dense fixed-point weight vector over CLS_DIM hashed
  feature buckets — small enough to ship inside the plan as an array
  literal (the Spark equivalent of broadcasting a model file to every
  executor). No join, no shuffle: scoring is a per-row ``aggregate()``
  fold over the token array, entirely inside codegen, mirroring
  ``unigram_logprob_scores``'s broadcast-lookup shape but without even
  the explode.
- weights are MILLI-UNIT INTEGERS (fixed point): the fold sums int64,
  the per-doc logit is bias + floor(mean), so Spark and the DuckDB
  oracle produce bit-identical scores — a float dot product would
  drift by summation order.
- feature hashing uses the md5-based cross-engine ``hash64`` (see
  functions/hashing.py for why not xxhash64 here).

The weights here are a deterministic fixture (a trained model would
load its real vector into the same literal); the OPERATOR — hashing,
lookup, fold, fixed-point logit — is the production inference path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from goe_spark.functions.hashing import HASH64_SQL_TEMPLATE, hash64
from goe_spark.functions.text import tokens, tokens_sql

#: hashed feature buckets — fastText-style models use 1e5-1e7; 1024
#: keeps the plan literal readable while exercising the same shape
CLS_DIM = 1024
#: model intercept, milli-units
CLS_BIAS_MILLI = 150
#: multiplicative hash constant (Knuth) expanding bucket -> weight
_W_MULT = 2654435761
_W_OFF = 12345


def classifier_weights_milli() -> list[int]:
    """The fixture model: CLS_DIM fixed-point weights in
    [-1000, 1000] milli-units, derived by a multiplicative hash of the
    bucket index so they are re-derivable anywhere (including inside
    SQL text generators) without an RNG."""
    return [
        ((j * _W_MULT + _W_OFF) % 2001) - 1000 for j in range(CLS_DIM)
    ]


def _bucket(tok: Column) -> Column:
    return F.pmod(hash64(tok), F.lit(CLS_DIM)).cast("int")


def _weights_array_col(weights_milli: list[int] | None = None) -> Column:
    """The CLS_DIM weight vector as ONE plan-literal array column,
    built by parsing a single SQL text — `F.array(*1024 lits)` costs
    1024 py4j round-trips (~0.5 s of pure driver build time per
    construction, and the trainer rebuilds the array every epoch);
    one `F.expr` hands the whole list to the JVM parser in one call.
    Same Literal array in the plan either way."""
    if weights_milli is None:
        weights_milli = classifier_weights_milli()
    return F.expr(
        "array(" + ",".join(str(int(x)) for x in weights_milli) + ")"
    )


def classifier_logit_from_tokens(
    toks: Column, weights_milli: list[int] | None = None
) -> Column:
    """Logit fold over an ALREADY-TOKENIZED bound column — the shared
    inference kernel: ``weights_milli`` defaults to the fixture model
    but accepts any learned vector (the training loop re-broadcasts
    its epoch weights through this exact path, so trained weights feed
    the same scoring fold classifier_scores uses)."""
    w = _weights_array_col(weights_milli)
    wsum = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.element_at(w, _bucket(t) + 1).cast("bigint"),
    )
    return (
        F.lit(CLS_BIAS_MILLI) + F.floor(wsum / F.size(toks))
    ).cast("bigint")


def classifier_logit_milli(
    text: Column | str, weights_milli: list[int] | None = None
) -> Column:
    """Per-document logit in milli-units: CLS_BIAS_MILLI +
    floor(mean of token weights). Integer end-to-end; NULL only for
    NULL text. The weight vector rides the plan as an array literal —
    executors receive it once with the serialized plan, the classic
    broadcast-small-model pattern."""
    c = F.col(text) if isinstance(text, str) else text
    return classifier_logit_from_tokens(tokens(c), weights_milli)


def hard_sigmoid_milli(z: Column) -> Column:
    """Piecewise-linear sigmoid in milli-units:
    clamp(500 + floor(z/4), 0, 1000). Transcendental exp() cannot be
    made bit-identical across engines; the hard sigmoid is pure
    integer arithmetic (floor of an exact small-magnitude division)
    and is the standard fixed-point substitute (e.g. quantized
    inference runtimes)."""
    return F.least(
        F.lit(1000).cast("bigint"),
        F.greatest(
            F.lit(0).cast("bigint"),
            (F.lit(500) + F.floor(z / F.lit(4.0))).cast("bigint"),
        ),
    )


def hard_sigmoid_milli_sql(z: str) -> str:
    return (
        f"least(1000, greatest(0, 500 + cast(floor(({z}) / 4.0) AS bigint)))"
    )


#: full-batch gradient epochs for the fixture trainer
CLS_EPOCHS = 3
#: label rule: quality_score(text) >= this is the positive class
CLS_LABEL_Q = 0.7


def train_classifier_epochs(
    docs, epochs: int = CLS_EPOCHS
) -> tuple[list[int], list[tuple]]:
    """Batch logistic-regression training over hashed unigram
    features with EXACT fixed-point arithmetic — the train side of the
    quality classifier (reference parity: GOE has no trainer; this is
    the production-pipeline operator the curation stack needs).

    Per epoch (the same iterative discipline as bpe_train_merges,
    queries/training.py): one pass scores every doc with the CURRENT
    weight vector (plan-literal broadcast, zero joins) and collects
    the per-bucket gradient sum(err_milli) TOGETHER with the epoch
    metrics at CLS_DIM grain (<= 1025 rows — the bounded
    vocabulary-grain argmax pattern, not a data collect); the driver
    applies w[j] := clamp(w[j] - floor(grad_j / n_docs)). Loss is
    squared error through a hard sigmoid, so err = p - y and every
    quantity is an integer — Spark, Python and the DuckDB oracle
    agree bit for bit (the two floor-divisions are exact below 2^53;
    at 100 TB promote the gradient sums to decimal(38,0), same plan
    shape — see SCALE.md).

    The token -> feature-bucket hashing (the md5-heavy projection) is
    computed ONCE into a localCheckpoint'd compact frame
    (y, array<int> buckets) that every epoch folds over — the r12
    formulation re-read the corpus and re-hashed every token per
    epoch, tripling the scan/md5 work, and ran three sequential jobs
    per epoch (checkpoint + metrics first() + gradient collect) where
    one groupBy now carries both: a j = -1 marker row aggregates the
    doc-grain metrics, rows j >= 0 the gradient (a real deployment
    checkpoints the hashed features to DFS — the classic
    "featurize once, iterate on the feature table" trainer layout).

    Returns (final_weights_milli, per-epoch metric tuples):
    (epoch, n_docs, n_pos, n_correct, sum_abs_err_milli, w_l1_after,
    w_checksum_after) — n_correct uses the PRE-update weights (the
    forward pass that produced the gradient)."""
    from goe_spark.functions.text import quality_score

    bucketed = (
        docs.select(
            tokens(F.col("text")).alias("toks"),
            (quality_score("text") >= F.lit(CLS_LABEL_Q))
            .cast("int")
            .alias("y"),
        )
        .where(F.size("toks") > 0)
        .select(
            "y",
            F.transform(F.col("toks"), _bucket).alias("bkts"),
        )
        .localCheckpoint(eager=True)
    )
    w = [0] * CLS_DIM
    rows: list[tuple] = []
    for epoch in range(1, epochs + 1):
        warr = _weights_array_col(w)
        z = (
            F.lit(CLS_BIAS_MILLI)
            + F.floor(
                F.aggregate(
                    F.col("bkts"),
                    F.lit(0).cast("bigint"),
                    lambda acc, j: acc
                    + F.element_at(warr, j + 1).cast("bigint"),
                )
                / F.size("bkts")
            )
        ).cast("bigint")
        err = hard_sigmoid_milli(F.col("z")) - 1000 * F.col("y")
        per = (
            bucketed.select("y", "bkts", z.alias("z"))
            .select(
                "y",
                "z",
                err.alias("err"),
                F.explode(
                    F.concat(F.array(F.lit(-1)), F.col("bkts"))
                ).alias("j"),
            )
        )
        stats = per.groupBy("j").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("err").cast("long").alias("g"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(
                ((F.col("z") >= 0).cast("int") == F.col("y")).cast("long")
            ).alias("sc"),
            F.sum(F.abs(F.col("err"))).cast("long").alias("sae"),
        )
        grads: dict[int, int] = {}
        n_docs = n_pos = n_correct = sae = 0
        for r in stats.collect():
            if int(r["j"]) < 0:
                n_docs = int(r["cnt"])
                n_pos = int(r["sy"])
                n_correct = int(r["sc"])
                sae = int(r["sae"])
            else:
                grads[int(r["j"])] = int(r["g"])
        w = [
            max(-1000, min(1000, w[j] - grads.get(j, 0) // n_docs))
            for j in range(CLS_DIM)
        ]
        rows.append(
            (
                epoch,
                n_docs,
                n_pos,
                n_correct,
                sae,
                sum(abs(x) for x in w),
                sum((j + 1) * x for j, x in enumerate(w)),
            )
        )
    return w, rows


def classifier_logit_milli_sql(
    expr: str, weights_milli: list[int] | None = None
) -> str:
    """The identical fixed-point inference in DuckDB SQL: the same
    weight list as a literal, the same md5 bucket hash, the same
    floor-mean — scores match Spark bit for bit."""
    if weights_milli is None:
        weights_milli = classifier_weights_milli()
    wlist = ", ".join(str(x) for x in weights_milli)
    h = HASH64_SQL_TEMPLATE.format(expr="t")
    return f"""(
  SELECT {CLS_BIAS_MILLI} + cast(floor(
           sum(([{wlist}])[({h} % {CLS_DIM}) + 1]) / count(*)
         ) AS bigint)
  FROM unnest({tokens_sql(expr)}) AS u(t)
)"""
