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


def classifier_logit_milli(text: Column | str) -> Column:
    """Per-document logit in milli-units: CLS_BIAS_MILLI +
    floor(mean of token weights). Integer end-to-end; NULL only for
    NULL text. The weight vector rides the plan as an array literal —
    executors receive it once with the serialized plan, the classic
    broadcast-small-model pattern."""
    c = F.col(text) if isinstance(text, str) else text
    w = F.array(*[F.lit(x) for x in classifier_weights_milli()])
    toks = tokens(c)
    wsum = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.element_at(w, _bucket(t) + 1).cast("bigint"),
    )
    return (
        F.lit(CLS_BIAS_MILLI) + F.floor(wsum / F.size(toks))
    ).cast("bigint")


def classifier_logit_milli_sql(expr: str) -> str:
    """The identical fixed-point inference in DuckDB SQL: the same
    weight list as a literal, the same md5 bucket hash, the same
    floor-mean — scores match Spark bit for bit."""
    wlist = ", ".join(str(x) for x in classifier_weights_milli())
    h = HASH64_SQL_TEMPLATE.format(expr="t")
    return f"""(
  SELECT {CLS_BIAS_MILLI} + cast(floor(
           sum(([{wlist}])[({h} % {CLS_DIM}) + 1]) / count(*)
         ) AS bigint)
  FROM unnest({tokens_sql(expr)}) AS u(t)
)"""
