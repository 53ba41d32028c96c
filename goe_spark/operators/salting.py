"""Skew-salted equi-join.

When one join key carries a disproportionate share of the fact rows
(the boilerplate document, the null-surrogate customer, the one hot
product), a plain shuffle join lands that key's entire volume on a
single reducer. AQE's skew-join split handles the sort-merge case at
runtime; this operator is the explicit, planner-independent fix that
also covers shuffled-hash joins and pre-AQE engines:

- fact rows get a deterministic salt in [0, n_salt) that is
  UNCORRELATED with the join key (derived from a per-row column), so
  one hot key spreads over n_salt reducers;
- the dimension is replicated n_salt times (explode over the salt
  range — acceptable because dim << fact is the precondition for
  using this at all);
- the join key becomes (key, salt); the salt is dropped afterwards.

The result is row-identical to the plain join — salting changes WHERE
rows meet, never WHICH rows meet — which is exactly what the DuckDB
oracle verifies (a plain JOIN with no salt in sight).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str | Column,
    n_salt: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on an equi-key with the fact side
    salted. ``salt_source`` is any per-row column with spread (a line
    number, an id) — hashed mod n_salt so a single hot ``fact_key``
    value fans out over ``n_salt`` partitions."""
    # Replicating the dim side makes right/full outer joins emit every
    # unmatched dim row n_salt times — only fact-preserving joins keep
    # the row-identity contract.
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins {sorted(allowed)}, "
            f"not {how!r}: dim replication would duplicate unmatched dim rows"
        )
    src = F.col(salt_source) if isinstance(salt_source, str) else salt_source
    f = fact.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(n_salt)))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    joined = f.join(
        d,
        (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]),
        how,
    )
    return joined.drop("__salt")
