"""Order-free money aggregation for cross-engine determinism.

A `round(sum(double), 2)` money total holds only while |sum| is
small: Spark and DuckDB accumulate partial sums in different orders,
so two bit-identical per-row values can produce totals differing in
the last few ulps — and once the total reaches ~1e8 the ulp gap
crosses the 0.01 rounding grid and the oracle hash flips. The sf1
scale probe (10x data) caught exactly this on q5/q9/order_price_tiers.

The fix is the classic warehouse money discipline: quantize each ROW
to exact cents with floor(x*100 + 0.5) — floor of plain IEEE
arithmetic, bit-identical on both engines, unlike round(), which
Spark applies to the double's shortest decimal string and DuckDB to
the raw binary — then SUM exactly (order-free) and divide once at
the end. The same helper scales to any fixed grid (pass ``scale``).

Overflow headroom (round-8 ADVICE): per-row quantized values are
BIGINT, but the SUM accumulates in DECIMAL(38,0) on the Spark side —
a bare long sum of 1e5-magnitude values on the 1e6 grid (rows up to
~1e11) would wrap int64 silently after ~9e7 rows per group, which a
100 TB fact table exceeds. DECIMAL(38,0) is exact to 1e38 (~1e27
rows per group at that magnitude — beyond any physical table) and
stays whole-stage-codegen. DuckDB needs no change: its SUM(BIGINT)
returns HUGEINT (int128). Both engines then convert the exact
integer to double once — nearest-even of the same integer — so the
final rounded value is bit-identical, row-order-free, at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(expr: Column, scale: int = 100) -> Column:
    """Exact fixed-point quantization of a money expression (BIGINT)."""
    return F.floor(expr * scale + 0.5).cast("long")


def cents_exact_sum(expr: Column, scale: int = 100) -> Column:
    """Order-free EXACT sum of quantized cents: DECIMAL(38,0)
    accumulation (no int64 wraparound at 100 TB group sizes; see
    module docstring)."""
    return F.sum(cents(expr, scale).cast("decimal(38,0)"))


def money_sum(expr: Column, scale: int = 100) -> Column:
    """round(sum(expr), 2) that cannot drift with addition order:
    per-row cents, exact decimal sum, one final division."""
    import math

    digits = int(math.log10(scale))
    return F.round(
        (cents_exact_sum(expr, scale).cast("double") / float(scale)),
        digits,
    )


def money_sum_window(expr: Column, window, scale: int = 100) -> Column:
    """The window-function form of money_sum."""
    import math

    digits = int(math.log10(scale))
    return F.round(
        (
            F.sum(cents(expr, scale).cast("decimal(38,0)"))
            .over(window)
            .cast("double")
            / float(scale)
        ),
        digits,
    )


def cents_sql(expr: str, scale: int = 100) -> str:
    return f"cast(floor(({expr}) * {scale} + 0.5) AS bigint)"


def money_sum_sql(expr: str, scale: int = 100) -> str:
    import math

    digits = int(math.log10(scale))
    return f"round(sum({cents_sql(expr, scale)}) / {scale}.0, {digits})"
