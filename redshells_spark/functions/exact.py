"""Order-free exact aggregation of fixed-decimal ("money") columns.

Double addition is non-associative, so ``round(sum(double_col), 4)``
can flip a rounding boundary when the partition order changes — the
factor-10 differential caught exactly this in ``market_share_asia``
(round 4) and the class recurs wherever a float sum feeds a rounding
function. For columns that are fixed-decimal BY CONTRACT (prices and
event values in the test tables carry 2 decimals), the cure is exact:
recover the integer unit count per row (``floor(x*scale + 0.5)`` —
half-up, identical in Spark and DuckDB for the positive values money
uses), sum as int64 (associative — any partition order gives the same
bits), and convert back with ONE correctly-rounded double division.

The result equals the true sum exactly (not a float approximation of
it), and is bit-identical across engines, partitionings, and scales —
int64 holds corpus-level cent sums up to ~9.2e16 dollars.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_units(col: Column, scale: int = 100) -> Column:
    """Per-row exact fixed-point units: floor(x*scale + 0.5) as long."""
    return F.floor(col * F.lit(scale) + F.lit(0.5)).cast("long")


def exact_money_sum(col: Column, scale: int = 100) -> Column:
    """Order-free sum of a fixed-decimal column, returned as a double
    (integer-unit sum ÷ scale, one correctly-rounded division)."""
    return F.sum(money_units(col, scale)).cast("double") / F.lit(float(scale))


def exact_money_sum_sql(expr: str, scale: int = 100) -> str:
    """The DuckDB mirror of :func:`exact_money_sum` (same expression
    tree token-for-token, HUGEINT cast back to BIGINT)."""
    return (
        f"CAST(sum(CAST(floor(({expr}) * {scale} + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS BIGINT)"
        f"::DOUBLE / {scale}"
    )


def exact_revenue_sum(price: Column, discount: Column) -> Column:
    """Order-free Σ price·(1−discount) for 2-decimal price and
    discount columns: exact integer e-4-dollar units per row
    (cents × (100 − discount-hundredths)), int64 sum, one
    correctly-rounded division back to dollars."""
    units = money_units(price) * (F.lit(100) - money_units(discount))
    return F.sum(units).cast("double") / F.lit(10000.0)


def exact_revenue_sum_sql(price: str, discount: str) -> str:
    """DuckDB mirror of :func:`exact_revenue_sum`."""
    def cents(e: str) -> str:
        return f"CAST(floor(({e}) * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"

    return (
        f"CAST(sum({cents(price)} * (100 - {cents(discount)})) AS BIGINT)"
        "::DOUBLE / 10000"
    )


def exact_avg_e4(sum_units: str, unit_scale: int, n: str = "count(*)") -> str:
    """SQL for an EXACT half-up 4-decimal average of a fixed-decimal
    column given its integer-unit sum: round(S/(scale·n)·1e4) as the
    integer ratio (2·S·(10000/scale) + n) div (2n), divided back once.
    Engine round() on a float average disagrees cross-engine when the
    true average lands exactly on a .xxxx5 binary-representable
    boundary (e.g. x.51/8) — the integer ratio never does."""
    assert 10000 % unit_scale == 0
    k = 10000 // unit_scale
    return (
        f"CAST((2 * ({sum_units}) * {k} + ({n})) // (2 * ({n})) AS BIGINT)"
        "::DOUBLE / 10000"
    )
