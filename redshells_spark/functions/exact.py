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


# ---- exact co-moment machinery (corr / covar / stddev boundary class) ----
#
# Engine-internal corr()/covar()/stddev() stream partial co-moments in
# engine-specific order, so Spark and DuckDB produce doubles differing in
# the last ulp — round(x, 4) then flips on half boundaries
# (correlation_stats, round-8 sample). Cure: aggregate EXACT integer
# moments (cent units; sums as decimal/HUGEINT — associative, any order),
# then make the one unavoidable float step bit-identical across engines by
# construction. The fragments below are token-identical Spark SQL and
# DuckDB SQL except the integral-divide operator (`div` vs `//`).

_SPLIT = 1_000_000_000_000  # 1e12: hi/lo split keeps every cast < 2^53, so exact


def stable_int_double_sql(expr: str, div_op: str = "div") -> str:
    """SQL: exact-integer (decimal/HUGEINT) → DOUBLE, bit-identical
    across engines. A direct cast of a >2^53 integer depends on the
    engine's rounding; splitting at 1e12 makes both casts exact and
    leaves only IEEE multiply/add, which round identically everywhere.
    Handles |expr| < 2^53 * 1e12 ≈ 9e27."""
    a = f"abs({expr})"
    return (
        f"(CASE WHEN ({expr}) < 0 THEN CAST(-1 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END"
        f" * (CAST(({a}) {div_op} {_SPLIT} AS DOUBLE) * CAST({_SPLIT} AS DOUBLE)"
        f" + CAST(({a}) % {_SPLIT} AS DOUBLE)))"
    )


def round_half_away_ratio_sql(num: str, den: str, div_op: str = "div") -> str:
    """SQL: round(num/den) half away from zero as exact integer
    arithmetic (num may be negative; den > 0). abs() keeps the integral
    divide on non-negative operands, where Spark's truncating `div` and
    DuckDB's `//` agree."""
    return (
        f"(CASE WHEN ({num}) < 0 THEN -1 ELSE 1 END"
        f" * CAST((2 * abs({num}) + ({den})) {div_op} (2 * ({den})) AS BIGINT))"
    )


def covar_e4_sql(num: str, den: str, div_op: str = "div") -> str:
    """SQL: a 4-decimal covariance as DOUBLE from its exact integer
    e4-ratio: covar-of-cent-units num/den == 1e4 * covar-of-dollars, so
    one exact integer rounding + one exact small-int division."""
    return (
        f"(CAST({round_half_away_ratio_sql(num, den, div_op)} AS DOUBLE)"
        " / CAST(10000 AS DOUBLE))"
    )


def corr_e4_sql(n1: str, dx: str, dy: str, div_op: str = "div") -> str:
    """SQL: Pearson corr rounded half-up to 4 decimals as DOUBLE, from
    exact integer co-moments n1 = n*Sxy - Sx*Sy, dx = n*Sxx - Sx^2,
    dy = n*Syy - Sy^2 (scale-invariant, so unit scaling cancels). The
    sqrt forces a float pipeline; every input reaches it through the
    bit-stable split cast, so both engines floor the same double."""
    t = (
        f"{stable_int_double_sql(n1, div_op)} * CAST(10000 AS DOUBLE)"
        f" / sqrt({stable_int_double_sql(dx, div_op)}"
        f" * {stable_int_double_sql(dy, div_op)})"
    )
    return (
        f"(CASE WHEN ({dx}) <= 0 OR ({dy}) <= 0 THEN NULL"
        f" ELSE CAST(CAST(floor({t} + CAST(0.5 AS DOUBLE)) AS BIGINT) AS DOUBLE)"
        " / CAST(10000 AS DOUBLE) END)"
    )


def stddev_e4_sql(d: str, n: str, unit_scale: int = 100, div_op: str = "div") -> str:
    """SQL: population stddev of a fixed-decimal column rounded half-up
    to 4 decimals as DOUBLE, from the exact integer d = n*Scc - Sc^2
    over integer units and the row count n (n < 2^53 so its direct cast
    is exact). stddev = sqrt(d)/(scale*n); e4-rounding folds to
    floor((1e4/scale)*sqrt(d)/n + 0.5)."""
    assert 10000 % unit_scale == 0
    k = 10000 // unit_scale
    t = (
        f"CAST({k} AS DOUBLE) * sqrt({stable_int_double_sql(d, div_op)})"
        f" / CAST({n} AS DOUBLE)"
    )
    return (
        f"(CASE WHEN ({d}) < 0 THEN NULL"
        f" ELSE CAST(CAST(floor({t} + CAST(0.5 AS DOUBLE)) AS BIGINT) AS DOUBLE)"
        " / CAST(10000 AS DOUBLE) END)"
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
