"""Portable cardinality sketch: K-Minimum-Values approximate distinct.

`F.approx_count_distinct` (HyperLogLog++) is the right default at
scale, but its hash and register layout are engine-private — the
estimate is unreproducible outside Spark, so the driver can only ever
rows-check it (`approx_distinct_users`). KMV (Bar-Yossef et al. 2002)
delivers the same mergeable-sketch capability from *portable*
arithmetic: hash every value with the engine-independent md5→60-bit
fold, keep the k smallest distinct hashes per group, and estimate

    D ≈ (k-1) · 2^60 / h_(k)

where h_(k) is the k-th minimum. Every step — hashing, ranking,
the float estimate — is reproducible in any engine, so the DuckDB
oracle MATCHes the estimate bit-for-bit: an approximate aggregate
with an exact correctness check.

Scale shape: the distinct-hash dedup and the per-group top-k ranking
shuffle only (group, hash) pairs — 8-byte hashes, not values — and the
window's ``rank ≤ k`` cut is WindowGroupLimit-prunable map-side.
Groups with fewer than k distinct values short-circuit to their exact
count (the sketch holds every hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.operators.bloom import _h60_sql
from redshells_spark.schema import require_columns

TWO_POW_60 = float(1 << 60)  # exactly representable as a double


def kmv_distinct(
    df: DataFrame,
    group_columns: list[str],
    value_column: str,
    k: int = 256,
) -> DataFrame:
    """→ (*group_columns, n_hashes, kmv_estimate) — approximate
    distinct count of ``value_column`` per group.

    ``n_hashes`` = min(k, true distinct-hash count): when it is below
    k the estimate IS the exact distinct count (collisions aside).
    Standard error of the k-minimum estimator is ~1/√(k-2) (~6% at
    k=256).
    """
    require_columns(df, group_columns + [value_column])
    hashes = df.select(
        *group_columns,
        F.expr(_h60_sql(f"`{value_column}`")).alias("__h"),
    ).dropDuplicates(group_columns + ["__h"])

    w = Window.partitionBy(*group_columns).orderBy(F.col("__h").asc())
    kept = hashes.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)

    agg = kept.groupBy(*group_columns).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("__h").alias("__hk"),
    )
    est = F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(TWO_POW_60) / F.col("__hk").cast("double")
    )
    return agg.select(
        *group_columns,
        F.col("n_hashes").cast("long").alias("n_hashes"),
        est.alias("kmv_estimate"),
    )


def kmv_distinct_global(
    df: DataFrame,
    value_column: str,
    k: int = 256,
) -> DataFrame:
    """→ one row (n_hashes, kmv_estimate): ungrouped KMV distinct
    estimate of ``value_column`` over the whole relation.

    The k smallest portable 60-bit hashes are found with a distributed
    ``orderBy().limit(k)`` (TakeOrdered: per-partition top-k merged on
    the driver) after a map-side-combined hash dedup — no global
    window, no single-partition exchange, so the path holds at any row
    count. Estimate arithmetic matches :func:`kmv_distinct`
    ((k−1)·2⁶⁰ / h_k), reproduced bit-for-bit by a DuckDB oracle.
    """
    require_columns(df, [value_column])
    hashes = df.select(
        F.expr(_h60_sql(f"`{value_column}`")).alias("__h")
    ).dropDuplicates(["__h"])
    kept = hashes.orderBy(F.col("__h").asc()).limit(k)
    agg = kept.agg(
        F.count(F.lit(1)).alias("n_hashes"), F.max("__h").alias("__hk")
    )
    est = F.when(F.col("n_hashes") < k, F.col("n_hashes").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(TWO_POW_60) / F.col("__hk").cast("double")
    )
    return agg.select(
        F.col("n_hashes").cast("long").alias("n_hashes"),
        est.alias("kmv_estimate"),
    )


def kmv_set_algebra(
    df: DataFrame,
    group_column: str,
    value_column: str,
    k: int = 256,
    max_groups: int = 1000,
) -> DataFrame:
    """Pairwise set-algebra estimates between every pair of groups'
    value sets, computed entirely from mergeable KMV sketches
    (Beyer et al., "On Synopses for Distinct-Value Estimation Under
    Multiset Operations", SIGMOD 2007):

    - merge two sketches = k smallest of the hash union;
    - union estimate from the merged k-th minimum;
    - Jaccard estimate ρ = fraction of merged hashes present in BOTH
      input sketches; intersection estimate = ρ · union-estimate.

    → (g1, g2, n_kept, inter_hashes, union_est, inter_est, jaccard_est)
    for every unordered pair g1 < g2.

    Scale shape: raw values are touched exactly once (the per-group
    k-min sketch); all pair math runs over ≤ k·|groups| hash rows.
    Pair enumeration is quadratic in |groups| — this operator compares
    a bounded set of cohorts (refuses above ``max_groups``), not an
    unbounded key domain.
    """
    require_columns(df, [group_column, value_column])
    hashes = df.select(
        F.col(group_column).alias("__g"),
        F.expr(_h60_sql(f"`{value_column}`")).alias("__h"),
    ).dropDuplicates(["__g", "__h"])
    w = Window.partitionBy("__g").orderBy(F.col("__h").asc())
    # <= k x |groups| rows feeding FOUR consumers (both pair sides +
    # both sketch joins) — pin or the fact-scale dedup+window re-runs
    # per consumer
    kept = (
        hashes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .localCheckpoint(eager=True)
    )

    n_groups = df.select(group_column).distinct().limit(max_groups + 1).count()
    if n_groups > max_groups:
        raise ValueError(
            f"kmv_set_algebra: more than {max_groups} groups — pairwise "
            "comparison is quadratic in the group count; aggregate or filter first"
        )

    pairs = (
        kept.select(F.col("__g").alias("g1"))
        .distinct()
        .join(kept.select(F.col("__g").alias("g2")).distinct(), F.col("g1") < F.col("g2"))
    )
    a = pairs.join(kept.select(F.col("__g").alias("g1"), "__h"), "g1").select(
        "g1", "g2", "__h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    b = pairs.join(kept.select(F.col("__g").alias("g2"), "__h"), "g2").select(
        "g1", "g2", "__h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        a.unionByName(b)
        .groupBy("g1", "g2", "__h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("g1", "g2").orderBy(F.col("__h").asc())
    top = merged.withColumn("__rn", F.row_number().over(wp)).filter(F.col("__rn") <= k)
    agg = top.groupBy("g1", "g2").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("__h").alias("__hk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("inter_hashes"),
    )
    union_est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(TWO_POW_60) / F.col("__hk").cast("double")
    )
    rho = F.col("inter_hashes").cast("double") / F.col("n_kept")
    return agg.select(
        "g1",
        "g2",
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("inter_hashes").cast("long").alias("inter_hashes"),
        F.round(union_est, 4).alias("union_est"),
        F.round(rho * union_est, 4).alias("inter_est"),
        F.round(rho, 4).alias("jaccard_est"),
    )


def log_histogram_quantiles(
    df: DataFrame,
    group_columns: list[str],
    value_column: str,
    quantiles: list[float],
) -> DataFrame:
    """Mergeable log₂-histogram quantile sketch over POSITIVE integers.

    The scale path for grouped quantiles: one groupBy builds per-group
    power-of-two bin counts (a ~64-counter synopsis, mergeable by
    plain addition — the same property that makes KMV/Misra-Gries
    streaming-safe); quantile q is answered with the lower bound of
    the first bin whose cumulative count reaches ceil(q·n). Relative
    error is bounded by the bin ratio (2×); callers needing tighter
    error scale the values first (e.g. cents → ¼-cent units gives
    √2-ish bins via two extra bits).

    Everything is integer arithmetic: binning uses the binary-string
    length of the value (``length(bin(v))`` — exact, unlike
    floor(ln v/ln 2) whose IEEE rounding flips at exact powers of
    two), and the answer is the bin's integer lower bound — so the
    estimate is bit-reproducible in any engine.

    → (*group_columns, q, n, est_lower_bound)
    """
    require_columns(df, group_columns + [value_column])
    if not quantiles or any(not 0.0 < q <= 1.0 for q in quantiles):
        raise ValueError("quantiles must be in (0, 1]")
    v = F.col(value_column)
    binned = df.filter(v > 0).select(
        *group_columns, F.length(F.bin(v.cast("long"))).alias("__bin")
    )
    counts = binned.groupBy(*group_columns, "__bin").agg(
        F.count(F.lit(1)).alias("__c")
    )
    wcum = (
        Window.partitionBy(*group_columns)
        .orderBy(F.col("__bin").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy(*group_columns)
    cum = counts.select(
        *group_columns,
        "__bin",
        F.sum("__c").over(wcum).alias("__cum"),
        F.sum("__c").over(wn).alias("__n"),
    )
    qs = F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    expanded = cum.select(*group_columns, "__bin", "__cum", "__n", qs)
    hit = expanded.filter(F.col("__cum") >= F.ceil(F.col("q") * F.col("__n")))
    wq = Window.partitionBy(*group_columns, "q").orderBy(F.col("__bin").asc())
    first_hit = hit.withColumn("__rn", F.row_number().over(wq)).filter(F.col("__rn") == 1)
    return first_hit.select(
        *group_columns,
        "q",
        F.col("__n").cast("long").alias("n"),
        # F.shiftleft takes a python-int bit count; the column-valued
        # shift must go through the SQL expression form
        F.expr("shiftleft(cast(1 as bigint), __bin - 1)").alias("est_lower_bound"),
    )


def kmv_rolling_distinct(
    df: DataFrame,
    bucket_column: str,
    value_column: str,
    window_buckets: int,
    k: int = 256,
) -> DataFrame:
    """Rolling-window approximate distinct count: for every time
    bucket b, the KMV estimate of distinct values over buckets
    [b − window_buckets + 1, b] — the classic "7-day rolling unique
    users" without re-scanning raw data per window.

    Sketch mergeability does the work: per-bucket k-minimum hash sets
    are built once (one scan), then each hash row fans out to the
    ≤ ``window_buckets`` windows it can serve (an explode, not a range
    join), is deduplicated per window (the same value may appear on
    several days), re-ranked, and estimated. Shuffles carry 8-byte
    hashes keyed by bucket — never raw values across windows.

    Windows are emitted only for buckets present in the data.

    → (bucket, n_kept, rolling_distinct_est)
    """
    require_columns(df, [bucket_column, value_column])
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    hashes = df.select(
        F.col(bucket_column).cast("long").alias("__bk"),
        F.expr(_h60_sql(f"`{value_column}`")).alias("__h"),
    ).dropDuplicates(["__bk", "__h"])
    wb = Window.partitionBy("__bk").orderBy(F.col("__h").asc())
    kept = hashes.withColumn("__rn", F.row_number().over(wb)).filter(F.col("__rn") <= k)

    offsets = F.explode(
        F.sequence(F.lit(0).cast("long"), F.lit(int(window_buckets) - 1).cast("long"))
    ).alias("__off")
    fanned = kept.select("__bk", "__h", offsets).select(
        (F.col("__bk") + F.col("__off")).alias("__target"), "__h"
    )
    present = kept.select(F.col("__bk").alias("__target")).distinct()
    merged = fanned.join(present, "__target").dropDuplicates(["__target", "__h"])
    wt = Window.partitionBy("__target").orderBy(F.col("__h").asc())
    top = merged.withColumn("__rn", F.row_number().over(wt)).filter(F.col("__rn") <= k)
    agg = top.groupBy("__target").agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("__h").alias("__hk")
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(TWO_POW_60) / F.col("__hk").cast("double")
    )
    return agg.select(
        F.col("__target").alias("bucket"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.round(est, 4).alias("rolling_distinct_est"),
    )


# --------------------------------------------------------- Count-Min sketch

# portable row-hash constants (Knuth multiplicative + per-row offset),
# all arithmetic within int64 for keys < 2^32 — identical in any engine
_CMS_A = 2654435761
_CMS_B = 1099087573
_CMS_C = 40503
_CMS_P = 2147483647


def cms_bucket_sql(key_sql: str, row: int, width: int) -> str:
    """Portable SQL for CMS row ``row``'s bucket of a NON-NEGATIVE
    integer key expression: ``(((k mod P)·A + row·B + C) mod P) mod
    width``. The key is reduced mod P FIRST so the product stays
    within int64 for any non-negative int64 key ((P-1)·A ≈ 5.7e18 <
    2^63-1) — without the reduction, keys above ~3.47e9 would overflow
    (a runtime error under Spark's ANSI default, silent wrap with ANSI
    off). The same text evaluates identically in Spark and DuckDB
    (``%`` on non-negative operands), which puts the sketch itself
    inside the cross-engine correctness contract."""
    return (
        f"(((({key_sql}) % {_CMS_P}) * {_CMS_A} + {row * _CMS_B + _CMS_C})"
        f" % {_CMS_P}) % {width}"
    )


def cms_build(
    df: DataFrame,
    key_column: str,
    depth: int = 4,
    width: int = 512,
    weight_column: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) of a
    non-negative integer key column → (row, bucket, c) with exactly
    ``depth × width`` cells (absent cells = 0).

    One explode(depth) + one groupBy: partial aggregation collapses
    every task's contribution to ≤ depth·width rows before the
    shuffle, so sketching 100 TB moves a few KB per task regardless of
    input size. Sketches merge by unioning cell tables and re-summing
    (`cms_merge`)."""
    if depth < 1 or width < 1:
        raise ValueError("cms_build: depth and width must be >= 1")
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"),
                F.expr(cms_bucket_sql(key_column, j, width)).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    w = F.col(weight_column) if weight_column else F.lit(1)
    return (
        df.select(F.explode(cells).alias("__cell"), w.alias("__w"))
        .groupBy(
            F.col("__cell.row").alias("row"), F.col("__cell.bucket").alias("bucket")
        )
        .agg(F.sum("__w").cast("long").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union cell tables and re-sum — CMS is a linear sketch, so the
    merged table equals the sketch of the concatenated inputs."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("c").cast("long").alias("c"))


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_column: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """→ keys + ``est``: the min over rows of the key's cell counts —
    an overestimate-only frequency (est ≥ true count, whp close).
    The sketch is depth·width rows, so the join broadcasts it; probing
    any number of keys never shuffles the sketch."""
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        F.expr(cms_bucket_sql(key_column, j, width)).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__cell"),
    ).select("*", F.col("__cell.row").alias("row"), F.col("__cell.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
    group_cols = [c for c in keys.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("est"))
    )


# --------------------------------------------------------------------------
# Portable HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007)
#
# Same motivation as the KMV family above: `F.approx_count_distinct`
# is HLL++ with an engine-private hash, so its estimate can only ever
# be rows-checked. These registers use the portable md5→60-bit fold
# (reg = h mod m, rank = leading-zero count of the remaining
# 60−p bits, +1), so build, merge (register-wise MAX — the property
# that makes HLL the 100-TB distinct-count structure: states are a few
# hundred bytes and union = max), and estimate reproduce bit-for-bit
# in any engine.
#
# Exactness discipline: the harmonic-mean denominator Σ 2^(−M_j) is
# kept as the INTEGER Σ 2^(S−M_j) with S = (60−p)+1 ≥ M_j (absent
# registers contribute 2^S each), so the only floats are one final
# division and the small-range linear-counting branch m·ln(m/V) —
# each a single fixed IEEE expression over exact int64 operands.


def _bitlen_case_sql(expr_sql: str, bits: int) -> str:
    """Engine-portable integer bit length: Σ_i [x ≥ 2^i]. A fixed
    comparison chain (no log2 float), identical in Spark and DuckDB."""
    terms = " + ".join(
        f"(CASE WHEN ({expr_sql}) >= {1 << i} THEN 1 ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})"


def hll_alpha(m: int) -> float:
    """Bias-correction constant for m ≥ 128 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    group_columns: list[str],
    value_column: str,
    p: int = 8,
) -> DataFrame:
    """→ (*group_columns, reg, m_j): the populated HLL registers of
    ``value_column``'s distinct set per group. One map-side-combined
    groupBy MAX over (group, reg) — at most m = 2^p rows survive per
    group no matter how many input rows, which is the whole point."""
    require_columns(df, group_columns + [value_column])
    m = 1 << p
    wbits = 60 - p
    h = _h60_sql(f"`{value_column}`")
    rank = f"({wbits + 1} - {_bitlen_case_sql(f'(({h}) div {m})', wbits)})"
    return (
        df.select(
            *group_columns,
            F.expr(f"(({h}) % {m})").cast("long").alias("reg"),
            F.expr(rank).cast("long").alias("rk"),
        )
        .groupBy(*group_columns, "reg")
        .agg(F.max("rk").cast("long").alias("m_j"))
    )


def hll_merge(registers: DataFrame, group_columns: list[str]) -> DataFrame:
    """Union any register tables (possibly re-keyed to coarser groups)
    and MAX per (group, reg) — HLL union is register-wise max, so the
    merged sketch equals the sketch of the concatenated inputs."""
    return registers.groupBy(*group_columns, "reg").agg(
        F.max("m_j").cast("long").alias("m_j")
    )


def hll_estimate(
    registers: DataFrame,
    group_columns: list[str],
    p: int = 8,
) -> DataFrame:
    """→ (*group_columns, v_zeros, z_scaled, hll_est): the HLL
    cardinality estimate per group with the standard small-range
    linear-counting correction (E_raw ≤ 2.5m and V > 0 → m·ln(m/V)).

    ``z_scaled`` = Σ_j 2^(S−M_j) over all m registers (absent → M_j=0)
    is the exact-int64 sufficient statistic; ``hll_est`` is the only
    float, computed in one fixed expression so oracles reproduce it."""
    m = 1 << p
    s_bits = (60 - p) + 1
    alpha = hll_alpha(m)
    agg = registers.groupBy(*group_columns).agg(
        F.count(F.lit(1)).cast("long").alias("__n_regs"),
        F.sum(
            F.expr(f"shiftleft(cast(1 as bigint), cast({s_bits} - m_j as int))")
        )
        .cast("long")
        .alias("__z_present"),
    )
    v = (F.lit(m) - F.col("__n_regs")).cast("long")
    z = (v * F.lit(1 << s_bits) + F.col("__z_present")).cast("long")
    est_raw = (
        F.lit(alpha * m * m * float(1 << s_bits)) / z.cast("double")
    )
    est = F.when(
        (est_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(est_raw)
    return agg.select(
        *group_columns,
        v.alias("v_zeros"),
        z.alias("z_scaled"),
        est.alias("hll_est"),
    )
