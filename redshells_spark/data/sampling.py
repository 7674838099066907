"""Corpus composition: stratified sampling and domain-mix weights.

Training-data pipelines rarely take a corpus as-is — they re-balance it
(per-language / per-source quotas, domain mixing à la The Pile /
DoReMi-style static weights). These are the deterministic, relational
versions of those steps.

Extends the reference's ``SampleData`` (``data/data_frame_utils.py:186-201``,
shuffle + head) from global exact-size sampling to per-group exact-size
sampling, with the same portable md5 ordering the repo's ``sample_data``
uses so a SQL oracle reproduces the selection bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def stratified_sample_exact(
    df: DataFrame,
    group_column: str,
    n_per_group: int,
    id_column: str,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``min(n_per_group, |group|)`` rows per group, selected by
    a portable pseudo-random order: md5(seed ‖ id) with the id as the
    tie-break. One window shuffle on ``group_column``; rows beyond the
    quota are pruned map-side by WindowGroupLimit before the exchange,
    so the shuffle moves ≈ n_per_group · n_groups rows, not the corpus."""
    require_columns(df, [group_column, id_column])
    order = F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_column).cast("string")))
    w = Window.partitionBy(group_column).orderBy(order, F.col(id_column))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def domain_mix_weights(
    df: DataFrame,
    group_column: str,
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """→ (group, n_rows, sample_prob): per-group downsampling
    probability that reshapes the corpus toward ``target_shares``
    (default: uniform across observed groups) without upsampling.

    sample_prob = (target_share / actual_share) scaled so the largest
    ratio is 1.0 — the group furthest below its target keeps all rows,
    every other group is thinned proportionally. One groupBy + one tiny
    cross-join against the 1-row global aggregate; the weights frame is
    n_groups rows and feeds a broadcast join + Bernoulli filter."""
    require_columns(df, [group_column])
    counts = df.groupBy(group_column).agg(F.count(F.lit(1)).alias("n_rows"))
    if target_shares is None:
        target = F.lit(1.0) / F.count(F.lit(1)).over(Window.partitionBy())
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in target_shares.items() for x in kv]
        )
        target = mapping[F.col(group_column)]
    total = Window.partitionBy()
    ratio = target / (F.col("n_rows") / F.sum("n_rows").over(total))
    return counts.select(
        group_column,
        "n_rows",
        F.round(ratio / F.max(ratio).over(total), 4).alias("sample_prob"),
    )


def apply_mix_weights(
    df: DataFrame,
    weights: DataFrame,
    group_column: str,
    id_column: str,
    seed: int = 0,
) -> DataFrame:
    """Thin ``df`` by the per-group ``sample_prob`` weights using a
    portable hash-Bernoulli: keep when md5-derived u(id) < prob.
    Deterministic (same id → same decision), broadcast join only."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit(str(seed)), F.col(id_column).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / float(0xFFFFFFFF)
    )
    w = F.broadcast(weights.select(group_column, "sample_prob"))
    return (
        df.join(w, on=group_column)
        .filter(u < F.col("sample_prob"))
        .drop("sample_prob")
    )


def weighted_sample_priority(
    df: DataFrame,
    group_column: str | None,
    id_column: str,
    weight_column: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): k rows per group with
    inclusion probability ≈ proportional to integer ``weight_column``,
    WITHOUT replacement, fully deterministic and engine-portable.

    Each row gets priority u/w where u is the portable 60-bit md5 hash
    of (seed ‖ id) — a fixed uniform draw — and the k smallest
    priorities win. The only float op is one int64→double divide, which
    IEEE defines identically everywhere, so a DuckDB oracle reproduces
    the exact sample. Non-positive weights are refused at runtime (a
    zero weight would mean division by zero masquerading as +inf
    priority).

    Same WindowGroupLimit shape as :func:`stratified_sample_exact`:
    the shuffle carries ≈ k·n_groups rows.
    """
    require_columns(df, [id_column, weight_column] + ([group_column] if group_column else []))
    u = F.expr(
        "cast(conv(substring(md5(concat_ws('|', "
        f"'{seed}', cast(`{id_column}` as string))), 1, 15), 16, 10) as bigint)"
    )
    # validate AFTER the integer cast: a fractional weight in (0,1)
    # passes a pre-cast `<= 0` guard, truncates to 0, and u/0 → null
    # priority — which nulls-first asc ordering would then PREFER.
    # Sub-1 weights must be refused, not win the sample.
    w_long = F.col(weight_column).cast("long")
    w_ok = F.when(
        w_long.isNull() | (w_long <= 0),
        F.raise_error(F.lit(f"weighted_sample_priority: non-positive weight in {weight_column}")),
    ).otherwise(w_long)
    prio = u / w_ok  # int64 / int64 → double, IEEE-identical cross-engine
    win = (
        Window.partitionBy(group_column) if group_column else Window.partitionBy()
    ).orderBy(prio.asc(), F.col(id_column).asc())
    return (
        df.withColumn("__rn", F.row_number().over(win))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def temperature_mix_weights(
    df: DataFrame,
    group_column: str,
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-scaled domain mixing (the multilingual-corpus
    trick: raise every domain's share to 1/T, T>1 flattens the
    distribution toward uniform): → (group, n_rows, sample_prob,
    prob_e6). ``sample_prob`` is the double the downstream thinning
    step (:func:`apply_mix_weights`) consumes; ``prob_e6`` is the same
    value in 1e-6 fixed point, the order-free integer export for
    exact cross-engine checks.

    The whole pipeline reduces to a closed form with NO float
    aggregation: target ∝ p^(1/T) and prob ∝ target/p = p^(1/T − 1),
    which is maximal at the smallest group, so

        sample_prob = (n_min / n_g)^(1 − 1/T)

    — one integer ratio and one power per group. At T=2 the power is a
    square root, which IEEE 754 requires to be correctly rounded, so
    the weights are bit-identical in any engine (the T=2 case is the
    one under the exact oracle contract; other T go through libm pow,
    identical in practice but not guaranteed to the last ulp).
    T=1 degenerates to prob 1.0 everywhere (natural mix); T→∞
    approaches the uniform rebalance of :func:`domain_mix_weights`.
    """
    if temperature < 1.0:
        raise ValueError("temperature_mix_weights: temperature must be >= 1")
    require_columns(df, [group_column])
    counts = df.groupBy(group_column).agg(F.count(F.lit(1)).alias("n_rows"))
    n_min = F.min("n_rows").over(Window.partitionBy())
    ratio = n_min.cast("double") / F.col("n_rows")
    expo = 1.0 - 1.0 / temperature
    if abs(expo - 0.5) < 1e-12:
        prob = F.sqrt(ratio)  # correctly rounded — exact cross-engine
    else:
        prob = F.pow(ratio, F.lit(expo))
    return counts.select(
        group_column,
        "n_rows",
        prob.alias("sample_prob"),
        (F.floor(prob * 1_000_000 + F.lit(0.5))).cast("long").alias("prob_e6"),
    )


def largest_remainder_allocation(
    counts: DataFrame,
    total_budget: int,
    group_column: str = "source",
    count_column: str = "n",
    carry_columns: tuple = (),
) -> DataFrame:
    """→ (group, [carry...], n, floor_share, extra, allocation): split
    an integer ``total_budget`` (tokens, rows, examples) across groups
    proportionally to ``count_column`` with the largest-remainder
    (Hamilton) method — allocations are integers, sum EXACTLY to the
    budget, and every step is integer arithmetic (ideal share
    B·n ÷ Σn via div/mod), so the result is engine-exact with no float
    anywhere. The per-group relation is small (one row per group);
    the single ordered window ranks remainders with a group tie-break.
    ``carry_columns`` ride through untouched — callers that would
    otherwise join the result back to ``counts`` (re-running a
    fact-scale upstream twice, since column pruning defeats exchange
    reuse) should carry instead.
    """
    # total and shortfall as GLOBAL windows over the per-group relation
    # (one row per group — tiny by contract): the caller's upstream
    # (often a fact-scale aggregate) is consumed exactly ONCE, with no
    # eager pin (a round-8 localCheckpoint here cost more than the
    # re-expansion it saved — VERDICT r08 item 5) and no probe joins.
    # All three windows share the one single-partition exchange.
    carry = [c for c in carry_columns]
    w_all = Window.partitionBy()
    base = counts.select(
        group_column,
        *carry,
        F.col(count_column).cast("long").alias("n"),
    ).withColumn("__tot", F.sum("n").over(w_all)).select(
        group_column,
        *carry,
        "n",
        F.expr(f"({total_budget} * n) div __tot").alias("floor_share"),
        F.expr(f"({total_budget} * n) % __tot").alias("__rem"),
    )
    w = Window.orderBy(F.col("__rem").desc(), F.col(group_column).asc())
    return (
        base.withColumn(
            "__short", F.lit(total_budget) - F.sum("floor_share").over(w_all)
        )
        .withColumn(
            "extra", (F.row_number().over(w) <= F.col("__short")).cast("long")
        )
        .select(
            group_column,
            *carry,
            "n",
            "floor_share",
            "extra",
            (F.col("floor_share") + F.col("extra")).alias("allocation"),
        )
    )


def negative_sampling_table(
    tokens: DataFrame,
    token_column: str = "token",
    power: float = 0.75,
    decimals: int = 4,
) -> DataFrame:
    """→ (token, n, prob, cum_prob): the word2vec negative-sampling
    distribution p(w) ∝ count(w)^power (Mikolov et al. 2013 use
    0.75 — it upweights the tail), with the running CDF for
    inverse-transform draws. One vocabulary-sized aggregate + one
    ordered window (vocab rows, not corpus rows); probabilities are
    rounded for the cross-engine export, the CDF accumulates in the
    deterministic (token asc) window order."""
    c = tokens.groupBy(token_column).agg(F.count(F.lit(1)).alias("n"))
    weighted = c.withColumn("w", F.pow(F.col("n").cast("double"), F.lit(power)))
    tot = weighted.agg(F.sum("w").alias("wt"))
    w = Window.orderBy(F.col(token_column).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        weighted.crossJoin(F.broadcast(tot))
        .withColumn("prob", F.round(F.col("w") / F.col("wt"), decimals))
        .withColumn(
            "cum_prob", F.round(F.sum(F.col("w") / F.col("wt")).over(w), decimals)
        )
        .select(token_column, F.col("n").cast("long").alias("n"), "prob", "cum_prob")
    )


def unimax_allocation(
    counts: DataFrame,
    group_column: str,
    tokens_column: str,
    budget: int,
    epoch_cap: int,
) -> DataFrame:
    """UniMax budget water-filling (Chung et al. 2023): allocate
    ``budget`` tokens over groups (languages/domains) so no group is
    sampled more than ``epoch_cap`` epochs, the freed budget spreading
    uniformly over the rest — closed relational form, no iteration.

    A group (ascending by capacity, j = 1..L) is epoch-capped iff
    cap_j * (L - j + 1) <= budget - prefix_{j-1}; survivors split the
    remainder by exact integer division with a largest-remainder
    top-up (cap-descending, then group ascending — deterministic).
    All int64: allocations sum to exactly ``budget`` whenever total
    capacity covers it, else every group gets its full cap.

    Output: (group, tokens_available, cap, allocation, capped). The
    relation is group-cardinality-bounded — corpus-scale work is
    whatever aggregate produced ``counts``."""
    caps = counts.select(
        F.col(group_column).alias("group"),
        F.col(tokens_column).cast("long").alias("tokens_available"),
        (F.col(tokens_column).cast("long") * int(epoch_cap)).alias("cap"),
    )
    wj = Window.orderBy(F.col("cap").asc(), F.col("group").asc())
    caps = caps.withColumn("j", F.row_number().over(wj)).withColumn(
        "l", F.count(F.lit(1)).over(Window.partitionBy()).cast("long")
    )
    wp = Window.orderBy(F.col("j").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    fl = caps.withColumn(
        "prefix", F.coalesce(F.sum("cap").over(wp), F.lit(0)).cast("long")
    ).withColumn(
        "capped",
        (
            F.col("cap") * (F.col("l") - F.col("j") + 1)
            <= F.lit(int(budget)) - F.col("prefix")
        ).cast("int"),
    )
    rem = fl.agg(
        (
            F.lit(int(budget))
            - F.coalesce(
                F.sum(F.when(F.col("capped") == 1, F.col("cap"))), F.lit(0)
            )
        )
        .cast("long")
        .alias("r"),
        F.coalesce(F.sum(F.lit(1) - F.col("capped")), F.lit(0))
        .cast("long")
        .alias("m"),
    )
    wu = Window.partitionBy("capped").orderBy(
        F.col("cap").desc(), F.col("group").asc()
    )
    shared = fl.crossJoin(F.broadcast(rem)).withColumn(  # 1-row agg join
        "uncapped_rank",
        F.when(F.col("capped") == 0, F.row_number().over(wu)),
    )
    return shared.select(
        F.col("group").alias(group_column),
        "tokens_available",
        "cap",
        F.when(F.col("capped") == 1, F.col("cap"))
        .otherwise(
            F.expr("r div m")
            + F.when(F.col("uncapped_rank") <= F.col("r") % F.col("m"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("allocation"),
        F.col("capped").cast("long").alias("capped"),
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_budget: int,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation: n_h ∝ N_h·S_h
    (minimum-variance allocation of a fixed budget across strata,
    Neyman 1934) → (stratum, n, s_value, weight_e6, floor_share,
    extra, allocation), allocations integer and summing EXACTLY to
    ``total_budget``.

    One map-combined pass collects exact int64 moments per stratum;
    S_h = sqrt((n·Σv² − (Σv)²)/(n·(n−1))) is double-from-ints (the
    variance combine runs in double on exact integers — CUPED
    precedent), the weight is re-quantized to exact e6 integers with
    half-up floor(x·1e6 + 0.5) so the largest-remainder split is pure
    integer arithmetic (largest_remainder_allocation). Single-row and
    zero-variance strata get S_h = 0: they draw no Neyman budget.
    Values must be integers (cents); |v| ≤ ~3e6 keeps Σv² in int64 up
    to ~1e6 rows per stratum — pre-scale beyond."""
    v = F.col(value_col).cast("long")
    # stratum-bounded moments, consumed ONCE: the weight/stddev
    # projections ride INTO the allocation via carry_columns, so the
    # round-8 eager pin (fact aggregate re-use guard) and the join
    # back to `per` are both gone — one pass, no pin, no join
    per = (
        df.groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(v).cast("long").alias("sv"),
            F.sum(v * v).cast("long").alias("svv"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    s_val = F.when(
        F.col("n") > 1,
        F.sqrt(
            F.greatest(
                (d("n") * d("svv") - d("sv") * d("sv"))
                / (d("n") * (d("n") - F.lit(1.0))),
                F.lit(0.0),
            )
        ),
    ).otherwise(F.lit(0.0))
    per = per.withColumn("s_value", s_val).withColumn(
        "weight_e6",
        F.floor(d("n") * F.col("s_value") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
            "long"
        ),
    )
    alloc = largest_remainder_allocation(
        per.select(
            "stratum",
            F.col("n").alias("__n_rows"),
            "s_value",
            "weight_e6",
            F.col("weight_e6").alias("w"),
        ),
        total_budget,
        group_column="stratum",
        count_column="w",
        carry_columns=("__n_rows", "s_value", "weight_e6"),
    )
    return (
        alloc.select(
            "stratum",
            F.col("__n_rows").alias("n"),
            F.round("s_value", 6).alias("s_value"),
            "weight_e6",
            "floor_share",
            "extra",
            "allocation",
        )
        .orderBy("stratum")
    )
