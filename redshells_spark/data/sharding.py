"""Write-path planning for a 100 TB corpus: token-balanced output
shards and deterministic multi-epoch training-order schedules.

Beyond-reference LLM-pipeline operators (the reference writes whatever
pandas hands it — ``data/data_frame_utils.py`` has no sharding story).
At cluster scale the *writer* is a first-class operator: a training
run reads shards round-robin, so shard token-counts must be balanced
(a 2x-heavy shard is a 2x-slow epoch tail), and data order must be a
reproducible function of (corpus, epoch), not of executor scheduling.

Scale design — the one primitive everything here needs is a GLOBAL
RANK, and the naive ``row_number() OVER (ORDER BY ...)`` is a
single-task window (every row through one partition — the canonical
100 TB scale-killer). :func:`distributed_rank` computes the identical
rank with bounded tasks:

1. ``repartitionByRange`` on the sort key (distributed range shuffle —
   the same machinery as a global ``orderBy``),
2. a *per-partition* ``row_number`` (bounded window),
3. one tiny driver collect of per-partition counts (#partitions rows)
   turned into a broadcast offset map.

The rank is invariant to where the range boundaries land because the
sort key is made total (explicit unique tie-break column), so the
result is bit-identical to the single-partition window and to the
DuckDB oracle's ``row_number()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def distributed_rank(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rank",
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """0-based dense global rank by ``order_cols`` (must be a total
    order — include a unique tie-break), computed without a
    single-partition window.

    With ``partition_cols``, the rank restarts inside each group
    (group key is prepended to the range-partitioning key so a group's
    rows may still span partitions — offsets are tracked per
    (group, partition)).

    The range-shuffled frame is pinned with ``localCheckpoint`` so the
    per-partition counts collected for the offset map describe the
    exact partitioning the final plan consumes (range-sampling is not
    guaranteed stable across separate jobs).
    """
    pcols = [F.col(c) for c in (partition_cols or [])]
    ranged = (
        df.repartitionByRange(*(pcols + order_cols))
        .sortWithinPartitions(*(pcols + order_cols))
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    group_key = (
        F.concat_ws("|", *[F.col(c).cast("string") for c in (partition_cols or [])])
        if partition_cols
        else F.lit("")
    )
    sizes = (
        ranged.groupBy(group_key.alias("__grp"), "__pid")
        .agg(F.count("*").alias("__n"))
        .collect()  # bounded: (#groups x #partitions) rows
    )
    if len(sizes) > 100_000:
        raise ValueError(
            f"distributed_rank offset map would hold {len(sizes)} "
            "(group, partition) entries — partition_cols cardinality is "
            "too high for a broadcast offset map; rank within groups via "
            "a per-group window instead"
        )
    offsets: dict[tuple[str, int], int] = {}
    acc: dict[str, int] = {}
    for row in sorted(sizes, key=lambda r: (r["__grp"], r["__pid"])):
        offsets[(row["__grp"], row["__pid"])] = acc.get(row["__grp"], 0)
        acc[row["__grp"]] = acc.get(row["__grp"], 0) + row["__n"]
    off_map = F.create_map(
        *[
            x
            for (grp, pid), off in offsets.items()
            for x in (F.lit(f"{grp}|{pid}"), F.lit(off))
        ]
    )
    w = Window.partitionBy(*(pcols + [F.col("__pid")])).orderBy(*order_cols)
    key = F.concat(group_key, F.lit("|"), F.col("__pid").cast("string"))
    return (
        ranged.withColumn(
            out_col,
            (F.row_number().over(w) - 1 + off_map[key]).cast("long"),
        )
        .drop("__pid")
    )


def token_balanced_shards(
    df: DataFrame,
    weight_column: str,
    n_shards: int,
    id_column: str = "doc_id",
) -> DataFrame:
    """Assign every row to one of ``n_shards`` output shards so shard
    weight totals are near-equal: serpentine placement over the
    weight-descending rank (rank block ``k`` fills shards left-to-right
    when ``k`` is even, right-to-left when odd — the relational,
    order-free form of greedy LPT bin packing; within-block imbalance
    is bounded by one row's weight).

    → original columns + ``shard`` (long). Feed to
    ``df.repartition('shard').write.partitionBy('shard')`` — the
    assignment is one range shuffle + bounded windows
    (:func:`distributed_rank`), no driver state.
    """
    require_columns(df, [id_column, weight_column])
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    ranked = distributed_rank(
        df,
        [F.col(weight_column).desc(), F.col(id_column).asc()],
        out_col="__rk",
    )
    block = F.col("__rk") / n_shards  # floor'd below; rank is long
    within = F.col("__rk") % n_shards
    shard = F.when(
        (F.floor(block) % 2) == 0, within
    ).otherwise(n_shards - 1 - within)
    return ranked.withColumn("shard", shard.cast("long")).drop("__rk")


def curriculum_schedule(
    df: DataFrame,
    difficulty_column: str,
    n_epochs: int = 3,
    id_column: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Deterministic multi-epoch training-data order: epoch 0 is the
    curriculum pass (easy → hard by ``difficulty_column``), epochs
    >= 1 are full reshuffles keyed on ``md5(seed|epoch|id)`` — so the
    schedule is a pure function of (corpus, seed), reproducible across
    cluster sizes and reruns (Bengio et al. 2009 curriculum learning;
    the per-epoch reshuffle every data loader needs).

    → (epoch, position, ``id_column``, ``difficulty_column``), one row
    per (epoch, doc). The position is a per-epoch
    :func:`distributed_rank` over a single string sort key that both
    engines compute identically: zero-padded difficulty+id for the
    curriculum epoch, the md5 hash otherwise.
    """
    require_columns(df, [id_column, difficulty_column])
    if n_epochs < 1:
        raise ValueError(f"n_epochs must be >= 1, got {n_epochs}")
    epochs = df.select(
        F.col(id_column),
        F.col(difficulty_column),
        F.explode(F.sequence(F.lit(0), F.lit(n_epochs - 1))).alias("epoch"),
    )
    sort_key = F.when(
        F.col("epoch") == 0,
        F.concat(
            F.lpad(F.col(difficulty_column).cast("string"), 10, "0"),
            F.lit("|"),
            F.lpad(F.col(id_column).cast("string"), 10, "0"),
        ),
    ).otherwise(
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(seed)),
                F.col("epoch").cast("string"),
                F.col(id_column).cast("string"),
            )
        )
    )
    keyed = epochs.withColumn("__key", sort_key)
    ranked = distributed_rank(
        keyed,
        [F.col("__key").asc(), F.col(id_column).asc()],
        out_col="position",
        partition_cols=["epoch"],
    )
    return ranked.select(
        F.col("epoch").cast("long").alias("epoch"),
        "position",
        id_column,
        difficulty_column,
    )
