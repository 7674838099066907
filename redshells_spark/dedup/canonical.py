"""Near-dup cluster canonicalization and leakage-safe splitting.

After near-dup detection (``dedup/minhash.py``) a production corpus
pipeline needs two more decisions that the drop-min-id policy of
``connected_components_dedup`` doesn't cover:

- **Which member represents the cluster?** Keeping the *longest*
  member (most tokens) preserves the most content — the policy CCNet
  and most web-corpus pipelines use — rather than an arbitrary id.
- **Which split does the cluster go to?** Assigning train/val/test
  per *document* leaks near-duplicates across the boundary; the unit
  of assignment must be the whole near-dup component (Lee et al. 2022,
  arXiv:2107.06499 §6 measure exactly this leakage).

Beyond-reference surface. Scale design: components are size-bounded
by the LSH ``max_bucket_size`` guard upstream, so the per-component
window here is bounded; the split is a stateless integer hash of the
component id — no global ordering, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import portable_hash, require_columns


def attach_components(
    docs: DataFrame,
    components: DataFrame,
    id_column: str = "doc_id",
    component_column: str = "keep_id",
) -> DataFrame:
    """Left-join the (member doc -> component id) labeling onto the
    full corpus; docs outside any near-dup component become their own
    singleton component. → docs + ``component`` (long)."""
    require_columns(docs, [id_column])
    require_columns(components, [id_column, component_column])
    comp = components.select(
        F.col(id_column),
        F.col(component_column).alias("__comp"),
    )
    return (
        docs.join(comp, on=id_column, how="left")
        .withColumn(
            "component",
            F.coalesce(F.col("__comp"), F.col(id_column)).cast("long"),
        )
        .drop("__comp")
    )


def canonical_pick(
    docs_with_components: DataFrame,
    weight_column: str,
    id_column: str = "doc_id",
) -> DataFrame:
    """Pick each component's canonical member: max ``weight_column``,
    ties to the smallest id. → input + ``canonical_id`` (long) +
    ``is_canonical`` (long 0/1). Per-component window only — bounded
    by the upstream LSH bucket cap, never corpus-wide."""
    require_columns(docs_with_components, [id_column, weight_column, "component"])
    w = Window.partitionBy("component").orderBy(
        F.col(weight_column).desc(), F.col(id_column).asc()
    )
    return (
        docs_with_components.withColumn(
            "canonical_id",
            F.first(F.col(id_column)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).cast("long"),
        )
        .withColumn(
            "is_canonical",
            (F.col(id_column) == F.col("canonical_id")).cast("long"),
        )
    )


def component_split(
    docs_with_components: DataFrame,
    train_pct: int = 80,
    val_pct: int = 10,
    seed: int = 11,
) -> DataFrame:
    """Leakage-safe train/val/test assignment at near-dup-component
    granularity: the portable integer hash of the *component* id picks
    the split, so every member of a cluster lands on the same side of
    every boundary. → input + ``split`` (string).

    Percentages are integer buckets of ``hash(component) % 100`` —
    exact expected shares, one stateless expression, no shuffle."""
    require_columns(docs_with_components, ["component"])
    if not (0 < train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError(f"bad split percentages: {train_pct}/{val_pct}")
    bucket = portable_hash(F.col("component"), seed) % 100
    return docs_with_components.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )
