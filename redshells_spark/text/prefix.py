"""Shared-prefix analysis for prompt corpora (prefix-cache planning).

LLM serving stacks (vLLM's automatic prefix caching, SGLang's
RadixAttention) reuse KV-cache across requests that share a token
prefix. The planning question — "how much compute would a prefix
cache save on THIS workload?" — reduces to the total longest common
prefix between each prompt and its lexicographic predecessor: sorting
the prompts makes every shared prefix adjacent, so

    Σ_i LCP(tokens_i, tokens_{i-1})   (within a sorted group)

is exactly the token count a radix-tree cache would serve from memory
on a cold full-corpus replay (each trie edge is paid once; sorted
adjacency charges every later occurrence to its predecessor).

Scale shape: one window per group ordered by (text, id) — the same
shuffle a sort-based dedup already does — and the LCP itself is a
first-mismatch array expression (min over positions of the first
unequal token), pure codegen over the zipped prefix, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def _lcp_expr(cur: str, prev: str) -> F.Column:
    """Token LCP of two array<string> columns: position of the first
    mismatch minus one, or min(len, len_prev) when one is a prefix of
    the other. array_min ignores the NULLs the transform emits for
    equal positions — an order-free reduction both engines share."""
    n = F.least(F.size(F.col(cur)), F.size(F.col(prev)))
    # clamp: sequence(1, 0) would run DESCENDING in Spark and probe
    # index 0; the n <= 0 guard below makes the clamped value unused
    first_bad = F.array_min(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
            lambda i: F.when(
                F.element_at(F.col(cur), i) != F.element_at(F.col(prev), i), i
            ),
        )
    )
    return F.when(F.col(prev).isNull() | (n <= 0), F.lit(0)).otherwise(
        F.coalesce(first_bad - 1, n)
    )


def prefix_cache_stats(
    df: DataFrame,
    group_column: str,
    id_column: str,
    tokens_column: str,
) -> DataFrame:
    """→ one row per group: (group, n_docs, total_tokens,
    shared_prefix_tokens, hit_rate_e4) where hit_rate_e4 is the exact
    fixed-point fraction of tokens a cold prefix-cache replay would
    serve from cache (shared·10⁴ div total)."""
    require_columns(df, [group_column, id_column, tokens_column])
    w = Window.partitionBy(group_column).orderBy(
        F.col("__t").asc(), F.col(id_column).asc()
    )
    lagged = df.select(
        group_column,
        id_column,
        F.col(tokens_column).alias("__t"),
    ).withColumn("__p", F.lag("__t").over(w))
    scored = lagged.select(
        group_column,
        F.size("__t").cast("long").alias("__n_tok"),
        _lcp_expr("__t", "__p").cast("long").alias("__lcp"),
    )
    return scored.groupBy(group_column).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("__n_tok").cast("long").alias("total_tokens"),
        F.sum("__lcp").cast("long").alias("shared_prefix_tokens"),
        F.expr("sum(__lcp) * 10000 div sum(__n_tok)")
        .cast("long")
        .alias("hit_rate_e4"),
    )
