"""Dimension reduction — §2.H ``dimension_reduction``.

Reference ``app/word_item_similarity/dimension_reduction_model.py:11-68``:
fit = per-dimension importance Σx² over rows, keep top-n dims;
apply = slice those dims + optional L2 normalize.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.functions.vector import l2_normalize
from redshells_spark.operators.aggregates import feature_importance_sumsq


@dataclass
class DimensionReductionModel:
    selected_dims: list[int]
    normalize: bool = True

    @classmethod
    def fit(
        cls,
        df: DataFrame,
        embedding_column: str = "embedding",
        top_n: int = 32,
        normalize: bool = True,
    ) -> "DimensionReductionModel":
        dims = feature_importance_sumsq(df, embedding_column, top_n)
        return cls(selected_dims=dims, normalize=normalize)

    def transform(
        self, df: DataFrame, embedding_column: str = "embedding"
    ) -> DataFrame:
        # element_at is 1-based; gather the selected dims in order
        gathered = F.array(
            *[F.element_at(F.col(embedding_column), d + 1) for d in self.selected_dims]
        )
        out = df.withColumn(embedding_column, gathered)
        if self.normalize:
            out = out.withColumn(embedding_column, l2_normalize(embedding_column))
        return out
