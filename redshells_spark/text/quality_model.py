"""Model-based document quality scoring.

The production complement to the heuristic signals in
:mod:`redshells_spark.text.analysis`: production pipelines (CCNet,
LLaMA's Wikipedia-reference classifier, GPT-3's WebText classifier)
train a lightweight linear classifier over bag-of-words features to
score "does this look like high-quality text", then filter or
importance-sample by the score.

Spark-first shape: ``HashingTF`` (fixed feature space — no vocabulary
fit, so the transform is stateless and stream-safe) → ``IDF`` →
``LogisticRegression``, all MLlib estimators; scoring is a pure
``model.transform`` — distributed, no driver involvement, no Python
UDF. Mirrors the reference's classifier-registry pattern
(``train/train_clasification_model.py:12-47``) applied to corpus
hygiene instead of CTR.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import IDF, HashingTF
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from redshells_spark.schema import require_columns


def train_quality_classifier(
    labeled_docs: DataFrame,
    tokens_column: str = "tokens",
    label_column: str = "label",
    num_features: int = 1 << 18,
    reg_param: float = 1e-3,
    max_iter: int = 50,
) -> PipelineModel:
    """Fit the quality model on (tokens, label ∈ {0,1}) rows.

    ``num_features`` buckets bound memory regardless of vocabulary
    size — at 100 TB there is no vocab collect, no dictionary shuffle;
    the only distributed work is the IDF document-frequency aggregate
    and LR's gradient passes (both map-side combined)."""
    from pyspark.ml.classification import LogisticRegression

    require_columns(labeled_docs, [tokens_column, label_column])
    tf = HashingTF(inputCol=tokens_column, outputCol="__tf", numFeatures=num_features)
    idf = IDF(inputCol="__tf", outputCol="__features")
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol=label_column,
        regParam=reg_param,
        maxIter=max_iter,
    )
    from redshells_spark.ml.mllib_compat import strip_training_summary

    # drop the LR training summary: it pins the SparkSession into the
    # model's object graph, which breaks transform-closure serialization
    # in any session that has ever run df.observe (see mllib_compat.py)
    return strip_training_summary(Pipeline(stages=[tf, idf, lr]).fit(labeled_docs))


def score_quality(
    model: PipelineModel,
    docs: DataFrame,
    tokens_column: str = "tokens",
    score_column: str = "quality_prob",
) -> DataFrame:
    """→ input columns + P(high quality). Pure transform: executors
    apply the hashed-TF/IDF/LR weights row-local; nothing shuffles."""
    from pyspark.ml.functions import vector_to_array

    require_columns(docs, [tokens_column])
    scored = model.transform(docs)
    return scored.withColumn(
        score_column, vector_to_array(F.col("probability")).getItem(1)
    ).drop("__tf", "__features", "rawPrediction", "probability", "prediction")


def filter_by_quality(
    model: PipelineModel,
    docs: DataFrame,
    threshold: float = 0.5,
    tokens_column: str = "tokens",
) -> DataFrame:
    """Keep docs with P(high quality) ≥ threshold (CCNet keeps the
    head/middle of the score distribution; a fixed threshold is the
    simplest policy and composes with ``domain_mix_weights`` for
    quality-aware sampling)."""
    scored = score_quality(model, docs, tokens_column)
    return scored.filter(F.col("quality_prob") >= threshold)
