"""The composite word→item similarity app (reference
``examples/word_item_similarity_example.py`` +
``app/word_item_similarity/build_word_item_similarity.py:117-152``):
keyword matching → word embeddings → similarity training pairs →
pairwise classifier → two-stage retrieval with model rerank."""

from __future__ import annotations

from _common import example_args, example_session


def main() -> None:
    args = example_args(__doc__)
    spark = example_session("word_item_similarity_example")
    from pyspark.sql import functions as F

    from redshells_spark.operators.joins import keyword_match_join
    from redshells_spark.pipelines.similarity_data import make_similarity_data
    from redshells_spark.pipelines.word_item_similarity import (
        calculate_word_embedding,
        calculate_word_item_similarity,
    )
    from redshells_spark.text.tokenize import tokenize_on_space

    docs = tokenize_on_space(
        spark.read.parquet(f"{args.sf_dir}/documents.parquet"), "text", "tokens",
        lowercase=True,
    )
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    keywords = spark.createDataFrame(
        [("spark",), ("join",), ("window",), ("stream",)], "keyword string"
    )

    w2i = keyword_match_join(docs, keywords, "doc_id", "tokens").select(
        F.col("keyword").alias("word"), F.col("doc_id").alias("item_id")
    )
    print(f"word→item pairs: {w2i.count()}")

    word_emb = calculate_word_embedding(w2i, emb, item_column="item_id")
    print(f"word embeddings: {word_emb.count()}")

    sim_data = make_similarity_data(w2i)
    print(f"similarity training pairs: {sim_data.count()}")

    result = calculate_word_item_similarity(
        word_emb, emb, prequery_return_size=100, return_size=10
    )
    result.show(12, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
