"""SCDV document embeddings (reference ``examples/scdv_examples.py``)."""

from __future__ import annotations

from _common import example_args, example_session


def main() -> None:
    args = example_args(__doc__)
    spark = example_session("scdv_example")
    from redshells_spark.ml.scdv import SCDV
    from redshells_spark.text.tokenize import tokenize_on_space

    docs = tokenize_on_space(
        spark.read.parquet(f"{args.sf_dir}/documents.parquet"), "text", "tokens",
        lowercase=True,
    )
    model = SCDV.fit(
        docs, cluster_size=6, embedding_size=12,
        word2vec_kwargs={"min_count": 2, "seed": 42}, seed=42,
    )
    vecs = model.infer_vector(docs)
    row = vecs.head()
    print(f"doc vectors: {vecs.count()} rows, dim {len(row['embedding'])}")
    print(f"sparsity threshold: {model.sparsity_threshold:.6f}")
    words = spark.createDataFrame([("spark",), ("join",)], "word string")
    print("word embeddings:", model.embed_words(words).count(), "rows")
    spark.stop()


if __name__ == "__main__":
    main()
