"""LLM corpus preparation tier 2: within-document dedup → overlapping
chunking → distributed BPE tokenizer training → corpus segmentation
stats. (Beyond the reference repo — the training-data-pipeline face of
the engine; every step here is oracle-checked in the driver contract.)
"""

from __future__ import annotations

from _common import example_args, example_session


def main() -> None:
    args = example_args(__doc__)
    spark = example_session("corpus_tokenizer_example")
    from pyspark.sql import functions as F

    from redshells_spark.text.bpe import (
        learn_bpe_merges,
        subtoken_count_per_doc,
        word_freq_table,
    )
    from redshells_spark.text.chunking import chunk_documents, dedup_within_doc

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")

    deduped = dedup_within_doc(docs)
    print("-- within-doc dedup (repeated tokens removed, order kept):")
    deduped.select("doc_id", "n_units", "n_removed").orderBy(
        F.col("n_removed").desc()
    ).show(5)

    chunks = chunk_documents(deduped, chunk_tokens=32, stride=24)
    print(f"-- {chunks.count()} overlapping 32/24 chunks (zero-shuffle generator)")

    wf = word_freq_table(docs)
    merges, segmented = learn_bpe_merges(wf, num_merges=8)
    print("-- learned BPE merge table (deterministic, oracle-checked):")
    merges.orderBy("rank").show(truncate=False)

    stats = subtoken_count_per_doc(docs, segmented)
    stats.agg(
        F.sum("n_tokens").alias("corpus_tokens"),
        F.sum("n_subtokens").alias("corpus_subtokens"),
    ).show()
    spark.stop()


if __name__ == "__main__":
    main()
