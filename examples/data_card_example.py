"""One-stop corpus data card: the per-source report a training-data
pipeline publishes before a run — volumes and exact-dup counts,
cross-source leakage, tokenizer fertility, quality/repetition/entropy
distributions, DSIR weights against a target slice, and the
largest-remainder token-budget split.

Run: python examples/data_card_example.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

from _common import example_args, example_session


def main() -> None:
    args = example_args(__doc__)
    spark = example_session("data_card_example")
    from pyspark.sql import functions as F

    from redshells_spark.data.dsir import dsir_log_weights
    from redshells_spark.data.sampling import largest_remainder_allocation
    from redshells_spark.dedup.exact import cross_source_overlap
    from redshells_spark.text.analysis import (
        gopher_quality_rules,
        gopher_repetition_battery,
        token_entropy_signals,
    )

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")

    print("== volumes & quality-gate pass rates by source ==")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    rules = gopher_quality_rules(docs.select("doc_id", "source", "text"))
    rules.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size(toks)).alias("tokens"),
        F.round(F.avg(F.col("keep").cast("double")), 3).alias("gopher_pass"),
    ).orderBy("source").show(5)

    print("== worst cross-source exact-dup leakage ==")
    cross_source_overlap(docs).orderBy(F.desc("jaccard")).show(5)

    print("== entropy / repetition outliers (boilerplate candidates) ==")
    ent = token_entropy_signals(docs.select("doc_id", "text"))
    rep = gopher_repetition_battery(docs.select("doc_id", "text"))
    ent.join(rep, "doc_id").orderBy("norm_entropy").select(
        "doc_id", "n_tokens", "norm_entropy", "top2_char_frac"
    ).show(5)

    print("== DSIR weights vs the lang='en' target slice ==")
    w = dsir_log_weights(docs, F.col("lang") == "en")
    w.orderBy(F.desc("log_weight")).show(5)

    print("== 100k-token budget split (largest remainder, sums exactly) ==")
    counts = (
        docs.select("source", F.size(toks).alias("nt"))
        .groupBy("source")
        .agg(F.sum("nt").alias("n"))
    )
    alloc = largest_remainder_allocation(counts, 100_000, count_column="n")
    alloc.orderBy(F.desc("allocation")).show(5)
    total = alloc.agg(F.sum("allocation")).collect()[0][0]
    print(f"allocated total = {total} (exact)")

    spark.stop()


if __name__ == "__main__":
    main()
