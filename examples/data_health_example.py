"""The data-health plane a production corpus runs nightly: the drift
triad (KS / PSI / Mann-Whitney) over an event metric, Merkle-style
snapshot digests over the document corpus, KNN-Shapley valuation of
the embedding table against a validation slice, and the two coreset
pickers (set max-coverage, metric k-center) for eval-subset selection.

Run: python examples/data_health_example.py [--sf-dir /root/testdata/sf0.001]
"""

from __future__ import annotations

from _common import example_args, example_session


def main() -> None:
    args = example_args(__doc__)
    spark = example_session("data_health_example")
    from pyspark.sql import functions as F

    from redshells_spark.data.coverage import greedy_max_coverage
    from redshells_spark.data.integrity import corpus_digest
    from redshells_spark.dedup.minhash import doc_shingles
    from redshells_spark.ml.valuation import knn_shapley
    from redshells_spark.operators.drift import (
        ks_two_sample,
        mann_whitney_u,
        psi_drift,
    )
    from redshells_spark.similarity.coreset import kcenter_coreset
    from redshells_spark.text.dictionary import train_dictionary
    from redshells_spark.text.tokenize import tokenize_on_space
    from redshells_spark.timeutil import event_us

    ev = spark.read.parquet(f"{args.sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")

    # --- drift triad: click vs purchase value distributions ----------
    b = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "value", (F.col("event_type") == "click").cast("long").alias("is1")
    )
    print("== KS ==")
    ks_two_sample(b, "value", "is1").show()
    print("== Mann-Whitney U ==")
    mann_whitney_u(b, "value", "is1").show()
    print("== PSI (early vs late halves, per event type) ==")
    base = ev.select("event_type", "value", event_us(ev).alias("us"))
    mm = base.agg((F.min("us") + F.max("us")).alias("mm"))
    flagged = base.crossJoin(F.broadcast(mm)).select(
        "event_type",
        "value",
        (F.col("us") * 2 < F.col("mm")).cast("long").alias("is_early"),
    )
    psi_drift(flagged, "value", "is_early", ["event_type"], max_bits=24).show()

    # --- snapshot certificate ----------------------------------------
    print("== corpus digest (global fold = bucket -1) ==")
    corpus_digest(docs, ["doc_id", "text", "lang", "source", "n_chars"]).filter(
        F.col("bucket") == -1
    ).show(truncate=False)

    # --- training-data valuation --------------------------------------
    print("== KNN-Shapley: 5 most harmful embeddings ==")
    train = emb.filter(F.col("vec_id") % 25 != 0)
    val = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("val_id"), "label", "embedding"
    )
    knn_shapley(train, val, k=5).orderBy("shapley_e12_sum").show(5)

    # --- eval-subset pickers ------------------------------------------
    toks = tokenize_on_space(docs, "text", "tokens", lowercase=True)
    vocab = train_dictionary(toks, "doc_id", "tokens", no_below=5, no_above=0.9, keep_n=100)
    sh = doc_shingles(toks, vocab)
    print("== greedy max-coverage picks (set objective) ==")
    greedy_max_coverage(sh, "doc_id", "shingle", k=4).show()
    print("== k-center coreset picks (metric objective) ==")
    kcenter_coreset(emb, k=4).show()

    spark.stop()


if __name__ == "__main__":
    main()
