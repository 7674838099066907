"""The corpus-snapshot audit a training-data pipeline runs when a new
crawl lands, end-to-end: distributional drift (KS + EMD + MMD), the
multiplicity-corrected per-segment screen (ANOVA omnibus → BH-FDR →
effect sizes), dedup-method trust checks (MinHash calibration +
cross-method agreement), and the series-health panel (Page-Hinkley,
runs test, Ljung-Box, Holt forecast) — every number hash-certified
against the DuckDB oracle by the registry differential."""

from __future__ import annotations

from _common import example_args, example_session


def main() -> None:
    args = example_args(__doc__)
    spark = example_session("distribution_audit_example")
    from redshells_spark.queries import QUERIES

    sf = args.sf_dir

    print("== 1. Did the distributions move? ==")
    ks = QUERIES["ks_two_sample"](spark, sf).collect()[0]
    emd = QUERIES["emd_price_histogram"](spark, sf).collect()[0]
    mmd = QUERIES["mmd_label_shift"](spark, sf).collect()[0]
    print(f"  KS D={ks['d_stat']:.4f} reject@5%={bool(ks['reject_005'])}")
    print(f"  EMD (R vs N prices) = {emd['emd_dollars']:.2f} dollars of mass-distance")
    print(f"  embedding MMD^2 (label 0 vs 1) = {mmd['mmd2']:.6f}")

    print("== 2. Which segments differ, after correction? ==")
    an = QUERIES["anova_order_totals"](spark, sf).collect()
    print(f"  ANOVA F={an[0]['f_stat']} (df {an[0]['df1']},{an[0]['df2']})")
    bh = QUERIES["bh_fdr_return_rates"](spark, sf).collect()
    sig = [r["nationkey"] for r in bh if r["significant"]]
    print(f"  BH-significant nations at FDR 5%: {sig or 'none'}")
    es = QUERIES["effect_size_by_segment"](spark, sf).collect()
    worst = max(es, key=lambda r: abs(r["cohen_d"]))
    print(f"  largest effect: {worst['segment']} d={worst['cohen_d']}")

    print("== 3. Can the dedup thresholds be trusted? ==")
    cal = QUERIES["minhash_estimate_calibration"](spark, sf).collect()
    big = [r for r in cal if r["est_sixteenths"] >= 8]
    if big:
        err = max(r["mean_abs_err_e6"] for r in big) / 1e6
        print(f"  worst sketch bias above est 0.5: {err:.3f} Jaccard")
    agree = QUERIES["dedup_method_agreement"](spark, sf).collect()
    tot_a = sum(r["n_minhash"] for r in agree)
    tot_b = sum(r["n_ngram"] for r in agree)
    tot_i = sum(r["n_both"] for r in agree)
    print(f"  minhash pairs={tot_a} ngram pairs={tot_b} both={tot_i}")

    print("== 4. Is the daily series healthy? ==")
    ph = QUERIES["page_hinkley_drift"](spark, sf).collect()
    print(f"  Page-Hinkley alarms: {sum(r['alarm'] for r in ph)}/{len(ph)} days")
    rt = QUERIES["runs_test_daily"](spark, sf).collect()[0]
    print(f"  runs test z={rt['z']} reject={bool(rt['reject_005'])}")
    lb = QUERIES["ljung_box_daily"](spark, sf).collect()[0]
    print(f"  Ljung-Box={lb['lb_stat']} (chi2_7 5% = 14.07)")
    hf = QUERIES["holt_linear_forecast"](spark, sf).collect()
    print(f"  Holt next-day forecast: {hf[-1]['fcst_next']:.2f} purchases")

    spark.stop()


if __name__ == "__main__":
    main()
