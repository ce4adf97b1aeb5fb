"""Property tests for the round-5d operator waves (the oracle gate
proves engine parity; these pin the semantic invariants parity can't)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from distributed_map_reduce_spark.registry import all_queries
from distributed_map_reduce_spark.sources import load_table


def test_kendall_tau_pair_accounting(spark, sf_dir):
    r = all_queries()["stats_kendall_tau"].fn(spark, sf_dir).collect()[0]
    n = r["n_days"]
    n0 = n * (n - 1) // 2
    # every pair is concordant, discordant, or tied in at least one axis
    assert r["concordant"] + r["discordant"] <= n0
    assert r["tied_x"] <= n0 and r["tied_y"] <= n0
    assert -1.0 <= r["tau_b"] <= 1.0
    # recompute tau_b from the emitted integer tallies
    expect = (r["concordant"] - r["discordant"]) / math.sqrt(
        (n0 - r["tied_x"]) * (n0 - r["tied_y"])
    )
    assert abs(r["tau_b"] - expect) < 1e-5
    assert r["significant"] == int(abs(r["z_stat"]) > 1.96)


def test_partial_correlation_vs_python(spark, sf_dir):
    r = all_queries()["stats_partial_correlation"].fn(spark, sf_dir).collect()[0]
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_extendedprice", "l_discount")
        .collect()
    )
    import statistics

    xs = [p[0] for p in rows]
    ys = [p[1] for p in rows]
    zs = [p[2] for p in rows]

    def corr(a, b):
        return statistics.correlation(a, b)

    rxy, rxz, ryz = corr(xs, ys), corr(xs, zs), corr(ys, zs)
    pr = (rxy - rxz * ryz) / math.sqrt((1 - rxz**2) * (1 - ryz**2))
    assert abs(r["partial_r_xy_z"] - pr) < 1e-3
    assert -1.0 <= r["partial_r_xy_z"] <= 1.0
    # partialling out a weak confounder barely moves a strong corr
    assert abs(r["r_xy"] - rxy) < 1e-3


def test_chow_test_f_nonnegative_and_df(spark, sf_dir):
    r = all_queries()["stats_chow_test"].fn(spark, sf_dir).collect()[0]
    # pooled RSS >= sum of segment RSS (nested models) -> F >= 0
    assert r["f_stat"] >= 0.0
    assert r["n_pre"] + r["n_post"] == r["n_days"]
    assert abs(r["n_pre"] - r["n_post"]) <= 1
    assert 0.0 <= r["r2_pooled"] <= 1.0
    assert r["structural_break"] == int(r["f_stat"] > 2.996)


def test_auc_roc_informed_beats_random(spark, sf_dir):
    rows = {r["model"]: r for r in all_queries()["eval_auc_roc"].fn(spark, sf_dir).collect()}
    inf, rnd = rows["informed"], rows["random"]
    assert inf["n_pos"] == rnd["n_pos"] and inf["n_neg"] == rnd["n_neg"]
    assert inf["n_pos"] > 0 and inf["n_neg"] > 0
    # an informed scorer must clear the label-blind 0.5 null decisively
    assert inf["auc"] > 0.75
    assert abs(rnd["auc"] - 0.5) < 0.2
    for r in (inf, rnd):
        assert abs(r["gini"] - (2 * r["auc"] - 1)) < 1e-5
        assert 0.0 <= r["auc"] <= 1.0


def test_pass_at_k_monotone_and_exact(spark, sf_dir):
    rows = {r["k"]: r for r in all_queries()["eval_pass_at_k"].fn(spark, sf_dir).collect()}
    assert set(rows) == {1, 5, 10}
    assert rows[1]["n_problems"] == 25
    assert rows[1]["total_samples"] == rows[10]["total_samples"]
    # pass@k is monotone nondecreasing in k for every problem, so in mean
    assert rows[1]["pass_at_k"] <= rows[5]["pass_at_k"] <= rows[10]["pass_at_k"]
    # brute-force recompute from the same deterministic sample sheet
    import hashlib
    from math import comb

    docs = load_table(spark, sf_dir, "documents").select("doc_id").collect()
    nc = {}
    for (doc_id,) in docs:
        pid = doc_id % 25
        coin = int(hashlib.md5(f"pass-{doc_id}".encode()).hexdigest()[:2], 16) % 256
        ok = 1 if coin < 30 + 40 * (pid % 5) else 0
        n, c = nc.get(pid, (0, 0))
        nc[pid] = (n + 1, c + ok)
    for k in (1, 5, 10):
        vals = [
            1.0 if n - c < k else 1.0 - comb(n - c, k) / comb(n, k)
            for n, c in nc.values()
        ]
        assert abs(rows[k]["pass_at_k"] - sum(vals) / len(vals)) < 1e-5


def test_bradley_terry_recovers_strength_ramp(spark, sf_dir):
    rows = {r["model"]: r for r in all_queries()["eval_bradley_terry"].fn(spark, sf_dir).collect()}
    assert set(rows) == set(range(8))
    # normalized to mean 1 over 8 arms
    assert abs(sum(r["strength"] for r in rows.values()) - 8.0) < 1e-3
    assert all(r["strength"] > 0 for r in rows.values())
    # the truth ramp s_i = i+1 must separate the extremes decisively
    assert rows[7]["strength"] > rows[0]["strength"] * 2
    assert sorted(r["strength_rank"] for r in rows.values()) == list(range(1, 9))
    # MM is win-consistent: the top-ranked arm has a better win rate
    # than the bottom-ranked arm
    top = min(rows.values(), key=lambda r: r["strength_rank"])
    bot = max(rows.values(), key=lambda r: r["strength_rank"])
    assert top["wins"] / top["n_matches"] > bot["wins"] / bot["n_matches"]


def test_rocchio_prf_expansion_moves_ranking(spark, sf_dir):
    rows = all_queries()["retrieval_rocchio_prf"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    assert sorted(r["rank_after"] for r in rows) == [1, 2, 3, 4, 5]
    # expansion only ADDS half-weight terms: after-score dominates
    assert all(r["score_after"] >= r["score_before"] for r in rows)
    assert any(r["score_after"] > r["score_before"] for r in rows)
    # scores are exact integers and strictly ordered by rank with doc_id ties
    by_rank = sorted(rows, key=lambda r: r["rank_after"])
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a["score_after"], -a["doc_id"]) >= (b["score_after"], -b["doc_id"])


def test_ams_f2_sketch_quality(spark, sf_dir):
    r = all_queries()["sketch_ams_f2"].fn(spark, sf_dir).collect()[0]
    # F2 >= F1 always (sum f^2 >= sum f for integer counts)
    assert r["exact_f2"] >= r["n_items"]
    assert r["n_keys"] > 0 and r["est_f2"] > 0
    # mean of 32 AMS estimators: std ~ sqrt(2/32)*F2 = 25%; 4 sigma bound
    assert r["rel_error"] < 1.0
    assert abs(r["rel_error"] - abs(r["est_f2"] - r["exact_f2"]) / r["exact_f2"]) < 1e-3


def test_holt_smoothing_vs_python(spark, sf_dir):
    r = all_queries()["temporal_holt_smoothing"].fn(spark, sf_dir).collect()[0]
    monthly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("month", F.col("o_orderdate").cast("date")).alias("m"))
        .agg(F.round(F.sum("o_totalprice")).cast("bigint").alias("y"))
        .orderBy("m")
        .collect()
    )
    ys = [row["y"] for row in monthly]
    l, b, e = float(ys[0]), 0.0, 0.0
    for v in ys[1:]:
        err = v - l - b
        l, b, e = l + b + 0.3 * err, b + 0.03 * err, e + abs(err)
    assert r["n_months"] == len(ys)
    assert abs(r["level_smoothed"] - l) < 1e-2
    assert abs(r["trend_smoothed"] - b) < 1e-2
    assert abs(r["one_step_mae"] - e / (len(ys) - 1)) < 1e-2
    # forecasts are linear in h with slope = trend
    assert abs((r["forecast_h2"] - r["forecast_h1"]) - r["trend_smoothed"]) < 1e-3
    assert abs((r["forecast_h3"] - r["forecast_h2"]) - r["trend_smoothed"]) < 1e-3


def test_ols_residual_diagnostics_bounds(spark, sf_dir):
    r = all_queries()["stats_ols_residual_diagnostics"].fn(spark, sf_dir).collect()[0]
    # DW lives in [0, 4]; ~2 means no serial correlation
    assert 0.0 <= r["dw_stat"] <= 4.0
    assert r["positive_autocorr"] == int(r["dw_stat"] < 1.5)
    # BP LM = n * R2_aux with R2 in [0,1]
    assert 0.0 <= r["bp_lm"] <= r["n_days"]
    assert r["heteroscedastic"] == int(r["bp_lm"] > 3.841)
    assert r["n_days"] > 100  # a year's worth of (sparse at small SF) order days


def test_hampel_filter_repairs_only_outliers(spark, sf_dir):
    df = all_queries()["window_hampel_filter"].fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == load_table(spark, sf_dir, "events").count()
    n_out = sum(r["is_outlier"] for r in rows)
    # the despiker must fire somewhere but not rewrite the series
    assert 0 < n_out < len(rows) * 0.2
    for r in rows[:500]:
        assert r["mad7"] >= 0.0
        if r["is_outlier"]:
            assert r["repaired"] == r["med7"]


def test_span_corruption_budget(spark, sf_dir):
    rows = all_queries()["pipeline_span_corruption"].fn(spark, sf_dir).collect()
    assert len(rows) == 20  # one row per source
    tot_tok = sum(r["n_tokens"] for r in rows)
    tot_mask = sum(r["n_masked"] for r in rows)
    # nominal budget is 3/20 = 15%: full blocks mask exactly 3, tail
    # blocks mask 0..3 of fewer tokens, so realized sits in a band around it
    assert 0.10 < tot_mask / tot_tok < 0.20
    for r in rows:
        assert 1.0 <= r["avg_span_len"] <= 3.0
        assert r["n_masked"] <= 3 * r["n_spans"]
        assert r["corruption_rate"] < 0.25


def test_engle_granger_structure(spark, sf_dir):
    r = all_queries()["stats_engle_granger_coint"].fn(spark, sf_dir).collect()[0]
    # rho of a DF regression on a fitted residual lives in (-2, 0] in practice
    assert -2.0 < r["rho"] <= 0.0
    assert r["adf_t"] <= 0.0
    assert r["cointegrated"] == int(r["adf_t"] < -3.34)
    assert r["n_days"] >= 20  # events span ~1 month at sf0.001


def test_best_of_n_scaling_curve(spark, sf_dir):
    rows = {r["n"]: r for r in all_queries()["eval_best_of_n_scaling"].fn(spark, sf_dir).collect()}
    assert set(rows) == {1, 4, 16}
    # order-statistic weights telescope: best-of-1 IS the mean
    assert abs(rows[1]["mean_best_of_n"] - rows[1]["mean_single"]) < 1e-5
    assert abs(rows[1]["mean_gain"]) < 1e-5
    # monotone scaling curve, bounded by the max reward (< 1)
    assert rows[1]["mean_best_of_n"] < rows[4]["mean_best_of_n"] < rows[16]["mean_best_of_n"] < 1.0
    assert rows[16]["mean_gain"] > rows[4]["mean_gain"] > 0.0


def test_parquet_footer_stats_consistency(spark, sf_dir):
    rows = all_queries()["source_parquet_footer_stats"].fn(spark, sf_dir).collect()
    tables = {r["table_name"] for r in rows}
    assert {"lineitem", "orders", "documents", "embeddings", "events"} <= tables
    li = [r for r in rows if r["table_name"] == "lineitem"]
    # footer row counts must equal the actual scan row count
    assert sum(r["n_rows"] for r in li) == load_table(spark, sf_dir, "lineitem").count()
    for r in rows:
        assert r["n_columns"] > 0
        assert r["compressed_bytes"] > 0 and r["uncompressed_bytes"] > 0
        # codec framing overhead can exceed savings on tiny row groups;
        # real ones must compress
        if r["uncompressed_bytes"] > 10_000:
            assert r["compressed_bytes"] <= r["uncompressed_bytes"]


def test_edit_distance_block_bimodal(spark, sf_dir):
    rows = all_queries()["dedup_edit_distance_block"].fn(spark, sf_dir).collect()
    assert rows, "blocking must admit at least the exact-duplicate pairs"
    for r in rows:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["prefix_edit_distance"] <= 25
        assert r["exact_prefix"] == int(r["prefix_edit_distance"] == 0)
    # the corpus' true duplicates surface as distance-0 prefix twins
    assert any(r["exact_prefix"] == 1 for r in rows)


def test_randomized_response_debias(spark, sf_dir):
    r = all_queries()["privacy_randomized_response"].fn(spark, sf_dir).collect()[0]
    assert r["n_users"] > 0
    assert 0 <= r["n_true_pos"] <= r["n_users"]
    # reported rate is pulled toward 1/2 by the coin arm
    assert abs(r["reported_rate"] - 0.5) <= abs(r["true_rate"] - 0.5) + 0.1
    # debias identity and sampling-noise bound (coin flips over n users)
    assert abs(r["debiased_rate"] - (2 * r["reported_rate"] - 0.5)) < 1e-5
    import math

    assert r["debias_abs_err"] < 4 / math.sqrt(r["n_users"])


def test_rouge_ngram_structure(spark, sf_dir):
    rows = {r["n"]: r for r in all_queries()["eval_rouge_ngram"].fn(spark, sf_dir).collect()}
    assert set(rows) == {1, 2}
    for n, r in rows.items():
        assert r["n_pairs"] == 250
        assert 0.0 <= r["mean_recall"] <= 1.0
        assert 0.0 <= r["mean_precision"] <= 1.0
        # F1 is the harmonic mean: bounded by min and max of P/R means
        assert r["mean_f1"] <= max(r["mean_recall"], r["mean_precision"]) + 1e-6
    # bigram overlap can't beat unigram overlap on the same pairs
    assert rows[2]["mean_f1"] <= rows[1]["mean_f1"]


def test_er_blocking_audit_metrics(spark, sf_dir):
    r = all_queries()["er_blocking_audit"].fn(spark, sf_dir).collect()[0]
    assert r["all_pairs"] == r["n_docs"] * (r["n_docs"] - 1) // 2
    assert 0 < r["cand_pairs"] < r["all_pairs"]
    # the whole point of blocking: prune >99% of the pair space
    assert r["reduction_ratio"] > 0.99
    assert 0 <= r["captured_pairs"] <= r["truth_pairs"]
    if r["truth_pairs"]:
        assert abs(r["pair_completeness"] - r["captured_pairs"] / r["truth_pairs"]) < 1e-5
    else:  # no exact twins at this SF: vacuously complete, never NULL
        assert r["pair_completeness"] == 1.0
    # exact text twins share length; only a lang-label mismatch can lose them
    assert r["pair_completeness"] > 0.5


def test_hodges_lehmann_robustness(spark, sf_dir):
    r = all_queries()["stats_hodges_lehmann"].fn(spark, sf_dir).collect()[0]
    n = r["n_days"]
    assert r["n_walsh"] == n * (n + 1) // 2  # self-pairs included
    # HL lies between the plain median and the mean for skewed data,
    # and within the sample range trivially
    lo, hi = min(r["median_x"], r["mean_x"]), max(r["median_x"], r["mean_x"])
    assert lo - abs(r["mean_x"]) * 0.5 <= r["hl_location"] <= hi + abs(r["mean_x"]) * 0.5
    assert abs(r["hl_minus_mean"] - (r["hl_location"] - r["mean_x"])) < 1e-3


def test_bland_altman_limits(spark, sf_dir):
    r = all_queries()["stats_bland_altman"].fn(spark, sf_dir).collect()[0]
    assert r["loa_low"] <= r["bias"] <= r["loa_high"]
    # triangular noise difference: thin tails, but nonzero beyond 1.96 sd
    assert 0.0 < r["frac_outside"] <= 0.15
    # instrument B carries a +$50k calibration offset; SE ~ $800
    assert 45_000 < r["bias"] < 55_000
    assert r["n"] == load_table(spark, sf_dir, "orders").count()


def test_deming_vs_ols_attenuation(spark, sf_dir):
    r = all_queries()["stats_deming_regression"].fn(spark, sf_dir).collect()[0]
    # equal-variance instruments on a shared truth: strong but imperfect r
    assert 0.6 < r["pearson_r"] < 0.98
    # OLS attenuates toward var_t/(var_t+var_n); Deming recovers slope 1
    assert 0.93 < r["slope_deming"] < 1.07
    assert r["slope_ols"] < r["slope_deming"] - 0.03
    assert abs(r["slope_deming"]) >= abs(r["slope_ols"]) - 1e-6


def test_youden_threshold_optimality(spark, sf_dir):
    r = all_queries()["eval_youden_threshold"].fn(spark, sf_dir).collect()[0]
    assert 0 <= r["best_threshold"] <= 256
    assert 0.0 <= r["fpr"] <= r["tpr"] <= 1.0  # above the chance diagonal
    assert abs(r["youden_j"] - (r["tpr"] - r["fpr"])) < 1e-5
    # the informed scorer's optimum must beat chance decisively
    assert r["youden_j"] > 0.3
    assert 0.0 <= r["accuracy"] <= 1.0


def test_kalman_gain_converges_to_riccati_fixpoint(spark, sf_dir):
    import math

    r = all_queries()["temporal_kalman_local_level"].fn(spark, sf_dir).collect()[0]
    # scalar Riccati steady state for the PRIOR variance M = P + Q:
    # M = MR/(M+R) + Q  =>  M* = (Q + sqrt(Q^2 + 4 Q R)) / 2,  K* = M*/(M*+R)
    Q, R = 1e10, 1e12
    m_star = (Q + math.sqrt(Q * Q + 4 * Q * R)) / 2
    k_star = m_star / (m_star + R)
    # P update is a contraction: after a year of days the gain is at the fixpoint
    assert abs(r["steady_gain"] - k_star) < 1e-4
    assert r["variance"] > 0
    assert r["innovation_mae"] > 0
    assert r["n_days"] >= 100


def test_isotonic_calibration_properties(spark, sf_dir):
    rows = sorted(
        all_queries()["stats_isotonic_calibration"].fn(spark, sf_dir).collect(),
        key=lambda r: r["bin"],
    )
    assert len(rows) >= 5
    # fitted curve is monotone nondecreasing in the bin order
    for a, b in zip(rows, rows[1:]):
        assert a["isotonic_rate"] <= b["isotonic_rate"] + 1e-9
    # isotonic regression preserves the weighted mean of the response
    tot_n = sum(r["n"] for r in rows)
    raw = sum(r["n"] * r["observed_rate"] for r in rows) / tot_n
    iso = sum(r["n"] * r["isotonic_rate"] for r in rows) / tot_n
    assert abs(raw - iso) < 1e-4
    # fitted values stay inside the observed range
    lo = min(r["observed_rate"] for r in rows)
    hi = max(r["observed_rate"] for r in rows)
    for r in rows:
        assert lo - 1e-9 <= r["isotonic_rate"] <= hi + 1e-9


def test_lsh_parameter_plan_scurve(spark, sf_dir):
    rows = all_queries()["dedup_lsh_parameter_plan"].fn(spark, sf_dir).collect()
    assert len(rows) == 12
    assert sorted(r["plan_rank"] for r in rows) == list(range(1, 13))
    for r in rows:
        # the S-curve is monotone in s for fixed (b, r)
        assert 0.0 <= r["p_at_50"] <= r["p_at_80"] <= r["p_at_90"] <= 1.0
        assert 0.0 < r["s_threshold"] < 1.0
        assert r["k"] == r["b"] * r["r"]
    import math

    # spot-check the closed form for one config
    r8x4 = next(r for r in rows if r["b"] == 8 and r["r"] == 4)
    assert abs(r8x4["p_at_80"] - (1 - (1 - 0.8**4) ** 8)) < 1e-5
