"""Property tests for the round-5 operator wave (the oracle gate proves
engine parity; these pin the semantic invariants parity can't)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_map_reduce_spark.registry import all_queries
from distributed_map_reduce_spark.sources import load_table


def test_anova_f_and_eta_bounds(spark, sf_dir):
    out = all_queries()["stats_anova_oneway"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_groups"] == 5
    assert r["f_stat"] >= 0
    assert 0.0 <= r["eta_sq"] <= 1.0
    assert r["significant"] in (0, 1)


def test_benjamini_hochberg_step_up_property(spark, sf_dir):
    out = all_queries()["stats_benjamini_hochberg"].fn(spark, sf_dir).collect()
    assert len(out) == 25
    by_rank = sorted(out, key=lambda r: r["bh_rank"])
    assert [r["bh_rank"] for r in by_rank] == list(range(1, 26))
    # p is non-decreasing in rank; rejection is a prefix of the ranking
    ps = [r["p_value"] for r in by_rank]
    assert ps == sorted(ps)
    rejected = [r["rejected"] for r in by_rank]
    assert all(x in (0, 1) for x in rejected)
    if 1 in rejected:
        last = max(i for i, x in enumerate(rejected) if x == 1)
        assert all(x == 1 for x in rejected[: last + 1])
    assert all(0.0 <= p <= 1.0 for p in ps)


def test_permutation_test_p_in_range(spark, sf_dir):
    out = all_queries()["stats_permutation_test"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert 0 <= r["n_extreme"] <= 199
    # add-one smoothing bounds: 1/200 <= p <= 1
    assert 0.005 <= r["p_value"] <= 1.0


def test_jensen_shannon_bounded_bits(spark, sf_dir):
    out = all_queries()["stats_jensen_shannon"].fn(spark, sf_dir).collect()
    assert out
    # JSD in bits is bounded by 1 for any two distributions
    assert all(0.0 <= r["jsd_bits"] <= 1.0 for r in out)
    assert all(r["n_tokens"] > 0 for r in out)


def test_self_bleu_ratio_bounds(spark, sf_dir):
    out = all_queries()["text_self_bleu_diversity"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0.0 <= r["avg_self_bleu2"] <= 1.0
        assert r["n_distinct_bigrams"] >= r["n_docs"]


def test_calendar_proration_conserves_cents_exactly(spark, sf_dir):
    """The largest-remainder allocation must re-sum to the corpus total
    to the exact cent — the property float proration cannot give."""
    out = all_queries()["temporal_calendar_proration"].fn(spark, sf_dir)
    recognized = out.agg(F.sum("recognized_cents")).collect()[0][0]
    li = load_table(spark, sf_dir, "lineitem")
    total = li.agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
    ).collect()[0][0]
    assert recognized == total


def test_contribution_capping_invariants(spark, sf_dir):
    out = all_queries()["privacy_contribution_capping"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["capped_events"] <= r["raw_events"]
        assert r["capped_cents"] <= r["raw_cents"]
        assert r["capped_events"] <= 5 * r["n_users"]
        assert r["capped_cents"] <= 50000 * r["n_users"]
        assert 0.0 <= r["clipped_frac"] <= 1.0
        assert r["n_clipped_users"] <= r["n_users"]


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    """Closed-form 2x2 normal equations must agree with numpy's QR
    least-squares on the same rows (per return flag, to cents/4dp)."""
    import numpy as np

    out = {r["flag"]: r for r in
           all_queries()["stats_ols_two_feature"].fn(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    import collections
    rows = collections.defaultdict(list)
    for r in li:
        rows[r["l_returnflag"]].append(
            (float(r["l_quantity"]), round(r["l_discount"] * 100),
             round(r["l_extendedprice"] * 100))
        )
    for flag, data in rows.items():
        a = np.array([[1.0, x1, x2] for x1, x2, _ in data])
        y = np.array([float(y) for *_, y in data])
        beta = np.linalg.lstsq(a, y, rcond=None)[0]
        assert abs(out[flag]["beta_qty"] - beta[1]) < 1e-2
        assert abs(out[flag]["beta_disc"] - beta[2]) < 1e-2
        assert 0.0 <= out[flag]["r2"] <= 1.0


def test_retention_fit_shape(spark, sf_dir):
    out = all_queries()["stats_retention_decay_fit"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_points"] >= 3
    # retention decays: slope negative, half-life positive and finite
    assert r["decay_slope"] < 0
    assert r["half_life_days"] > 0
    assert 0.0 <= r["fit_r2"] <= 1.0


def test_gumbel_plausible(spark, sf_dir):
    out = all_queries()["stats_extreme_value_gumbel"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["beta_cents"] > 0
    # the 20-day return level sits above the location parameter
    assert r["return_level_20d"] > r["mu_cents"]
    assert 0.0 <= r["p_exceed_hist_max"] <= 1.0


def test_interleaved_assembly_budget_arithmetic(spark, sf_dir):
    out = all_queries()["multimodal_interleaved_assembly"].fn(spark, sf_dir).collect()
    assert out
    docs_total = sum(r["n_docs"] for r in out)
    docs = load_table(spark, sf_dir, "documents")
    assert docs_total == docs.count()
    for r in out:
        # every doc carries 1-3 images
        assert r["n_docs"] <= r["n_images"] <= 3 * r["n_docs"]
        assert 0 <= r["n_fit_8k"] <= r["n_docs"]
        assert 0.0 < r["image_token_share"] < 1.0


def test_asof_arrow_twin_equals_declarative(spark, sf_dir):
    """The cogrouped pandas merge_asof twin must produce exactly the
    declarative as-of join's rows (same oracle, different physical
    strategy — the plan-diversity invariant)."""
    a = all_queries()["asof_purchase_to_click"].fn(spark, sf_dir)
    b = all_queries()["asof_arrow_grouped"].fn(spark, sf_dir)
    cols = ["event_id", "user_id", "purchase_ts",
            "asof_click_ts", "asof_click_value", "lag_seconds"]
    ra = sorted([tuple(r[c] for c in cols) for r in a.select(*cols).collect()])
    rb = sorted([tuple(r[c] for c in cols) for r in b.select(*cols).collect()])
    assert ra == rb


def test_bayes_ab_prob_consistency(spark, sf_dir):
    out = all_queries()["stats_bayes_ab_normal_approx"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert 0.0 <= r["prob_b_beats_a"] <= 1.0
    # direction agrees with the posterior means
    if r["post_mean_b"] > r["post_mean_a"]:
        assert r["prob_b_beats_a"] >= 0.5
    elif r["post_mean_b"] < r["post_mean_a"]:
        assert r["prob_b_beats_a"] <= 0.5


def test_experiment_duration_arithmetic(spark, sf_dir):
    out = all_queries()["stats_experiment_duration"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["days_needed"] >= 1
    assert r["n_required_per_arm"] > 0
    assert 0.0 < r["p_base"] < 1.0
    # days = ceil(2n / rate) within rounding
    import math
    assert r["days_needed"] == math.ceil(
        2 * (2.0 * 7.84 * r["p_base"] * (1 - r["p_base"]) / (0.1 * r["p_base"]) ** 2)
        / (r["n_users"] / r["n_days"])
    )


def test_capture_recapture_bounds(spark, sf_dir):
    out = all_queries()["stats_capture_recapture"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    observed_union = (r["n_first_half"] + r["n_second_half"] - r["n_both"])
    # Chapman estimate can never be below the observed union
    assert r["chapman_estimate"] >= r["n_both"]
    assert r["est_unseen_users"] >= -1.0  # floor rounding slack
    assert r["chapman_estimate"] >= observed_union - 1


def test_term_burst_scores(spark, sf_dir):
    out = all_queries()["text_term_burst"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["total"] >= 50
        assert r["peak"] <= r["total"]
        assert r["is_burst"] in (0, 1)
        if r["is_burst"]:
            assert r["burst_z"] > 2.0
        # peak is at least the daily mean, so z >= 0
        assert r["burst_z"] >= 0.0


def test_mmr_diversity_property(spark, sf_dir):
    """MMR picks must be distinct, rank-1 is pure 0.7*sim, and later
    scores stay within the penalty band 0.7*sim ± 0.3 (pair cosine is
    in [-1, 1], so the penalty can add as well as subtract)."""
    out = all_queries()["similarity_mmr_rerank"].fn(spark, sf_dir).collect()
    assert len(out) == 4
    ids = [r["vec_id"] for r in out]
    assert len(set(ids)) == 4
    by_rank = sorted(out, key=lambda r: r["pick_rank"])
    assert abs(by_rank[0]["mmr_score"] - 0.7 * by_rank[0]["sim_to_query"]) < 1e-6
    for r in by_rank[1:]:
        assert abs(r["mmr_score"] - 0.7 * r["sim_to_query"]) <= 0.3 + 1e-9


def test_importance_reweight_ess_bounds(spark, sf_dir):
    out = all_queries()["sample_importance_reweight"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    # ESS is at most n (uniform weights) and at least 1
    assert 1.0 <= r["ess"] <= r["n_events"]
    assert 0.0 < r["ess_frac"] <= 1.0
    assert r["reweighted_mean_cents"] > 0


def test_audio_framing_arithmetic(spark, sf_dir):
    out = all_queries()["multimodal_audio_framing"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        # 8x stacking: tokens within [frames/8, frames/8 + 1)
        assert r["total_audio_tokens"] >= r["total_frames"] / 8.0
        assert r["total_audio_tokens"] < r["total_frames"] / 8.0 + r["n_clips"]
        assert 0 <= r["n_fit_30s"] <= r["n_clips"]


def test_krippendorff_alpha_range(spark, sf_dir):
    out = all_queries()["stats_krippendorff_alpha"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    # 70% label fidelity must yield clear above-chance agreement
    assert 0.1 < r["alpha"] <= 1.0
    assert r["d_expected"] > r["d_observed"] > 0


def test_stitch_recovers_every_split(spark, sf_dir):
    out = all_queries()["text_suffix_prefix_stitch"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_eligible = docs.filter(
        F.size(F.split(F.lower("text"), " ")) >= 12
    ).count()
    same_doc = [r for r in out if r["same_doc"] == 1]
    # every in-doc split is recovered as (chunk 2d -> chunk 2d+1);
    # cross-doc accidents (same_doc=0) may pair arbitrary chunks
    assert sum(1 for r in same_doc
               if r["head_chunk"] == r["tail_chunk"] + 1) == n_eligible


def test_markov_absorption_monotone_and_bounded(spark, sf_dir):
    out = all_queries()["stats_markov_absorption"].fn(spark, sf_dir).collect()
    assert out
    by_state = {r["state"]: r for r in out}
    assert by_state["purchase"]["p_convert_8"] == 1.0
    for r in out:
        assert 0.0 <= r["p_convert_8"] <= 1.0
        if r["state"] != "purchase":
            assert r["n_out_transitions"] > 0


def test_power_iteration_matches_numpy_eig(spark, sf_dir):
    """The 16-step power iteration's Rayleigh quotient must land near
    (and never above) numpy's exact top eigenvalue of the same
    (4dp-rounded) Gram."""
    import numpy as np

    out = all_queries()["similarity_power_iteration_pca"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    emb = load_table(spark, sf_dir, "embeddings").select("embedding").collect()
    x = np.array([row["embedding"] for row in emb], dtype=np.float64)
    gram = np.round(x.T @ x, 4)
    eig = np.linalg.eigvalsh(gram)[-1]
    assert r["dim"] == x.shape[1]
    # the k-step Rayleigh quotient is a guaranteed LOWER bound on the
    # top eigenvalue; with this spectrum's small gap 16 steps land
    # within ~5% (convergence rate (lambda2/lambda1)^2k)
    assert 0.9 * eig <= r["lambda1"] <= eig * 1.0000001
    assert 0.0 < r["explained_frac"] <= 1.0


def test_subject_access_cascade_consistent(spark, sf_dir):
    out = all_queries()["privacy_subject_access_export"].fn(spark, sf_dir).collect()
    assert out
    by = {}
    for r in out:
        by.setdefault(r["subject"], {})[r["source_table"]] = r
    for subject, tables in by.items():
        # lineitem rows only exist through the orders cascade
        if "lineitem" in tables:
            assert "orders" in tables
            assert tables["lineitem"]["n_rows"] >= tables["orders"]["n_rows"]
        for r in tables.values():
            assert r["min_key"] <= r["max_key"]
            assert r["n_rows"] >= 1


def test_calibration_bins_partition_users(spark, sf_dir):
    out = all_queries()["eval_calibration_brier"].fn(spark, sf_dir).collect()
    assert out
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r["n"] for r in out) == n_users
    for r in out:
        assert 0 <= r["bin"] <= 9
        assert 0.0 <= r["mean_predicted"] <= 1.0
        assert 0.0 <= r["observed_rate"] <= 1.0
        assert 0.0 <= r["brier_contrib"] <= 1.0
        # bin membership: mean prediction falls inside the decile
        assert r["bin"] / 10.0 - 1e-9 <= r["mean_predicted"] <= (r["bin"] + 1) / 10.0 + 1e-9


def test_overdispersion_index_positive(spark, sf_dir):
    out = all_queries()["stats_negbinom_overdispersion"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["mean_daily"] > 0
        assert r["var_daily"] >= 0
        assert r["dispersion_index"] >= 0
        if r["dispersion_index"] > 1:
            assert r["nb_r_estimate"] > 0
        else:
            assert r["nb_r_estimate"] == 0.0


def test_did_identity(spark, sf_dir):
    """DiD must equal (T_post - T_pre) - (C_post - C_pre) from its own
    emitted cell means, and differ from both naive estimators by the
    confound each one absorbs."""
    out = all_queries()["stats_diff_in_diff"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    did = (r["treated_post"] - r["treated_pre"]) - (
        r["control_post"] - r["control_pre"]
    )
    assert abs(r["did_estimate"] - did) < 1e-3
    time_trend = r["control_post"] - r["control_pre"]
    assert abs(r["naive_before_after"] - r["did_estimate"] - time_trend) < 1e-3


def test_code_detect_partitions(spark, sf_dir):
    out = all_queries()["text_code_detect"].fn(spark, sf_dir).collect()
    assert out
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in out) == docs.count()
    for r in out:
        assert 0 <= r["n_code_docs"] <= r["n_docs"]
        assert 0.0 <= r["code_frac"] <= 1.0
        assert r["avg_sym_pct"] >= 0.0


def test_tost_directional_consistency(spark, sf_dir):
    out = all_queries()["stats_tost_equivalence"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["std_err"] > 0
    # equivalence requires BOTH one-sided z's over the cut
    assert r["equivalent"] == int(r["z_lower"] > 1.645 and r["z_upper"] > 1.645)
    # the margin bounds the detectable diff when equivalent
    if r["equivalent"]:
        assert abs(r["diff"]) < 0.05


def test_key_discovery_known_schema(spark, sf_dir):
    out = {(r["object"], r["probe"]): r for r in
           all_queries()["profile_key_discovery"].fn(spark, sf_dir).collect()}
    # primary keys verify; FK columns don't
    assert out[("orders.o_orderkey", "uniqueness")]["verdict"] == 1
    assert out[("customer.c_custkey", "uniqueness")]["verdict"] == 1
    assert out[("orders.o_custkey", "uniqueness")]["verdict"] == 0
    assert out[("lineitem.l_orderkey", "uniqueness")]["verdict"] == 0
    # referential integrity holds in the fixtures
    assert out[("orders.o_custkey->customer.c_custkey", "fk_containment")]["verdict"] == 1
    assert out[("lineitem.l_orderkey->orders.o_orderkey", "fk_containment")]["verdict"] == 1


def test_t_closeness_bounds(spark, sf_dir):
    out = all_queries()["privacy_t_closeness"].fn(spark, sf_dir).collect()
    assert out
    cust = load_table(spark, sf_dir, "customer")
    assert sum(r["class_size"] for r in out) == cust.count()
    for r in out:
        # total variation distance lives in [0, 1]
        assert 0.0 <= r["t_distance"] <= 1.0
        assert r["violates_t"] == int(r["t_distance"] > 0.3)


def test_assortativity_in_range(spark, sf_dir):
    out = all_queries()["graph_degree_assortativity"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_directed_edges"] > 0 and r["n_directed_edges"] % 2 == 0
    if r["assortativity"] is not None:
        assert -1.0 <= r["assortativity"] <= 1.0
    assert r["mean_edge_degree"] >= 1.0


def test_shard_mix_chi2_healthy(spark, sf_dir):
    out = all_queries()["pipeline_shard_mix_audit"].fn(spark, sf_dir).collect()
    assert len(out) == 16
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in out) == docs.count()
    for r in out:
        assert r["chi2"] >= 0.0
        # a working hash shuffle keeps chi2 within a loose multiple of df
        assert r["chi2"] < 10 * (r["n_sources"] - 1) + 30


def test_instruction_dedup_keeper_rule(spark, sf_dir):
    out = all_queries()["pipeline_instruction_dedup"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["n_variants"] >= 2
        assert r["keeper_response_tokens"] >= 0
        assert len(r["instruction_key"].split(" ")) <= 8


def test_local_maxima_are_peaks(spark, sf_dir):
    out = all_queries()["window_local_maxima"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    daily = {
        r["day"]: r["cents"]
        for r in ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.round(F.sum("value") * 100).cast("bigint").alias("cents"))
        .collect()
    }
    days = sorted(daily)
    for r in out:
        i = days.index(r["day"])
        shoulders = days[max(0, i - 3):i] + days[i + 1:i + 4]
        assert all(daily[r["day"]] > daily[d] for d in shoulders)
        assert r["prominence_cents"] > 0


def test_ratio_delta_method_sane(spark, sf_dir):
    out = all_queries()["stats_ratio_delta_method"].fn(spark, sf_dir).collect()
    assert len(out) == 2
    for r in out:
        assert r["cents_per_event"] > 0
        assert r["delta_se"] >= 0
        # SE is small relative to the ratio at these sample sizes
        assert r["delta_se"] < r["cents_per_event"]


def test_rank_metrics_bounds_and_consistency(spark, sf_dir):
    out = all_queries()["eval_rank_metrics_ndcg"].fn(spark, sf_dir).collect()
    assert len(out) == 8
    for r in out:
        assert 0.0 <= r["ndcg_at_10"] <= 1.0
        assert 0.0 <= r["mrr_at_10"] <= 1.0
        assert 0.0 <= r["precision_at_5"] <= 1.0
        # a hit in the top-5 implies a reciprocal rank of at least 1/5... no:
        # precision@5 > 0 implies first_rel <= 5 -> mrr >= 1/5
        if r["precision_at_5"] > 0:
            assert r["mrr_at_10"] >= 1.0 / 5 - 1e-9


def test_qini_random_score_near_diagonal(spark, sf_dir):
    out = all_queries()["stats_qini_uplift_deciles"].fn(spark, sf_dir).collect()
    assert len(out) == 10
    by_dec = sorted(out, key=lambda r: r["dec"])
    total_users = sum(r["n_t"] + r["n_c"] for r in out)
    ev = load_table(spark, sf_dir, "events")
    assert total_users == ev.select("user_id").distinct().count()
    # cumulative qini is monotone in accumulation steps only if uplift
    # stays positive — just pin bounds and decile sizes here
    for r in out:
        assert -1.0 <= r["uplift"] <= 1.0
        assert r["c_t"] <= r["n_t"] and r["c_c"] <= r["n_c"]


def test_mixture_em_separates_components(spark, sf_dir):
    out = all_queries()["stats_mixture_em_gaussian"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert 0.0 < r["weight1"] < 1.0
    assert r["sigma1_cents"] >= 1.0 and r["sigma2_cents"] >= 1.0
    # initialization orders the components low/high; EM keeps them
    # ordered on this data
    assert r["mu1_cents"] <= r["mu2_cents"]


def test_modularity_bounds(spark, sf_dir):
    out = all_queries()["graph_modularity_score"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    # Q is bounded by [-1/2, 1); a min-label partition of near-dup
    # clusters should be assortative (positive)
    assert -0.5 <= r["modularity"] < 1.0
    assert r["modularity"] > 0
    assert r["n_communities"] >= 1
    assert r["n_edges"] >= r["n_communities"]


def test_perplexity_exceeds_unigram_floor(spark, sf_dir):
    out = all_queries()["text_bigram_perplexity"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_test_bigrams"] > 0
    # perplexity == exp(avg_nll) by construction
    import math
    assert abs(r["perplexity"] - math.exp(r["avg_nll"])) < 1e-2
    # bounded below by 1 and above by the smoothed vocab size
    assert 1.0 < r["perplexity"] < 10000


def test_snapshot_read_subset_of_head(spark, sf_dir):
    """Every snapshot row's version must be <= the snapshot seq, and a
    key live at the snapshot either survives to HEAD or was later
    deleted/overwritten — snapshot state is never newer than HEAD."""
    snap = all_queries()["kv_snapshot_read_asof"].fn(spark, sf_dir).collect()
    assert snap
    s = snap[0]["snapshot_seq"]
    for r in snap:
        assert r["version_seq"] <= s
    head = {r["key"]: r["value"] for r in
            all_queries()["kv_cdc_tombstone_apply"].fn(spark, sf_dir).collect()}
    # keys unchanged after the snapshot hold their value at HEAD
    ev = load_table(spark, sf_dir, "events")
    changed_after = {
        str(r["user_id"])
        for r in ev.filter(F.col("event_id") > s).select("user_id").distinct().collect()
    }
    for r in snap:
        if r["key"] not in changed_after:
            assert head.get(r["key"]) == r["value_asof"]


def test_elasticity_regimes_labeled(spark, sf_dir):
    out = all_queries()["stats_price_elasticity"].fn(spark, sf_dir).collect()
    assert len(out) == 3
    for r in out:
        assert 0.0 <= r["r2"] <= 1.0
        if r["elasticity"] < -1.0:
            assert r["regime"] == "elastic"
        elif r["elasticity"] < 0.0:
            assert r["regime"] == "inelastic"
        else:
            assert r["regime"] == "non-negative"


def test_hurst_in_plausible_band(spark, sf_dir):
    out = all_queries()["stats_hurst_rs"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    # R/S grows with block size for any real series
    assert r["rs_w5"] < r["rs_w15"]
    # H mathematically lives in [0, 1] (estimation noise tolerated)
    assert -0.2 <= r["hurst_exponent"] <= 1.2


def test_hot_cold_split_equals_plain_join(spark, sf_dir):
    """The hot/cold union must equal the plain join aggregate exactly
    (the oracle asserts this too; here we also pin the hot flag)."""
    out = all_queries()["join_hot_cold_split"].fn(spark, sf_dir).collect()
    assert out
    o = load_table(spark, sf_dir, "orders")
    counts = {r["o_custkey"]: r["cnt"] for r in
              o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    for r in out:
        assert r["is_hot"] == int(counts[r["o_custkey"]] > 20)
        assert r["n_orders"] == counts[r["o_custkey"]]


def test_fixedwidth_roundtrip_totals(spark, sf_dir):
    out = all_queries()["source_fixedwidth_parse"].fn(spark, sf_dir).collect()
    assert out
    cust = load_table(spark, sf_dir, "customer")
    n = cust.count()
    assert sum(r["n_rows"] for r in out) == n
    total = cust.agg(
        F.sum(F.round(F.col("c_acctbal") * 100).cast("bigint"))
    ).collect()[0][0]
    assert sum(r["total_cents"] for r in out) == total


def test_blocklist_density_gate(spark, sf_dir):
    out = all_queries()["pipeline_blocklist_filter"].fn(spark, sf_dir).collect()
    assert out
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in out) == docs.count()
    for r in out:
        assert 0 <= r["n_blocked"] <= r["n_docs"]
        assert 0.0 <= r["block_rate"] <= 1.0
        # density gate: if nothing hit, nothing blocked
        if r["total_hits"] == 0:
            assert r["n_blocked"] == 0


def test_self_excitation_counts_consistent(spark, sf_dir):
    out = all_queries()["events_self_excitation"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    ev = load_table(spark, sf_dir, "events")
    assert r["n_triggers"] == ev.filter(F.col("event_type") == "purchase").count()
    assert r["n_follow"] >= 0 and r["n_placebo"] >= 0
    assert r["self_exciting"] in (0, 1)
    if r["n_placebo"] > 0:
        assert abs(
            r["excitation_ratio"] - round(r["n_follow"] / r["n_placebo"], 4)
        ) < 1e-9


def test_stream_dynamic_gap_equals_batch(spark, sf_dir):
    """The append-mode dynamic-gap stream, fully flushed, must equal the
    batch dynamic-gap sessionization row-for-row."""
    batch = all_queries()["events_session_dynamic_gap"].fn(spark, sf_dir)
    stream = all_queries()["stream_session_dynamic_gap_flush"].fn(spark, sf_dir)
    cols = ["user_id", "session_start", "n_events", "session_value"]
    b = sorted(tuple(r[c] for c in cols) for r in batch.select(*cols).collect())
    s = sorted(tuple(r[c] for c in cols) for r in stream.select(*cols).collect())
    assert b == s


def test_pettitt_u_bounds(spark, sf_dir):
    out = all_queries()["stats_pettitt_changepoint"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    n = r["n_days"]
    # |U| is bounded by the number of cross-split pairs
    assert abs(r["u_stat"]) <= n * (n - 1) / 2
    assert 0.0 <= r["p_approx"] <= 2.0
    assert r["significant"] == int(r["p_approx"] < 0.05)


def test_ewma_chart_recursion_identity(spark, sf_dir):
    """Closed-form weighted sum must equal the recursive EWMA replayed
    in Python, and limits must widen monotonically to the asymptote."""
    out = sorted(
        all_queries()["stats_ewma_control_chart"].fn(spark, sf_dir).collect(),
        key=lambda r: r["day"],
    )
    assert out
    xs = [r["cents"] for r in out]
    mu0 = sum(xs) / len(xs)
    z = mu0
    for r, x in zip(out, xs):
        z = 0.3 * x + 0.7 * z
        assert abs(r["ewma"] - z) < 1.0  # cents-scale values, 4dp rounding
    widths = [r["ucl"] - r["lcl"] for r in out]
    assert all(w2 >= w1 - 1e-6 for w1, w2 in zip(widths, widths[1:]))


def test_kruskal_wallis_vs_scipy_formula(spark, sf_dir):
    """H must match a direct Python recomputation on the same data."""
    out = all_queries()["stats_kruskal_wallis"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    ).collect()
    import collections
    vals = [(row["o_orderpriority"], row["c"]) for row in o]
    ranks = {}
    s = sorted(v for _, v in vals)
    # average ranks with ties
    pos = {}
    for i, v in enumerate(s, 1):
        pos.setdefault(v, []).append(i)
    avg = {v: sum(ps) / len(ps) for v, ps in pos.items()}
    groups = collections.defaultdict(list)
    for gname, v in vals:
        groups[gname].append(avg[v])
    n = len(vals)
    h = 12.0 / (n * (n + 1)) * sum(
        (sum(rs)) ** 2 / len(rs) for rs in groups.values()
    ) - 3 * (n + 1)
    ties = collections.Counter(v for _, v in vals)
    tie_term = sum(t**3 - t for t in ties.values() if t > 1)
    h /= 1 - tie_term / (n**3 - n)
    assert abs(r["h_stat"] - h) < 1e-2
    assert r["significant"] == int(h > 9.488)


def test_obf_monitoring_sheet(spark, sf_dir):
    out = sorted(
        all_queries()["stats_obf_group_sequential"].fn(spark, sf_dir).collect(),
        key=lambda r: r["look"],
    )
    assert [r["look"] for r in out] == [1, 2, 3, 4]
    # information accrues monotonically; boundary shrinks monotonically
    ns = [r["n_users"] for r in out]
    assert ns == sorted(ns)
    bs = [r["obf_boundary"] for r in out]
    assert bs == sorted(bs, reverse=True)
    assert abs(bs[-1] - 2.024) < 1e-6
    for r in out:
        assert r["crossed"] == int(abs(r["z_score"]) > r["obf_boundary"])


def test_meta_analysis_pooled_within_segment_range(spark, sf_dir):
    out = all_queries()["stats_meta_analysis_pooled"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert 0.0 < r["pooled_rate"] < 1.0
    assert r["pooled_se"] > 0
    assert r["q_heterogeneity"] >= 0
    assert 0.0 <= r["i_squared"] < 1.0
    # the pooled rate lies inside the convex hull of segment rates
    nat = (
        load_table(spark, sf_dir, "orders")
        .join(load_table(spark, sf_dir, "customer"),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            (F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0))
             / F.count(F.lit(1))).alias("p")
        )
        .collect()
    )
    ps = [row["p"] for row in nat if 0 < row["p"] < 1]
    assert min(ps) <= r["pooled_rate"] <= max(ps)
