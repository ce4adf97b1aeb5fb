"""Property tests for the late round-5 operator waves (the oracle gate
proves engine parity; these pin the semantic invariants parity can't)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_map_reduce_spark.registry import all_queries
from distributed_map_reduce_spark.sources import load_table


def test_spearman_bounds_and_direction(spark, sf_dir):
    out = all_queries()["stats_spearman_corr"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert -1.0 <= r["rho"] <= 1.0
    # order value and total quantity are strongly positively associated
    assert r["rho"] > 0.5
    assert r["significant"] == 1
    assert r["n_orders"] > 100


def test_spearman_matches_python_recompute(spark, sf_dir):
    """rho must match a direct Python rank-and-corr on the same pairs."""
    r = all_queries()["stats_spearman_corr"].fn(spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100
                )
            )
            .cast("bigint")
            .alias("x"),
            F.sum("l_quantity").cast("bigint").alias("y"),
        )
        .collect()
    )

    def avg_ranks(vals):
        pos = {}
        for i, v in enumerate(sorted(vals), 1):
            pos.setdefault(v, []).append(i)
        return {v: sum(ps) / len(ps) for v, ps in pos.items()}

    xs = [p["x"] for p in pairs]
    ys = [p["y"] for p in pairs]
    rx_map, ry_map = avg_ranks(xs), avg_ranks(ys)
    rx = [rx_map[v] for v in xs]
    ry = [ry_map[v] for v in ys]
    n = len(pairs)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    assert abs(r["rho"] - num / den) < 1e-4


def test_ljung_box_monotone_q_and_consistent_flags(spark, sf_dir):
    out = sorted(
        all_queries()["stats_ljung_box"].fn(spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in out] == [1, 2, 3, 4, 5]
    qs = [r["q_stat"] for r in out]
    # Q is a cumulative sum of non-negative terms
    assert all(b >= a - 1e-9 for a, b in zip(qs, qs[1:]))
    assert all(q >= 0 for q in qs)
    assert all(-1.0 <= r["acf"] <= 1.0 for r in out)
    crit = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.07}
    for r in out:
        assert r["significant"] == int(r["q_stat"] > crit[r["k"]])


def test_jarque_bera_rejects_uniform_quantity(spark, sf_dir):
    out = all_queries()["stats_jarque_bera"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    # l_quantity is uniform on 1..50: near-zero skew, platykurtic
    assert abs(r["skewness"]) < 0.2
    assert -1.5 < r["excess_kurtosis"] < -0.8
    assert r["jb_stat"] > 5.991 and r["significant"] == 1


def test_cramers_v_bounds_and_dof(spark, sf_dir):
    out = all_queries()["stats_cramers_v"].fn(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    assert r["dof"] == 8  # keeps the hardcoded 15.507 critical value honest
    assert 0.0 <= r["cramers_v"] <= 1.0
    assert r["chi2"] >= 0.0
    assert r["significant"] == int(r["chi2"] > 15.507)


def test_levene_w_matches_anova_on_absdevs(spark, sf_dir):
    """W must equal a direct Python one-way-ANOVA on |x - groupmean|."""
    r = all_queries()["stats_levene_test"].fn(spark, sf_dir).collect()[0]
    rows = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("g"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
        )
        .collect()
    )
    import collections

    groups = collections.defaultdict(list)
    for row in rows:
        groups[row["g"]].append(row["x"])
    zs = {}
    for g, xs in groups.items():
        m = sum(xs) / len(xs)
        zs[g] = [abs(x - m) for x in xs]
    n = sum(len(v) for v in zs.values())
    k = len(zs)
    zbar = sum(sum(v) for v in zs.values()) / n
    between = sum(len(v) * (sum(v) / len(v) - zbar) ** 2 for v in zs.values())
    within = sum(
        sum((z - sum(v) / len(v)) ** 2 for z in v) for v in zs.values()
    )
    w = (n - k) / (k - 1) * between / within
    assert abs(r["w_stat"] - w) < 1e-2
    assert r["n_rows"] == n and r["k_groups"] == k


def test_mantel_haenszel_matches_python_recompute(spark, sf_dir):
    out = all_queries()["stats_mantel_haenszel"].fn(spark, sf_dir).collect()
    assert len(out) == 3
    mh = {r["or_mh"] for r in out}
    assert len(mh) == 1  # pooled value repeated per stratum
    (pooled,) = mh
    assert all(r["n_s"] > 0 for r in out)
    # replay the per-user collapse and the MH weighting in Python
    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") >= 150),
                    1,
                ).otherwise(0)
            ).alias("outcome")
        )
        .collect()
    )
    cells = {}
    for r in rows:
        uid = r["user_id"]
        key = (uid // 2) % 3
        a, b, c, d = cells.setdefault(key, [0, 0, 0, 0])
        idx = (1 - uid % 2) * 2 + (1 - r["outcome"])
        cells[key][idx] += 1
    num = sum(
        (a * d) / (a + b + c + d) for a, b, c, d in cells.values()
    )
    den = sum(
        (b * c) / (a + b + c + d) for a, b, c, d in cells.values()
    )
    expect = num / den if den > 0 else 0.0
    assert abs(pooled - expect) < 1e-3
    by_stratum = {r["stratum"]: r for r in out}
    for k, (a, b, c, d) in cells.items():
        assert by_stratum[k]["exposed_cases"] == a
        assert by_stratum[k]["unexposed_cases"] == c
        expect_or = (a * d) / (b * c) if b * c > 0 else 0.0
        assert abs(by_stratum[k]["or_stratum"] - expect_or) < 1e-3


def test_bm25_ranking_properties(spark, sf_dir):
    out = sorted(
        all_queries()["text_bm25_topk"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rnk"],
    )
    assert 0 < len(out) <= 20
    assert [r["rnk"] for r in out] == list(range(1, len(out) + 1))
    scores = [r["bm25"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # saturation: bm25 term contribution is bounded by idf*(k1+1)
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    import math

    max_possible = 3 * math.log(1 + (n - 0.5) / 0.5) * 2.2
    assert all(s < max_possible for s in scores)


def test_hybrid_rrf_fuses_both_rankings(spark, sf_dir):
    out = sorted(
        all_queries()["retrieval_hybrid_rrf"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rnk"],
    )
    assert len(out) == 20
    for r in out:
        expect = 1.0 / (60 + r["rank_lex"]) + 1.0 / (60 + r["rank_vec"])
        assert abs(r["rrf_score"] - expect) < 1e-5
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # the probe embedding (vec_id 0) must rank first on the vector side
    probe = [r for r in out if r["doc_id"] == 0]
    if probe:
        assert probe[0]["rank_vec"] == 1


def test_readability_identities(spark, sf_dir):
    out = all_queries()["text_readability_scores"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["n_docs"] > 0
        # the fixed 15-word segmenter bounds words/sentence at 15
        assert 0 < r["words_per_sentence"] <= 15.0
        assert r["syllables_per_word"] > 0
        expect = 206.835 - 1.015 * r["words_per_sentence"] - 84.6 * r[
            "syllables_per_word"
        ]
        assert abs(r["flesch"] - expect) < 1e-2
        assert r["lix"] >= r["words_per_sentence"] - 1e-9


def test_token_fertility_identities(spark, sf_dir):
    out = all_queries()["text_token_fertility"].fn(spark, sf_dir).collect()
    assert len(out) >= 3  # several languages present
    for r in out:
        # a 4-char chunker emits at least one token per word
        assert r["fertility"] >= 1.0
        # and never more than one token per character
        assert 1.0 <= r["chars_per_token"] <= 4.0
        assert r["subtokens"] >= r["words"]


def test_peak_concurrency_bounds(spark, sf_dir):
    out = all_queries()["events_peak_concurrency"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        # peak concurrency is at least 1 and never exceeds users present
        assert 1 <= r["max_concurrent"] <= r["n_users"]
        assert r["peak_ts"] is not None
    # peak_ts falls on its own day
    for r in out:
        assert r["peak_ts"].date() == r["day"]


def test_nelson_aalen_vs_kaplan_meier(spark, sf_dir):
    na = sorted(
        all_queries()["stats_nelson_aalen"].fn(spark, sf_dir).collect(),
        key=lambda r: r["t_days"],
    )
    km = sorted(
        all_queries()["stats_kaplan_meier"].fn(spark, sf_dir).collect(),
        key=lambda r: r["t_days"],
    )
    assert na
    # same subjects frame: identical event times, risk sets, death counts
    assert [(r["t_days"], r["n_risk"], r["n_deaths"]) for r in na] == [
        (r["t_days"], r["n_risk"], r["n_deaths"]) for r in km
    ]
    hs = [r["cum_hazard"] for r in na]
    assert all(b >= a - 1e-9 for a, b in zip(hs, hs[1:]))  # H non-decreasing
    # Breslow S = exp(-H) >= KM product-limit S everywhere (standard bound)
    for rna, rkm in zip(na, km):
        assert rna["breslow_survival"] >= rkm["survival"] - 1e-6


def test_weekly_churn_partition(spark, sf_dir):
    out = all_queries()["events_weekly_churn"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["retained_users"] + r["churned_users"] == r["active_users"]
        assert 0.0 <= r["churn_rate"] <= 1.0
        expect = r["churned_users"] / r["active_users"]
        assert abs(r["churn_rate"] - expect) < 1e-3
    # the final observed week is censored out
    wk = (
        load_table(spark, sf_dir, "events")
        .select(F.date_trunc("week", "ts").cast("date").alias("w"))
        .agg(F.max("w"))
        .collect()[0][0]
    )
    assert all(r["week"] < wk for r in out)


def test_herfindahl_bounds(spark, sf_dir):
    r = all_queries()["stats_herfindahl_index"].fn(spark, sf_dir).collect()[0]
    n = r["n_firms"]
    assert n > 1
    assert 1.0 / n - 1e-9 <= r["hhi"] <= 1.0
    assert 0.0 <= r["hhi_normalized"] <= 1.0
    assert 1.0 <= r["effective_n"] <= n + 1e-9


def test_curriculum_schedule_total_order(spark, sf_dir):
    out = sorted(
        all_queries()["pipeline_curriculum_order"].fn(spark, sf_dir).collect(),
        key=lambda r: r["curriculum_rank"],
    )
    assert out
    assert [r["curriculum_rank"] for r in out] == list(range(1, len(out) + 1))
    diffs = [r["difficulty"] for r in out]
    assert diffs == sorted(diffs)
    cum = 0
    for r in out:
        cum += r["total_tokens"]
        assert r["cum_tokens"] == cum


def test_collapse_audit_identity_vs_bruteforce(spark, sf_dir):
    """The sum-vector identity must equal brute-force mean pairwise
    cosine (unit-norm vectors) for every label."""
    out = {
        r["label"]: r
        for r in all_queries()["similarity_collapse_audit"].fn(spark, sf_dir).collect()
    }
    assert out
    vecs = (
        load_table(spark, sf_dir, "embeddings")
        .select("label", F.col("embedding").cast("array<double>").alias("v"))
        .collect()
    )
    import collections

    by_label = collections.defaultdict(list)
    for r in vecs:
        by_label[r["label"]].append(r["v"])
    for lbl, vs in by_label.items():
        n = len(vs)
        if n < 2:
            assert lbl not in out or out[lbl]["n_vectors"] == n
            continue
        s = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                s += sum(a * b for a, b in zip(vs[i], vs[j]))
        mean = 2 * s / (n * (n - 1))
        assert abs(out[lbl]["mean_pairwise_cosine"] - mean) < 1e-4
        assert out[lbl]["n_vectors"] == n


def test_schema_drift_sheet_shape(spark, sf_dir):
    out = {r["metric"]: r for r in all_queries()["profile_schema_drift"].fn(spark, sf_dir).collect()}
    assert set(out) == {
        "row_count",
        "price_mean",
        "price_null_frac",
        "status_ndv",
        "priority_ndv",
        "custkey_ndv",
    }
    for r in out.values():
        if r["val_old"] != 0.0:
            expect = (r["val_new"] - r["val_old"]) / r["val_old"]
            assert abs(r["rel_change"] - expect) < 1e-4
            assert r["drifted"] == int(abs(expect) > 0.1)
    # priorities/statuses are closed vocabularies: no cardinality drift —
    # provided both snapshot halves actually contain rows
    rc = out["row_count"]
    if rc["val_old"] > 0 and rc["val_new"] > 0:
        assert out["priority_ndv"]["drifted"] == 0
        assert out["status_ndv"]["drifted"] == 0


def test_stickiness_bounds(spark, sf_dir):
    out = all_queries()["events_dau_mau_stickiness"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        assert 0.0 < r["stickiness"] <= 1.0
        assert r["dau_avg"] <= r["mau"] + 1e-9
        assert r["active_days"] >= 1


def test_theil_decomposition_identity(spark, sf_dir):
    r = all_queries()["stats_theil_index"].fn(spark, sf_dir).collect()[0]
    assert r["theil_total"] >= 0
    assert r["theil_within"] >= 0
    # T = T_within + T_between (additive decomposability)
    assert abs(r["theil_total"] - (r["theil_within"] + r["theil_between"])) < 1e-3
    assert 0.0 <= r["between_share"] <= 1.0 + 1e-9


def test_mom_growth_nulls_and_identities(spark, sf_dir):
    out = sorted(
        all_queries()["temporal_mom_growth"].fn(spark, sf_dir).collect(),
        key=lambda r: r["month"],
    )
    assert out
    assert out[0]["mom_growth"] is None  # first month has no base
    for i in range(1, len(out)):
        prev, cur = out[i - 1], out[i]
        if cur["mom_growth"] is not None and prev["cents"] > 0:
            expect = (cur["cents"] - prev["cents"]) / prev["cents"]
            assert abs(cur["mom_growth"] - expect) < 1e-4
    # yoy defined only once 12 months of history exist
    for i, r in enumerate(out):
        if i < 12:
            assert r["yoy_growth"] is None or len(out) <= 12


def test_position_attribution_mass_balance(spark, sf_dir):
    out = all_queries()["events_attribution_position"].fn(spark, sf_dir).collect()
    assert out
    import collections

    by_p = collections.defaultdict(list)
    for r in out:
        by_p[r["purchase_id"]].append(r)
    for pid, rows in by_p.items():
        n = rows[0]["n_touches"]
        assert len(rows) == n
        assert sorted(r["pos"] for r in rows) == list(range(1, n + 1))
        total = sum(r["credit"] for r in rows)
        # credits sum to the purchase value (4dp rounding slack per touch)
        ref = max(r["credit"] for r in rows)
        assert total > 0
        if n >= 3:
            first = next(r for r in rows if r["pos"] == 1)
            last = next(r for r in rows if r["pos"] == n)
            mid = [r for r in rows if 1 < r["pos"] < n]
            assert abs(first["credit"] - last["credit"]) < 1e-6
            assert all(m["credit"] <= first["credit"] + 1e-9 for m in mid)
            # mass balance: 0.4+0.4+0.2 of the value
            value = first["credit"] / 0.4
            assert abs(total - value) < 0.01 * n


def test_logrank_consistency_with_km_subjects(spark, sf_dir):
    r = all_queries()["stats_logrank_test"].fn(spark, sf_dir).collect()[0]
    assert r["variance"] > 0
    assert r["chi2"] >= 0
    expect = r["o_minus_e"] ** 2 / r["variance"]
    assert abs(r["chi2"] - expect) < 0.05
    assert r["significant"] == int(r["chi2"] > 3.841)
    # arms partition the KM subjects frame
    km = all_queries()["stats_kaplan_meier"].fn(spark, sf_dir).collect()
    n_km_subjects_at_t1 = max(x["n_risk"] for x in km)
    assert r["n_subjects_a"] + r["n_subjects_b"] >= n_km_subjects_at_t1


def test_lorenz_deciles_convex_and_complete(spark, sf_dir):
    out = sorted(
        all_queries()["stats_lorenz_deciles"].fn(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in out] == list(range(1, 11))
    shares = [r["share"] for r in out]
    # deciles are ordered poorest-first: shares non-decreasing (convex Lorenz)
    assert all(b >= a - 1e-9 for a, b in zip(shares, shares[1:]))
    assert abs(sum(shares) - 1.0) < 1e-3
    assert abs(out[-1]["cum_share"] - 1.0) < 1e-6
    cums = [r["cum_share"] for r in out]
    assert all(b >= a for a, b in zip(cums, cums[1:]))
    # decile sizes balanced within 1
    ns = [r["n_customers"] for r in out]
    assert max(ns) - min(ns) <= 1


def test_dunn_pairs_and_symmetry(spark, sf_dir):
    out = all_queries()["stats_dunn_posthoc"].fn(spark, sf_dir).collect()
    assert len(out) == 10  # C(5,2) priority pairs
    for r in out:
        assert r["grp_a"] < r["grp_b"]
        assert r["significant"] == int(abs(r["z_dunn"]) > 2.807)
    # KW significant implies at least consistency in direction magnitudes
    kw = all_queries()["stats_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    if not kw["significant"]:
        # if the omnibus finds nothing, Bonferroni pairs shouldn't light up
        assert sum(r["significant"] for r in out) == 0


def test_mcnemar_vs_kappa_cells(spark, sf_dir):
    r = all_queries()["stats_mcnemar_test"].fn(spark, sf_dir).collect()[0]
    assert r["only_a"] >= 0 and r["only_b"] >= 0
    bc = r["only_a"] + r["only_b"]
    if bc > 0:
        expect = (abs(r["only_a"] - r["only_b"]) - 1.0) ** 2 / bc
        assert abs(r["chi2_cc"] - expect) < 1e-3
        assert r["significant"] == int(expect > 3.841)
    else:
        assert r["chi2_cc"] == 0.0 and r["significant"] == 0
    # same raters as cohens_kappa: discordant cells must match its sheet
    k = all_queries()["stats_cohens_kappa"].fn(spark, sf_dir).collect()[0]
    assert r["only_a"] == k["n10"] and r["only_b"] == k["n01"]
    assert r["n"] == k["n"]


def test_friedman_rank_bounds(spark, sf_dir):
    r = all_queries()["stats_friedman_test"].fn(spark, sf_dir).collect()[0]
    k, b = r["n_treatments"], r["n_blocks"]
    assert k == 5 and b >= 1
    # chi2_F ranges over [0-ish, b*k*(k-1)*... ]; the hard upper bound
    # with complete blocks is b(k-1) scaled: max sum R_j^2 at perfect
    # consistency gives chi2 = b(k-1)*... just pin non-negativity + cut
    assert r["friedman_chi2"] >= -1e-6
    assert r["significant"] == int(r["friedman_chi2"] > 9.488)


def test_granger_nesting_inequality(spark, sf_dir):
    r = all_queries()["stats_granger_causality"].fn(spark, sf_dir).collect()[0]
    # the unrestricted model nests the restricted one: R2_u >= R2_r
    assert r["r2_unrestricted"] >= r["r2_restricted"] - 1e-9
    assert r["f_stat"] >= -1e-6
    assert r["granger_causal"] == int(r["f_stat"] > 3.841)
    assert r["n_obs"] > 10


def test_textrank_scores_form_distribution(spark, sf_dir):
    out = sorted(
        all_queries()["text_textrank_keywords"].fn(spark, sf_dir).collect(),
        key=lambda r: r["rnk"],
    )
    assert 0 < len(out) <= 15
    scores = [r["textrank"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # PageRank conserves mass: every score below 1, top-15 sum below ~1
    assert all(s < 1.0 for s in scores)
    assert sum(scores) <= 1.0 + 1e-6
    assert len({r["word"] for r in out}) == len(out)


def test_cochran_armitage_vs_python(spark, sf_dir):
    r = all_queries()["stats_cochran_armitage"].fn(spark, sf_dir).collect()[0]
    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("value") >= 150),
                    1,
                ).otherwise(0)
            ).alias("conv")
        )
        .collect()
    )
    import collections

    g = collections.defaultdict(lambda: [0, 0])
    for row in rows:
        d = row["user_id"] % 4
        g[d][0] += 1
        g[d][1] += row["conv"]
    n = sum(v[0] for v in g.values())
    a = sum(v[1] for v in g.values())
    pbar = a / n
    t = sum(d * (v[1] - v[0] * pbar) for d, v in g.items())
    snt = sum(v[0] * d for d, v in g.items())
    snt2 = sum(v[0] * d * d for d, v in g.items())
    s_tt = snt2 - snt * snt / n
    assert abs(r["trend_stat"] - t) < 1e-2
    if 0 < pbar < 1 and s_tt > 0:
        chi2 = t * t / (pbar * (1 - pbar) * s_tt)
        assert abs(r["chi2_trend"] - chi2) < 1e-2
        assert r["significant"] == int(chi2 > 3.841)


def test_littles_law_residual_is_zero(spark, sf_dir):
    out = all_queries()["events_littles_law_audit"].fn(spark, sf_dir).collect()
    assert out
    for r in out:
        # the conservation identity must hold exactly (6dp rounding)
        assert abs(r["little_residual"]) < 1e-5
        assert 0 < r["avg_concurrency"] <= r["n_users"]
        assert r["avg_presence_s"] >= 0


def test_kcenter_coreset_greedy_invariants(spark, sf_dir):
    out = sorted(
        all_queries()["similarity_kcenter_coreset"].fn(spark, sf_dir).collect(),
        key=lambda r: r["selection_round"],
    )
    assert [r["selection_round"] for r in out] == [0, 1, 2, 3]
    # seed is vec 0 at distance zero
    assert out[0]["vec_id"] == 0 and out[0]["sel_dist"] == 0.0
    # greedy farthest-first: selection distances are non-increasing
    dists = [r["sel_dist"] for r in out[1:]]
    assert dists == sorted(dists, reverse=True)
    assert all(d > 0 for d in dists)
    # all picks distinct
    assert len({r["vec_id"] for r in out}) == 4
    # coverage radius bounds: radius <= last pick's sel_dist (the last
    # pick WAS the farthest point before it was absorbed), radius >= 0
    radius = out[0]["coverage_radius"]
    assert all(r["coverage_radius"] == radius for r in out)
    assert 0 <= radius <= dists[-1] + 1e-9


def test_simpsons_reversal_vs_python(spark, sf_dir):
    out = all_queries()["stats_simpsons_reversal"].fn(spark, sf_dir).collect()
    assert len(out) >= 2
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_discount") * 100.0).cast("bigint").alias("x"),
            F.col("l_quantity").cast("bigint").alias("y"),
        )
        .collect()
    )

    def slope(pts):
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        return (sxy - sx * sy / n) / (sxx - sx * sx / n)

    overall = slope([(r["x"], r["y"]) for r in rows])
    for r in out:
        grp = [(p["x"], p["y"]) for p in rows if p["flag"] == r["flag"]]
        assert r["n_g"] == len(grp)
        assert abs(r["slope_group"] - slope(grp)) < 1e-5
        assert abs(r["slope_overall"] - overall) < 1e-5
        assert r["reversed"] == int(r["slope_group"] * r["slope_overall"] < 0)
