"""Property tests for the round-5e operator waves (the oracle gate
proves engine parity; these pin the semantic invariants parity can't)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from distributed_map_reduce_spark.registry import all_queries
from distributed_map_reduce_spark.sources import load_table


def test_skyline_frontier_is_pareto_set(spark, sf_dir):
    rows = sorted(
        all_queries()["relational_skyline_frontier"].fn(spark, sf_dir).collect(),
        key=lambda r: r["price_cents"],
    )
    assert rows
    # along ascending price the frontier's size strictly increases —
    # mutual non-domination in 2-D is exactly this staircase shape
    for a, b in zip(rows, rows[1:]):
        if a["price_cents"] < b["price_cents"]:
            assert a["p_size"] < b["p_size"]
        else:  # exact price tie on the frontier -> exact size tie
            assert a["p_size"] == b["p_size"]
    # no part in the full table dominates any frontier row
    parts = [
        (int(round(p[0] * 100)), p[1])
        for p in load_table(spark, sf_dir, "part")
        .select("p_retailprice", "p_size")
        .collect()
    ]
    for r in rows:
        for price, size in parts:
            dominates = (
                price <= r["price_cents"]
                and size >= r["p_size"]
                and (price < r["price_cents"] or size > r["p_size"])
            )
            assert not dominates


def test_wilcoxon_signed_rank_vs_python(spark, sf_dir):
    r = all_queries()["stats_wilcoxon_signed_rank"].fn(spark, sf_dir).collect()[0]
    assert r["n_pairs"] == r["n_pos"] + r["n_neg"]
    # replay the statistic from the raw pairs
    cy = (
        load_table(spark, sf_dir, "orders")
        .where(F.year("o_orderdate").isin(1995, 1996))
        .groupBy("o_custkey", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("c"))
        .collect()
    )
    by_cust: dict = {}
    for row in cy:
        by_cust.setdefault(row["o_custkey"], {})[row["yr"]] = row["c"]
    diffs = [
        v[1996] - v[1995]
        for v in by_cust.values()
        if 1995 in v and 1996 in v and v[1996] != v[1995]
    ]
    n = len(diffs)
    assert n == r["n_pairs"]
    order = sorted(abs(d) for d in diffs)
    # average-rank map over tie runs
    rank_of: dict = {}
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and order[j] == order[i]:
            j += 1
        rank_of[order[i]] = (i + 1 + j) / 2.0
        i = j
    w_plus = sum(rank_of[abs(d)] for d in diffs if d > 0)
    assert abs(w_plus - r["w_plus"]) < 0.51
    tie_corr = 0
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and order[j] == order[i]:
            j += 1
        t = j - i
        tie_corr += t * t * t - t
        i = j
    var = n * (n + 1) * (2 * n + 1) / 24.0 - tie_corr / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(var)
    assert abs(z - r["z_stat"]) < 1e-4
    assert r["significant"] == int(abs(z) > 1.96)


def test_bloom_filter_no_false_negatives(spark, sf_dir):
    r = all_queries()["sketch_bloom_filter_audit"].fn(spark, sf_dir).collect()[0]
    # THE bloom guarantee: every true member is claimed (zero FNs), so
    # claimed = members + false positives exactly
    assert r["claimed_pos"] == r["true_members"] + r["false_pos"]
    assert r["bits_set"] <= min(8192, 3 * r["n_a"])
    assert 0.0 <= r["fp_theory"] <= 1.0
    if r["fp_rate"] is not None:
        # measured FP rate should be within a loose envelope of theory
        assert r["fp_rate"] <= 5 * r["fp_theory"] + 0.05
