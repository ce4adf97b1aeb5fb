"""Reference-parity tests for the MapReduce engine: the five golden
queries of `/root/reference/test/mr.test.js` and
`test/all.student.test.js`, plus the differential local-executor check
(the reference's `sanityCheck`, mr.test.js:78-96)."""

from __future__ import annotations

from distributed_map_reduce_spark.plans.kv import KVTable
from distributed_map_reduce_spark.plans.mapreduce import exec_mr, local_exec_mr
from distributed_map_reduce_spark.plans.mr_queries import (
    DLIB_PAIRS,
    NCDC_DUP_PAIRS,
    NCDC_PAIRS,
    NCDC_TIES_PAIRS,
    ncdc_map,
    ncdc_reduce_max,
    ncdc_reduce_min,
    wc_map,
    wc_map_lower,
    wc_reduce,
)


def _pairs_df(spark, pairs):
    return KVTable.from_pairs(spark, pairs).resolve().select("key", "value")


def test_ncdc_max_golden(spark):
    """Golden: [{1950: 22}, {1949: 111}] (mr.test.js:123)."""
    out = dict(exec_mr(_pairs_df(spark, NCDC_PAIRS), ncdc_map, ncdc_reduce_max))
    assert out == {"1950": 22, "1949": 111}


def test_ncdc_min_golden(spark):
    """Golden: [{1950: -11}, {1949: 78}] (all.student.test.js:123)."""
    out = dict(exec_mr(_pairs_df(spark, NCDC_PAIRS), ncdc_map, ncdc_reduce_min))
    assert out == {"1950": -11, "1949": 78}


def test_ncdc_all_ties(spark):
    out = dict(exec_mr(_pairs_df(spark, NCDC_TIES_PAIRS), ncdc_map, ncdc_reduce_min))
    assert out == {"1950": 11, "1949": 11}


def test_ncdc_dup_key_lww(spark):
    """Key '319' written twice: the second write (-0011) wins, so 1949's
    max comes from nothing but the surviving record."""
    out = dict(exec_mr(_pairs_df(spark, NCDC_DUP_PAIRS), ncdc_map, ncdc_reduce_max))
    assert out == {"1950": 22, "1949": -11, "1948": 45}


def test_wordcount_golden(spark):
    """Spot-check the golden bag (mr.test.js:192-204)."""
    out = dict(exec_mr(_pairs_df(spark, DLIB_PAIRS), wc_map, wc_reduce))
    assert out["it"] == 9  # 'It' capitalized once — case-sensitive
    assert out["was"] == 10
    assert out["the"] == 10
    assert out["times,"] == 2
    assert out["of"] == 10


def test_wordcount_lower(spark):
    out = dict(exec_mr(_pairs_df(spark, DLIB_PAIRS), wc_map_lower, wc_reduce))
    assert out["it"] == 10  # 'It' now folds in


def test_differential_local_vs_distributed(spark):
    """sanityCheck: distributed results == single-process reference
    executor on every fixture/closure combination."""
    for pairs, m, r in [
        (NCDC_PAIRS, ncdc_map, ncdc_reduce_max),
        (NCDC_PAIRS, ncdc_map, ncdc_reduce_min),
        (DLIB_PAIRS, wc_map, wc_reduce),
        (DLIB_PAIRS, wc_map_lower, wc_reduce),
    ]:
        dist = sorted(exec_mr(_pairs_df(spark, pairs), m, r))
        local = sorted(local_exec_mr(pairs, m, r))
        assert dist == local


def test_dual_map_contract(spark):
    """The reference's D5 wart: map may return one dict (compact) or a
    list (compactV2) — both normalize to flatMap semantics."""
    pairs = [("a", "x y"), ("b", "y z")]
    df = _pairs_df(spark, pairs)
    single = exec_mr(df, lambda k, v: {k: len(v)}, lambda k, vs: (k, sum(vs)))
    multi = exec_mr(df, lambda k, v: [{w: 1} for w in v.split()], lambda k, vs: (k, len(vs)))
    assert dict(single) == {"a": 3, "b": 3}
    assert dict(multi) == {"x": 1, "y": 2, "z": 1}


def test_keys_filter(spark):
    """The broadcast key-list semi-filter (mapperReducer.js:14-17)."""
    df = _pairs_df(spark, NCDC_PAIRS)
    out = dict(
        exec_mr(df, ncdc_map, ncdc_reduce_max, keys=["000", "106", "212"])
    )
    assert out == {"1950": 22}


def test_consistent_placement_routes_like_placement_module(spark):
    """exec_mr with placement='consistent' must land every key group on
    the partition the ring says — and produce the same result bag as the
    default routing."""
    from distributed_map_reduce_spark.plans.mapreduce import (
        consistent_hash_partitioner,
        exec_mr,
        exec_mr_rdd,
    )

    pairs = spark.createDataFrame(
        [(f"k{i}", str(i % 7)) for i in range(200)], "key string, value string"
    )
    m = lambda k, v: {v: 1}  # noqa: E731
    r = lambda k, vs: (k, len(vs))  # noqa: E731
    default_bag = sorted(exec_mr(pairs, m, r, num_partitions=8))
    rdd = exec_mr_rdd(pairs, m, r, num_partitions=8, placement="consistent")
    assert sorted(rdd.collect()) == default_bag
    # every reduced key sits on its ring-assigned partition
    owner = consistent_hash_partitioner(8)
    placed = rdd.mapPartitionsWithIndex(
        lambda pid, it: ((k, pid) for k, _ in it)
    ).collect()
    assert placed and all(pid == owner(k) for k, pid in placed)
