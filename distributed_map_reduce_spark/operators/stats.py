"""Distribution statistics: exact percentiles, histograms, and the
approximate tier for 100 TB (approx_percentile — one pass, mergeable
sketches, no global sort).

The exact `percentile` is the oracle-checkable tier (linear
interpolation, identical to DuckDB's quantile_cont); the approximate
twin is registered rows-only because sketch estimates are
engine-specific by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "agg_percentiles",
    tags=("agg", "stats"),
    oracle="""
SELECT l_returnflag,
       round(median(l_extendedprice), 4)                       AS median_price,
       list_transform(quantile_cont(l_extendedprice, [0.25, 0.5, 0.95]),
                      x -> round(x, 4))                        AS price_quantiles
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — matches quantile_cont).
    At 100 TB use the approx twin below; exact percentile shuffles whole
    groups to sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.expr(
            "transform(percentile(l_extendedprice, array(0.25D, 0.5D, 0.95D)), x -> round(x, 4))"
        ).alias("price_quantiles"),
    )


@register(
    "agg_approx_percentiles",
    tags=("agg", "stats", "approx"),
    doc="Mergeable KLL/GK-style sketch percentiles — the 100 TB tier "
    "(single pass, no sort); estimates are engine-specific, rows-only check.",
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", 0.5, 10000).alias("median_est"),
        F.approx_percentile(
            "l_extendedprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.95)), 10000
        ).alias("quantile_est"),
    )


@register(
    "agg_histogram",
    tags=("agg", "stats"),
    oracle="""
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
       count(*) AS n,
       round(min(o_totalprice), 2) AS lo,
       round(max(o_totalprice), 2) AS hi
FROM orders
GROUP BY 1
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as a bucketed group-by — one pass, map-side
    partials; the portable form of width_bucket."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@register(
    "agg_regression_funcs",
    tags=("agg", "stats"),
    oracle="""
SELECT l_returnflag,
       round(corr(l_extendedprice, l_quantity), 6)        AS price_qty_corr,
       round(covar_samp(l_extendedprice, l_quantity), 4)  AS price_qty_covar,
       round(regr_slope(l_extendedprice, l_quantity), 6)  AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       round(regr_r2(l_extendedprice, l_quantity), 6)     AS r2,
       round(stddev_samp(l_extendedprice), 4)             AS price_sd,
       round(var_samp(l_quantity), 4)                     AS qty_var
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_regression_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in bivariate statistics per group: Pearson corr, sample
    covariance, OLS slope/intercept/R² (regr_*), stddev, variance — the
    JVM-codegen twin of the applyInPandas OLS in functions/grouped.py
    (`udaf_grouped_regression`): same math, zero Python, one partial+
    final aggregate. Definitions align across engines (sample variants
    everywhere); results round at 4-6dp per the float discipline."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(y, x), 6).alias("price_qty_corr"),
        F.round(F.covar_samp(y, x), 4).alias("price_qty_covar"),
        F.round(F.regr_slope(y, x), 6).alias("slope"),
        F.round(F.regr_intercept(y, x), 4).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.stddev_samp(y), 4).alias("price_sd"),
        F.round(F.var_samp(x), 4).alias("qty_var"),
    )


@register(
    "agg_mode_per_group",
    tags=("agg", "stats"),
    oracle="""
WITH counts AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q, count(*) AS c
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag,
       min(q) FILTER (WHERE rn = 1) AS mode_qty,
       max(c) FILTER (WHERE rn = 1) AS mode_count
FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag ORDER BY c DESC, q) AS rn
      FROM counts)
GROUP BY l_returnflag
""",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode (most frequent value) per group with a deterministic
    smallest-value tie-break: count → rank → keep rn=1. Two exchanges
    (value counts, then per-group top-1 via the rank window); never
    collects a value histogram anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(
        "l_returnflag", F.col("l_quantity").cast("bigint").alias("q")
    ).agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("l_returnflag").orderBy(F.col("c").desc(), F.col("q"))
    )
    return (
        counts.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("q").alias("mode_qty"), F.col("c").alias("mode_count"))
    )


@register(
    "stats_market_basket",
    tags=("stats", "join"),
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n_orders AS (
  SELECT count(DISTINCT l_orderkey) AS n FROM items
), part_freq AS (
  SELECT l_partkey, count(*) AS c FROM items GROUP BY l_partkey
), pair_counts AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_both
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT p.part_a, p.part_b, p.n_both,
       round(p.n_both * 1.0 / (SELECT n FROM n_orders), 6) AS support,
       round(p.n_both * 1.0 * (SELECT n FROM n_orders)
             / (fa.c * fb.c), 4) AS lift
FROM pair_counts p
JOIN part_freq fa ON fa.l_partkey = p.part_a
JOIN part_freq fb ON fb.l_partkey = p.part_b
ORDER BY p.n_both DESC, p.part_a, p.part_b
LIMIT 50
""",
)
def stats_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: co-occurrence count, support,
    and lift for part pairs bought in the same order — the A-Priori
    pair-counting pass expressed relationally.

    Scale shape: the self-join fans out per order as |basket|² — bounded
    by basket size (~7 here), never by catalog or order count. Pair
    counts shuffle on the pair key with map-side combine; the part
    frequency table joins in small. Top-50 via TakeOrderedAndProject,
    no global sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n_orders = items.agg(F.countDistinct("l_orderkey").alias("n"))
    part_freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "o")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    enriched = (
        pairs.crossJoin(F.broadcast(n_orders))
        .join(part_freq.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a")), "part_a")
        .join(part_freq.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b")), "part_b")
    )
    return (
        enriched.select(
            "part_a",
            "part_b",
            "n_both",
            F.round(F.col("n_both") / F.col("n"), 6).alias("support"),
            F.round(F.col("n_both") * F.col("n") / (F.col("c_a") * F.col("c_b")), 4).alias("lift"),
        )
        .orderBy(F.col("n_both").desc(), "part_a", "part_b")
        .limit(50)
    )
