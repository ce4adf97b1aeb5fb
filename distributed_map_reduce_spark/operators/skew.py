"""Skew-mitigation operators: salted two-stage aggregation and a salted
broadcast-replicated join.

AQE's skew-join splitting handles sort-merge skew automatically
(session.py turns it on); salting is the explicit form for (a) skewed
*aggregations*, which AQE does not split, and (b) deliberate key
spreading when one key dominates (the 100 TB "hot user" problem).

Correctness is oracle-provable because salting is algebraic: stage 1
aggregates (key, salt) partials, stage 2 merges partials per key —
identical results to the direct group-by, by associativity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

N_SALTS = 16


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = N_SALTS,
) -> DataFrame:
    """Two-stage skew-proof aggregation. ``aggs`` maps output column →
    (input column, fn) with fn ∈ {sum, count, min, max}; all are
    algebraic, so partial-per-salt then merge-per-key is exact.

    Stage 1 shuffles on (key, salt) — a hot key spreads over n_salts
    reducers; stage 2 shuffles n_salts rows per key, negligible."""
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    part_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}

    def _pcol(col: str, fn: str) -> Column:
        return part_fn[fn](F.lit(1) if fn == "count" else F.col(col))

    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(
        *[_pcol(c, fn).alias(f"_p_{out}") for out, (c, fn) in aggs.items()]
    )
    return partial.groupBy(key).agg(
        *[merge_fn[fn](f"_p_{out}").alias(out) for out, (c, fn) in aggs.items()]
    )


@register(
    "agg_salted_skew",
    tags=("agg", "skew"),
    oracle="""
SELECT l_returnflag,
       round(sum(l_extendedprice), 2) AS total_price,
       count(*) AS n,
       round(max(l_quantity), 2) AS max_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation on a 3-value key (maximal skew: every key is
    hot). The oracle is the direct group-by — algebraically identical."""
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        "l_returnflag",
        {
            "total_price": ("l_extendedprice", "sum"),
            "n": ("l_extendedprice", "count"),
            "max_qty": ("l_quantity", "max"),
        },
    )
    return out.select(
        "l_returnflag",
        F.round("total_price", 2).alias("total_price"),
        "n",
        F.round("max_qty", 2).alias("max_qty"),
    )


@register(
    "join_salted_skew",
    tags=("join", "skew"),
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_lines,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-and-replicate join: the big side salts its key, the small
    side replicates each row n_salts times — a hot join key spreads over
    n_salts reducers. Results identical to the plain join."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    n = N_SALTS
    big = li.withColumn("_salt", (F.rand(seed=7) * n).cast("int"))
    small = o.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    return (
        big.join(small, (big.l_orderkey == small.o_orderkey) & (big._salt == small._salt))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )
