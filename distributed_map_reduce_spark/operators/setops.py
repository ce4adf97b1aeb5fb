"""Set operations, distinct, pivot/unpivot.

Absent in the reference (SURVEY.md §2.3). UNION ALL is a zero-shuffle
concat; DISTINCT/INTERSECT/EXCEPT shuffle once on the full row hash —
at scale prefer pre-aggregated keys (as these queries do) so the
exchange carries keys, not payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "set_union_all",
    tags=("setop",),
    oracle="""
SELECT party_key, party_name, kind FROM (
  SELECT c_custkey AS party_key, c_name AS party_name, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_suppkey AS party_key, s_name AS party_name, 'supplier' AS kind FROM supplier
)
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two heterogeneous sources mapped to one schema."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("party_key"), F.col("c_name").alias("party_name"), F.lit("customer").alias("kind")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("party_key"), F.col("s_name").alias("party_name"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s)


@register(
    "set_intersect",
    tags=("setop",),
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers active in both years."""
    o = load_table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    y97 = o.filter(F.year("o_orderdate") == 1997).select(F.col("o_custkey").alias("custkey"))
    return y96.intersect(y97)


@register(
    "set_except",
    tags=("setop",),
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers who churned between the two years."""
    o = load_table(spark, sf_dir, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    y97 = o.filter(F.year("o_orderdate") == 1997).select(F.col("o_custkey").alias("custkey"))
    return y96.subtract(y97)


@register(
    "set_union_distinct",
    tags=("setop",),
    oracle="""
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey FROM supplier
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of key sets."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "distinct_pairs",
    tags=("setop", "dedup"),
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT — hash-aggregate with map-side partials, not a sort."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@register(
    "pivot_segment_by_nation",
    tags=("pivot",),
    oracle="""
SELECT c_nationkey,
       count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS automobile,
       count(*) FILTER (WHERE c_mktsegment = 'BUILDING')   AS building,
       count(*) FILTER (WHERE c_mktsegment = 'FURNITURE')  AS furniture,
       count(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD')  AS household,
       count(*) FILTER (WHERE c_mktsegment = 'MACHINERY')  AS machinery
FROM customer GROUP BY c_nationkey
""",
)
def pivot_segment_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (never inferred — inference is a
    separate job at scale); counts per market segment per nation."""
    c = load_table(spark, sf_dir, "customer")
    out = (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.count(F.lit(1)))
    )
    renamed = out.select(
        "c_nationkey", *[F.coalesce(F.col(s), F.lit(0)).alias(s.lower()) for s in _SEGMENTS]
    )
    return renamed


@register(
    "unpivot_stack",
    tags=("pivot",),
    oracle="""
SELECT p_partkey, attr, round(val, 2) AS val FROM (
  SELECT p_partkey, 'retailprice' AS attr, p_retailprice AS val FROM part
  UNION ALL
  SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
)
""",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) wide columns into (attr, val) rows via stack()."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (attr, raw_val)"
        ),
    ).select("p_partkey", "attr", F.round("raw_val", 2).alias("val"))


@register(
    "set_intersect_all",
    tags=("setops",),
    oracle="""
SELECT CAST(l_suppkey AS BIGINT) AS k FROM lineitem WHERE l_quantity >= 25
INTERSECT ALL
SELECT CAST(l_suppkey AS BIGINT) AS k FROM lineitem WHERE l_discount >= 0.05
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag semantics: a supplier key appearing 3× in the
    high-quantity stream and 2× in the discounted stream survives
    exactly min(3,2)=2 times. The multiset algebra matters whenever
    rows carry multiplicity weight (joins against it reproduce counts);
    Spark plans it as a counted hash join, no dedup pass."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 25).select(
        F.col("l_suppkey").cast("bigint").alias("k")
    )
    b = li.filter(F.col("l_discount") >= 0.05).select(
        F.col("l_suppkey").cast("bigint").alias("k")
    )
    return a.intersectAll(b)


@register(
    "set_except_all",
    tags=("setops",),
    oracle="""
SELECT CAST(l_suppkey AS BIGINT) AS k FROM lineitem WHERE l_quantity >= 25
EXCEPT ALL
SELECT CAST(l_suppkey AS BIGINT) AS k FROM lineitem WHERE l_discount >= 0.05
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: each occurrence on the right
    cancels ONE occurrence on the left (count 5 minus count 2 leaves
    3 rows), completing the bag-semantics tier next to the distinct
    set ops."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") >= 25).select(
        F.col("l_suppkey").cast("bigint").alias("k")
    )
    b = li.filter(F.col("l_discount") >= 0.05).select(
        F.col("l_suppkey").cast("bigint").alias("k")
    )
    return a.exceptAll(b)


@register(
    "setops_union_missing_columns",
    tags=("set", "source"),
    oracle="""
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, NULL AS o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 0
), v2 AS (
  SELECT o_orderkey, o_orderstatus, NULL AS o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 3 = 1
), unioned AS (
  SELECT * FROM v1 UNION ALL SELECT * FROM v2
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(o_totalprice) AS BIGINT) AS with_price,
       CAST(count(o_orderpriority) AS BIGINT) AS with_priority
FROM unioned
GROUP BY o_orderstatus
""",
)
def setops_union_missing_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True): stitching two feed
    generations whose schemas DIVERGED — v1 carries price but predates
    the priority column, v2 dropped price and added priority — into one
    frame with NULLs where a side lacks the column (the schema-drift
    union every multi-vintage ingestion needs; positional UNION would
    silently misalign the columns instead). The audit counts per-column
    coverage so the drift is visible. Name resolution is analyzer-time;
    the plan is a plain union of two pruned scans."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    v2 = o.filter(F.col("o_orderkey") % 3 == 1).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return u.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count("o_totalprice").cast("bigint").alias("with_price"),
        F.count("o_orderpriority").cast("bigint").alias("with_priority"),
    )
