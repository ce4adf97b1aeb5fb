"""TPC-H Q2/Q11/Q16/Q20 — the four partsupp-bound queries, run against a
DETERMINISTICALLY DERIVED partsupp (the testdata ships no partsupp
table; VERDICT r01 scoped these out — this closes TPC-H to 22/22).

The derivation mirrors how TPC-H itself generates partsupp (4 suppliers
per part, spread around the supplier ring): for i ∈ {0..3}

    ps_suppkey    = (p_partkey + i·⌊S/4⌋ + 1) mod S      (S = |supplier|)
    ps_availqty   = (p_partkey·11 + i·17) mod 9999 + 1
    ps_supplycost = round(((p_partkey·7 + i·13) mod 1000) / 10 + 1, 2)

Pure integer arithmetic over the dense 0-based keys, so Spark and the
DuckDB oracle derive bit-identical rows with no side table and no RNG.
S enters as a broadcast 1-row aggregate (never a driver constant), so
the derivation stays a distributed plan at any SF.

Column adaptations per query are documented in each docstring (the
slimmed schema has no mfgr/comment/address/phone columns)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

N_SUPP_PER_PART = 4

# The derivation as a reusable WITH-clause body (DuckDB side).
PARTSUPP_SQL = f"""partsupp AS (
  SELECT CAST(p_partkey AS BIGINT) AS ps_partkey,
         CAST((p_partkey + i * (s_cnt // {N_SUPP_PER_PART}) + 1) % s_cnt AS BIGINT) AS ps_suppkey,
         CAST((p_partkey * 11 + i * 17) % 9999 + 1 AS BIGINT) AS ps_availqty,
         round(((p_partkey * 7 + i * 13) % 1000) / 10.0 + 1.0, 2) AS ps_supplycost
  FROM part,
       (SELECT count(*) AS s_cnt FROM supplier),
       unnest([0, 1, 2, 3]) AS t(i)
)"""


def partsupp_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same derivation as a Spark plan: part × broadcast(1-row
    supplier count) × posexploded {0..3}. Four narrow rows per part,
    zero shuffles."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    s_cnt = load_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_cnt")
    )
    pk = F.col("p_partkey")
    i = F.col("i")
    return (
        p.crossJoin(F.broadcast(s_cnt))
        .select(
            "p_partkey",
            "s_cnt",
            F.explode(F.array(*[F.lit(j) for j in range(N_SUPP_PER_PART)])).alias("i"),
        )
        .select(
            pk.cast("bigint").alias("ps_partkey"),
            ((pk + i * F.floor(F.col("s_cnt") / N_SUPP_PER_PART) + 1) % F.col("s_cnt"))
            .cast("bigint")
            .alias("ps_suppkey"),
            ((pk * 11 + i * 17) % 9999 + 1).cast("bigint").alias("ps_availqty"),
            F.round(((pk * 7 + i * 13) % 1000) / 10.0 + 1.0, 2).alias("ps_supplycost"),
        )
    )


@register(
    "q2_min_cost_supplier",
    tags=("tpch", "partsupp", "subquery"),
    oracle=f"""
WITH {PARTSUPP_SQL},
eu_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
offers AS (
  SELECT ps_partkey, ps_supplycost, s_name, s_acctbal, n_name
  FROM partsupp
  JOIN part ON p_partkey = ps_partkey AND p_type = 'LARGE' AND p_size <= 15
  JOIN eu_supp ON s_suppkey = ps_suppkey
),
best AS (
  SELECT ps_partkey, min(ps_supplycost) AS min_cost FROM offers GROUP BY ps_partkey
)
SELECT round(o.s_acctbal, 2) AS s_acctbal, o.s_name, o.n_name,
       o.ps_partkey AS p_partkey, round(o.ps_supplycost, 2) AS supplycost
FROM offers o JOIN best b
  ON b.ps_partkey = o.ps_partkey AND o.ps_supplycost = b.min_cost
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: the cheapest EUROPE supplier for each small LARGE-type
    part (size <= 15). The correlated min-cost subquery decorrelates into a per-part
    aggregate joined back on (part, cost) — one exchange over the
    derived partsupp, region-filtered suppliers arrive broadcast at this
    SF. (mfgr/address/phone columns absent; ORDER/LIMIT dropped — the
    driver compare is order-insensitive and ties are kept.)"""
    ps = partsupp_derived(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 15)
    ).select("p_partkey")
    eu_supp = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = (
        ps.join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .join(eu_supp, F.col("s_suppkey") == F.col("ps_suppkey"))
        .select("ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    )
    best = offers.groupBy(F.col("ps_partkey").alias("bk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        offers.join(
            best,
            (F.col("bk") == F.col("ps_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            F.round("ps_supplycost", 2).alias("supplycost"),
        )
    )


@register(
    "q11_important_stock",
    tags=("tpch", "partsupp", "having"),
    oracle=f"""
WITH {PARTSUPP_SQL},
nat_ps AS (
  SELECT ps_partkey, ps_supplycost * ps_availqty AS val
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT ps_partkey, round(sum(val), 2) AS stock_value
FROM nat_ps
GROUP BY ps_partkey
HAVING sum(val) > (SELECT sum(val) * 0.001 FROM nat_ps)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose NATION_7 stock value exceeds 0.1% of that
    nation's total. The global total is a broadcast 1-row aggregate over
    the same keyed aggregate (shared shuffle via ReusedExchange), never
    a driver-side scalar."""
    ps = partsupp_derived(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_ps = (
        ps.join(s, F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", (F.col("ps_supplycost") * F.col("ps_availqty")).alias("val"))
    )
    per_part = nat_ps.groupBy("ps_partkey").agg(F.sum("val").alias("sv"))
    total = per_part.agg((F.sum("sv") * 0.001).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("sv") > F.col("threshold"))
        .select("ps_partkey", F.round("sv", 2).alias("stock_value"))
    )


@register(
    "q16_supplier_part_counts",
    tags=("tpch", "partsupp", "antijoin"),
    oracle=f"""
WITH {PARTSUPP_SQL}
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many suppliers can furnish each surviving
    (brand, type, size) bucket. The 'customer complaints' NOT IN becomes
    a negative-balance supplier anti-join (comment column absent) — same
    anti-join + count-distinct shape."""
    ps = partsupp_derived(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_key")
    )
    return (
        ps.join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .join(bad, F.col("bad_key") == F.col("ps_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("ps_suppkey")).alias("supplier_cnt"))
    )


@register(
    "q20_excess_stock_suppliers",
    tags=("tpch", "partsupp", "semijoin"),
    oracle=f"""
WITH {PARTSUPP_SQL},
shipped AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey
),
excess AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN part ON p_partkey = ps_partkey AND p_name LIKE '%blue%'
  JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE ps_availqty > 0.5 * qty
)
SELECT s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (SELECT ps_suppkey FROM excess)
""",
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: suppliers holding excess stock (availqty > half of
    what they shipped in 1996) of blue parts. Chain of semi-joins: the
    per-(part,supplier) shipped aggregate joins the derived partsupp,
    the surviving supplier keyset semi-filters supplier."""
    ps = partsupp_derived(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%blue%")).select(
        "p_partkey"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    excess = (
        ps.join(p, F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(excess, F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
    )
