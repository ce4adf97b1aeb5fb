"""Grouped-map and table-function UDF surfaces — the reference's reduce
contract (`reduce(key, values[]) → result`, SURVEY.md §2.2 Q14) in its
two Spark-native generalizations:

- ``applyInPandas``: the whole group arrives as one pandas DataFrame —
  the UDAF surface for logic built-in aggregates can't express
  (here: per-group OLS regression, checked against DuckDB's regr_*).
- Python UDTF (one row in → N rows out, lateral-join shape) — here the
  n-gram generator, checked against a pure-SQL unnest twin.

Scale posture: applyInPandas shuffles whole groups — group cardinality
must be bounded (returnflag groups here; at 100 TB never key a grouped
map by a hot unbounded key without salting first). The UDTF is narrow
(no shuffle at all).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


def _ols_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Least-squares slope/intercept of extendedprice ~ quantity, plain
    closed form (identical to SQL regr_slope/regr_intercept)."""
    x = pdf["l_quantity"].astype("float64")
    y = pdf["l_extendedprice"].astype("float64")
    n = float(len(pdf))
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = sy / n - slope * (sx / n)
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "n": [int(n)],
            "slope": [round(slope, 4)],
            "intercept": [round(intercept, 2)],
        }
    )


@register(
    "udaf_grouped_regression",
    tags=("udf", "agg"),
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept
FROM lineitem
GROUP BY l_returnflag
""",
)
def udaf_grouped_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF via applyInPandas: per-group OLS fit the built-in agg
    library can't express as one function — Arrow moves each group to
    pandas once; DuckDB's regr_slope/regr_intercept replay the math."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return li.groupBy("l_returnflag").applyInPandas(
        _ols_group, schema="l_returnflag string, n bigint, slope double, intercept double"
    )


@register(
    "udtf_ngrams",
    tags=("udf", "text"),
    oracle="""
WITH toks AS (
  SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS t
  FROM documents WHERE doc_id <= 50
), grams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM toks
)
SELECT bigram, count(*) AS n FROM grams GROUP BY bigram HAVING count(*) >= 3
""",
)
def udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (one doc row → N bigram rows) in a lateral join, then
    a plain aggregate. The declarative twin (explode over a transform)
    is what the 100 TB path uses; the UDTF form exists for logic that
    genuinely needs imperative row expansion."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram string")
    class BigramGen:
        def eval(self, text: str):
            toks = [w for w in (text or "").lower().split(" ") if w != ""]
            for i in range(len(toks) - 1):
                yield (toks[i] + " " + toks[i + 1],)

    spark.udtf.register("bigram_gen", BigramGen)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") <= 50)
    docs.createOrReplaceTempView("udtf_docs_in")
    grams = spark.sql(
        "SELECT g.bigram FROM udtf_docs_in, LATERAL bigram_gen(text) AS g"
    )
    return (
        grams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 3)
    )
