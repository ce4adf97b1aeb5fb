"""End-to-end training-data curation pipeline — the composite operator
chain a 100 TB pretraining-data run executes, as ONE declarative plan:

    quality filter → language filter → exact dedup (keep canonical)
    → per-language stats

Each stage is an operator proven individually elsewhere
(operators.text, operators.dedup); this query proves they compose into
a single Catalyst plan (filters merge into the scan, dedup is one
keyed exchange, stats re-use the dedup shuffle's partitioning where
possible) rather than materializing between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "pipeline_curate_corpus",
    tags=("pipeline", "dedup", "text"),
    oracle="""
WITH scored AS (
  SELECT doc_id, lang, text,
         len(list_filter(string_split(text, ' '), w -> trim(w) <> '')) AS n_tokens,
         md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
  FROM documents
), filtered AS (
  SELECT * FROM scored
  WHERE n_tokens BETWEEN 10 AND 1000
    AND lang IN ('en', 'es', 'fr', 'de')
), canonical AS (
  SELECT *, row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
  FROM filtered
)
SELECT lang,
       count(*) AS n_docs,
       sum(n_tokens) AS total_tokens,
       round(avg(n_tokens), 4) AS avg_tokens
FROM canonical WHERE rn = 1
GROUP BY lang
""",
)
def pipeline_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation chain as one plan: token-count quality gate → language
    allowlist → exact dedup keeping the lowest doc_id per fingerprint →
    per-language token budget. At 100 TB: two exchanges total
    (fingerprint window, language agg); the filters run inside the scan."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda w: F.trim(w) != ""))
    fingerprint = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    scored = docs.select(
        "doc_id", "lang", n_tokens.alias("n_tokens"), fingerprint.alias("fingerprint")
    )
    filtered = scored.filter(
        F.col("n_tokens").between(10, 1000) & F.col("lang").isin("en", "es", "fr", "de")
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    canonical = filtered.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return canonical.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


@register(
    "window_distribution",
    tags=("window",),
    oracle="""
SELECT c_custkey, c_nationkey,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cume,
       ntile(10)            OVER w     AS decile
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY round(c_acctbal, 2), c_custkey)
""",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile
    per nation (the per-group quantile-assignment primitives)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.round("c_acctbal", 2), "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )
