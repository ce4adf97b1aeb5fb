"""URL canonicalization — the first dedup pass of a web-corpus pipeline
(strip tracking params / fragments, lowercase host) run BEFORE any
content hashing. The fixtures carry no URL column, so crawl-style
variants are synthesized per page identity; the pass provably collapses
them back. Pure regexp scan → one hash agg on the canonical string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "pipeline_url_canonical_dedup",
    tags=("pipeline", "dedup", "text"),
    oracle=r"""
WITH urls AS (
  -- page identity derives ONLY from doc_id // 4, so each group of four
  -- consecutive doc_ids is four raw spellings of one page
  SELECT doc_id,
         'site' || CAST((doc_id // 4) % 7 AS VARCHAR) AS sub,
         'p' || CAST(doc_id // 4 AS VARCHAR) AS page
  FROM documents
), raw AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'https://' || sub || '.Example.COM/docs/' || page
                       || '?utm_source=feed&id=' || page
           WHEN 1 THEN 'https://' || sub || '.example.com/docs/' || page
                       || '/?id=' || page || '#frag'
           WHEN 2 THEN 'https://' || sub || '.example.com/docs/' || page
                       || '?id=' || page || '&utm_campaign=x&fbclid=abc'
           ELSE        'https://' || sub || '.example.com/docs/' || page
                       || '?id=' || page
         END AS url
  FROM urls
), c1 AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(url, '#.*$', ''),
                   '[?&](utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g'),
                 '^([^?&]*)&', '\1?'),
               '\?&', '?'),
             '[?&]$', ''),
           '/\?', '?') AS u1
  FROM raw
), c2 AS (
  SELECT doc_id, u1,
         regexp_extract(u1, '^(https?://)', 1) AS scheme,
         regexp_extract(u1, '^https?://([^/?#]+)', 1) AS host_raw
  FROM c1
), canon AS (
  SELECT doc_id,
         scheme || lower(host_raw)
                || substr(u1, length(scheme) + length(host_raw) + 1) AS canonical
  FROM c2
)
SELECT canonical,
       CAST(count(*) AS BIGINT) AS n_raw_urls,
       CAST(min(doc_id) AS BIGINT) AS keeper_doc
FROM canon
GROUP BY canonical
HAVING count(*) > 1
""",
)
def pipeline_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization dedup — the first dedup pass every web
    corpus runs, BEFORE any content hashing: strip fragments and
    tracking parameters (utm_*, fbclid, gclid), lowercase the host,
    normalize the trailing-slash-before-query form, then group by the
    canonical URL (keeper = min doc_id). Stripping a FIRST-position
    tracking param consumes the '?' and leaves a dangling '&'
    ('...?utm_source=feed&id=p' -> '...p&id=p'), so a dedicated step
    promotes the first '&' of a query-less string back to '?'
    ('^([^?&]*)&' -> '$1?'). Four crawl-style raw variants
    are synthesized per page identity (doc_id // 4 — the fixtures carry
    no URL column), so the pass provably collapses them 4:1. Zero
    shuffle before the final hash agg on the canonical string; at
    100 TB the canonical column is what the crawl frontier and content
    store both key on. Regexes are RE2-and-Java-safe (character classes
    and anchors only); the host splice is substring arithmetic, not a
    backreference, so both engines rebuild the identical string."""
    docs = load_table(spark, sf_dir, "documents")
    page = F.concat(F.lit("p"), F.floor(F.col("doc_id") / 4).cast("bigint").cast("string"))
    sub = F.concat(
        F.lit("site"), (F.floor(F.col("doc_id") / 4) % 7).cast("bigint").cast("string")
    )
    base = F.concat(sub, F.lit(".example.com/docs/"), page)
    idp = page
    url = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://"), sub,
                     F.lit(".Example.COM/docs/"), page,
                     F.lit("?utm_source=feed&id="), idp),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(F.lit("https://"), base, F.lit("/?id="), idp, F.lit("#frag")),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://"), base, F.lit("?id="), idp,
                     F.lit("&utm_campaign=x&fbclid=abc")),
        )
        .otherwise(F.concat(F.lit("https://"), base, F.lit("?id="), idp))
    )
    u1 = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(url, r"#.*$", ""),
                        r"[?&](utm_[a-z]+|fbclid|gclid)=[^&]*", ""),
                    r"^([^?&]*)&", "$1?"),
                r"\?&", "?"),
            r"[?&]$", ""),
        r"/\?", "?")
    c2 = docs.select(
        "doc_id",
        u1.alias("u1"),
        F.regexp_extract(u1, r"^(https?://)", 1).alias("scheme"),
        F.regexp_extract(u1, r"^https?://([^/?#]+)", 1).alias("host_raw"),
    )
    canonical = F.concat(
        F.col("scheme"),
        F.lower(F.col("host_raw")),
        F.expr("substring(u1, length(scheme) + length(host_raw) + 1)"),
    )
    return (
        c2.select("doc_id", canonical.alias("canonical"))
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw_urls"),
            F.min("doc_id").cast("bigint").alias("keeper_doc"),
        )
        .filter(F.col("n_raw_urls") > 1)
    )
