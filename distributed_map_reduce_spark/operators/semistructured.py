"""Semi-structured analytics over the open VARIANT type (Spark 4).

The reference's KV layer stores arbitrary JS values; our schema-less path
(`plans/kv.py from_objects`, canonical-JSON column) covers round-tripping.
VARIANT is the *query-side* half: a binary-encoded, shredding-friendly
semi-structured type whose typed path extraction stays inside codegen —
at 100 TB the Parquet variant shredding keeps `$.meta.k`-style accesses
columnar instead of re-parsing JSON text per row.

The DuckDB oracle runs the same paths through its JSON functions — the
point is that VARIANT semantics (typed extraction, null on missing,
tolerant parse) are engine-portable even though the encodings differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "variant_nested_extract",
    tags=("semistructured", "variant"),
    oracle="""
WITH doc AS (
  SELECT '{"meta": ' || props || ', "type": "' || event_type || '"}' AS j,
         value
  FROM events
)
SELECT json_extract_string(j, '$.type') AS etype,
       CAST(json_extract(j, '$.meta.k') AS BIGINT) % 7 AS k_bucket,
       count(*) AS n,
       round(sum(value), 2) AS total_value
FROM doc
GROUP BY 1, 2
""",
)
def variant_nested_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested VARIANT path extraction: wrap each event's JSON props in an
    envelope object, parse ONCE to a variant, then pull `$.meta.k` and
    `$.type` as typed columns with `variant_get` — the
    parse-once/extract-many shape that beats repeated get_json_object
    text scans, and the shape Parquet variant shredding accelerates to
    columnar reads at scale."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(
        F.concat(
            F.lit('{"meta": '), F.col("props"), F.lit(', "type": "'),
            F.col("event_type"), F.lit('"}'),
        )
    )
    doc = ev.select(v.alias("v"), "value")
    return (
        doc.select(
            F.variant_get("v", "$.type", "string").alias("etype"),
            (F.variant_get("v", "$.meta.k", "bigint") % 7).alias("k_bucket"),
            "value",
        )
        .groupBy("etype", "k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "variant_tolerant_ingest",
    tags=("semistructured", "variant"),
    oracle="""
WITH raw AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN '{truncated' ELSE props END AS j
  FROM events
)
SELECT event_type,
       count(*) AS n_rows,
       count(*) FILTER (WHERE NOT json_valid(j)) AS n_corrupt,
       CAST(sum(CASE WHEN json_valid(j)
                     THEN CAST(json_extract(j, '$.k') AS BIGINT) END) AS BIGINT)
         AS sum_valid_k
FROM raw
GROUP BY 1
""",
)
def variant_tolerant_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corruption-tolerant semi-structured ingest: every 7th row's JSON is
    truncated (simulating upstream writer crashes); `try_parse_json`
    yields NULL instead of failing the job, so the pipeline quantifies
    corruption per type and aggregates only valid payloads. The
    fail-soft ingest contract a 100 TB raw-log reader needs — one bad
    blob must never kill a 1000-executor stage."""
    ev = load_table(spark, sf_dir, "events")
    j = F.when(F.col("event_id") % 7 == 0, F.lit("{truncated")).otherwise(
        F.col("props")
    )
    return (
        ev.select(
            "event_type",
            j.alias("j"),
            F.try_parse_json(j).alias("v"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # NULL input is absent data, not corruption: the oracle's
            # `NOT json_valid(j)` is NULL (not counted) for NULL j, so the
            # corrupt count must likewise require j IS NOT NULL.
            F.count_if(F.col("j").isNotNull() & F.col("v").isNull()).alias("n_corrupt"),
            F.sum(F.variant_get("v", "$.k", "bigint")).alias("sum_valid_k"),
        )
    )
