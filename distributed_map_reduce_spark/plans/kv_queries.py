"""KV-store verb queries (SURVEY.md §2.1 D10-D14, §2.2 Q11-Q12) over the
driver's tables, exercising the KVTable layer end-to-end with DuckDB
oracles: LWW upsert, content-addressed keys, point get, key scan,
delete-as-anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table
from .kv import KVTable, content_address


def _customer_kv(spark: SparkSession, sf_dir: str) -> KVTable:
    c = load_table(spark, sf_dir, "customer")
    return KVTable(
        c.select(
            F.col("c_custkey").cast("string").alias("key"),
            F.col("c_name").alias("value"),
        )
    )


@register(
    "kv_lww_upsert",
    tags=("kv",),
    oracle="""
SELECT CAST(user_id AS VARCHAR) AS key, event_type AS value
FROM (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def kv_lww_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-write-wins resolve: each event is a `put` keyed by user;
    the latest write (by ingestion seq = event_id) wins — the reference's
    silent filesystem overwrite (`local/store.js:117-133`) made
    deterministic with a seq column (SURVEY.md §7.5 item 2)."""
    ev = load_table(spark, sf_dir, "events")
    kv = KVTable(
        ev.select(
            F.col("user_id").cast("string").alias("key"),
            F.col("event_type").alias("value"),
            F.col("event_id").alias("seq"),
        )
    )
    return kv.resolve().select("key", "value")


@register(
    "kv_content_addressed",
    tags=("kv",),
    oracle="""
SELECT sha256(to_json(struct_pack(c_custkey := c_custkey, c_name := c_name))) AS key,
       c_name AS value
FROM customer
""",
)
def kv_content_addressed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """put(value, null): key = sha256 of the value's canonical JSON
    (`util/id.js:72-78`, `test/all.test.js:833-847`). Integer/string
    fields only so JSON text is canonical across engines."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        content_address(F.col("c_custkey"), F.col("c_name")).alias("key"),
        F.col("c_name").alias("value"),
    )


@register(
    "kv_point_get",
    tags=("kv",),
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS key, c_name AS value
FROM customer WHERE c_custkey = 42
""",
)
def kv_point_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get(key): point read — the key predicate pushes into the scan
    (the reference routes to one node; Catalyst prunes to one file/rowgroup)."""
    return _customer_kv(spark, sf_dir).get("42")


@register(
    "kv_key_scan",
    tags=("kv",),
    oracle="SELECT CAST(c_custkey AS VARCHAR) AS key FROM customer",
)
def kv_key_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get(null): full key scan (`all/store.js:150-164`) — a single-column
    projection, pruned at the parquet reader."""
    return _customer_kv(spark, sf_dir).scan_keys()


@register(
    "kv_del_antijoin",
    tags=("kv",),
    oracle="""
SELECT CAST(c_custkey AS VARCHAR) AS key, c_name AS value
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
)
def kv_del_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """del(keys): distributed delete = broadcast anti-join; here every
    customer key that appears in orders is deleted."""
    kv = _customer_kv(spark, sf_dir)
    doomed = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").cast("string").alias("key"))
        .distinct()
    )
    return kv.delete(doomed).resolve().select("key", "value")
