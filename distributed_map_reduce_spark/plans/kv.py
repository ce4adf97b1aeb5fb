"""Keyed-dataset (KV) semantics over DataFrames.

Reference semantics (SURVEY.md §1.1-§1.4, §2.1 D10-D14):

- a named group holds (key, value) pairs; `put` is a silent last-write-
  wins upsert (`/root/reference/distribution/local/store.js:117-133`);
- `put(value, null)` content-addresses the value — key = SHA-256 of its
  JSON (`/root/reference/distribution/util/id.js:72-78`, applied at
  `local/store.js:128`);
- `get(key)` point read, `get(null)` full key scan
  (`distribution/all/store.js:150-177`), `del(key)` delete;
- `reconf` re-partitions after membership change
  (`all/store.js:217-285`).

Spark-first translation: a ``KVTable`` wraps a DataFrame
``(key STRING, value <T>, seq BIGINT)``. ``seq`` is the ingestion order
that makes LWW deterministic on an immutable DataFrame (SURVEY.md §7.5
item 2) — ``resolve()`` keeps the max-seq row per key with one window.
Placement/hashing (naive/consistent/rendezvous, `util/id.js:107-148`)
collapses into Spark's hash partitioner: ``reconf(n)`` ==
``repartition(n, "key")``, and AQE handles runtime re-partitioning.

At scale: the production form of LWW-resolve is a Delta/Iceberg MERGE
(jar not in this image); the window-resolve here is the same shuffle
shape (one exchange on key) and works on any size because rows group by
key, never collect to the driver.
"""

from __future__ import annotations

import datetime
import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def canonical_json(value: Any) -> str:
    """Canonical JSON text for schema-less values — the reference's
    universal serializer re-expressed as a storage format
    (`/root/reference/distribution/util/serialization.js:441-499`:
    arbitrary nested objects/arrays/numbers/strings/booleans/null/Date).

    Sorted keys + compact separators make the text deterministic, so
    sha-256 content addressing is stable across writers; Date becomes an
    ISO-8601 string (the reference tags native Dates; a typed projection
    casts it back). Cycles and function-valued data are out of scope
    (SURVEY.md §2.3)."""

    def _default(o: Any) -> str:
        if isinstance(o, (datetime.datetime, datetime.date)):
            return o.isoformat()
        raise TypeError(f"unserializable value of type {type(o).__name__}")

    return json.dumps(value, sort_keys=True, separators=(",", ":"), default=_default)


def json_field(col, path: str, dtype: str | None = None) -> F.Column:
    """Typed projection into a schema-less JSON value column:
    `get_json_object` + cast. Stays JVM-side (no Python UDF), so a
    projection over 100 TB of JSON values is one codegen'd scan."""
    out = F.get_json_object(col, path)
    return out.cast(dtype) if dtype else out


def content_address(*cols) -> F.Column:
    """key = sha256 of the canonical JSON of the value — the reference's
    content addressing (`id.js:72-78`). Use integer/string fields so JSON
    text is canonical across engines."""
    return F.sha2(F.to_json(F.struct(*cols)), 256)


class KVTable:
    """A named keyed dataset (the reference's group, SURVEY.md §1.1)."""

    def __init__(self, df: DataFrame, resolved: bool = False):
        if df.columns[:2] != ["key", "value"]:
            raise ValueError(f"KVTable needs (key, value[, seq]) columns, got {df.columns}")
        self._df = df if "seq" in df.columns else df.withColumn("seq", F.lit(0).cast("bigint"))
        self._resolved = resolved

    # -- construction -----------------------------------------------------
    @classmethod
    def from_pairs(cls, spark: SparkSession, pairs: list[tuple[str | None, Any]], value_type: str = "string") -> "KVTable":
        """Batch-ingest a pair list; list order is the ingestion order.
        ``key=None`` content-addresses the value (string values only here;
        structured values address via ``content_address`` columns)."""
        rows = [(k, v, i) for i, (k, v) in enumerate(pairs)]
        df = spark.createDataFrame(rows, schema=f"key string, value {value_type}, seq bigint")
        df = df.withColumn(
            "key",
            F.coalesce(F.col("key"), F.sha2(F.to_json(F.struct(F.col("value"))), 256)),
        )
        return cls(df)

    @classmethod
    def from_objects(cls, spark: SparkSession, pairs: list[tuple[str | None, Any]]) -> "KVTable":
        """Schema-less ingest: each value is an arbitrary JSON-serializable
        Python object (nested dicts/lists/str/num/bool/None/datetime —
        the reference's universal value domain, `serialization.js:441-499`,
        corpus `test/serialization.test.js:4-156`). Values are stored as
        ONE canonical-JSON string column; read back typed via
        :func:`json_field` projections. ``key=None`` content-addresses
        the value: key = sha256 of its canonical JSON (`util/id.js:72-78`)."""
        rows = [(k, canonical_json(v), i) for i, (k, v) in enumerate(pairs)]
        df = spark.createDataFrame(rows, schema="key string, value string, seq bigint")
        df = df.withColumn("key", F.coalesce(F.col("key"), F.sha2(F.col("value"), 256)))
        return cls(df)

    @property
    def df(self) -> DataFrame:
        return self._df

    # -- the KV verbs -----------------------------------------------------
    def put(self, other: "KVTable | DataFrame") -> "KVTable":
        """Append new writes (later seq wins on resolve) — D12."""
        odf = other.df if isinstance(other, KVTable) else KVTable(other).df
        base = self._df
        shift = base.agg(F.coalesce(F.max("seq"), F.lit(-1)).alias("m"))
        # cross-join the 1-row max to keep this fully distributed
        odf = odf.crossJoin(F.broadcast(shift)).withColumn("seq", F.col("seq") + F.col("m") + 1).drop("m")
        return KVTable(base.unionByName(odf))

    def resolve(self) -> DataFrame:
        """Last-write-wins view: keep max-seq row per key (Q11). One
        exchange on key; AQE handles skewed hot keys."""
        if self._resolved:
            return self._df
        w = Window.partitionBy("key").orderBy(F.col("seq").desc())
        return (
            self._df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )

    def get(self, key: str) -> DataFrame:
        """Point read (D11) — predicate pushes into the scan."""
        return self.resolve().filter(F.col("key") == key).select("key", "value")

    def scan_keys(self) -> DataFrame:
        """`get(null)` key scan (D10)."""
        return self.resolve().select("key")

    def scan_prefix(self, prefix: str) -> DataFrame:
        """Prefix range scan — the ordered-keyspace read between
        `get(key)` and `get(null)`. `startswith` compiles to a
        StringStartsWith pushed filter at the parquet reader, the
        columnar analog of an LSM/B-tree range seek."""
        return (
            self.resolve()
            .filter(F.col("key").startswith(prefix))
            .select("key", "value")
        )

    def delete(self, keys: list[str] | DataFrame) -> "KVTable":
        """Delete keys (D13) — planned as a broadcast anti-join, the
        distributed form of per-key file unlink."""
        if isinstance(keys, DataFrame):
            kdf = keys.select(F.col(keys.columns[0]).alias("key"))
        else:
            kdf = self._df.sparkSession.createDataFrame([(k,) for k in keys], "key string")
        return KVTable(self._df.join(F.broadcast(kdf), "key", "left_anti"))

    def reconf(self, num_partitions: int) -> "KVTable":
        """Re-partition by key (D14). The reference moves only keys whose
        owner changed (`all/store.js:217-285`); Spark's exchange +
        AQE coalescing is the scalable equivalent."""
        return KVTable(self._df.repartition(num_partitions, "key"))
