"""distributed_map_reduce_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference MapReduce-over-KV system (`lost-particles/Distributed_Map_Reduce`,
surveyed in /root/repo/SURVEY.md), re-expressed Spark-first:

- ``plans.mapreduce`` — the reference's MapReduce contract
  (map → combine → shuffle → reduce → gather) as Spark dataflow.
- ``plans.kv`` — keyed-dataset semantics: LWW upsert, content-addressed
  keys, point get/del, key scan, repartitioning.
- ``operators`` — the relational surface (scans, filters, aggregations,
  joins, windows, set ops, top-k) plus LLM-data-pipeline extensions
  (dedup, similarity search, text analysis, multimodal columns).
- ``sources`` — table catalog over the driver's parquet fixtures.
- ``streaming`` — Structured Streaming windows/watermark/dedup.
- ``registry`` — the named-query registry consumed by
  ``__spark_entry__.py`` (driver contract) and ``bench.py``.

Everything is DataFrame/SQL-first: logical plans go to Catalyst, shuffles
are Spark exchanges, and Python is reached only through Arrow-vectorized
pandas UDFs where built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
