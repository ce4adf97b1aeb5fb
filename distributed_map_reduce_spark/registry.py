"""Named-query registry: the single source of truth consumed by
``__spark_entry__.py`` (driver contract) and ``bench.py``.

Each Query pairs a Spark DataFrame builder with the ANSI-SQL oracle DuckDB
runs on the same parquet views. Column names are aliased identically on
both sides — the driver's compare sorts columns by name before value-
hashing. Queries without an expressible SQL oracle (custom stateful
streaming, iterative algorithms) carry ``oracle=None`` and get the
driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .session import tune_session


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py's headline set
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
    doc: str = "",
):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        docline = doc or ((fn.__doc__ or "").strip().splitlines() or [""])[0]
        _REGISTRY[name] = Query(
            name=name, fn=wrapped, oracle=oracle, tags=tags, bench=bench, doc=docline,
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from .operators import (  # noqa: F401
        relational,
        joins,
        windows,
        setops,
        dedup,
        similarity,
        text,
        multimodal,
        temporal,
        tpch,
        stats,
        arrays_maps,
        skew,
        sampling,
        pipeline,
        graph,
    )
    from .functions import grouped, udfs  # noqa: F401
    from .plans import kv_queries, mr_queries  # noqa: F401
    from .sources import bucketing, sinks  # noqa: F401
    from .streaming import batch_windows, stateful  # noqa: F401


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in all_queries().values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}


def bench_queries() -> dict[str, Query]:
    return {q.name: q for q in all_queries().values() if q.bench}
