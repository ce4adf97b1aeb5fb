"""Vector math over `array<float>` embedding columns — all JVM-side
higher-order functions (`zip_with` + `aggregate`), no Python UDFs.

Accumulation is double-precision left-to-right over the array, the same
order DuckDB's `list_cosine_similarity` uses, so oracle comparison is
bit-stable after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# Measured dead end, recorded so it isn't retried: unrolling dot() into
# an explicit 64-term element_at chain IS bit-identical to the fold
# (verified on all 1.1M sf1 kNN pairs) but runs ~2.5x SLOWER — the
# generated expression tree blows past the JIT method limits and falls
# back to per-node interpretation, which is worse than the HOF fold's
# specialized loop. The effective pair-side levers are (a) computing
# norms once per ROW, never per pair (3 folds -> 1), and (b) the
# adaptive bucket target that bounds the pair count itself.
