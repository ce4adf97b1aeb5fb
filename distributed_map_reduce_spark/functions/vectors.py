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
