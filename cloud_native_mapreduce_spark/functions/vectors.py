"""Vector math over `array<float>` embedding columns — all JVM-side
higher-order functions (zip_with/aggregate), no Python in the hot path.

Cosine/dot are computed in DOUBLE: float32 inputs are cast exactly, and
double accumulation keeps results comparable with the DuckDB oracle to
well past the 4-decimal rounding used in registry queries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prod = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
