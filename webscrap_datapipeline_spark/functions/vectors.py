"""Vector math over array<float|double> embedding columns — all JVM-side
higher-order functions (zip_with / aggregate), no Python UDF: the dot
product of two 64-dim arrays stays inside codegen.

Scale note: for brute-force similarity these expressions stream; the
quadratic pair-join problem is handled in operators/similarity.py
(broadcast query side / LSH bucketing), not here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — sequential left fold, which is
    exactly what the DuckDB oracle's list_sum(list_transform(...)) does,
    so float results match bit-for-bit after a final round."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
