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


def quantize_int8(a: Column) -> Column:
    """Per-vector affine int8 quantization: struct(scale, zero, codes)
    with x ≈ zero + scale · code, code ∈ [0, 255] stored as
    array<smallint> (Spark has no unsigned byte). Pure column algebra —
    min/max/transform are higher-order functions inside codegen, so the
    4×-compression pass streams at scan speed with no Python.

    A constant vector (max == min) quantizes to all-zero codes with
    scale 0 — dequantization returns the constant exactly.
    """
    mn = F.array_min(a).cast("double")
    mx = F.array_max(a).cast("double")
    scale = F.when(mx > mn, (mx - mn) / F.lit(255.0)).otherwise(F.lit(0.0))
    codes = F.transform(
        a,
        lambda x: F.when(
            scale > 0,
            F.round((x.cast("double") - mn) / scale).cast("smallint"),
        ).otherwise(F.lit(0).cast("smallint")),
    )
    return F.struct(
        scale.alias("scale"), mn.alias("zero"), codes.alias("codes")
    )


def dequantize_int8(q: Column) -> Column:
    """Inverse of :func:`quantize_int8`: array<double> reconstruction.
    Max absolute error is scale/2 = (max-min)/510 per component."""
    return F.transform(
        q["codes"], lambda c: q["zero"] + q["scale"] * c.cast("double")
    )
