"""Vector math over ``array<float>`` embedding columns.

Pure Catalyst higher-order functions (`zip_with` + `aggregate`): the
dot product/norm run JVM-side inside codegen — no Python boundary, no
UDF serialization. This is the building block for brute-force cosine
top-k and for the LSH-bucketed ANN scale path (operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm vectors (never NaN/div0)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)
