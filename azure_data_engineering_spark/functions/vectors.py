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


def cosine_from_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine_similarity with the two l2_norms HOISTED to per-row
    columns computed BEFORE a join (r12): inside an |Q|x|C| pair
    expansion the inline form re-folds each side's norm once per PAIR
    (the HOF fold is interpreted, so 2 of the 3 folds per pair are
    redundant recomputation); projecting ||a||/||b|| onto the join
    inputs leaves one fold (the dot) per pair. Same doubles, same
    zero-norm guard — bit-identical to cosine_similarity."""
    denom = na * nb
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def max_abs(a: Column) -> Column:
    """max(|x_i|) — the symmetric-quantization scale basis."""
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))


def quantize_int8(a: Column) -> Column:
    """Symmetric int8 quantization: q_i = trunc(x_i * (127 / max|x|)),
    in [-127, 127] — embedding compression for training-data storage
    (4x smaller than float32; public standard scheme). trunc, not
    round: truncation of identical doubles is engine-portable, rounding
    conventions are not. Zero vectors quantize to zeros. HOF lambdas
    are interpreted, so for hot paths batch this through the Arrow
    kernel instead (operators/similarity._bucket_arrow pattern)."""
    scale = F.lit(127.0) / max_abs(a)
    return F.when(max_abs(a) == 0, F.transform(a, lambda x: F.lit(0).cast("int"))).otherwise(
        F.transform(a, lambda x: (x.cast("double") * scale).cast("int"))
    )


def dequantize_int8(q: Column, scale_basis: Column) -> Column:
    """Inverse map: x̂_i = q_i * (max|x| / 127). Lossy by design; the
    reconstruction error bound is max|x|/127 per component."""
    inv = scale_basis / F.lit(127.0)
    return F.transform(q, lambda x: x.cast("double") * inv)


def l2_normalize(a: Column) -> Column:
    """Unit-normalize (double); zero vectors pass through as zeros so
    downstream dot products stay 0 instead of NaN. Normalizing first
    turns inner product into cosine — the standard precondition for
    product-quantized similarity search (operators/ivf.ivfpq_top_k)."""
    n = l2_norm(a)
    return F.when(n == 0, F.transform(a, lambda x: x.cast("double"))).otherwise(
        F.transform(a, lambda x: x.cast("double") / n)
    )
