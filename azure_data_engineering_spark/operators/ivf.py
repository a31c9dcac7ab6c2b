"""IVF (inverted-file) approximate nearest neighbor search.

The second scale path for similarity search (besides hyperplane LSH,
operators/similarity.py): partition the corpus into nlist Voronoi
cells around trained centroids, then probe only the nprobe cells
closest to each query — the standard IVF-Flat recipe (Jégou et al.,
"Product Quantization for Nearest Neighbor Search", IEEE TPAMI 2011;
the non-quantized IVF-Flat variant).

Spark-first shape:
- training: pyspark.ml KMeans (fixed seed) on a sample — at 100 TB
  train on a ~1M-row sample, never the full corpus;
- assignment: centroids broadcast as literals; nearest-centroid is a
  codegen expression (argmin over nlist dot products), no UDF;
- search: queries join the corpus on cell id (hash equi-join on a
  low-cardinality key — prefer nlist >> shuffle partitions at scale),
  exact cosine within the probed cells, per-query top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from azure_data_engineering_spark.functions.vectors import cosine_similarity, dot


def train_centroids(corpus: DataFrame, vec_col: str, nlist: int, seed: int = 42) -> list[list[float]]:
    """KMeans centroids (deterministic under the fixed seed). Driver
    holds nlist x dim floats — tiny; the corpus never leaves executors."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.select(array_to_vector(F.col(vec_col)).alias("features"))
    model = KMeans(k=nlist, seed=seed, maxIter=10).fit(train)
    return [list(map(float, c)) for c in model.clusterCenters()]


def _nearest_cells(vec: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """Array of the nprobe cell ids with highest dot(vec, centroid) —
    a static argtop-n unrolled over literal centroid arrays (codegen,
    no UDF). nlist is small (hundreds), so the unrolled expression is
    cheap relative to corpus math."""
    scores = F.array(
        *[
            F.struct(
                dot(vec, F.array(*[F.lit(float(x)) for x in c])).alias("score"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    ranked = F.reverse(F.array_sort(scores))  # by score asc -> reversed = desc
    return F.transform(F.slice(ranked, 1, nprobe), lambda s: s["cell"])


def ivf_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k cosine: corpus rows live in their nearest
    cell; each query probes its nprobe nearest cells. Work per query
    ≈ nprobe/nlist of the corpus, reached via a hash equi-join on
    cell — never a cartesian."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, nprobe)).alias("cell"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), round_digits))
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
