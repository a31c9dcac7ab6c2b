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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from azure_data_engineering_spark.functions.vectors import (
    cosine_from_norms,
    dot,
    l2_norm,
)


def train_centroids(
    corpus: DataFrame,
    vec_col: str,
    nlist: int,
    seed: int = 42,
    id_col: str = "vec_id",
    max_train: int = 4096,
    iters: int = 10,
) -> list[list[float]]:
    """Coarse KMeans centroids from a BOUNDED deterministic sample —
    the same sample-train discipline as train_pq_codebooks: pull
    max_train rows ordered by id_col to the driver (4096 x 64 doubles
    = 2 MB) and run numpy Lloyd with deterministic evenly-spaced init.
    Driver holds nlist x dim floats — tiny; at 100 TB you fit nlist
    coarse centroids on a ~1M-row sample, never the corpus.

    r12: replaces pyspark.ml KMeans(maxIter=10).fit over the full
    corpus — a kmeans||-init + 10-iteration cascade of ~25 scheduled
    jobs whose output is a KB-sized artifact. The sample path is one
    TakeOrdered job + driver numpy; recall through the trained cells
    is re-verified by every ANN gate's floor. `seed` is kept for
    call-site compatibility; the init is deterministic by construction
    (sample order is pinned by id_col), so no RNG is consumed."""
    sel = (
        corpus.select(F.col(vec_col).alias("__v"), F.col(id_col).alias("__id"))
        .orderBy("__id")
        .limit(int(max_train))
        .select("__v")
    )
    X = np.array([r["__v"] for r in sel.collect()], dtype=np.float64)
    if len(X) == 0:
        raise ValueError("train_centroids: empty corpus")
    idx = np.linspace(0, len(X) - 1, nlist).astype(int)
    C = X[idx].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(nlist):
            pts = X[a == j]
            if len(pts):
                C[j] = pts.mean(0)
    return [[float(x) for x in c] for c in C]


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
    # norms hoisted to the join inputs: one interpreted fold per
    # candidate pair, not three — see vectors.cosine_from_norms (r12)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, nprobe)).alias("cell"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                cosine_from_norms(
                    F.col("q_vec"), F.col("c_vec"), F.col("__qn"), F.col("__cn")
                ),
                round_digits,
            ),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.first("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ------------------------------------------------------------------ IVF-PQ


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str,
    dim: int,
    id_col: str | None = None,
    m: int = 8,
    ksub: int = 16,
    iters: int = 10,
    max_train: int = 4096,
) -> list[list[list[float]]]:
    """Per-subspace product-quantization codebooks (Jégou et al.,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    the dim-D space splits into `m` subspaces of dim/m and each gets
    its own ksub-centroid Lloyd codebook, fit on unit-normalized
    vectors (inner product == cosine thereafter).

    Training pulls a BOUNDED deterministic sample to the driver
    (max_train rows ordered by id_col; 4096 x 64 doubles = 2 MB) and
    runs numpy Lloyd with deterministic init (evenly-spaced sample
    rows) — the standard recipe: at 100 TB you fit codebooks on a ~1M
    row sample, never the corpus, and the resulting artifact is
    driver-resident by design anyway (m*ksub*dim/m = ksub*dim floats,
    a few KB, same footprint as the IVF coarse centroids)."""
    from azure_data_engineering_spark.functions.vectors import l2_normalize

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    if id_col is None:
        # ADVICE r4: limit() without an ordering is nondeterministic
        # across runs/partitionings, which would silently break the
        # module's determinism discipline (codebooks differ run to run).
        raise ValueError(
            "train_pq_codebooks requires id_col: the bounded driver sample "
            "must be ordered to be deterministic across partitionings"
        )
    # limit FIRST on the raw (vec, id) projection, then normalize only
    # the max_train survivors: TakeOrdered otherwise evaluates the
    # interpreted normalize HOF over EVERY corpus row just to discard
    # it (r12). Same rows, same doubles.
    sel = (
        corpus.select(F.col(vec_col).alias("__v"), F.col(id_col).alias("__id"))
        .orderBy("__id")
        .limit(int(max_train))
        .select(l2_normalize(F.col("__v")).alias("v"))
    )
    rows = sel.collect()
    X = np.array([r.v for r in rows], dtype=np.float64)
    sub = dim // m
    books: list[list[list[float]]] = []
    for i in range(m):
        S = X[:, i * sub : (i + 1) * sub]
        idx = np.linspace(0, len(S) - 1, ksub).astype(int)
        C = S[idx].copy()
        for _ in range(iters):
            d = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            for j in range(ksub):
                pts = S[a == j]
                if len(pts):
                    C[j] = pts.mean(0)
        books.append([[float(x) for x in c] for c in C])
    return books


def _pq_encode_udf(codebooks):
    """Arrow-batched PQ encoder: per batch, ONE numpy matmul per
    subspace (argmin ||x-c||^2 == argmax 2x.c - ||c||^2); ties go to
    the lower code id (argmax returns the first maximum). The same
    justified-pandas-UDF case as similarity._bucket_arrow — a literal
    unrolled ksub*m expression tree is interpreted per-row by
    Catalyst HOFs and measured ~20x slower."""
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    @pandas_udf("array<int>")
    def enc(vs: pd.Series) -> pd.Series:
        X = np.stack(vs.to_numpy())
        out = np.empty((X.shape[0], len(books)), dtype=np.int32)
        for i, B in enumerate(books):
            sub = B.shape[1]
            Q = X[:, i * sub : (i + 1) * sub]
            score = 2.0 * (Q @ B.T) - (B * B).sum(1)[None, :]
            out[:, i] = score.argmax(1)
        return pd.Series(list(out))

    return enc


def _adc_score_udf(codebooks):
    """Arrow-batched asymmetric distance computation (inner-product
    form): per batch and subspace, gather the coded codewords and
    row-wise dot them against the exact query subvectors
    (einsum) — vectorized lookup-table scoring, no per-row Python."""
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    @pandas_udf("double")
    def adc(qn: pd.Series, codes: pd.Series) -> pd.Series:
        Q = np.stack(qn.to_numpy())
        C = np.stack(codes.to_numpy()).astype(np.int64)
        total = np.zeros(len(Q), dtype=np.float64)
        for i, B in enumerate(books):
            sub = B.shape[1]
            Qm = Q[:, i * sub : (i + 1) * sub]
            total += np.einsum("ij,ij->i", Qm, B[C[:, i]])
        return pd.Series(total)

    return adc


def ivfpq_top_k(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    refine_factor: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """IVF-PQ approximate top-k cosine — the 100 TB memory story for
    embedding search: corpus rows carry only (cell id, m PQ codes —
    m bytes replacing 4*dim; dim=64 float32 is 256 B -> 8 code bytes
    + 1 cell byte, ~28x, so a 1e11-vector corpus whose raw vectors
    are 25.6 TB holds its searchable index in under 1 TB of executor
    memory). Each query probes its nprobe nearest cells via the same
    hash equi-join as IVF-Flat (never a cartesian), ranks candidates
    by the ADC inner product against unit-normalized codewords, keeps
    a refine_factor*k shortlist, and exactly re-ranks ONLY the
    shortlist against the true vectors (the standard refine step:
    full-precision vectors are touched for k' rows per query, not per
    candidate).

    Plan: one broadcast-query equi-join on cell, two window top-ks
    (ADC shortlist, exact re-rank); encoding and ADC are Arrow-batched
    numpy (see _pq_encode_udf), cell assignment and the final exact
    cosine stay in codegen."""
    from azure_data_engineering_spark.functions.vectors import l2_normalize

    enc = _pq_encode_udf(codebooks)
    adc = _adc_score_udf(codebooks)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
        enc(l2_normalize(F.col(vec_col))).alias("codes"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        l2_normalize(F.col(vec_col)).alias("qn"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, nprobe)).alias("cell"),
    )
    cand = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc", adc(F.col("qn"), F.col("codes")))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    shortlist = cand.withColumn("__r", F.row_number().over(w1)).filter(
        F.col("__r") <= int(refine_factor) * k
    )
    refined = shortlist.withColumn(
        "cosine",
        F.round(
            cosine_from_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("__qn"), F.col("__cn")
            ),
            round_digits,
        ),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ------------------------------------------------- incremental index


def ivf_index_build(
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    index_table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Materialize the IVF-PQ index as a persisted SNAPSHOT TABLE
    (sources/snapshot.py) of (id, cell, codes) rows — the artifact a
    continuous-crawl corpus maintains incrementally instead of
    re-deriving cell assignments and PQ codes from raw vectors on
    every search. Returns the committed snapshot version.

    100 TB shape: the index is ~17 bytes/vector (1 cell + m codes) —
    the only thing searches scan; raw vectors stay in the corpus
    table and are touched per-query only for the k' refine rows."""
    from azure_data_engineering_spark.functions.vectors import l2_normalize
    from azure_data_engineering_spark.sources.snapshot import snapshot_write

    enc = _pq_encode_udf(codebooks)
    idx = corpus.select(
        F.col(id_col).alias("vec_id"),
        _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
        enc(l2_normalize(F.col(vec_col))).alias("codes"),
    )
    return snapshot_write(idx, index_table, mode="overwrite")


def ivf_index_append(
    new_rows: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    index_table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incremental index maintenance for a corpus that appends vectors
    continuously: assign + PQ-encode ONLY the new batch against the
    FROZEN centroids/codebooks and commit it as one atomic `append`
    snapshot — O(batch) work and an O(batch) commit, no rewrite of
    the existing index (same pattern as the streaming near-dup
    signature store, streaming/dedup_stream.py). Ids already present
    in the index are anti-joined away first, so replaying a batch
    after a crash is a no-op (idempotent restart, like the CDC sink).

    Codebook staleness is the operational trade: appended vectors from
    a drifted distribution still land in their nearest FROZEN cell and
    quantize against frozen codewords, so recall degrades gracefully
    rather than failing (tests/test_ivf.py asserts the floor holds on
    a deliberately drifted batch); the periodic re-train + rebuild is
    an offline job that swaps in a fresh index via an `overwrite`
    snapshot commit without pausing readers (time travel keeps the old
    version readable until vacuum).

    Returns the committed snapshot version."""
    from azure_data_engineering_spark.functions.vectors import l2_normalize
    from azure_data_engineering_spark.sources.snapshot import (
        snapshot_read,
        snapshot_write,
    )

    enc = _pq_encode_udf(codebooks)
    spark = new_rows.sparkSession
    existing = snapshot_read(spark, index_table).select("vec_id")
    batch = (
        new_rows.select(
            F.col(id_col).alias("vec_id"),
            _nearest_cells(F.col(vec_col), centroids, 1)[0].alias("cell"),
            enc(l2_normalize(F.col(vec_col))).alias("codes"),
        )
        .join(existing, "vec_id", "left_anti")
    )
    return snapshot_write(batch, index_table, mode="append")


def ivfpq_search_index(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    index_table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    refine_factor: int = 8,
    round_digits: int = 6,
    version: int | None = None,
) -> DataFrame:
    """IVF-PQ top-k against the PERSISTED index (ivf_index_build /
    ivf_index_append): queries broadcast-equi-join the index on cell,
    rank by Arrow-batched ADC, then the refine_factor*k shortlist —
    and only it — joins back to the corpus BY ID for the exact
    full-precision re-rank. Identical ranking math to ivfpq_top_k
    (same ADC + refine), but the candidate side scans 17-byte index
    rows instead of recomputing codes from raw vectors, which is the
    whole point of maintaining the index incrementally."""
    from azure_data_engineering_spark.functions.vectors import (
        cosine_from_norms,
        l2_normalize,
    )
    from azure_data_engineering_spark.sources.snapshot import snapshot_read

    adc = _adc_score_udf(codebooks)
    idx = snapshot_read(queries.sparkSession, index_table, version=version).select(
        F.col("vec_id").alias("neighbor_id"), "cell", "codes"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        l2_normalize(F.col(vec_col)).alias("qn"),
        F.explode(_nearest_cells(F.col(vec_col), centroids, nprobe)).alias("cell"),
    )
    cand = (
        F.broadcast(q)
        .join(idx, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc", adc(F.col("qn"), F.col("codes")))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    shortlist = cand.withColumn("__r", F.row_number().over(w1)).filter(
        F.col("__r") <= int(refine_factor) * k
    )
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    refined = shortlist.join(vecs, "neighbor_id").withColumn(
        "cosine",
        F.round(
            cosine_from_norms(
                F.col("q_vec"), F.col("c_vec"), F.col("__qn"), F.col("__cn")
            ),
            round_digits,
        ),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
