"""Similarity search over embedding columns (``array<float>``).

Two paths:

- **Brute-force cosine top-k** — the exactness baseline.  Dot products
  via ``F.zip_with`` + ``F.aggregate`` (JVM codegen, no Python); top-k by
  a per-query window.  Cost O(|Q|·|C|) — fine when the query set is
  small or as the verification oracle.
- **LSH-bucketed ANN (random hyperplanes)** — the scale path: sign-bit
  signatures from seeded hyperplanes (driver-generated numpy, inlined as
  literals), candidates = bucket collisions in any band, exact cosine
  re-rank inside buckets only.  Candidate generation is an equi-join on
  (band, bucket) — never a cross join.

Cosine values are rounded (1e-6) so the DuckDB oracle
(``list_cosine_similarity``) hashes identically.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine",
    "brute_force_topk",
    "matryoshka_topk",
    "hyperplane_signatures",
    "lsh_topk",
    "ivf_assign",
    "ivf_topk",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_blocked",
    "normalize_embeddings",
    "pca_project",
    "kmeans_fit",
    "kmeans_assign",
    "silhouette_simplified",
    "cluster_embeddings",
    "pq_train",
    "pq_encode",
    "pq_topk",
    "pq_topk_refined",
    "ivf_pq_topk",
    "ivf_pq_build",
    "ivf_pq_append",
    "ivf_pq_delete",
    "ivf_pq_search",
    "sq8_encode",
    "sq8_topk",
    "mmr_rerank",
    "knn_classify",
    "kmeans_fit_exact",
]


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two float-array columns, JVM-side."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


def _norm(v: Column) -> Column:
    """``sqrt(Σ vᵢ²)`` — the exact norm subexpression :func:`cosine`
    folds, exposed so pair joins can stage it ONCE per vector (a
    projection on each join input) instead of re-folding it once per
    PAIR.  Same ops in the same order, so the staged quotient is
    bit-identical to the inline one."""
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, v: s + v * v))


def _cosine_staged(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine` with the two norms already staged as columns:
    the per-pair work is the dot-product fold only — the other two
    O(dim) folds ride the join inputs, computed once per vector.  The
    division is ``dot / (na · nb)`` exactly as in :func:`cosine`, so
    results are bit-identical."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors for each query: ``(query_id, vec_id, sim, rank)``.

    ``queries`` is broadcast (a query batch is small by construction);
    the corpus is scanned once.  Self-matches (same id) are excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            _norm(F.col(vec_col)).alias("__qn"),
        )
    )
    scored = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("__cvec"),
            _norm(F.col(vec_col)).alias("__cn"),
        )
        .crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _cosine_staged(
                    F.col("__qvec"), F.col("__cvec"), F.col("__qn"), F.col("__cn")
                ),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _planes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(np.random.SeedSequence(seed)))
    return rng.standard_normal((num_planes, dim))


def hyperplane_signatures(
    embeddings: DataFrame,
    dim: int,
    num_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit LSH signature per vector: ``(vec_id, embedding, sig: array<int>)``.

    Hyperplanes are regenerated from the seed inside each worker (a few
    KB of numpy, cheaper than a broadcast); signatures come from one
    Arrow-batched matmul ``X @ planes.T`` per batch — the vectorized
    form of num_planes dot products per row, ~an order of magnitude
    faster than per-row fold expressions at scale.
    """
    import pandas as pd
    from collections.abc import Iterator

    schema = f"vec_id long, embedding array<float>, sig array<int>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = _planes(dim, num_planes, seed)  # deterministic per seed
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
            bits = (X @ planes.T > 0).astype(np.int32)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vid"],
                    "embedding": pdf["emb"],
                    "sig": list(bits),
                }
            )

    src = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("emb")
    )
    return src.mapInPandas(fn, schema=schema)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH candidates, exact cosine re-rank.

    Recall rises with bands (OR-amplification).  Per band the bucket key
    is the band's bit-slice; candidates join on (band, bucket) so the
    plan is scan + two shuffles regardless of corpus size.
    """
    if num_planes % bands != 0:
        raise ValueError(f"num_planes={num_planes} not divisible by bands={bands}")
    r = num_planes // bands
    c_sig = hyperplane_signatures(embeddings, dim, num_planes, seed, id_col, vec_col)
    q_sig = hyperplane_signatures(queries, dim, num_planes, seed, query_id_col, vec_col)

    def band_rows(sig_df: DataFrame, who: str) -> DataFrame:
        # the vector norm is staged here, BEFORE the band explode and
        # the bucket join, so the re-rank's cosine folds it once per
        # vector instead of once per candidate pair (8 bytes/row extra
        # through the shuffle vs an O(dim) fold per pair)
        return sig_df.select(
            F.col("vec_id").alias(who),
            F.col("embedding").alias(f"__{who}_vec"),
            _norm(F.col("embedding")).alias(f"__{who}_n"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.concat_ws(
                                "", *[F.col("sig")[bi * r + j].cast("string") for j in range(r)]
                            ).alias("bucket"),
                        )
                        for bi in range(bands)
                    ]
                )
            ).alias("bb"),
        ).select(who, f"__{who}_vec", f"__{who}_n", "bb.band", "bb.bucket")

    cand = (
        band_rows(q_sig, "query_id")
        .join(band_rows(c_sig, "vec_id"), ["band", "bucket"])
        .where(F.col("query_id") != F.col("vec_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(
            _cosine_staged(
                F.col("__query_id_vec"),
                F.col("__vec_id_vec"),
                F.col("__query_id_n"),
                F.col("__vec_id_n"),
            ),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def _kmeans(sample: np.ndarray, n_cells: int, seed: int, iters: int = 10) -> np.ndarray:
    """Plain seeded Lloyd's k-means on a driver-side sample (the standard
    way an IVF coarse quantizer is trained: sample → centroids)."""
    rng = np.random.Generator(np.random.PCG64(np.random.SeedSequence(seed)))
    cents = sample[rng.choice(sample.shape[0], n_cells, replace=sample.shape[0] < n_cells)]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``n_probe`` nearest IVF cells:
    ``(vec_id, embedding, cell)``, one row per probed cell.  One Arrow
    matmul per batch; centroids travel in the closure (n_cells×dim
    floats — a few hundred KB at most).  ``n_probe`` is clamped to the
    cell count (asking for more probes than cells would otherwise
    surface as an opaque executor-side length-mismatch)."""
    import pandas as pd
    from collections.abc import Iterator

    if n_probe < 1:
        raise ValueError("n_probe must be >= 1")
    n_probe = min(int(n_probe), int(centroids.shape[0]))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = centroids
        c2 = (c**2).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
            d2 = (X**2).sum(axis=1)[:, None] - 2 * (X @ c.T) + c2[None, :]
            cells = np.argsort(d2, axis=1)[:, :n_probe]
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vid"].to_numpy(), n_probe),
                    "embedding": [e for e in pdf["emb"] for _ in range(n_probe)],
                    "cell": cells.reshape(-1).astype(np.int32),
                }
            )

    src = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("emb"))
    return src.mapInPandas(fn, schema="vec_id long, embedding array<float>, cell int")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_train_sample: int = 20000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer → cell-equi-join
    candidates → exact cosine re-rank.

    The corpus is indexed with 1 cell per vector; each query probes its
    ``n_probe`` nearest cells, so the scanned fraction is ~n_probe /
    n_cells of the corpus (vs the LSH path's band-collision candidates).
    ``n_probe == n_cells`` degenerates to exact brute force.  Centroids
    are trained on a deterministic driver-side sample.
    """
    sample = np.stack(
        [
            np.asarray(r["emb"], dtype=np.float64)
            for r in embeddings.select(F.col(vec_col).alias("emb"))
            .orderBy(F.col(id_col))
            .limit(max_train_sample)
            .collect()
        ]
    )
    cents = _kmeans(sample, n_cells, seed)
    corpus_cells = ivf_assign(embeddings, cents, 1, id_col, vec_col).withColumn(
        "__cn", _norm(F.col("embedding"))
    )
    query_cells = ivf_assign(queries, cents, n_probe, query_id_col, vec_col).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qvec"),
        _norm(F.col("embedding")).alias("__qn"),
        "cell",
    )
    cand = (
        query_cells.join(corpus_cells, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id",
        "vec_id",
        F.round(
            _cosine_staged(
                F.col("__qvec"), F.col("embedding"), F.col("__qn"), F.col("__cn")
            ),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold: ``(id_a, id_b, sim)``, a < b.

    Brute implementation (the sf-scale oracle); at scale route through
    ``lsh_topk`` candidates instead.
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        _norm(F.col(vec_col)).alias("__na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        _norm(F.col(vec_col)).alias("__nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                _cosine_staged(
                    F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def embedding_near_dup_pairs_blocked(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_cells: int = 64,
    n_probe: int = 2,
    seed: int = 42,
    max_train_sample: int = 20000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs at scale: IVF-cell blocking instead of the O(n²)
    cross pair join.  Each vector lands in its ``n_probe`` nearest cells;
    candidate pairs are same-cell collisions (an equi-join on ``cell``),
    then the exact cosine filter runs on candidates only.  Near-dup
    vectors are near-identical points, so multi-probe assignment makes a
    shared cell overwhelmingly likely; recall rises with ``n_probe``.
    """
    sample = np.stack(
        [
            np.asarray(r["emb"], dtype=np.float64)
            for r in embeddings.select(F.col(vec_col).alias("emb"))
            .orderBy(F.col(id_col))
            .limit(max_train_sample)
            .collect()
        ]
    )
    # lazy checkpoint: the self-join consumes `cells` on BOTH sides, and
    # without the cut each side re-runs the whole Arrow assignment stage
    # (the corpus crosses the Python boundary twice — guide §4); with it
    # the assignment computes once and both branches read the blocks
    cells = (
        ivf_assign(
            embeddings, _kmeans(sample, n_cells, seed), n_probe, id_col, vec_col
        )
        # the norm is staged INSIDE the checkpointed frame, so it is
        # computed once per (vector, probe) row and the per-candidate
        # cosine fold is the dot product only
        .withColumn("__n", _norm(F.col("embedding")))
        .localCheckpoint(eager=False)
    )
    a = cells.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("__va"),
        F.col("__n").alias("__na"),
        "cell",
    )
    b = cells.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("__vb"),
        F.col("__n").alias("__nb"),
        "cell",
    )
    return (
        a.join(b, ["cell"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            F.round(
                _cosine_staged(
                    F.col("__va"), F.col("__vb"), F.col("__na"), F.col("__nb")
                ),
                6,
            ).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def normalize_embeddings(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """L2-normalize the embedding column (pure JVM higher-order
    functions — no UDF, no shuffle).  Unit-norm vectors turn cosine
    into a plain dot product, the precondition most ANN index math
    assumes; zero vectors pass through unchanged.

    The norm is staged behind its own projection: inlining the O(dim)
    aggregate inside the per-element transform lambda re-evaluates it
    per element — O(dim²) per row (the Generate-inlining pathology
    measured elsewhere in this codebase as 70 s vs <2 s)."""
    v = F.col(vec_col)
    staged = embeddings.withColumn(
        "__norm", F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    )
    unit = F.transform(v, lambda x: (x / F.col("__norm")).cast("float"))
    return staged.withColumn(
        vec_col, F.when(F.col("__norm") > 0, unit).otherwise(v)
    ).drop("__norm")


def pca_project(
    embeddings: DataFrame,
    dim: int,
    out_dim: int,
    seed: int = 42,
    max_train_sample: int = 20000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project embeddings onto their top ``out_dim`` principal
    components — the standard dimensionality-reduction step before ANN
    indexing (shorter vectors: cheaper distance math, smaller index).

    Same scale shape as the IVF quantizer: the component basis is
    learned driver-side from a bounded deterministic sample (top-k
    eigenvectors of the sample covariance via SVD), then applied
    distributed as one Arrow-batch matmul per partition — the corpus
    itself never concentrates anywhere.  Output: ``(id_col, <vec_col>:
    array<float>[out_dim])`` with the mean removed (centering plus
    rotation preserve relative geometry; cosine consumers should
    re-normalize after projection).
    """
    if not 0 < out_dim <= dim:
        raise ValueError("need 0 < out_dim <= dim")
    import pandas as pd
    from collections.abc import Iterator

    sample = np.stack(
        [
            np.asarray(r["emb"], dtype=np.float64)
            for r in embeddings.select(F.col(vec_col).alias("emb"))
            .orderBy(F.col(id_col))
            .limit(max_train_sample)
            .collect()
        ]
    )
    mean = sample.mean(axis=0)
    # SVD of the centered sample: rows of Vt are principal directions.
    _, _, vt = np.linalg.svd(sample - mean, full_matrices=False)
    basis = vt[:out_dim].T.copy()  # (dim, out_dim)

    sc = embeddings.sparkSession.sparkContext
    bc_mean = sc.broadcast(mean)
    bc_basis = sc.broadcast(basis)
    staged = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("emb")
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, b = bc_mean.value, bc_basis.value
        for pdf in batches:
            if len(pdf):
                x = np.stack([np.asarray(e, dtype=np.float64) for e in pdf["emb"]])
                proj = (x - m) @ b
                out = [row.astype(np.float32) for row in proj]
            else:
                out = []
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "emb": out})

    return staged.mapInPandas(
        fn, schema="vec_id long, emb array<float>"
    ).select(F.col("vec_id").alias(id_col), F.col("emb").alias(vec_col))


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    max_iterations: int = 20,
    tol: float = 1e-6,
    seed: int = 13,
    init_sample: int = 20000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL corpus (unlike the
    driver-sampled ``_kmeans`` quantizer used by IVF) — corpus clustering
    for data curation: domain bucketing, diversity-balanced sampling,
    per-cluster quality audits.

    Scale shape (the classic MLlib plan): centroids (k×dim floats) ride
    the task closure; each iteration is ONE job that computes per-
    partition partial sums — an Arrow matmul per batch, one
    ``(cluster, count, vec_sum)`` row per nonempty cluster per partition
    — and the driver reduces ≤ P·k tiny rows and recenters.  No shuffle
    of the corpus, ever; traffic is P·k·dim floats per iteration, the
    same volume an MPI AllReduce would move.

    Initial centroids come from a deterministic driver-side sample.
    Empty clusters keep their previous centroid.  Partials are summed in
    (cluster, partition) order so the result is bit-deterministic for a
    fixed partitioning.  Returns the (k, dim) centroid matrix.
    """
    import pandas as pd
    from collections.abc import Iterator

    from pyspark import TaskContext

    sample = np.stack(
        [
            np.asarray(r["emb"], dtype=np.float64)
            for r in embeddings.select(F.col(vec_col).alias("emb"))
            .orderBy(F.col(id_col))
            .limit(init_sample)
            .collect()
        ]
    )
    rng = np.random.Generator(np.random.PCG64(np.random.SeedSequence(seed)))
    cents = sample[
        rng.choice(sample.shape[0], k, replace=sample.shape[0] < k)
    ].copy()
    dim = cents.shape[1]
    src = embeddings.select(F.col(vec_col).alias("emb"))

    for _ in range(max_iterations):
        c = cents  # rebind for closure capture of THIS iteration's value

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pid = TaskContext.get().partitionId()
            c2 = (c**2).sum(axis=1)
            cnt = np.zeros(k, dtype=np.int64)
            acc = np.zeros((k, dim), dtype=np.float64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
                assign = ((X**2).sum(axis=1)[:, None] - 2 * (X @ c.T) + c2[None, :]).argmin(axis=1)
                np.add.at(cnt, assign, 1)
                np.add.at(acc, assign, X)
            nz = np.nonzero(cnt)[0]
            if len(nz):
                yield pd.DataFrame(
                    {
                        "pid": pid,
                        "cluster": nz.astype(np.int32),
                        "cnt": cnt[nz],
                        "vec_sum": [acc[i] for i in nz],
                    }
                )

        pdf = (
            src.mapInPandas(
                partials, schema="pid int, cluster int, cnt long, vec_sum array<double>"
            )
            .toPandas()
            .sort_values(["cluster", "pid"])
        )
        new_cents = cents.copy()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        for cl, cn, vs in zip(pdf["cluster"], pdf["cnt"], pdf["vec_sum"]):
            counts[cl] += cn
            sums[cl] += np.asarray(vs, dtype=np.float64)
        nz = counts > 0
        new_cents[nz] = sums[nz] / counts[nz, None]
        shift = float(np.abs(new_cents - cents).max())
        cents = new_cents
        if shift <= tol:
            break
    return cents


def kmeans_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: ``(vec_id, cluster, dist)`` with
    ``dist`` the Euclidean distance (rounded 1e-6).  One Arrow matmul
    per batch, centroids in the closure — no shuffle, no join."""
    import pandas as pd
    from collections.abc import Iterator

    c = np.asarray(centroids, dtype=np.float64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c2 = (c**2).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
            d2 = (X**2).sum(axis=1)[:, None] - 2 * (X @ c.T) + c2[None, :]
            a = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vid"],
                    "cluster": a.astype(np.int32),
                    "dist": np.sqrt(np.maximum(d2[np.arange(len(a)), a], 0.0)).round(6),
                }
            )

    src = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("emb"))
    return src.mapInPandas(fn, schema="vec_id long, cluster int, dist double")


def cluster_embeddings(
    embeddings: DataFrame,
    k: int = 8,
    max_iterations: int = 20,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + assign in one call: ``(vec_id, cluster, dist)`` for every
    vector, trained by :func:`kmeans_fit` on the full corpus."""
    cents = kmeans_fit(
        embeddings, k, max_iterations, seed=seed, id_col=id_col, vec_col=vec_col
    )
    return kmeans_assign(embeddings, cents, id_col, vec_col)


def pq_train(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    seed: int = 29,
    train_sample: int = 20000,
    iters: int = 15,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search", TPAMI 2011): split the
    ``dim`` dimensions into ``m`` contiguous subspaces and run k-means
    with ``k`` centroids in each.

    Returns the ``(m, k, dim//m)`` codebook tensor — ``m·k·dsub`` floats,
    kilobytes; it travels in task closures from then on.  Training runs
    on a bounded deterministic driver-side sample (the standard PQ
    recipe — codebooks need distribution shape, not the full corpus;
    same bound as the IVF coarse quantizer and `pca_project`).
    """
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    sample = np.stack(
        [
            np.asarray(r["emb"], dtype=np.float64)
            for r in embeddings.select(F.col(vec_col).alias("emb"))
            .orderBy(F.col(id_col))
            .limit(train_sample)
            .collect()
        ]
    )
    return _fit_codebooks(sample, m, k, [seed + j for j in range(m)], iters)


def _fit_codebooks(
    sample: np.ndarray, m: int, k: int, seeds: list[int], iters: int = 15
) -> np.ndarray:
    """Per-subspace k-means over a driver-side sample matrix — shared by
    ``pq_train`` (raw vectors) and ``ivf_pq_topk`` (residuals).  Trains
    on UNIQUE subvectors: duplicate-heavy samples otherwise seed
    identical initial centroids and Lloyd's can never split them (it
    also makes k >= #distinct points exactly lossless)."""
    dsub = sample.shape[1] // m
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        sub = np.unique(sample[:, j * dsub : (j + 1) * dsub], axis=0)
        books[j] = _kmeans(sub, k, seeds[j], iters)
    return books


def _nearest_codes(R: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Row-wise nearest-codebook-entry indices per subspace:
    ``(n, m)`` int32 — the encode step both PQ variants share."""
    m, _, dsub = books.shape
    code = np.empty((R.shape[0], m), dtype=np.int32)
    for j in range(m):
        Rj = R[:, j * dsub : (j + 1) * dsub]
        b = books[j]
        bd = (
            (Rj**2).sum(axis=1)[:, None]
            - 2 * (Rj @ b.T)
            + (b**2).sum(axis=1)[None, :]
        )
        code[:, j] = np.argmin(bd, axis=1)
    return code


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Quantize each vector to ``m`` codebook indices:
    ``(vec_id, code array<int>)`` — dim·4 bytes shrink to m bytes-ish,
    the compression that lets a 100 TB embedding store fit a scan
    budget.  One Arrow matmul per subspace per batch; codebooks ride
    the closure."""
    import pandas as pd
    from collections.abc import Iterator

    m, k, dsub = codebooks.shape

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
            codes = _nearest_codes(X, codebooks)
            yield pd.DataFrame({"vec_id": pdf["vid"], "code": list(codes)})

    src = embeddings.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("emb"))
    return src.mapInPandas(fn, schema="vec_id long, code array<int>")


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC): each
    query precomputes its (m, k_codes) distance table; a code's
    approximate squared L2 distance is ``m`` table lookups summed —
    no vector is ever decompressed.

    ``(query_id, vec_id, adist, rank)``, ascending ``adist``.

    Scale shape: queries are collected once (a query batch is small by
    construction — same contract as ``brute_force_topk``); the code
    table is scanned ONCE for all queries with per-batch numpy table
    lookups, each task emitting only its per-query top-k partials, and
    a final window ranks P·|Q|·k candidate rows — never |corpus|·|Q|.
    """
    import pandas as pd
    from collections.abc import Iterator

    m, kc, dsub = codebooks.shape
    qrows = queries.select(
        F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    # distance tables: (|Q|, m, kc)
    tables = np.empty((len(qids), m, kc), dtype=np.float64)
    for j in range(m):
        Qj = Q[:, j * dsub : (j + 1) * dsub]
        c = codebooks[j]
        tables[:, j, :] = (
            (Qj**2).sum(axis=1)[:, None] - 2 * (Qj @ c.T) + (c**2).sum(axis=1)[None, :]
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["code"]])
            n = len(pdf)
            # adist[q, i] = sum_j tables[q, j, C[i, j]]
            ad = np.zeros((len(qids), n), dtype=np.float64)
            for j in range(m):
                ad += tables[:, j, :][:, C[:, j]]
            vids = pdf["vec_id"].to_numpy()
            # keep k+1 per batch: a query drawn from the corpus occupies
            # one slot with its own ~0-distance code row, and the final
            # self-filter runs AFTER this truncation — keeping only k
            # would silently drop the true k-th neighbor (or return k-1
            # rows when the corpus fits one Arrow batch).
            keep = min(k + 1, n)
            part = np.argpartition(ad, keep - 1, axis=1)[:, :keep]
            out_q = np.repeat(qids, keep)
            out_v = vids[part.reshape(-1)]
            out_d = np.take_along_axis(ad, part, axis=1).reshape(-1)
            yield pd.DataFrame({"query_id": out_q, "vec_id": out_v, "adist": out_d})

    cands = codes.mapInPandas(fn, schema="query_id long, vec_id long, adist double")
    w = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    return (
        cands.where(F.col("vec_id") != F.col("query_id"))
        .withColumn("adist", F.round("adist", 6))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def pq_topk_refined(
    embeddings: DataFrame,
    codes: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    oversample: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """The standard two-stage PQ pipeline: ADC shortlist of
    ``k·oversample`` candidates from the compressed codes, then EXACT
    cosine re-rank of just those — compression pays for the scan, exact
    math pays only for |Q|·k·oversample rows.

    ``(query_id, vec_id, sim, rank)`` — same shape as the other top-k
    operators, so it swaps in wherever ``ivf_topk``/``lsh_topk`` do.

    The re-rank join hits the full-precision table on its ID (pushdown-
    friendly point lookups via the broadcast shortlist); nothing
    corpus-sized shuffles.
    """
    shortlist = pq_topk(
        codes, queries, codebooks, k=k * oversample,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
    ).select("query_id", "vec_id")
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            _norm(F.col(vec_col)).alias("__qvn"),
        )
    )
    full = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cvn"),
    )
    scored = (
        F.broadcast(shortlist)
        .join(full, "vec_id")
        .join(q, "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _cosine_staged(
                    F.col("__qv"), F.col("__cv"), F.col("__qvn"), F.col("__cvn")
                ),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 16,
    oversample: int = 5,
    seed: int = 42,
    max_train_sample: int = 20000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ — the faiss-standard billion-scale ANN composition (Jégou
    et al. 2011 §V): a k-means coarse quantizer partitions the corpus
    into ``n_cells`` inverted lists, PQ codebooks trained on RESIDUALS
    (x − centroid, the part the coarse quantizer can't explain)
    compress each vector to ``m`` code indices, and a query probes its
    ``n_probe`` nearest cells, ADC-scans ONLY those cells' codes with a
    per-(query, cell) residual distance table, shortlists
    ``k·oversample`` candidates, then exact-cosine re-ranks just the
    shortlist.

    ``(query_id, vec_id, sim, rank)`` — swaps in wherever the other
    top-k operators do.  With ``n_probe == n_cells`` and
    ``k·oversample ≥ |corpus|`` the shortlist is the whole corpus and
    the output EQUALS brute-force cosine top-k (the registry gate's
    exactness config); recall at real approximate configs is measured
    in tests.

    Scale shape: one scan encodes (cell + code per vector, Arrow
    batches); the search scans ~``n_probe/n_cells`` of the code table —
    each task emits per-query top-shortlist partials, never
    |corpus|·|Q| rows; the re-rank joins the full-precision table only
    on the broadcast shortlist ids.  Codebooks and centroids travel in
    closures (kilobytes).
    """
    import pandas as pd
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    empty_schema = "query_id long, vec_id long, sim double, rank int"
    trained = _train_ivfpq_quantizers(
        embeddings, n_cells, m, k_codes, seed, max_train_sample, id_col, vec_col
    )
    if trained is None:  # empty corpus: no neighbors to return
        return embeddings.sparkSession.createDataFrame([], empty_schema)
    cents, books = trained
    codes = _encode_ivfpq(embeddings, cents, books, id_col, vec_col)

    prep = _query_probe_tables(queries, cents, books, n_probe, query_id_col, vec_col)
    if prep is None:  # empty query batch: empty result, not an np.stack crash
        return embeddings.sparkSession.createDataFrame([], empty_schema)
    return _ivf_pq_search(
        codes, queries, embeddings, books, prep, k, oversample,
        id_col, vec_col, query_id_col,
    )


def _train_ivfpq_quantizers(
    embeddings, n_cells, m, k_codes, seed, max_train_sample, id_col, vec_col
):
    """Coarse quantizer + residual codebooks from one driver-side sample
    (the standard recipe: quantizers need distribution shape only) —
    shared by ``ivf_pq_topk`` (inline) and ``ivf_pq_build`` (persisted),
    so the two can never drift in sampling rule or seed derivation.
    Returns ``(centroids, codebooks)`` or None for an empty corpus."""
    srows = (
        embeddings.select(F.col(vec_col).alias("emb"))
        .orderBy(F.col(id_col))
        .limit(max_train_sample)
        .collect()
    )
    if not srows:
        return None
    sample = np.stack([np.asarray(r["emb"], dtype=np.float64) for r in srows])
    cents = _kmeans(sample, n_cells, seed)
    d2 = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    resid = sample - cents[np.argmin(d2, axis=1)]
    books = _fit_codebooks(resid, m, k_codes, [seed + 7 * j + 1 for j in range(m)])
    return cents, books


def _encode_ivfpq(embeddings, cents, books, id_col, vec_col) -> DataFrame:
    """Nearest cell + residual PQ code per corpus vector (one Arrow
    matmul pass; quantizers ride the closure)."""
    import pandas as pd
    from collections.abc import Iterator

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c2 = (cents**2).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["emb"]])
            cd = (X**2).sum(axis=1)[:, None] - 2 * (X @ cents.T) + c2[None, :]
            cell = np.argmin(cd, axis=1)
            code = _nearest_codes(X - cents[cell], books)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vid"],
                    "cell": cell.astype(np.int32),
                    "code": list(code),
                }
            )

    return embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("emb")
    ).mapInPandas(encode, schema="vec_id long, cell int, code array<int>")


def _query_probe_tables(queries, cents, books, n_probe, query_id_col, vec_col):
    """Driver-side query prep (query batches are small by construction,
    same contract as brute_force_topk/pq_topk): nearest probed cells per
    query + per-(query, probed cell) residual ADC tables.  Returns
    ``(qids, probes, tables)`` or None for an empty query batch."""
    m, k_codes, dsub = books.shape
    qrows = queries.select(
        F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qv")
    ).collect()
    if not qrows:
        return None
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    qcd = (Q**2).sum(axis=1)[:, None] - 2 * (Q @ cents.T) + (cents**2).sum(axis=1)[None, :]
    n_probe_eff = min(int(n_probe), cents.shape[0])
    probes = np.argsort(qcd, axis=1)[:, :n_probe_eff]  # (|Q|, n_probe)
    # tables[qi, pi, j, :] = distances of (q - cell_centroid) subvector j
    # to codebook j's entries
    tables = np.empty((len(qids), n_probe_eff, m, k_codes), dtype=np.float64)
    for qi in range(len(qids)):
        for pi in range(n_probe_eff):
            qr = Q[qi] - cents[probes[qi, pi]]
            for j in range(m):
                qj = qr[j * dsub : (j + 1) * dsub]
                b = books[j]
                tables[qi, pi, j, :] = ((b - qj[None, :]) ** 2).sum(axis=1)
    return qids, probes, tables


def _ivf_pq_search(
    codes: DataFrame,
    queries: DataFrame,
    embeddings: DataFrame,
    books: np.ndarray,
    prep: tuple,
    k: int,
    oversample: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """ADC scan over (vec_id, cell, code) rows + shortlist + exact
    re-rank — the search half shared by ``ivf_pq_topk`` (codes built
    inline) and ``ivf_pq_search`` (codes read from a persisted,
    cell-pruned index)."""
    import pandas as pd
    from collections.abc import Iterator

    m = books.shape[0]
    qids, probes, tables = prep
    n_probe_eff = probes.shape[1]
    shortlist_k = k * oversample

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # probe lookup: cell -> list of (query_index, probe_index)
        probe_of: dict[int, list[tuple[int, int]]] = {}
        for qi in range(len(qids)):
            for pi in range(n_probe_eff):
                probe_of.setdefault(int(probes[qi, pi]), []).append((qi, pi))
        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy()
            C = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["code"]])
            vids = pdf["vec_id"].to_numpy()
            out_q, out_v, out_d = [], [], []
            for cell in np.unique(cells):
                hits = probe_of.get(int(cell))
                if not hits:
                    continue
                rows = np.flatnonzero(cells == cell)
                Cc = C[rows]
                for qi, pi in hits:
                    t = tables[qi, pi]  # (m, k_codes)
                    ad = np.zeros(rows.shape[0], dtype=np.float64)
                    for j in range(m):
                        ad += t[j, Cc[:, j]]
                    keep = min(shortlist_k + 1, rows.shape[0])
                    part = np.argpartition(ad, keep - 1)[:keep]
                    out_q.append(np.full(keep, qids[qi]))
                    out_v.append(vids[rows[part]])
                    out_d.append(ad[part])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "vec_id": np.concatenate(out_v),
                        "adist": np.concatenate(out_d),
                    }
                )

    cands = codes.mapInPandas(scan, schema="query_id long, vec_id long, adist double")
    ws = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vec_id"))
    shortlist = (
        cands.where(F.col("vec_id") != F.col("query_id"))
        .withColumn("__r", F.row_number().over(ws))
        .where(F.col("__r") <= shortlist_k)
        .select("query_id", "vec_id")
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            _norm(F.col(vec_col)).alias("__qvn"),
        )
    )
    full = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cvn"),
    )
    scored = (
        F.broadcast(shortlist)
        .join(full, "vec_id")
        .join(q, "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _cosine_staged(
                    F.col("__qv"), F.col("__cv"), F.col("__qvn"), F.col("__cvn")
                ),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def ivf_pq_build(
    embeddings: DataFrame,
    dim: int,
    path: str,
    n_cells: int = 16,
    m: int = 8,
    k_codes: int = 16,
    seed: int = 42,
    max_train_sample: int = 20000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Build and PERSIST an IVF-PQ index: quantizers trained once, the
    corpus encoded once, and every later query batch pays only a
    pruned ADC scan (``ivf_pq_search``) instead of re-training and
    re-encoding per call (what ``ivf_pq_topk`` does inline).

    Layout: ``{path}/codes/`` is the ``(vec_id, code)`` table written
    ``partitionBy("cell")`` — searching with ``n_probe`` of ``n_cells``
    then reads ONLY the probed cells' files via parquet partition
    pruning, which is the inverted-list file-skipping story at 100 TB
    (cost ∝ probed fraction, not corpus size).  ``{path}/quantizer.npz``
    holds the coarse centroids + residual codebooks (kilobytes, driver-
    side).  Determinism: same (corpus, seed) → identical index."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    trained = _train_ivfpq_quantizers(
        embeddings, n_cells, m, k_codes, seed, max_train_sample, id_col, vec_col
    )
    if trained is None:
        raise ValueError("cannot build an IVF-PQ index over an empty corpus")
    cents, books = trained
    (
        _encode_ivfpq(embeddings, cents, books, id_col, vec_col)
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(f"{path}/codes")
    )
    np.savez(f"{path}/quantizer.npz", centroids=cents, codebooks=books)


def ivf_pq_append(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append new vectors to a persisted ``ivf_pq_build`` index WITHOUT
    rebuilding — the crawl-refresh shape (each new dump adds vectors;
    re-training + re-encoding the whole corpus per increment would cost
    the full build every time).  The FROZEN quantizer from
    ``{path}/quantizer.npz`` encodes the increment (same coarse cells,
    same residual codebooks — an appended vector is searched through
    the identical ADC tables as a built one), and the codes land as an
    APPEND into the existing cell partitions, preserving the partition-
    pruned read.  Same policy as faiss ``IndexIVF.add``: quantizers do
    not drift with the data; rebuild deliberately (``ivf_pq_build``)
    when the distribution has — recall degrades gracefully, never
    correctness (the exact re-rank stage scores true vectors).

    Callers own ``id_col`` uniqueness across increments (also the faiss
    contract): an id appended twice appears twice in search output.
    The exactly-once streaming ledgers (`streaming.windows`) are the
    repo's dedup gate for that."""
    qz = np.load(f"{path}/quantizer.npz")
    cents, books = qz["centroids"], qz["codebooks"]
    (
        _encode_ivfpq(new_vectors, cents, books, id_col, vec_col)
        .write.partitionBy("cell")
        .mode("append")
        .parquet(f"{path}/codes")
    )


def ivf_pq_search(
    queries: DataFrame,
    path: str,
    embeddings: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    oversample: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Search a persisted ``ivf_pq_build`` index: load the kB quantizer,
    pick each query's ``n_probe`` nearest cells, and read ONLY those
    cells' code files (``cell IN (…)`` on the partition column →
    parquet partition pruning skips every unprobed inverted list), then
    the shared ADC scan + shortlist + exact re-rank against
    ``embeddings``.  Same output contract as ``ivf_pq_topk``; with
    ``n_probe >= n_cells`` and ``k·oversample ≥ |corpus|`` it equals
    brute-force cosine top-k."""
    spark = queries.sparkSession
    qz = np.load(f"{path}/quantizer.npz")
    cents, books = qz["centroids"], qz["codebooks"]
    prep = _query_probe_tables(queries, cents, books, n_probe, query_id_col, vec_col)
    if prep is None:
        return spark.createDataFrame(
            [], "query_id long, vec_id long, sim double, rank int"
        )
    probed = sorted({int(c) for c in prep[1].ravel()})
    codes = spark.read.parquet(f"{path}/codes").where(F.col("cell").isin(probed))
    return _ivf_pq_search(
        codes, queries, embeddings, books, prep, k, oversample,
        id_col, vec_col, query_id_col,
    )


def sq8_encode(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 scalar quantization (the faiss SQ8
    storage layout): ``(vec_id, scale, q8 array<int>)`` with
    ``scale = max|v| / 127`` and ``q8 = clamp(round(v / scale))`` —
    4x smaller vectors for brute-force shortlist scans, pure JVM array
    expressions, no shuffle.  Zero vectors (scale 0) are dropped: they
    carry no direction to search.  The raw scale is staged under an
    internal name so no downstream display alias can lateral-capture
    the arithmetic."""
    v = F.transform(vec_col, lambda x: x.cast("double"))
    scale = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    ) / F.lit(127.0)
    staged = embeddings.select(
        F.col(id_col).alias("vec_id"), v.alias("__v"), scale.alias("__sc")
    ).where(F.col("__sc") > 0)
    q8 = F.transform(
        "__v",
        lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127), F.round(x / F.col("__sc")).cast("int")),
        ),
    )
    return staged.select("vec_id", F.col("__sc").alias("scale"), q8.alias("q8"))


def sq8_topk(
    codes: DataFrame,
    queries: DataFrame,
    k: int = 5,
    refine_with: DataFrame | None = None,
    shortlist: int | None = None,
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine neighbors over SQ8 codes: ``(query_id, vec_id, sim,
    rank)``.  The per-vector scale CANCELS in cosine (both the dot
    product and the norm carry one factor of it), so scoring is plain
    ``cosine(q8, query)`` over the int codes — the scan reads 4x fewer
    bytes than the float corpus, which is the whole point at 100 TB.

    With ``refine_with`` (the float table), a two-stage search: SQ8
    shortlist of ``shortlist`` (default ``4k``) candidates per query,
    then EXACT cosine re-rank of the shortlist only — the standard
    quantize-then-refine recall fix, same shape as
    :func:`pq_topk_refined`."""
    if k < 1:
        raise ValueError("k must be >= 1")
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.transform(vec_col, lambda x: x.cast("double")).alias("__qvec"),
        ).withColumn("__qn", _norm(F.col("__qvec")))
    )
    pre_k = k if refine_with is None else max(shortlist or 4 * k, k)
    scored = (
        codes.select(
            "vec_id", F.transform("q8", lambda x: x.cast("double")).alias("__c")
        )
        .withColumn("__cn", _norm(F.col("__c")))
        .crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                _cosine_staged(
                    F.col("__qvec"), F.col("__c"), F.col("__qn"), F.col("__cn")
                ),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= pre_k)
        .select("query_id", "vec_id", "sim", "rank")
    )
    if refine_with is None:
        return short
    exact = refine_with.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__e"),
    ).withColumn("__en", _norm(F.col("__e")))
    rescored = (
        short.select("query_id", "vec_id")
        .join(exact, "vec_id")
        .join(q, "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _cosine_staged(
                    F.col("__qvec"), F.col("__e"), F.col("__qn"), F.col("__en")
                ),
                6,
            ).alias("sim"),
        )
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


def ivf_pq_delete(
    ids: DataFrame,
    path: str,
    id_col: str = "vec_id",
) -> int:
    """Delete vectors from a persisted ``ivf_pq_build`` index by id —
    the takedown half of index maintenance (build / append / DELETE) —
    rewriting ONLY the cell partitions that contain a deleted id:

    1. one column-pruned scan of the code table joined to the
       (broadcast, takedown-sized) id list finds the affected cells —
       a list bounded by ``n_cells``, collected to the driver;
    2. those cells' files are re-read via partition pruning, the ids
       anti-joined away, and written back with DYNAMIC partition
       overwrite (untouched cells' files are never opened);
    3. a cell left EMPTY is removed via the filesystem (dynamic
       overwrite can't replace a partition with zero rows).

    Returns the number of code rows removed.  The quantizer is
    untouched — deletes never change how surviving vectors encode."""
    spark = ids.sparkSession
    codes_path = f"{path}/codes"
    codes = spark.read.parquet(codes_path)
    key = F.broadcast(ids.select(F.col(id_col).alias("vec_id")).distinct())
    affected = [
        r["cell"]
        for r in codes.join(key, "vec_id").select("cell").distinct().collect()
    ]
    if not affected:
        return 0
    touched = codes.where(F.col("cell").isin(affected))
    n_before = touched.count()
    survivors = touched.join(key, "vec_id", "left_anti").localCheckpoint(
        eager=True  # sever lineage from the files the overwrite replaces
    )
    keep_cells = {
        r["cell"] for r in survivors.select("cell").distinct().collect()
    }
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if keep_cells:
            (
                survivors.where(F.col("cell").isin(list(keep_cells)))
                .write.partitionBy("cell")
                .mode("overwrite")
                .parquet(codes_path)
            )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    emptied = [c for c in affected if c not in keep_cells]
    if emptied:
        from plda_spark.sources.snapshot import _FS

        fs = _FS(spark, codes_path)
        for c in emptied:
            fs.delete(f"{codes_path}/cell={c}", recursive=True)
    return n_before - survivors.count()


def matryoshka_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    prefix_dim: int,
    k: int = 5,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Two-stage cosine top-k over MATRYOSHKA-style embeddings
    (Kusupati et al. 2022, "Matryoshka Representation Learning" —
    public work): MRL-trained models pack a usable low-dim embedding
    into the FIRST ``prefix_dim`` coordinates, so stage 1 scores
    cosine over just the prefix (``prefix_dim/dim`` of the scan bytes
    and arithmetic) to build a ``shortlist`` (default ``4k``) per
    query, and stage 2 re-ranks the shortlist with exact full-dim
    cosine.  Returns ``(query_id, vec_id, sim, rank)`` — ``sim`` is
    the FULL-dimension similarity.

    The dimension-slice analog of :func:`sq8_topk`'s precision cut:
    SQ8 shrinks bytes-per-coordinate, the matryoshka prefix shrinks
    coordinates-per-vector; both keep the exact re-rank.  ``slice`` is
    a JVM array expression, the shortlist is a per-query window over
    prefix scores, and only |queries|·shortlist rows reach the full-dim
    join — the corpus is scanned once at prefix width.
    """
    if prefix_dim < 1:
        raise ValueError("prefix_dim must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    pre_k = max(shortlist or 4 * k, k)
    pfx = lambda c: F.slice(c, 1, prefix_dim)  # noqa: E731
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("__qvec"),
            pfx(F.col(vec_col)).alias("__qpfx"),
        ).withColumn("__qpn", _norm(F.col("__qpfx")))
        .withColumn("__qn", _norm(F.col("__qvec")))
    )
    short = (
        embeddings.select(
            F.col(id_col).alias("vec_id"), pfx(F.col(vec_col)).alias("__cpfx")
        )
        .withColumn("__cpn", _norm(F.col("__cpfx")))
        .crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            # rounded like every ranking sim in this module so the
            # shortlist's order (and its DuckDB twin) is engine-stable
            F.round(
                _cosine_staged(
                    F.col("__qpfx"), F.col("__cpfx"), F.col("__qpn"), F.col("__cpn")
                ),
                6,
            ).alias("__psim"),
        )
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.desc("__psim"), F.asc("vec_id")
    )
    short = (
        short.withColumn("__prank", F.row_number().over(wp))
        .where(F.col("__prank") <= pre_k)
        .select("query_id", "vec_id")
    )
    full = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cvec"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    rescored = (
        short.join(full, "vec_id")
        .join(q, "query_id")
        .select(
            "query_id",
            "vec_id",
            F.round(
                _cosine_staged(
                    F.col("__qvec"), F.col("__cvec"), F.col("__qn"), F.col("__cn")
                ),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", "rank")
    )


_MMR_MAX_LITERALS = 20_000


def mmr_rerank(
    candidates: DataFrame,
    k: int = 8,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    score_col: str = "score",
    max_candidates: int = 100_000,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity-aware top-k every RAG context builder wants:
    greedily pick the candidate maximizing ``λ·relevance − (1−λ)·max
    cosine-similarity to anything already picked``, so the k results
    cover the query's facets instead of repeating its nearest
    neighbor k times.

    Operates on a CANDIDATE LIST (the top-N of a retrieval stage —
    hundreds, not the corpus); the seed is the highest-relevance
    candidate (id tie-break).  Returns ``(sel_order, id, score,
    mmr)`` — ``mmr`` is the winning objective value at selection time,
    NULL for the seed.  All arithmetic is double left-folds over the
    vectors (dot products and norms), so an external SQL replayer
    lands on identical bits and the greedy choices — which compare at
    full precision — cannot diverge between engines.

    Scale shape: the greedy is INHERENTLY sequential in k, and the
    candidate list is re-ranker sized by contract, so the whole loop
    runs driver-side over ONE bounded collect (round-11 optimization:
    the previous shape paid k−1 single-task Spark jobs of pure
    scheduling overhead against a 1-partition checkpoint — measured
    ~0.3 s per pass at any SF).  The contract is SELF-ENFORCING twice
    over: ``max_candidates`` (the knn_classify ``max_test_rows``
    pattern) refuses an unbounded frame BEFORE the collect, and the
    k·dim literal budget bounds the selected-set state.  Every fold,
    division, and comparison replicates the engine's IEEE-double
    semantics (left-fold accumulation order, ±inf/NaN division via
    numpy, NaN-greatest ordering), so the output is bit-identical to
    the distributed form — the DuckDB oracle and the engine cross-pin
    it."""
    import math

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    if max_candidates < 1:
        raise ValueError(f"max_candidates must be >= 1, got {max_candidates}")
    n_cand = candidates.count()
    if n_cand == 0:
        raise ValueError("mmr_rerank on an empty candidate frame")
    if n_cand > max_candidates:
        raise ValueError(
            f"mmr_rerank: candidate frame has {n_cand} rows > "
            f"max_candidates={max_candidates}; MMR is a RERANKER — the "
            "greedy collects the candidate list driver-side, which does "
            "not survive a corpus-sized frame. Re-rank a retrieval "
            "stage's top-N, or raise max_candidates if the list is "
            "genuinely bounded."
        )
    rows = candidates.select(
        F.col(id_col).alias("__id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("__vec"),
        F.col(score_col).cast("double").alias("__score"),
    ).collect()

    def _gt(a: float, b: float) -> bool:
        # engine ORDER BY semantics for doubles: NaN sorts GREATEST
        an, bn = a != a, b != b
        if an:
            return not bn
        if bn:
            return False
        return a > b

    def _eq(a: float, b: float) -> bool:
        return (a == b) or (a != a and b != b)

    def _pick(pool, key):  # max by (key(c) desc, id asc), engine order
        best = None
        for c in pool:
            if best is None:
                best = c
                continue
            kc, kb = key(c), key(best)
            if _gt(kc, kb) or (_eq(kc, kb) and c[0] < best[0]):
                best = c
        return best

    cand = [(r["__id"], list(r["__vec"]), float(r["__score"])) for r in rows]
    seed = _pick(cand, key=lambda c: c[2])
    dim = len(seed[1])
    if k * dim > _MMR_MAX_LITERALS:
        raise ValueError(
            f"mmr_rerank: k*dim = {k}*{dim} = {k * dim} literal vector "
            f"coordinates > {_MMR_MAX_LITERALS}; MMR is a RERANKER — "
            "run it on a retrieval stage's top-N candidates, not a "
            "corpus, or shrink k"
        )

    def _dot(a: list, b: list) -> float:  # left fold, engine order
        s = 0.0
        for x, y in zip(a, b):
            s += x * y
        return s

    def _norm2(a: list) -> float:
        s = 0.0
        for x in a:
            s += x * x
        return s

    def _fdiv(n: float, d: float) -> float:  # IEEE ±inf / NaN division
        with np.errstate(divide="ignore", invalid="ignore"):
            return float(np.float64(n) / np.float64(d))

    lam = float(lam)
    selected = [(0, seed[0], seed[2], None)]
    sel_vecs: list[tuple[list, float]] = [(seed[1], math.sqrt(_norm2(seed[1])))]
    chosen = {seed[0]}
    for step in range(1, k):
        pool = [c for c in cand if c[0] not in chosen]
        if not pool:
            break  # fewer candidates than k

        def _mmr(c):
            nv = math.sqrt(_norm2(c[1]))
            sims = [_fdiv(_dot(c[1], sv), nv * sn) for sv, sn in sel_vecs]
            # array_max: NaN is greatest, matching the sort order above
            mx = sims[0]
            for s in sims[1:]:
                if _gt(s, mx):
                    mx = s
            return lam * c[2] - (1.0 - lam) * mx

        scored = [(c, _mmr(c)) for c in pool]
        nxt, nxt_mmr = scored[0]
        for c, m in scored[1:]:
            if _gt(m, nxt_mmr) or (_eq(m, nxt_mmr) and c[0] < nxt[0]):
                nxt, nxt_mmr = c, m
        selected.append((step, nxt[0], nxt[2], nxt_mmr))
        sel_vecs.append((nxt[1], math.sqrt(_norm2(nxt[1]))))
        chosen.add(nxt[0])
    spark = candidates.sparkSession
    id_type = candidates.schema[id_col].dataType.simpleString()
    return spark.createDataFrame(
        selected,
        f"sel_order int, id {id_type}, score double, mmr double",
    ).select(
        "sel_order",
        F.col("id").alias(id_col),
        F.round("score", 6).alias("score"),
        F.round("mmr", 6).alias("mmr"),
    )


def silhouette_simplified(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Simplified (centroid-based) silhouette — the O(n·k) clustering
    quality score (Hruschka et al. 2004; the classic Rousseeuw 1987
    silhouette needs all-pairs distances, O(n²) — a non-starter at
    corpus scale): per point, ``a`` = distance to its OWN centroid,
    ``b`` = distance to the nearest OTHER centroid,
    ``s = (b − a) / max(a, b)`` (0 when both distances are 0).

    Returns one row per cluster: ``(cluster, n, mean_silhouette)``
    rounded to 6 — near 1 = tight and well separated, near 0 =
    boundary-riding, negative = likely mis-assigned.

    Scale shape: the k·dim centroid coordinates ride the plan as
    literals — SELF-ENFORCED at k·dim ≤ 20,000 (the same literal
    budget mmr_rerank enforces), raising before a megabyte-scale plan
    is ever compiled; distances are bit-replayable double left-folds,
    so the DuckDB oracle reproduces the exact IEEE sequence; one
    |clusters|-group aggregation ends the plan.  No shuffle beyond
    that aggregation, no join, nothing collects."""
    k = len(centroids)
    if k < 2:
        raise ValueError(f"need >= 2 centroids, got {k}")
    n_lits = int(k) * int(len(centroids[0]))
    if n_lits > 20_000:
        raise ValueError(
            f"silhouette_simplified: k*dim = {n_lits} literal centroid "
            "coordinates > 20000; the plan embeds every coordinate as "
            "a literal (the kcenter/MMR contract) and a larger budget "
            "compiles a megabyte-scale expression tree. Reduce k, "
            "project to fewer dimensions, or score against a centroid "
            "TABLE via a bucketed join instead."
        )
    cents_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )
    d2s = F.transform(
        cents_lit,
        lambda c: F.aggregate(
            F.zip_with(
                F.col(vec_col),
                c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    staged = embeddings.select(
        F.col(id_col).alias("__id"), d2s.alias("__d2s")
    )
    a2 = F.array_min("__d2s")
    # first index of the min = lowest cluster id on ties (matches the
    # assignment's (d2, cl) tie-break); array_position is 1-based
    own = F.array_position(F.col("__d2s"), a2)
    b2 = F.array_min(
        F.filter(F.col("__d2s"), lambda x, i: (i + 1) != own)
    )
    a, b = F.sqrt(a2), F.sqrt(b2)
    s_i = F.when(
        F.greatest(a, b) > 0, (b - a) / F.greatest(a, b)
    ).otherwise(F.lit(0.0))
    return (
        staged.select((own - 1).cast("int").alias("cluster"), s_i.alias("__s"))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("__s"), 6).alias("mean_silhouette"),
        )
    )


def knn_classify(
    train: DataFrame,
    test: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_test_rows: int = 10_000,
) -> DataFrame:
    """k-nearest-neighbor classification by exact cosine top-k +
    majority vote (Fix & Hodges 1951; Cover & Hart 1967) — the
    zero-training baseline every embedding-quality audit starts with:
    if k-NN over your embeddings can't separate the labels, no
    downstream head will.

    Neighbors come from :func:`brute_force_topk` (train corpus scanned
    once, test batch broadcast); the vote is per-query majority with a
    deterministic ``(count DESC, label ASC)`` tie-break.  Returns one
    row per test vector: ``(query_id, actual, predicted, n_votes,
    correct)``.

    Scale shape: ``brute_force_topk`` broadcasts the test batch and
    crossJoins it against the train corpus, so the batch being small
    is a hard precondition, not a hope — a SELF-ENFORCING
    ``max_test_rows`` pre-check (the ks_test/kcenter pattern) counts
    the test frame and refuses an unbounded eval set BEFORE the
    crossJoin plan ever executes.  Past the budget, route neighbors
    through :func:`ivf_topk` / :func:`lsh_topk` (bucketed equi-joins)
    and feed their output to a vote of your own.  After the scan,
    everything is one (query, label) count + one per-query top-1
    window over ≤ k rows per query."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if max_test_rows < 1:
        raise ValueError(f"max_test_rows must be >= 1, got {max_test_rows}")
    n_test = test.count()
    if n_test > max_test_rows:
        raise ValueError(
            f"knn_classify: test batch has {n_test} rows > "
            f"max_test_rows={max_test_rows}; the exact path broadcasts "
            "the batch and scores |test|x|train| pairs, which does not "
            "survive an unbounded eval set at corpus scale. Sample a "
            "bounded eval set upstream, raise max_test_rows if the "
            "batch is genuinely bounded, or use ivf_topk / lsh_topk "
            "(bucketed candidate generation) for corpus-scale scoring."
        )
    nbrs = brute_force_topk(
        train, test, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=id_col,
    )
    lab = train.select(
        F.col(id_col).alias("vec_id"), F.col(label_col).alias("__nl")
    )
    votes = (
        nbrs.join(lab, "vec_id")
        .groupBy("query_id", "__nl")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("__c").desc(), F.col("__nl").asc()
    )
    top = (
        votes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "query_id",
            F.col("__nl").alias("predicted"),
            F.col("__c").alias("n_votes"),
        )
    )
    truth = test.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("actual")
    )
    return top.join(truth, "query_id").select(
        "query_id",
        "actual",
        "predicted",
        "n_votes",
        (F.col("actual") == F.col("predicted")).alias("correct"),
    )


def kmeans_fit_exact(
    embeddings: DataFrame,
    k: int = 4,
    rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed Lloyd's k-means (Lloyd 1957/1982) with a fully
    ENGINE-REPLAYABLE contract — the hash-checkable sibling of
    :func:`kmeans_fit` (the production Arrow-partials fit, whose
    numpy-seeded init no SQL oracle can replay): initial centroids are the ``k``
    lowest-id vectors (engine-replayable, no random restarts — swap
    in k-center seeds upstream for quality), each of the fixed
    ``rounds`` iterations assigns every vector to its nearest
    centroid (squared-L2 left-fold, first-index tie-break — the
    :func:`silhouette_simplified` convention) and recomputes
    per-cluster per-dimension means; an emptied cluster keeps its
    previous centroid.  Returns one row per cluster after a final
    assignment pass: ``(cluster, n, wcss)`` rounded to 6 — feed the
    same centroids to :func:`silhouette_simplified` for quality.

    Scale shape: the k·dim centroid literals are budget-enforced
    (≤ 20k, the MMR contract); per round, ONE corpus pass assigns
    (JVM fold expressions) and ONE posexplode aggregation reduces to
    k·dim partial means (map-side combined — the exchange carries
    k·dim partials per partition, not n·dim rows), collected driver-
    side as a bounded k·dim frame and ROUNDED to 6 decimals so both
    engines replay identical next-round literals.  Rounds are a
    driver loop with bounded collects (the max-coverage precedent),
    never an unbounded iteration."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    init_rows = (
        embeddings.select(
            F.col(id_col).alias("__id"),
            # HALF_UP rounding JVM-side (F.round), matching the SQL
            # oracle's round() — python round() is banker's
            F.transform(
                F.col(vec_col), lambda x: F.round(x.cast("double"), 6)
            ).alias("__v"),
        )
        .orderBy("__id")
        .limit(k)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(
            f"kmeans_fit_exact: corpus has only {len(init_rows)} vectors < k={k}"
        )
    first = init_rows[0]["__v"]
    if first is None or len(first) == 0:
        raise ValueError(
            "kmeans_fit_exact: first seed vector is NULL/empty — the "
            "corpus has ragged or NULL-valued embedding arrays; filter "
            "or pad them upstream."
        )
    dim = len(first)
    # up-front dim contract (one bounded LIMIT-1 guard job): a vector
    # of a different length, a NULL array, or a NULL element would
    # otherwise surface rounds later as a bare KeyError/TypeError from
    # the driver centroid rebuild
    bad = (
        embeddings.where(
            F.col(vec_col).isNull()
            | (F.size(vec_col) != dim)
            | F.exists(vec_col, lambda x: x.isNull())
        )
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(
            f"kmeans_fit_exact: corpus contains vectors that are not "
            f"exactly dim={dim} non-NULL doubles (first seed's shape) — "
            "the corpus has ragged or NULL-valued embedding arrays; "
            "filter or pad them upstream."
        )
    cents = [[float(x) for x in r["__v"]] for r in init_rows]
    if k * dim > 20_000:
        raise ValueError(
            f"kmeans_fit_exact: k*dim = {k * dim} literal centroid "
            "coordinates > 20000 (the kcenter/MMR budget); reduce k or "
            "project to fewer dimensions first."
        )

    def _assign(cent_rows):
        cents_lit = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in cent_rows]
        )
        d2s = F.transform(
            cents_lit,
            lambda c: F.aggregate(
                F.zip_with(
                    F.col("__v"),
                    c,
                    lambda x, y: (x.cast("double") - y)
                    * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )
        staged = embeddings.select(
            F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
        ).withColumn("__d2s", d2s)
        own = F.array_position(F.col("__d2s"), F.array_min("__d2s"))
        return staged.select(
            "__id",
            "__v",
            (own - 1).cast("int").alias("cluster"),
            F.array_min("__d2s").alias("__d2"),
        )

    for _ in range(rounds):
        assigned = _assign(cents)
        means = (
            assigned.select("cluster", F.posexplode("__v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("m"))
            .collect()
        )
        new_cents = [list(c) for c in cents]  # emptied cluster keeps old
        per_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            per_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        for cl, dims in per_cluster.items():
            rebuilt = []
            for i in range(dim):
                m_i = dims.get(i)
                if m_i is None:
                    # a ragged corpus (vector shorter than the seed dim)
                    # or an all-NULL dimension would otherwise surface
                    # as a bare KeyError/TypeError from the driver loop
                    raise ValueError(
                        "kmeans_fit_exact: cluster "
                        f"{cl} has no mean for dimension {i} (expected "
                        f"dim={dim} from the first seed) — the corpus "
                        "has ragged or NULL-valued embedding arrays; "
                        "filter or pad them upstream."
                    )
                rebuilt.append(float(m_i))
            new_cents[cl] = rebuilt
        cents = new_cents

    final = _assign(cents)
    # wcss hash stability: a raw double sum is order-of-accumulation
    # dependent (partitioning changes which last-bit the 6-decimal
    # rounding sees), so round each row's d2 to 9 decimals — the
    # per-row fold order is identical in both engines, so the rounded
    # operands agree exactly — and accumulate as DECIMAL (associative,
    # partition-order invariant); both engines then sum identical
    # exact operands and the gate cannot flake across SFs/partitionings
    d2_exact = F.round(F.col("__d2"), 9).cast("decimal(38,9)")
    return (
        final.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum(d2_exact), 6).cast("double").alias("wcss"),
        )
    )
