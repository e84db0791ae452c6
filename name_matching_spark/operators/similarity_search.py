"""Similarity search over an embedding column (array<float>).

Baseline: brute-force cosine top-k. The per-PAIR stage (the hot loop)
computes cosines in an Arrow-vectorized numpy kernel (einsum over the
batch — >2x the JVM higher-order-function fold, which disables whole-stage
codegen); values agree with the SQL-oracle rendition at well beyond the
gate's 6-decimal tolerance (only the ULP-level summation order differs).
Scale paths: seeded random-hyperplane LSH bucketing and an IVF-style
coarse quantizer, both cutting the candidate set before the exact rerank.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

__all__ = [
    "cosine_similarity_col",
    "brute_force_topk",
    "cosine_near_dupes",
    "hyperplane_lsh_buckets",
    "lsh_topk",
    "lsh_candidate_pairs",
    "lsh_near_dupes",
    "ivf_topk",
    "semantic_dedup",
    "ivf_assignments",
    "centroid_update",
    "cluster_medoids",
    "banding_candidate_prob",
    "banding_config",
    "banding_cost_solve",
]


def banding_candidate_prob(
    cosine: float, n_bands: int, band_planes: int
) -> float:
    """Probability that a pair with the given cosine becomes an LSH
    candidate under OR-of-ANDs banding: per-plane collision prob is
    ``p = 1 - arccos(cosine)/pi`` (random-hyperplane LSH), a band matches
    with ``p^band_planes``, and the pair is a candidate iff at least one of
    ``n_bands`` bands matches. Accepts a scalar or a numpy array of
    cosines (the cost solver integrates over a quadrature grid)."""
    p = 1.0 - np.arccos(np.clip(cosine, -1.0, 1.0)) / np.pi
    return 1.0 - (1.0 - p**band_planes) ** n_bands


def banding_config(
    threshold: float,
    recall_target: float = 0.95,
    band_planes: int | None = None,
    max_bands: int = 64,
) -> tuple[int, int]:
    """Solve for ``(n_bands, band_planes)`` achieving
    ``banding_candidate_prob(threshold, ...) >= recall_target`` for every
    pair AT the threshold (higher-cosine pairs collide more, so the bound
    holds for all qualifying pairs).

    With ``band_planes`` fixed, ``n_bands`` is the exact closed form
    ``ceil(log(1 - recall) / log(1 - p^band_planes))``. Otherwise the
    LARGEST ``band_planes`` whose required band count fits ``max_bands`` is
    chosen — more planes per band means fewer, more selective buckets, i.e.
    maximal pruning at the recall target.

    Caveat (measured on the q28 profile): when the corpus is
    near-orthogonal at a LOW threshold, per-plane collision prob ``p``
    approaches 0.5 and ANY sign-LSH config prunes weakly — candidate
    generation degenerates toward all-pairs and the job is rerank-bound.
    Banding pays off at realistic near-dup thresholds (~0.8+), where ``p``
    is large and a few selective bands reach recall ~1 cheaply.
    """
    if not 0.0 < recall_target < 1.0:
        raise ValueError("recall_target must be in (0, 1)")
    p = 1.0 - float(np.arccos(np.clip(threshold, -1.0, 1.0))) / np.pi
    if p <= 0.0:
        raise ValueError("threshold too low: per-plane collision prob is 0")

    def bands_needed(planes: int) -> int:
        band_p = p**planes
        if band_p >= 1.0:
            return 1
        return int(np.ceil(np.log1p(-recall_target) / np.log1p(-band_p)))

    if band_planes is not None:
        n = bands_needed(band_planes)
        if n > max_bands:
            raise ValueError(
                f"recall_target {recall_target} needs {n} bands at "
                f"band_planes={band_planes} (max_bands={max_bands})"
            )
        return n, band_planes
    best = (bands_needed(1), 1)
    planes = 2
    while True:
        n = bands_needed(planes)
        if n > max_bands:
            break
        best = (n, planes)
        planes += 1
    if best[0] > max_bands:
        raise ValueError(
            f"recall_target {recall_target} at threshold {threshold} "
            f"needs {best[0]} single-plane bands (max_bands={max_bands})"
        )
    return best


def banding_cost_solve(
    threshold: float,
    recall_target: float,
    n_vectors: int,
    dim: int,
    pair_cosine_mu: float = 0.0,
    pair_cosine_sigma: float | None = None,
    max_bands: int = 64,
    max_planes: int = 8,
    sig_cost_per_plane: float = 1.0,
    rerank_cost_per_candidate: float = 25.0,
) -> dict:
    """COST-AWARE banding solve: choose ``(n_bands, band_planes)``
    minimizing expected total work — signatures plus rerank — subject to
    per-pair recall >= ``recall_target`` at the threshold, and SAY what
    every feasible config would cost (the no-silent-cost analog of
    ``token_cap_census``: weak pruning must be visible, not discovered in
    production).

    Expected candidate volume integrates :func:`banding_candidate_prob`
    over the corpus pair-cosine distribution, modeled Gaussian
    ``N(pair_cosine_mu, pair_cosine_sigma)`` with the random-unit-vector
    default ``sigma = 1/sqrt(dim)`` (measured on the embeddings corpus:
    mu = 0.000, sigma = 0.125 at dim 64 for every SF — the analytic
    profile exactly). A fixed 241-point quadrature over mu +- 6 sigma
    keeps the solve deterministic (no RNG), so the same table renders
    into SQL-oracle literals.

    Cost model per config (n bands x r planes):
      ``sig  = n_vectors * n * r * sig_cost_per_plane``   (dot products)
      ``rerank = E[candidates] * rerank_cost_per_candidate`` (exact cosine)
    The default 25:1 rerank:plane ratio reflects that a candidate costs
    two vector fetches + a dim-length dot + a shuffled pair row, vs one
    in-cache projection per plane; the argmin is insensitive to this
    ratio when pruning is strong or absent (the two regimes that matter).

    Returns a dict: ``n_bands``, ``band_planes``, ``miss_prob`` (at the
    threshold), ``expected_candidate_frac``, ``expected_candidates``,
    ``strategy`` ('lsh', or 'exact' when even the best config's expected
    cost >= brute-force rerank of all pairs — the honest verdict on
    weak-pruning corpora, where LSH adds signature cost without removing
    rerank cost), and ``table``: one row per band_planes in
    [1, max_planes] with (band_planes, n_bands, feasible, miss_ppm,
    expected_candidate_ppm, cost) — the caller's census surface.

    On q28's profile (threshold 0.3 over near-orthogonal embeddings) the
    argmin is single-plane: every feasible config passes ~100% of pairs
    (expected_candidate_ppm ~ 10^6), so added planes only add signature
    cost, and ``strategy`` is 'exact'. At a realistic near-dup threshold
    (0.8+) the same solve turns on multi-plane pruning with
    expected_candidate_ppm orders of magnitude lower — pinned by
    tests/test_ann_multimodal_streaming.py.
    """
    if not 0.0 < recall_target < 1.0:
        raise ValueError("recall_target must be in (0, 1)")
    if pair_cosine_sigma is None:
        pair_cosine_sigma = 1.0 / float(np.sqrt(dim))
    p_thr = 1.0 - float(np.arccos(np.clip(threshold, -1.0, 1.0))) / np.pi
    if p_thr <= 0.0:
        raise ValueError("threshold too low: per-plane collision prob is 0")
    xs = np.linspace(
        pair_cosine_mu - 6.0 * pair_cosine_sigma,
        pair_cosine_mu + 6.0 * pair_cosine_sigma,
        241,
    )
    w = np.exp(-0.5 * ((xs - pair_cosine_mu) / pair_cosine_sigma) ** 2)
    w /= w.sum()
    n_pairs = n_vectors * (n_vectors - 1) / 2.0
    table: list[dict] = []
    best: dict | None = None
    for planes in range(1, max_planes + 1):
        band_p = p_thr**planes
        n = (
            1
            if band_p >= 1.0
            else int(np.ceil(np.log1p(-recall_target) / np.log1p(-band_p)))
        )
        feasible = n <= max_bands
        row: dict = {"band_planes": planes, "n_bands": n, "feasible": feasible}
        if feasible:
            frac = float(
                (w * banding_candidate_prob(xs, n, planes)).sum()
            )
            miss = 1.0 - banding_candidate_prob(threshold, n, planes)
            cost = (
                n_vectors * n * planes * sig_cost_per_plane
                + frac * n_pairs * rerank_cost_per_candidate
            )
            row.update(
                miss_ppm=int(round(miss * 1_000_000)),
                expected_candidate_ppm=int(round(frac * 1_000_000)),
                cost=cost,
                miss_prob=miss,
                expected_candidate_frac=frac,
            )
            if best is None or cost < best["cost"]:
                best = row
        else:
            row.update(
                miss_ppm=None, expected_candidate_ppm=None, cost=None,
                miss_prob=None, expected_candidate_frac=None,
            )
        table.append(row)
    if best is None:
        raise ValueError(
            f"no feasible banding for recall {recall_target} at threshold "
            f"{threshold} within max_bands={max_bands}"
        )
    brute = n_pairs * rerank_cost_per_candidate
    return {
        "n_bands": best["n_bands"],
        "band_planes": best["band_planes"],
        "miss_prob": best["miss_prob"],
        "expected_candidate_frac": best["expected_candidate_frac"],
        "expected_candidates": best["expected_candidate_frac"] * n_pairs,
        "strategy": "lsh" if best["cost"] < brute else "exact",
        "table": table,
    }


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns as a pure JVM
    column expression (sequential fold; 0.0 when either norm is 0). For
    per-pair hot loops prefer :func:`_with_pair_cosine` (Arrow kernel)."""
    dot = _dot(a, b)
    na = F.sqrt(_dot(a, a))
    nb = F.sqrt(_dot(b, b))
    return F.when((na == 0) | (nb == 0), 0.0).otherwise(dot / (na * nb))


def _batch_cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    dot = np.einsum("ij,ij->i", a, b)
    na = np.sqrt(np.einsum("ij,ij->i", a, a))
    nb = np.sqrt(np.einsum("ij,ij->i", b, b))
    denom = na * nb
    return np.where(denom == 0, 0.0, dot / np.where(denom == 0, 1.0, denom))


def _list_col_matrix(col, n: int) -> np.ndarray | None:
    """Arrow list column -> (n, dim) float64 matrix via the FLAT values
    buffer (zero Python-object round trips — the pandas path materializes a
    Series of per-row ndarrays, ~1000x slower at 64k-row batches). Returns
    None when any row is NULL or rows are ragged (caller falls back).

    Raggedness is checked per row via ``list_value_length`` — a
    divisibility check alone is unsound: a ragged batch whose lengths sum
    to a multiple of n (e.g. dims 63/65 averaging 64) would reshape into a
    silently misaligned matrix."""
    import pyarrow.compute as pc

    if n == 0 or col.null_count:
        return None
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    dim = int(lengths[0])
    if dim == 0 or not (lengths == dim).all():
        return None
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(
        np.float64, copy=False
    )
    return flat.reshape(n, dim)


# auto cap for broadcasting the corpus vectors into the pair-cosine kernel
# closure: n_vectors * dim float64 elements (32 MB at the default)
BROADCAST_VECTOR_ELEMENTS = 4_000_000


def _collect_vector_dict(
    df: DataFrame, id_col: str, vec_col: str, max_elements: int
):
    """(sorted ids, (n, dim) float64 matrix) for a small corpus, or None
    when it exceeds ``max_elements`` (or is ragged, or the id column is not
    an integral type — string/decimal ids fall back to the join path rather
    than raising). One small eager job."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        return None  # non-integral ids: use the join path
    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        return None
    dim = first["d"] or 0
    n = df.count()
    if dim <= 0 or n * dim > max_elements:
        return None
    rows = df.select(id_col, vec_col).collect()
    ids = np.empty(n, dtype=np.int64)
    mat = np.empty((n, dim), dtype=np.float64)
    for i, r in enumerate(rows):
        v = r[1]
        if r[0] is None or v is None or len(v) != dim:
            return None  # null-id/ragged corpus: fall back to the join path
        ids[i] = r[0]
        mat[i] = v
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    if n > 1 and (ids[1:] == ids[:-1]).any():
        return None  # conflicting vectors under one id: never pick silently
    return ids, mat


def _pair_cosine_from_dict(
    cand: DataFrame,
    ids: np.ndarray,
    mat: np.ndarray,
    id1: str = "id1",
    id2: str = "id2",
    out: str = "cosine",
) -> DataFrame:
    """Append cosine(``id1``, ``id2``) looked up from the closure-broadcast
    vector matrix — the rerank ships two bigints per pair instead of
    2 x dim floats (the join path's measured cost is Arrow transfer of the
    vectors, not the einsum). Values are bit-identical to the join path:
    same float32 -> float64 cast per element, same einsum fold."""
    import pyarrow as pa
    from pyspark.sql.types import StructField, StructType

    fields = list(cand.schema.fields)
    out_schema = StructType(fields + [StructField(out, DoubleType())])
    names = [f.name for f in fields]
    norms = np.sqrt(np.einsum("ij,ij->i", mat, mat))

    def compute(batches):
        for b in batches:
            i1 = b.column(b.schema.get_field_index(id1)).to_numpy(
                zero_copy_only=False
            )
            i2 = b.column(b.schema.get_field_index(id2)).to_numpy(
                zero_copy_only=False
            )
            p1 = np.searchsorted(ids, i1)
            p2 = np.searchsorted(ids, i2)
            dot = np.einsum("ij,ij->i", mat[p1], mat[p2])
            denom = norms[p1] * norms[p2]
            cos = np.where(denom == 0, 0.0, dot / np.where(denom == 0, 1.0, denom))
            arrays = [b.column(i) for i in range(b.num_columns)]
            arrays.append(pa.array(cos, type=pa.float64()))
            yield pa.RecordBatch.from_arrays(arrays, names + [out])

    return cand.mapInArrow(compute, out_schema)


def _with_pair_cosine(
    df: DataFrame, v1: str, v2: str, out: str = "cosine",
    drop: tuple = None,
) -> DataFrame:
    """Append a batched cosine(``v1``, ``v2``) column via ``mapInArrow`` —
    the pair-stage hot loop reads the Arrow list buffers flat and runs one
    einsum per batch. ``drop`` (default: both vector columns) controls
    which inputs are projected away afterwards."""
    import pyarrow as pa
    from pyspark.sql.types import StructField, StructType

    drop = (v1, v2) if drop is None else drop
    keep = [f for f in df.schema.fields if f.name not in drop]
    out_schema = StructType(keep + [StructField(out, DoubleType())])
    keep_names = [f.name for f in keep]

    def compute(batches):
        for b in batches:
            n = b.num_rows
            c1 = b.column(b.schema.get_field_index(v1))
            c2 = b.column(b.schema.get_field_index(v2))
            m1 = _list_col_matrix(c1, n)
            m2 = _list_col_matrix(c2, n)
            if m1 is not None and m2 is not None and m1.shape == m2.shape:
                cos = _batch_cosine_matrix(m1, m2)
            else:  # ragged/null/empty fallback, row-at-a-time numpy
                cos = np.zeros(n, dtype=np.float64)
                p1 = c1.to_pylist()
                p2 = c2.to_pylist()
                for i in range(n):
                    if p1[i] is None or p2[i] is None:
                        continue  # NULL vector -> cosine 0.0
                    x = np.asarray(p1[i], dtype=np.float64)
                    y = np.asarray(p2[i], dtype=np.float64)
                    if x.shape != y.shape:
                        continue  # dim mismatch -> cosine 0.0
                    d = np.sqrt(x @ x) * np.sqrt(y @ y)
                    cos[i] = 0.0 if d == 0 else (x @ y) / d
            arrays = [b.column(b.schema.get_field_index(c)) for c in keep_names]
            arrays.append(pa.array(cos, type=pa.float64()))
            yield pa.RecordBatch.from_arrays(arrays, keep_names + [out])

    return df.mapInArrow(compute, out_schema)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_vectors: bool | None = None,
) -> DataFrame:
    """Exact top-k neighbors for every query row against the corpus.

    crossJoin + windowed rank; Catalyst broadcasts the smaller side. O(Q*N)
    — the correctness baseline and the right tool when Q is small (rerank
    stage). Ties break on neighbor id for determinism. Self-pairs (same id)
    are excluded.

    ``broadcast_vectors`` (None = auto when the corpus fits
    ``BROADCAST_VECTOR_ELEMENTS``): the pair stage ships two bigints per
    pair and looks vectors up from the kernel-closure matrix instead of
    crossJoining 2 x dim floats per pair — bit-identical cosines. Big
    corpora fall back to the join path automatically.
    """
    vd = None
    if broadcast_vectors or broadcast_vectors is None:
        # project to (id, vec) before the union so query/corpus frames with
        # differing extra columns still align; dedup on (id, vec) so an id
        # bound to two DIFFERENT vectors survives as two rows and is then
        # rejected by _collect_vector_dict instead of silently picking one
        vd = _collect_vector_dict(
            queries.select(id_col, vec_col)
            .unionByName(corpus.select(id_col, vec_col))
            .dropDuplicates([id_col, vec_col]),
            id_col, vec_col, BROADCAST_VECTOR_ELEMENTS,
        )
        if vd is None and broadcast_vectors:
            raise ValueError("corpus exceeds BROADCAST_VECTOR_ELEMENTS")
    if vd is not None:
        ids, mat = vd
        cand = (
            queries.select(F.col(id_col).alias("query_id"))
            .crossJoin(corpus.select(F.col(id_col).alias("neighbor_id")))
            .filter(F.col("query_id") != F.col("neighbor_id"))
        )
        scored = _pair_cosine_from_dict(cand, ids, mat, "query_id", "neighbor_id")
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        )
        scored = _with_pair_cosine(
            q.crossJoin(c).filter(F.col("query_id") != F.col("neighbor_id")),
            "qv", "cv",
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_near_dupes(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_vectors: bool | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all unordered pairs with
    cosine >= threshold. Exact form (crossJoin + filter) — the correctness
    baseline; at corpus scale route through
    :func:`hyperplane_lsh_buckets` first and rerank within buckets.
    ``broadcast_vectors`` as in :func:`brute_force_topk`."""
    vd = None
    if broadcast_vectors or broadcast_vectors is None:
        vd = _collect_vector_dict(df, id_col, vec_col, BROADCAST_VECTOR_ELEMENTS)
        if vd is None and broadcast_vectors:
            raise ValueError("corpus exceeds BROADCAST_VECTOR_ELEMENTS")
    if vd is not None:
        ids, mat = vd
        a = df.select(F.col(id_col).alias("id1"))
        b = df.select(F.col(id_col).alias("id2"))
        scored = _pair_cosine_from_dict(
            a.crossJoin(b).filter(F.col("id1") < F.col("id2")), ids, mat
        )
    else:
        a = df.select(
            F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"),
        )
        b = df.select(
            F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"),
        )
        scored = _with_pair_cosine(
            a.crossJoin(b).filter(F.col("id1") < F.col("id2")), "v1", "v2"
        )
    return (
        scored.filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def _kmeans_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str,
    seed: int,
) -> DataFrame:
    """Train a KMeans coarse quantizer on the corpus and return its centers
    as a (centroid_id, cv) frame — same shape the deterministic quantizer
    feeds the broadcast join, so the physical plan is unchanged."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, featuresCol="features").fit(feat)
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    return corpus.sparkSession.createDataFrame(
        centers, schema="centroid_id long, cv array<double>"
    )


def _coarse_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str,
    vec_col: str,
    centroids: str,
    kmeans_seed: int,
) -> DataFrame:
    """(centroid_id, cv) coarse-quantizer frame — ``deterministic`` (the
    n_centroids lowest-id corpus vectors, fully SQL-expressible for
    oracles) or seeded ``kmeans`` (the production choice)."""
    if centroids == "kmeans":
        return _kmeans_centroids(corpus, n_centroids, vec_col, kmeans_seed)
    if centroids == "deterministic":
        return (
            corpus.orderBy(F.col(id_col))
            .limit(n_centroids)
            .select(
                F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv"),
            )
        )
    raise ValueError("centroids must be 'deterministic' or 'kmeans'")


def _nearest_centroids(
    df: DataFrame,
    cent: DataFrame,
    side_id: str,
    keep: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Attach the ``keep`` nearest centroid ids (by cosine, ties on
    centroid id) to every row of ``df`` — broadcast centroids, one window
    per side row."""
    v = df.select(F.col(id_col).alias(side_id), F.col(vec_col).alias("v"))
    scored = _with_pair_cosine(
        v.join(F.broadcast(cent), how="cross"),
        "v", "cv", out="csim", drop=("cv",),
    )
    w = Window.partitionBy(side_id).orderBy(F.desc("csim"), F.asc("centroid_id"))
    return (
        scored.withColumn("_cr", F.row_number().over(w))
        .filter(F.col("_cr") <= keep)
        .select(side_id, "v", "centroid_id")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "deterministic",
    kmeans_seed: int = 42,
) -> DataFrame:
    """IVF-flavored approximate top-k: a coarse quantizer partitions the
    corpus into inverted lists; each query probes its ``n_probe`` nearest
    centroids and exact-reranks only those lists.

    The default coarse quantizer (``centroids="deterministic"``) is the
    ``n_centroids`` lowest-id corpus vectors — reproducible, and the oracle
    can express the whole structure in SQL. ``centroids="kmeans"`` trains
    the quantizer with seeded KMeans instead (the production choice:
    centers adapt to the data distribution, so inverted lists are balanced
    and probes land better); the plan shape — broadcast centroids -> argmin
    assignment -> shuffle on centroid id -> windowed rerank — is identical
    either way. Recall rises with ``n_probe``; ``n_probe = n_centroids``
    degenerates to exact search under EITHER quantizer (every list is
    probed — pinned by tests).

    Shuffle shape at scale: centroid set broadcast to both sides, one
    shuffle on ``centroid_id`` for the probe join (each inverted list is a
    partition-local scan), one window for top-k.
    """
    cent = _coarse_centroids(
        corpus, n_centroids, id_col, vec_col, centroids, kmeans_seed
    )

    def _nearest(df: DataFrame, side_id: str, keep: int) -> DataFrame:
        return _nearest_centroids(df, cent, side_id, keep, id_col, vec_col)

    lists = _nearest(corpus, "neighbor_id", 1)
    probes = _nearest(queries, "query_id", n_probe)
    scored = _with_pair_cosine(
        probes.withColumnsRenamed({"v": "qv"})
        .join(lists.withColumnsRenamed({"v": "nv"}), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id")),
        "qv", "nv",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: str = "deterministic",
    kmeans_seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the embedding corpus with a coarse
    quantizer, then compare pairs only WITHIN each cluster and drop every
    vector that has a lower-id cluster-mate at cosine >= ``threshold``.

    The pointwise drop rule is the paper's (no transitive closure): a row
    is dropped iff some lower-id member of its own cluster is a semantic
    duplicate; ``canonical_id`` is the smallest such duplicate (the
    evidence pointer), or the row's own id when kept.

    Output: ``(vec_id, centroid_id, canonical_id, is_kept)`` for every
    corpus row.

    Scale shape: broadcast centroid set -> argmin assignment (narrow) ->
    ONE shuffle on centroid_id for the within-cluster self-join -> batched
    Arrow cosine on the pair stream -> per-victim min aggregate. Pair count
    is sum of cluster sizes squared / 2 — the quantizer bounds it (that is
    the SemDeDup design point; all-pairs never materializes across
    clusters). Quantizer choice as in :func:`ivf_topk`: ``deterministic``
    keeps the whole structure SQL-expressible; ``kmeans`` (seeded) is the
    production choice with balanced lists.
    """
    cent = _coarse_centroids(
        corpus, n_centroids, id_col, vec_col, centroids, kmeans_seed
    )
    asn = _nearest_centroids(corpus, cent, "_rid", 1, id_col, vec_col)
    a = asn.select(
        F.col("_rid").alias("id1"), F.col("v").alias("v1"), "centroid_id"
    )
    b = asn.select(
        F.col("_rid").alias("id2"), F.col("v").alias("v2"), "centroid_id"
    )
    dup_edges = _with_pair_cosine(
        a.join(b, "centroid_id").filter(F.col("id1") < F.col("id2")),
        "v1", "v2",
    ).filter(F.col("cosine") >= threshold)
    victims = dup_edges.groupBy("id2").agg(F.min("id1").alias("_dup_of"))
    return (
        asn.join(victims, asn["_rid"] == victims["id2"], "left")
        .select(
            F.col("_rid").alias(id_col),
            "centroid_id",
            F.coalesce(F.col("_dup_of"), F.col("_rid")).alias("canonical_id"),
            F.col("_dup_of").isNull().cast("int").alias("is_kept"),
        )
    )


def _seeded_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def _with_sign_sigs(
    df: DataFrame,
    planes: list[list[float]],
    band_planes: int,
    vec_col: str,
    out_col: str = "_sigs",
) -> DataFrame:
    """Append an ``array<bigint>`` column of per-band packed sign
    signatures: band k's element is sum over p of (1 << p) where
    ``dot(vec, planes[k*band_planes + p]) >= 0``.

    ONE vectorized pass per Arrow batch against the (n_planes, dim) plane
    matrix — replaces n_bands x band_planes JVM higher-order folds per row,
    which disable whole-stage codegen (this module's measured finding). Sign
    semantics mirror the fold exactly: NULL vectors and vectors whose
    length differs from the plane dim get all-zero signatures (the fold's
    null-propagating ``when(proj >= 0, ...).otherwise(0)`` behavior).

    The projection is accumulated dimension-by-dimension in float64 — a
    sequential left-to-right fold, bit-identical to DuckDB's ``list_sum``
    (measured: list_sum([1e16,1,1,-1e16]) = 0.0, i.e. L->R) and to Spark's
    ``aggregate`` fold, for ANY dim. A BLAS matmul (``m @ P.T``) is NOT
    used on purpose: its blocked accumulation order can round a
    within-1-ulp-of-zero projection to the other side of the sign
    boundary, silently changing bucket membership vs the oracle.
    """
    import pyarrow as pa
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    P = np.asarray(planes, dtype=np.float64)  # (n_planes, dim)
    n_bands = P.shape[0] // band_planes
    weights = 1 << np.arange(band_planes, dtype=np.int64)
    fields = list(df.schema.fields)
    out_schema = StructType(fields + [StructField(out_col, ArrayType(LongType()))])
    names = [f.name for f in fields]

    def compute(batches):
        for b in batches:
            n = b.num_rows
            c = b.column(b.schema.get_field_index(vec_col))
            m = _list_col_matrix(c, n)
            if m is not None and m.shape[1] == P.shape[1]:
                # sequential L->R fold over dims (see docstring); each step
                # is one vectorized FMA over the (n, n_planes) accumulator
                proj = np.zeros((n, P.shape[0]), dtype=np.float64)
                for i in range(P.shape[1]):
                    proj += m[:, i : i + 1] * P.T[i : i + 1, :]
                signs = proj >= 0  # (n, n_planes)
                packed = (
                    signs.reshape(n, n_bands, band_planes).astype(np.int64)
                    @ weights
                )  # (n, n_bands)
                sigs = packed.tolist()
            else:  # ragged/null fallback, row-at-a-time
                sigs = []
                zero = [0] * n_bands
                for row in c.to_pylist():
                    if row is None or len(row) != P.shape[1]:
                        sigs.append(zero)
                        continue
                    s = (P @ np.asarray(row, dtype=np.float64)) >= 0
                    sigs.append(
                        (
                            s.reshape(n_bands, band_planes).astype(np.int64)
                            @ weights
                        ).tolist()
                    )
            arrays = [b.column(i) for i in range(b.num_columns)]
            arrays.append(pa.array(sigs, type=pa.list_(pa.int64())))
            yield pa.RecordBatch.from_arrays(arrays, names + [out_col])

    return df.mapInArrow(compute, out_schema)


def hyperplane_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Attach a ``bucket`` column: sign bits against ``n_planes`` seeded
    random hyperplanes packed into a bigint. Cosine-similar vectors collide
    with probability (1 - theta/pi)^n_planes. One Arrow matmul per batch
    (single band of ``n_planes`` bits)."""
    planes = _seeded_planes(dim, n_planes, seed)
    return (
        _with_sign_sigs(df, planes, band_planes=n_planes, vec_col=vec_col)
        .withColumn("bucket", F.element_at(F.col("_sigs"), 1))
        .drop("_sigs")
    )


def _band_signatures(
    df: DataFrame,
    dim: int,
    n_bands: int,
    band_planes: int,
    seed: int,
    vec_col: str,
) -> DataFrame:
    """Attach ``band`` / ``band_sig`` rows (one per band) by posexploding the
    kernel-computed per-band signature array. ``n_bands * band_planes``
    seeded planes are sliced band-wise; band k's signature packs its
    ``band_planes`` sign bits into an int."""
    planes = _seeded_planes(dim, n_bands * band_planes, seed)
    return (
        _with_sign_sigs(df, planes, band_planes, vec_col)
        .select("*", F.posexplode(F.col("_sigs")).alias("band", "band_sig"))
        .drop("_sigs")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    dim: int,
    n_bands: int,
    band_planes: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distinct candidate pairs ``(id1 < id2)`` agreeing on at least one
    full band signature — the pre-rerank stage of :func:`lsh_near_dupes`,
    exposed separately so cost censuses (q140) can measure OBSERVED
    candidate volume per banding config against the solver's prediction.
    One shuffle on (band, band_sig) plus one pair dedup; never a cross
    join."""
    banded = _band_signatures(
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
        dim, n_bands, band_planes, seed, "_v",
    ).select("_id", "band", "band_sig")
    a = banded.select(F.col("_id").alias("id1"), "band", "band_sig")
    b = banded.select(F.col("_id").alias("id2"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def lsh_near_dupes(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bands: int = 8,
    band_planes: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    recall_target: float | None = None,
    broadcast_vectors: bool | None = None,
) -> DataFrame:
    """Bucketed embedding-threshold dedup: the production form of
    :func:`cosine_near_dupes` — multi-band hyperplane LSH candidate
    generation + exact cosine rerank, no all-pairs shape anywhere.

    Candidates are pairs agreeing on at least one full band signature
    (OR-of-ANDs banding: candidate probability for angle theta is
    ``1 - (1 - (1-theta/pi)^band_planes)^n_bands``). Recall rises with
    ``n_bands`` and falls with ``band_planes``; ``band_planes=1`` with
    several bands gives near-1 recall at moderate thresholds (pair-set
    equality with the exact form is pinned by
    tests/test_similarity_search.py at the q28 configuration).

    ``recall_target`` overrides (``n_bands``, ``band_planes``) with the
    :func:`banding_config` solution for ``threshold`` — expected recall >=
    the target for every qualifying pair. See the solver's caveat on
    near-orthogonal/low-threshold corpora (q28's profile), where any
    sign-LSH config prunes weakly and the job is rerank-bound.

    Shuffle shape at scale: one shuffle on (band, band_sig) for the
    candidate join, a dedup on (id1, id2), and two id-keyed joins to fetch
    vectors for the rerank — never a crossJoin.
    """
    if recall_target is not None:
        n_bands, band_planes = banding_config(threshold, recall_target)
    cand = lsh_candidate_pairs(
        df, dim, n_bands, band_planes, seed, id_col, vec_col
    )
    vd = None
    if broadcast_vectors or broadcast_vectors is None:
        vd = _collect_vector_dict(df, id_col, vec_col, BROADCAST_VECTOR_ELEMENTS)
        if vd is None and broadcast_vectors:
            raise ValueError("corpus exceeds BROADCAST_VECTOR_ELEMENTS")
    if vd is not None:
        ids, mat = vd
        scored = _pair_cosine_from_dict(cand, ids, mat)
    else:
        v1 = df.select(
            F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"),
        )
        v2 = df.select(
            F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"),
        )
        scored = _with_pair_cosine(cand.join(v1, "id1").join(v2, "id2"), "v1", "v2")
    return (
        scored.filter(F.col("cosine") >= threshold)
        .select("id1", "id2", "cosine")
    )


def lsh_topk(
    df: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate all-pairs top-k: bucket by hyperplane signature, exact
    cosine rerank WITHIN buckets. One shuffle on bucket instead of a full
    cross join — the 100 TB path (recall is tunable via n_planes; fewer
    planes = bigger buckets = higher recall & cost)."""
    b = hyperplane_lsh_buckets(df, dim, n_planes, seed, vec_col)
    a = b.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket",
    )
    c = b.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket",
    )
    scored = _with_pair_cosine(
        a.join(c, "bucket").filter(F.col("query_id") != F.col("neighbor_id")),
        "qv", "cv",
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_assignments(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment under the deterministic coarse
    quantizer (the ``n_centroids`` lowest-id corpus vectors — the same
    quantizer :func:`ivf_topk` defaults to): broadcast centroids, one
    kernel cosine per (vector, centroid), per-vector argmax window. The
    E-step of Lloyd's algorithm / the list-building stage of IVF, exposed
    for inverted-list maintenance and cluster analytics.

    Output: ``(id_col, v, centroid_id, csim)`` — one row per corpus
    vector. Shuffle shape: centroids broadcast; the only shuffle is the
    per-vector window (partitioned by vector id).
    """
    cent = (
        corpus.orderBy(F.col(id_col))
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv"))
    )
    v = corpus.select(F.col(id_col), F.col(vec_col).alias("v"))
    scored = _with_pair_cosine(
        v.join(F.broadcast(cent), how="cross"), "v", "cv", out="csim",
        drop=("cv",),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("csim"), F.asc("centroid_id"))
    return (
        scored.withColumn("_cr", F.row_number().over(w))
        .filter(F.col("_cr") == 1)
        .select(id_col, "v", "centroid_id", "csim")
    )


# 2^40: fixed-point scale for cross-engine-exact distributed means. A
# power-of-two multiply only shifts the exponent (exact in IEEE doubles),
# so floor(x * 2^40) is the same integer in every engine and the summation
# becomes exact bigint arithmetic — no float summation-order dependence.
FIXED_POINT_SCALE = float(1 << 40)


def centroid_update(
    assigned: DataFrame,
    vec_col: str = "v",
    cluster_col: str = "centroid_id",
) -> DataFrame:
    """One Lloyd M-step: the mean vector per cluster, computed exactly.

    Distributed float means are summation-order-dependent; here each
    component is quantized to 2^-40 fixed point (``floor(x * 2^40)`` —
    exact for |x| < 2^23, far above any normalized embedding), summed as
    bigints (map-side partial aggregation; one shuffle on
    (cluster, dim)), and the mean is one double division of exact
    integers at the end. The 2^-40 quantization error (~1e-12) is twelve
    orders below float32 input precision.

    Long format out: ``(cluster_col, dim, n, sum_scaled, mean)`` — ready
    to re-broadcast as the next iteration's centroids or to serve as
    entity-level embeddings after ER clustering.
    """
    exploded = assigned.select(
        F.col(cluster_col),
        F.posexplode(F.col(vec_col)).alias("dim", "_x"),
    )
    scaled = exploded.withColumn(
        "_sx",
        F.floor(F.col("_x").cast("double") * F.lit(FIXED_POINT_SCALE)).cast(
            "bigint"
        ),
    )
    return (
        scaled.groupBy(cluster_col, "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_sx").alias("sum_scaled"),
        )
        .withColumn(
            "mean",
            F.col("sum_scaled").cast("double")
            / (F.col("n").cast("double") * F.lit(FIXED_POINT_SCALE)),
        )
    )


def cluster_medoids(
    vectors: DataFrame,
    assignments: DataFrame,
    id_col: str = "vec_id",
    cluster_col: str = "cluster_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic representative per cluster: the member closest (cosine) to
    its cluster's mean vector — the embedding-space analog of
    ``clustering.select_canonical`` (SemDeDup keeps one exemplar per
    semantic cluster; this picks it by centroid proximity instead of
    lowest id). Ties break by member id ascending.

    Fully relational (no vector UDF): one posexplode to (cluster, member,
    dim, x) — rows x dim, narrow — a (cluster, dim)-keyed mean for the
    centroid, a join back on (cluster, dim) for dots/norms, and a min_by
    per cluster. Both the centroid means and the dot products are plain
    group sums, the same reduction shape the SQL oracle runs, so
    cross-engine drift is one ulp-scale rounding per dimension — ranking
    flips would need two members at cosine distance ~1e-15 from each
    other.

    Output: (cluster_id, medoid_id, n_members, medoid_cos).
    """
    v = vectors.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).join(
        assignments.select(
            F.col(id_col).alias("_id"), F.col(cluster_col).alias("_cl")
        ),
        "_id",
    )
    dims = v.select(
        "_cl",
        "_id",
        F.posexplode("_v").alias("_d", "_xf"),
    ).select("_cl", "_id", "_d", F.col("_xf").cast("double").alias("_x"))
    cent = dims.groupBy("_cl", "_d").agg(
        (F.sum("_x") / F.count(F.lit(1))).alias("_cd")
    )
    cnorm = cent.groupBy("_cl").agg(
        F.sqrt(F.sum(F.col("_cd") * F.col("_cd"))).alias("_cn")
    )
    per_member = (
        dims.join(cent, ["_cl", "_d"])
        .groupBy("_cl", "_id")
        .agg(
            F.sum(F.col("_x") * F.col("_cd")).alias("_dot"),
            F.sqrt(F.sum(F.col("_x") * F.col("_x"))).alias("_mn"),
        )
    )
    scored = per_member.join(cnorm, "_cl").select(
        "_cl",
        "_id",
        F.when((F.col("_mn") == 0.0) | (F.col("_cn") == 0.0), F.lit(0.0))
        .otherwise(F.col("_dot") / (F.col("_mn") * F.col("_cn")))
        .alias("_cos"),
    )
    return scored.groupBy(F.col("_cl").alias(cluster_col)).agg(
        F.min_by(
            F.struct(F.col("_id").alias("medoid_id"), F.col("_cos").alias("c")),
            F.struct((-F.col("_cos")).alias("a"), F.col("_id").alias("b")),
        ).alias("_m"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    ).select(
        cluster_col,
        F.col("_m.medoid_id").alias("medoid_id"),
        "n_members",
        F.col("_m.c").alias("medoid_cos"),
    )
