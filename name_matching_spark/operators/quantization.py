"""Product quantization (PQ) for embedding search at corpus scale.

PQ (Jegou et al., "Product Quantization for Nearest Neighbor Search") splits
a D-dim vector into M subvectors and quantizes each against its own K-entry
codebook: D floats (256 B at D=64 float32) compress to M small ints (8 B at
M=8, K<=256). That 32x compression is what makes a 100 TB embedding corpus
scannable: the encoded table fits in cluster memory, queries never touch raw
vectors during the scan, and distance evaluation is M table lookups per
candidate (asymmetric distance computation, ADC) instead of a D-wide dot
product.

Plan shapes:

- ``pq_encode`` — one ``mapInArrow`` pass over the corpus (argmin against
  the broadcast codebook in the kernel closure; zero shuffles).
- ``pq_adc_topk`` — broadcast the (small) query set against the encoded
  corpus, one Arrow kernel for ADC distances, one window for top-k. At
  scale the encoded corpus stays partition-local; only ``n_queries x k``
  result rows shuffle.

Codebooks: :func:`pq_codebooks_seeded` is data-independent (reproducible,
renderable as SQL literals — the oracle path); :func:`pq_codebooks_kmeans`
trains per-subspace codebooks with seeded KMeans (the production choice —
cells adapt to the data, quantization error drops). Both produce the same
``(M, K, dsub)`` ndarray, so every downstream stage is identical.

Complements ``similarity_search``: IVF prunes *which* candidates are
scored; PQ compresses *how* each candidate is scored. Real systems (IVFPQ)
compose the two — ``ivf_topk``'s inverted lists over ``pq_encode``-d codes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

__all__ = [
    "pq_codebooks_seeded",
    "pq_codebooks_kmeans",
    "pq_encode",
    "pq_adc_topk",
    "codebooks_sql_values",
]


def pq_codebooks_seeded(
    dim: int, n_subspaces: int, n_codes: int, seed: int = 33
) -> np.ndarray:
    """Deterministic data-independent codebooks, shape ``(M, K, dim/M)``.

    Entries are seeded normals rounded to 6 decimals so their ``repr`` is an
    exact decimal literal — both Spark and an oracle engine parse it to the
    identical double (the q25 inlined-planes technique)."""
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    rng = np.random.default_rng(seed)
    cb = rng.normal(0.0, 1.0, size=(n_subspaces, n_codes, dim // n_subspaces))
    return np.round(cb, 6)


def pq_codebooks_kmeans(
    corpus: DataFrame,
    n_subspaces: int,
    n_codes: int,
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace codebooks trained with seeded Spark ML KMeans on the
    corpus subvectors (one model per subspace over slices of the same
    cached sample — training cost is O(sample), not O(corpus))."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = (first["d"] if first else 0) or 0
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    dsub = dim // n_subspaces
    sliced = corpus.select(
        *[
            array_to_vector(
                F.slice(F.col(vec_col), m * dsub + 1, dsub).cast("array<double>")
            ).alias(f"sub_{m}")
            for m in range(n_subspaces)
        ]
    ).cache()
    try:
        books = []
        for m in range(n_subspaces):
            model = KMeans(
                k=n_codes, seed=seed + m, featuresCol=f"sub_{m}"
            ).fit(sliced)
            centers = np.zeros((n_codes, dsub))
            got = model.clusterCenters()
            centers[: len(got)] = np.asarray(got)  # k may collapse on tiny data
            books.append(centers)
        return np.stack(books)
    finally:
        sliced.unpersist()


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``M`` codebook indices: ``(id, codes)`` with
    ``codes[m] = argmin_c ||x_m - codebooks[m][c]||^2`` (ties -> lowest
    code, matching a relational ``ORDER BY dist, code`` argmin).

    One Arrow kernel pass; the codebook rides the task closure
    (``M * K * dsub`` doubles — a few KB). NULL/ragged vectors yield NULL
    codes."""
    m_sub, _, dsub = codebooks.shape
    cb = codebooks.astype(np.float64)
    out_schema = StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    def compute(batches):
        import pyarrow as pa

        from name_matching_spark.operators.similarity_search import _list_col_matrix

        for b in batches:
            n = b.num_rows
            ids = b.column(b.schema.get_field_index(id_col))
            mat = _list_col_matrix(b.column(b.schema.get_field_index(vec_col)), n)
            if mat is None or mat.shape[1] != m_sub * dsub:
                rows = b.column(b.schema.get_field_index(vec_col)).to_pylist()
                codes = []
                for v in rows:
                    if v is None or len(v) != m_sub * dsub:
                        codes.append(None)
                        continue
                    x = np.asarray(v, dtype=np.float64).reshape(m_sub, dsub)
                    d = ((x[:, None, :] - cb) ** 2).sum(-1)
                    codes.append([int(c) for c in d.argmin(axis=1)])
                arr = pa.array(codes, type=pa.list_(pa.int32()))
            else:
                x = mat.reshape(n, m_sub, dsub)
                code_mat = np.empty((n, m_sub), dtype=np.int32)
                for m in range(m_sub):
                    # (n, K): squared L2 to every centroid of subspace m
                    d = ((x[:, m, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
                    code_mat[:, m] = d.argmin(axis=1)
                arr = pa.ListArray.from_arrays(
                    np.arange(0, (n + 1) * m_sub, m_sub, dtype=np.int32),
                    pa.array(code_mat.reshape(-1), type=pa.int32()),
                )
            yield pa.RecordBatch.from_arrays([ids, arr], [id_col, "codes"])

    return df.select(id_col, vec_col).mapInArrow(compute, out_schema)


def pq_adc_topk(
    queries: DataFrame,
    encoded: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: raw query vectors against the PQ-encoded
    corpus. ``adc_dist = sum_m ||q_m - codebooks[m][codes[m]]||^2`` — the
    quantized approximation of squared L2.

    The query set is broadcast against the encoded corpus (each task scans
    its resident codes — at scale this is the memory-bandwidth win PQ
    exists for); distances come from one Arrow kernel (codebook gather +
    einsum, no per-row Python); a window takes top-k ascending with id
    tiebreak. Self-pairs are excluded before ranking."""
    m_sub, _, dsub = codebooks.shape
    cb = codebooks.astype(np.float64)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    enc = encoded.select(F.col(id_col).alias("neighbor_id"), "codes")
    cand = enc.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))

    out_schema = StructType(
        [
            StructField("query_id", cand.schema["query_id"].dataType),
            StructField("neighbor_id", cand.schema["neighbor_id"].dataType),
            StructField("adc_dist", DoubleType()),
        ]
    )

    def compute(batches):
        import pyarrow as pa

        from name_matching_spark.operators.similarity_search import _list_col_matrix

        for b in batches:
            n = b.num_rows
            qi = b.column(b.schema.get_field_index("query_id"))
            ni = b.column(b.schema.get_field_index("neighbor_id"))
            qmat = _list_col_matrix(b.column(b.schema.get_field_index("qv")), n)
            cmat = _list_col_matrix(b.column(b.schema.get_field_index("codes")), n)
            if qmat is None or cmat is None or qmat.shape[1] != m_sub * dsub:
                dist = np.full(n, np.inf)
                qs = b.column(b.schema.get_field_index("qv")).to_pylist()
                cs = b.column(b.schema.get_field_index("codes")).to_pylist()
                for i in range(n):
                    if qs[i] is None or cs[i] is None or len(cs[i]) != m_sub:
                        continue
                    x = np.asarray(qs[i], dtype=np.float64).reshape(m_sub, dsub)
                    g = cb[np.arange(m_sub), np.asarray(cs[i], dtype=np.int64)]
                    dist[i] = ((x - g) ** 2).sum()
            else:
                x = qmat.reshape(n, m_sub, dsub)
                codes = cmat.astype(np.int64)
                gathered = cb[np.arange(m_sub)[None, :], codes]  # (n, M, dsub)
                dist = ((x - gathered) ** 2).sum(axis=(1, 2))
            yield pa.RecordBatch.from_arrays(
                [qi, ni, pa.array(dist, type=pa.float64())],
                ["query_id", "neighbor_id", "adc_dist"],
            )

    scored = cand.mapInArrow(compute, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def codebooks_sql_values(codebooks: np.ndarray, cte_name: str = "cb") -> str:
    """Render codebooks as a ``(m, c, cv)`` VALUES CTE of DOUBLE-list
    literals for an oracle engine — usable only with codebooks whose entries
    round-trip through ``repr`` (the seeded generator guarantees this)."""
    rows = []
    for m in range(codebooks.shape[0]):
        for c in range(codebooks.shape[1]):
            vec = ", ".join(repr(float(v)) for v in codebooks[m, c])
            # explicit DOUBLE[] — DuckDB types bare decimal literals DECIMAL
            rows.append(f"({m}, {c}, [{vec}]::DOUBLE[])")
    return (
        f"{cte_name}(m, c, cv) AS (SELECT * FROM (VALUES "
        + ", ".join(rows)
        + ") t(m, c, cv))"
    )
