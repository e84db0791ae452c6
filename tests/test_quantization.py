"""Product quantization: encode argmin semantics, ADC ranking, codebooks."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from name_matching_spark.operators.quantization import (
    codebooks_sql_values,
    pq_adc_topk,
    pq_codebooks_kmeans,
    pq_codebooks_seeded,
    pq_encode,
)

DIM, M, K = 16, 4, 4


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(40, DIM)).astype(np.float32)
    mat[7] = mat[3]  # exact duplicate -> identical codes
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    return df, mat.astype(np.float64)


def _np_codes(mat, cb):
    x = mat.reshape(len(mat), M, DIM // M)
    return np.stack(
        [((x[:, m, None, :] - cb[m][None]) ** 2).sum(-1).argmin(1) for m in range(M)],
        axis=1,
    )


def test_encode_matches_numpy_argmin(spark, vectors):
    df, mat = vectors
    cb = pq_codebooks_seeded(DIM, M, K, seed=5)
    got = {r["vec_id"]: r["codes"] for r in pq_encode(df, cb).collect()}
    want = _np_codes(mat, cb)
    for i in range(len(mat)):
        assert got[i] == [int(c) for c in want[i]]
    assert got[7] == got[3]  # duplicate vectors -> duplicate codes


def test_encode_null_and_ragged_rows(spark):
    cb = pq_codebooks_seeded(DIM, M, K)
    df = spark.createDataFrame(
        [(0, [0.0] * DIM), (1, None), (2, [1.0] * (DIM - 1))],
        ["vec_id", "embedding"],
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    got = {r["vec_id"]: r["codes"] for r in pq_encode(df, cb).collect()}
    assert got[0] is not None and len(got[0]) == M
    assert got[1] is None and got[2] is None


def test_adc_topk_ranks_by_quantized_distance(spark, vectors):
    df, mat = vectors
    cb = pq_codebooks_seeded(DIM, M, K, seed=5)
    enc = pq_encode(df, cb)
    out = pq_adc_topk(df.filter(F.col("vec_id") < 3), enc, cb, k=5)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    codes = _np_codes(mat, cb)
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert len(rs) == 5
        # distances non-decreasing, ids ascend within exact ties
        for a, b in zip(rs, rs[1:]):
            assert (a["adc_dist"], a["neighbor_id"]) < (b["adc_dist"], b["neighbor_id"])
        # spot-check the distance value against numpy
        top = rs[0]
        g = cb[np.arange(M), codes[top["neighbor_id"]]]
        want = ((mat[qid].reshape(M, DIM // M) - g) ** 2).sum()
        assert top["adc_dist"] == pytest.approx(want, rel=1e-12)
        assert all(r["neighbor_id"] != qid for r in rs)


def test_adc_finds_planted_near_duplicates_with_kmeans(spark):
    """Trained codebooks: each query's planted near-duplicate (tiny
    perturbation) should dominate the ADC ranking for most queries —
    the retrieval property PQ exists to preserve under 32x compression.
    (On structureless uniform noise PQ recall is legitimately poor, so the
    fixture plants real neighbors.)"""
    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, DIM))
    near = base + rng.normal(scale=0.05, size=base.shape)
    mat = np.vstack([base, near])  # vec i's planted neighbor is i + 20
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    cb = pq_codebooks_kmeans(df, M, K, seed=11)
    enc = pq_encode(df, cb)
    out = pq_adc_topk(df.filter(F.col("vec_id") < 20), enc, cb, k=3).collect()
    got = {}
    for r in out:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for qid in range(20) if qid + 20 in got[qid])
    assert hits >= 15, hits


def test_kmeans_codebook_shape_and_determinism(spark, vectors):
    df, _ = vectors
    a = pq_codebooks_kmeans(df, M, K, seed=11)
    b = pq_codebooks_kmeans(df, M, K, seed=11)
    assert a.shape == (M, K, DIM // M)
    assert np.array_equal(a, b)


def test_seeded_codebook_literal_roundtrip():
    cb = pq_codebooks_seeded(DIM, M, K, seed=5)
    sql = codebooks_sql_values(cb)
    assert sql.count("(") >= M * K
    # repr round-trip: every literal parses back to the identical double
    import duckdb

    got = duckdb.connect().execute(
        "WITH " + sql + " SELECT m, c, cv FROM cb ORDER BY m, c"
    ).fetchall()
    for m, c, cv in got:
        assert [float(v) for v in cv] == list(cb[m, c])
        assert all(isinstance(v, float) for v in cv)  # DOUBLE[], not DECIMAL[]


def test_dim_not_divisible_raises():
    with pytest.raises(ValueError):
        pq_codebooks_seeded(10, 3, 4)
