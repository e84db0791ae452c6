"""KMV bottom-k distinct sketch: exact-path, estimator, partition invariance."""

import hashlib

import pytest

from name_matching_spark.operators.sketches import (
    KMV_HASH_HEX,
    KMV_HASH_SPACE,
    kmv_distinct,
)


def _h(v: str) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:KMV_HASH_HEX], 16)


def _expected(values, k):
    hs = sorted({_h(v) for v in values})
    if len(hs) < k:
        return len(hs), None, len(hs)
    kth = hs[k - 1]
    return k, kth, (k - 1) * KMV_HASH_SPACE // max(kth, 1)


def test_kmv_small_group_is_exact(spark):
    rows = [("g", f"v{i}") for i in range(10)] * 3  # dups collapse
    df = spark.createDataFrame(rows, ["g", "v"])
    out = kmv_distinct(df, "g", "v", k=64).collect()[0]
    assert out["n_sketch"] == 10
    assert out["kth_min_hash"] is None
    assert out["est_distinct"] == 10
    assert out["n_distinct_exact"] == 10
    assert out["err_ppm"] == 0


def test_kmv_estimator_matches_reference(spark):
    values = [f"item-{i:05d}" for i in range(1000)]
    df = spark.createDataFrame([("g", v) for v in values], ["g", "v"])
    k = 16
    n_sketch, kth, est = _expected(values, k)
    out = kmv_distinct(df, "g", "v", k=k).collect()[0]
    assert out["n_sketch"] == n_sketch
    assert out["kth_min_hash"] == kth
    assert out["est_distinct"] == est
    assert out["n_distinct_exact"] == 1000
    # a 16-min sketch over 1000 uniform values lands within ~60%
    assert 400 <= out["est_distinct"] <= 2500
    assert out["err_ppm"] == (est - 1000) * 1_000_000 // 1000 or out["err_ppm"] == int(
        (est - 1000) * 1_000_000 / 1000
    )


def test_kmv_partition_invariant(spark):
    values = [f"x{i}" for i in range(500)]
    rows = [(f"g{i % 3}", v) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, ["g", "v"])
    a = sorted(map(tuple, kmv_distinct(df, "g", "v", k=32).collect()))
    b = sorted(map(tuple, kmv_distinct(df.repartition(13), "g", "v", k=32).collect()))
    assert a == b


def test_kmv_k_bounds():
    with pytest.raises(ValueError):
        kmv_distinct(None, "g", "v", k=1)
    with pytest.raises(ValueError):
        kmv_distinct(None, "g", "v", k=128)


def test_profile_table_hand_computed(spark):
    from name_matching_spark.operators.profiling import profile_table

    df = spark.createDataFrame(
        [
            ("a", None), ("a", 1), ("", 1), ("b", 2), ("a", None),
        ],
        ["name", "v"],
    )
    out = {r["col_name"]: r for r in profile_table(df, ["name", "v"]).collect()}
    n = out["name"]
    assert (n["n_rows"], n["n_null"], n["n_empty"], n["n_distinct"]) == (5, 0, 1, 3)
    assert n["est_distinct"] == 3  # under k: exact
    assert (n["min_value"], n["max_value"]) == ("", "b")
    assert (n["top_value"], n["top_count"]) == ("a", 3)
    assert n["avg_len_ppm"] == 4 * 1_000_000 // 5  # lengths 1+1+0+1+1 over 5
    v = out["v"]
    assert (v["n_rows"], v["n_null"], v["n_distinct"]) == (5, 2, 2)
    assert (v["top_value"], v["top_count"]) == ("1", 2)
    assert v["avg_len_ppm"] == 1_000_000  # "1","1","2" over 3 non-null


def test_cluster_medoids_hand_computed(spark):
    from name_matching_spark.operators.similarity_search import cluster_medoids

    # cluster 1: vectors around +x; member 2 is closest to the mean.
    # cluster 2: a single member -> cosine 1 with itself.
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.1]),
            (3, [1.0, 0.2]),
            (9, [0.0, 3.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    asn = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (9, 20)], "vec_id long, cluster_id long"
    )
    out = {r["cluster_id"]: r for r in cluster_medoids(vecs, asn).collect()}
    assert out[10]["medoid_id"] == 2  # mean direction ~ (1, 0.1)
    assert out[10]["n_members"] == 3
    assert out[20]["medoid_id"] == 9 and out[20]["n_members"] == 1
    assert abs(out[20]["medoid_cos"] - 1.0) < 1e-9
    assert 0.99 < out[10]["medoid_cos"] <= 1.0 + 1e-12


def test_weighted_sample_properties(spark):
    import hashlib
    import math

    from name_matching_spark.operators.sketches import (
        KMV_HASH_HEX,
        KMV_HASH_SPACE,
        weighted_sample,
    )

    rows = [(i, (i % 10) + 1) for i in range(200)] + [(999, 0)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = weighted_sample(df, "w", k=20, id_col="doc_id").collect()
    assert len(out) == 20
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == list(
        range(1, 21)
    )
    # zero-weight row never sampled
    assert all(r["doc_id"] != 999 for r in out)

    # keys match the reference formula exactly
    def key(i, w):
        h = int(hashlib.md5(f"es|{i}".encode()).hexdigest()[:KMV_HASH_HEX], 16)
        return math.log((h + 1.0) / KMV_HASH_SPACE) / w

    expect = sorted(
        ((key(i, w), i, w) for i, w in rows if w > 0),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    got = sorted(out, key=lambda r: r["rank"])
    for (ek, ei, ew), r in zip(expect, got):
        assert r["doc_id"] == ei and r["weight"] == ew
        assert abs(r["sample_key"] - ek) < 1e-12

    # determinism: same seed -> same sample; different seed -> different
    again = weighted_sample(df, "w", k=20, id_col="doc_id").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    other = weighted_sample(df, "w", k=20, id_col="doc_id", seed="es2").collect()
    assert {r["doc_id"] for r in other} != {r["doc_id"] for r in out}


def test_kmv_pairwise_overlap_identical_and_disjoint(spark):
    from name_matching_spark.operators.sketches import kmv_pairwise_overlap

    rows = (
        [("a", f"v{i}") for i in range(300)]
        + [("b", f"v{i}") for i in range(300)]      # identical to a
        + [("c", f"w{i}") for i in range(300)]      # disjoint
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {(r["g1"], r["g2"]): r for r in
           kmv_pairwise_overlap(df, "g", "v", k=32).collect()}
    ab = out[("a", "b")]
    # identical sets: union estimate == per-set estimate, Jaccard ~ 1
    assert ab["est_union"] == ab["est_1"] == ab["est_2"]
    assert ab["jaccard_est_ppm"] == 1_000_000
    ac = out[("a", "c")]
    # disjoint sets: intersection estimate small, Jaccard near 0
    assert ac["jaccard_est_ppm"] < 300_000
    assert ac["est_union"] > max(ac["est_1"], ac["est_2"])
