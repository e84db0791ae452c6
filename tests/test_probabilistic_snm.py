"""Sorted-neighborhood blocking, Fellegi-Sunter weights, BCubed metrics."""

import math

import pytest
from pyspark.sql import functions as F

from name_matching_spark.operators.blocking import (
    global_sort_rank,
    sorted_neighborhood_pairs,
)
from name_matching_spark.operators.evaluation import bcubed_metrics
from name_matching_spark.operators.probabilistic import (
    estimate_mu_weights,
    fs_score_pairs,
)


@pytest.fixture(scope="module")
def names(spark):
    rows = [
        ("r1", "anderson maria"),
        ("r2", "anderson marla"),  # typo neighbor of r1
        ("r3", "cruz juan"),
        ("r4", "cruz juana"),
        ("r5", "zavala pedro"),
        ("r6", "cruz juan"),  # exact duplicate key of r3 (tie on key)
    ]
    return spark.createDataFrame(rows, ["record_id", "key"])


def test_global_sort_rank_is_total_order(spark, names):
    got = {
        r["record_id"]: r["rank"]
        for r in global_sort_rank(names, "key", num_partitions=3).collect()
    }
    expected_order = sorted(names.collect(), key=lambda r: (r["key"], r["record_id"]))
    for i, row in enumerate(expected_order, start=1):
        assert got[row["record_id"]] == i
    assert sorted(got.values()) == list(range(1, 7))


def _brute_force_snm(rows, window):
    order = sorted(rows, key=lambda r: (r["key"], r["record_id"]))
    out = set()
    for i in range(len(order)):
        for j in range(i + 1, min(i + window, len(order))):
            out.add((order[i]["record_id"], order[j]["record_id"]))
    return out


@pytest.mark.parametrize("window", [2, 3, 4])
def test_snm_pairs_match_brute_force(spark, names, window):
    got = {
        (r["id1"], r["id2"])
        for r in sorted_neighborhood_pairs(
            names, "key", window=window, num_partitions=3
        ).collect()
    }
    assert got == _brute_force_snm(names.collect(), window)


def test_snm_rank_dist_bounds(spark, names):
    dists = [
        r["rank_dist"]
        for r in sorted_neighborhood_pairs(names, "key", window=3).collect()
    ]
    assert dists and all(1 <= d <= 2 for d in dists)


def test_snm_hot_key_stays_linear(spark):
    """1000 identical keys: SNM generates w-1 pairs per row (not k^2/2) —
    the skew-immunity property equality blocking lacks."""
    df = spark.range(1000).select(
        F.concat(F.lit("r"), F.lpad(F.col("id").cast("string"), 4, "0")).alias(
            "record_id"
        ),
        F.lit("samekey").alias("key"),
    )
    n = sorted_neighborhood_pairs(df, "key", window=4).count()
    assert n == 999 + 998 + 997  # rank dists 1, 2, 3


def test_snm_window_validation(spark, names):
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(names, "key", window=1)


def test_snm_payload_structs(spark, names):
    out = sorted_neighborhood_pairs(
        names.withColumn("extra", F.upper(F.col("key"))),
        "key",
        window=2,
        payload_cols=["extra"],
    )
    row = out.orderBy("id1", "id2").first()
    assert row["s1"]["extra"] == row["key1"].upper()


# -- Fellegi-Sunter ----------------------------------------------------------


@pytest.fixture(scope="module")
def labeled(spark):
    # 4 matches (3 agree on f, 4 on l), 6 non-matches (1 agrees on f, 2 on l)
    rows = []
    for i in range(4):
        rows.append((f"m{i}", i != 3, True, "match"))
    for i in range(6):
        rows.append((f"n{i}", i == 0, i < 2, "non-match"))
    return spark.createDataFrame(rows, ["pair_id", "agree_f", "agree_l", "true_label"])


def test_estimate_mu_weights_exact_counts(spark, labeled):
    w = {r["field"]: r.asDict() for r in
         estimate_mu_weights(labeled, ["agree_f", "agree_l"]).collect()}
    f = w["agree_f"]
    assert (f["n_match"], f["n_nonmatch"], f["agree_m"], f["agree_u"]) == (4, 6, 3, 1)
    assert f["m_ppm"] == (3 + 1) * 1000000 // (4 + 2)
    assert f["u_ppm"] == (1 + 1) * 1000000 // (6 + 2)
    assert f["agree_weight"] == pytest.approx(
        math.log2(f["m_ppm"] / f["u_ppm"]), rel=1e-12
    )
    l = w["agree_l"]
    assert (l["agree_m"], l["agree_u"]) == (4, 2)
    assert l["disagree_weight"] == pytest.approx(
        math.log2(max(1000000 - l["m_ppm"], 1) / (1000000 - l["u_ppm"])), rel=1e-12
    )


def test_fs_score_pairs_fixed_order_sum(spark, labeled):
    weights = estimate_mu_weights(labeled, ["agree_f", "agree_l"])
    wmap = {r["field"]: (r["agree_weight"], r["disagree_weight"])
            for r in weights.collect()}
    scored = fs_score_pairs(labeled, weights, ["agree_f", "agree_l"])
    for r in scored.collect():
        expect = (wmap["agree_f"][0] if r["agree_f"] else wmap["agree_f"][1]) + (
            wmap["agree_l"][0] if r["agree_l"] else wmap["agree_l"][1]
        )
        assert r["fs_weight"] == expect  # identical fixed-order IEEE sum
        assert r["fs_match"] == int(expect > 0)


def test_fs_missing_field_raises(spark, labeled):
    weights = estimate_mu_weights(labeled, ["agree_f"])
    with pytest.raises(ValueError, match="agree_l"):
        fs_score_pairs(labeled, weights, ["agree_f", "agree_l"])


# -- BCubed ------------------------------------------------------------------


def _bcubed_frames(spark, assignment, truth):
    a = spark.createDataFrame(
        [(k, v) for k, v in assignment.items()], ["record_id", "cluster_id"]
    )
    t = spark.createDataFrame(
        [(k, v) for k, v in truth.items()], ["record_id", "class_id"]
    )
    return bcubed_metrics(a, t).collect()[0]


def test_bcubed_perfect_clustering(spark):
    assignment = {"a": 1, "b": 1, "c": 2}
    truth = {"a": "x", "b": "x", "c": "y"}
    row = _bcubed_frames(spark, assignment, truth)
    assert row["n_records"] == 3
    assert row["bcubed_precision"] == 1.0
    assert row["bcubed_recall"] == 1.0
    assert row["bcubed_f1"] == 1.0


def test_bcubed_overmerged(spark):
    # one cluster holding two classes of sizes 2 and 2:
    # precision per record = 2/4, recall = 1 -> P=0.5, R=1
    assignment = {k: 1 for k in "abcd"}
    truth = {"a": "x", "b": "x", "c": "y", "d": "y"}
    row = _bcubed_frames(spark, assignment, truth)
    assert row["bcubed_precision"] == pytest.approx(0.5)
    assert row["bcubed_recall"] == 1.0
    assert row["bcubed_f1"] == pytest.approx(2 * 0.5 / 1.5)


def test_bcubed_oversplit_asymmetric(spark):
    # class x of size 3 split into clusters {a,b} and {c}:
    # P = 1; R = (2/3 + 2/3 + 1/3) / 3 = 5/9
    assignment = {"a": 1, "b": 1, "c": 2}
    truth = {k: "x" for k in "abc"}
    row = _bcubed_frames(spark, assignment, truth)
    assert row["bcubed_precision"] == 1.0
    assert row["bcubed_recall"] == pytest.approx(5 / 9)


# --------------------------------------------------------------------------
# mutual best match (reciprocal top-1 assignment)
# --------------------------------------------------------------------------

def test_mutual_best_match_symmetric(spark):
    from name_matching_spark.operators.score_pairs import mutual_best_match

    # undirected pairs: a-b (0.9), b-c (0.8), c-d (0.95)
    # best partners: a->b, b->a, c->d, d->c  => reciprocal: (a,b), (c,d)
    pairs = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.8), ("c", "d", 0.95)],
        ["id1", "id2", "score"],
    )
    out = {
        (r["id1"], r["id2"])
        for r in mutual_best_match(pairs).collect()
    }
    assert out == {("a", "b"), ("c", "d")}


def test_mutual_best_match_chain_drops_middle(spark):
    from name_matching_spark.operators.score_pairs import mutual_best_match

    # a-b (0.9), b-c (0.95): b's best is c, c's best is b; a unmatched
    pairs = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.95)], ["id1", "id2", "score"]
    )
    out = {(r["id1"], r["id2"]) for r in mutual_best_match(pairs).collect()}
    assert out == {("b", "c")}


def test_mutual_best_match_tie_breaks_by_id(spark):
    from name_matching_spark.operators.score_pairs import mutual_best_match

    # b ties between a and c at 0.9 -> partner id ascending picks a
    pairs = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "c", 0.9)], ["id1", "id2", "score"]
    )
    out = {(r["id1"], r["id2"]) for r in mutual_best_match(pairs).collect()}
    assert out == {("a", "b")}


def test_mutual_best_match_bipartite(spark):
    from name_matching_spark.operators.score_pairs import mutual_best_match

    # left {l1, l2} vs right {r1}: both lefts prefer r1; r1 prefers l1
    pairs = spark.createDataFrame(
        [("l1", "r1", 0.9), ("l2", "r1", 0.8)], ["id1", "id2", "score"]
    )
    out = {
        (r["id1"], r["id2"])
        for r in mutual_best_match(pairs, symmetric=False).collect()
    }
    assert out == {("l1", "r1")}


def test_cohens_kappa_values(spark):
    from name_matching_spark.operators.evaluation import cohens_kappa

    # n=10, agree=7; pred marginals 6/4, truth 5/5 ->
    # po=0.7, pe=(6*5+4*5)/100=0.5, kappa=0.4
    rows = (
        [("match", "match")] * 4
        + [("non-match", "non-match")] * 3
        + [("match", "non-match")] * 2
        + [("non-match", "match")] * 1
    )
    df = spark.createDataFrame(rows, ["pred", "truth"])
    r = cohens_kappa(df, "pred", "truth").collect()[0]
    assert (r["n_pairs"], r["n_agree"]) == (10, 7)
    assert (r["po_ppm"], r["pe_ppm"]) == (700000, 500000)
    assert r["kappa"] == pytest.approx(0.4)


def test_cohens_kappa_perfect(spark):
    from name_matching_spark.operators.evaluation import cohens_kappa

    df = spark.createDataFrame(
        [("a", "a"), ("b", "b"), ("c", "c"), ("a", "a")], ["pred", "truth"]
    )
    r = cohens_kappa(df, "pred", "truth").collect()[0]
    assert r["po_ppm"] == 1000000
    assert r["kappa"] == 1.0


def test_qgram_cosine_golden(spark):
    from name_matching_spark.operators.score_pairs import qgram_cosine_pairs

    # martha: {ma,ar,rt,th,ha}; marhta: {ma,ar,rh,ht,ta} -> dot=2, norms 5
    recs = spark.createDataFrame(
        [(1, "martha"), (2, "marhta"), (3, "aaa")], ["record_id", "name"]
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id1", "id2"])
    out = {
        (r["id1"], r["id2"]): r
        for r in qgram_cosine_pairs(recs, pairs, "name").collect()
    }
    r12 = out[(1, 2)]
    assert (r12["dot"], r12["sq1"], r12["sq2"]) == (2, 5, 5)
    assert r12["qgram_cosine"] == pytest.approx(0.4)
    # "aaa" has profile {aa: 2} -> sq=4, zero overlap with martha
    r13 = out[(1, 3)]
    assert (r13["dot"], r13["sq2"]) == (0, 4)
    assert r13["qgram_cosine"] == 0.0


def test_value_frequency_weights(spark):
    import math

    from name_matching_spark.operators.probabilistic import (
        frequency_weighted_pairs,
        value_frequency_weights,
    )

    recs = spark.createDataFrame(
        [
            (1, "smith", "1990"),
            (2, "smith", "1990"),
            (3, "smith", "1991"),
            (4, "zorro", None),
        ],
        ["record_id", "last", "year"],
    )
    w = {
        (r["field"], r["value"]): r
        for r in value_frequency_weights(recs, ["last", "year"]).collect()
    }
    # smith: 3/4 -> 750000 ppm; zorro: 1/4 -> 250000 ppm (exact integers)
    assert w[("last", "smith")]["u_ppm"] == 750000
    assert w[("last", "zorro")]["u_ppm"] == 250000
    assert w[("last", "zorro")]["weight"] == pytest.approx(2.0)
    assert ("year", None) not in w  # NULLs carry no evidence

    pairs = spark.createDataFrame([(1, 2), (1, 3), (3, 4)], ["id1", "id2"])
    out = {
        (r["id1"], r["id2"]): r
        for r in frequency_weighted_pairs(recs, pairs, ["last", "year"]).collect()
    }
    # (1,2): smith + 1990 agree -> both weights sum
    exp_last = math.log2(1e6 / 750000)
    exp_year = math.log2(1e6 / 500000)
    assert out[(1, 2)]["w_last"] == pytest.approx(exp_last)
    assert out[(1, 2)]["w_year"] == pytest.approx(exp_year)
    assert out[(1, 2)]["vf_weight"] == pytest.approx(exp_last + exp_year)
    # (1,3): years differ -> only last-name weight
    assert out[(1, 3)]["w_year"] == 0.0
    assert out[(1, 3)]["vf_weight"] == pytest.approx(exp_last)
    # (3,4): nothing agrees (year NULL on one side) -> 0
    assert out[(3, 4)]["vf_weight"] == 0.0


def test_multipass_blocking_provenance(spark):
    """q74 invariants at sf0.001: oriented unique pairs; flags consistent
    with n_passes; every tokensort pair is also an SNM pair at distance 1+
    only when adjacent — and each pass contributes at least one pair."""
    import __spark_entry__ as e

    out = e.q74_multipass_blocking(spark, "/root/testdata/sf0.001").toPandas()
    assert (out["id1"] < out["id2"]).all()
    assert not out.duplicated(["id1", "id2"]).any()
    assert (
        out["n_passes"]
        == out["in_phonetic"] + out["in_tokensort"] + out["in_snm"]
    ).all()
    assert out["in_phonetic"].sum() > 0
    assert out["in_tokensort"].sum() > 0
    assert out["in_snm"].sum() > 0
    # multi-pass must add pairs beyond any single pass
    assert len(out) > out["in_phonetic"].sum() or len(out) > out["in_snm"].sum()


def test_soft_tfidf_semantics(spark):
    import math

    from name_matching_spark.operators.score_pairs import soft_tfidf_pairs

    recs = spark.createDataFrame(
        [(1, "maria cruz"), (2, "maria crux"), (3, "pedro gomez")],
        ["record_id", "name"],
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], ["id1", "id2"])
    out = {
        (r["id1"], r["id2"]): r
        for r in soft_tfidf_pairs(recs, pairs, "name", threshold=0.9).collect()
    }
    # JW(cruz, crux) = 0.8833 < 0.9 -> only "maria" is close for (1,2)
    assert out[(1, 2)]["n_close"] == 1
    v_m = math.log(2.0) * math.log(3.0 / 2.0)
    v_c = math.log(2.0) * math.log(3.0)
    vn_m = v_m / math.hypot(v_m, v_c)
    assert out[(1, 2)]["soft_tfidf"] == pytest.approx(vn_m * vn_m, abs=1e-3)
    # no shared/close tokens with pedro gomez
    assert out[(1, 3)]["n_close"] == 0
    assert out[(1, 3)]["soft_tfidf"] == 0.0


def test_soft_tfidf_identical_names_score_one(spark):
    from name_matching_spark.operators.score_pairs import soft_tfidf_pairs

    recs = spark.createDataFrame(
        [(1, "ana reyes santos"), (2, "ana reyes santos"), (3, "ana lopez")],
        ["record_id", "name"],
    )
    pairs = spark.createDataFrame([(1, 2)], ["id1", "id2"])
    r = soft_tfidf_pairs(recs, pairs, "name").collect()[0]
    # identical token sets: TF-IDF cosine of a vector with itself = 1
    assert r["n_close"] == 3
    assert r["soft_tfidf"] == pytest.approx(1.0, abs=1e-4)


def test_em_estimate_separates_mixture(spark):
    """EM with no labels recovers m >> u for a discriminative field on a
    planted two-class mixture, and every parameter stays strictly in
    (0,1) (Laplace smoothing), even for a field that always agrees."""
    import random

    from name_matching_spark.operators.probabilistic import em_estimate

    rng = random.Random(7)
    rows = []
    for _ in range(500):
        if rng.random() < 0.3:  # true match pairs: fields mostly agree
            rows.append((rng.random() < 0.95, rng.random() < 0.9, True))
        else:  # non-matches: fields rarely agree
            rows.append((rng.random() < 0.15, rng.random() < 0.1, True))
    df = spark.createDataFrame(rows, ["agree_a", "agree_b", "agree_const"])
    out = {
        r["field"]: r
        for r in em_estimate(
            df, ["agree_a", "agree_b", "agree_const"], n_iter=3
        ).collect()
    }
    for f, r in out.items():
        assert 0.0 < r["m"] < 1.0 and 0.0 < r["u"] < 1.0
        assert 0.0 < r["lam"] < 1.0
    assert out["agree_a"]["m"] > 0.7 > 0.35 > out["agree_a"]["u"]
    assert out["agree_b"]["m"] > out["agree_b"]["u"]
    assert out["agree_a"]["agree_weight"] > 0 > out["agree_a"]["disagree_weight"]


def test_em_census_weighted_parity(spark):
    """Census-weighted EM fit (weight_col) is BIT-IDENTICAL to the
    row-level fit: the E-step responsibility depends only on the gamma
    pattern, so weighted M-step sums equal row sums exactly. Also pins
    the weighted roc_auc path against its row-level form."""
    import random

    from name_matching_spark.operators.evaluation import roc_auc
    from name_matching_spark.operators.probabilistic import em_estimate

    rng = random.Random(13)
    rows = []
    for _ in range(400):
        match = rng.random() < 0.3
        rows.append((
            rng.random() < (0.95 if match else 0.15),
            rng.random() < (0.9 if match else 0.1),
            match,
        ))
    df = spark.createDataFrame(rows, ["agree_a", "agree_b", "is_match"])
    fields = ["agree_a", "agree_b"]
    census = df.groupBy(*fields, "is_match").agg(F.count(F.lit(1)).alias("_w"))

    by_row = em_estimate(df, fields, n_iter=3).collect()
    by_census = em_estimate(census, fields, n_iter=3, weight_col="_w").collect()
    assert [r.asDict() for r in by_row] == [r.asDict() for r in by_census]

    # weighted AUC parity: score = integer gamma code
    code = (F.col("agree_a").cast("long") * 2 + F.col("agree_b").cast("long"))
    auc_rows = roc_auc(df.withColumn("g", code), "g", "is_match").collect()
    auc_census = roc_auc(
        census.withColumn("g", code), "g", "is_match", weight_col="_w"
    ).collect()
    assert [r.asDict() for r in auc_rows] == [r.asDict() for r in auc_census]


# ---------------------------------------------------------------------------
# SymSpell delete-1 neighborhood join
# ---------------------------------------------------------------------------


def test_symspell_matches_brute_force_dl1(spark):
    """Delete-1 neighborhood join == exhaustive all-pairs DL<=1 scan
    (recall = 1), over a vocabulary exercising every distance-1 edit kind:
    deletion, insertion, substitution, adjacent transposition — plus
    distance-2 decoys that a sloppy candidate filter would admit."""
    from name_matching_spark.functions.kernels import batch_dl_distance
    from name_matching_spark.operators.blocking import symspell_delete1_pairs

    vocab = [
        "maria", "mara",       # deletion / insertion
        "marla",               # substitution of maria
        "mraia",               # transposition of maria
        "juan", "juna",        # transposition
        "jose", "rose",        # substitution
        "a", "b", "ab",        # length-1 edge cases
        "cruz", "curz",        # transposition
        "santos", "anders",    # far apart (decoys)
    ]
    df = spark.createDataFrame([(w,) for w in vocab], "word string")
    got = {
        (r.w1, r.w2)
        for r in symspell_delete1_pairs(df).collect()
        if batch_dl_distance([r.w1], [r.w2])[0] <= 1
    }
    want = set()
    for i, w1 in enumerate(vocab):
        for w2 in vocab[i + 1:]:
            a, b = sorted([w1, w2])
            if batch_dl_distance([a], [b])[0] <= 1:
                want.add((a, b))
    assert got == want
    assert ("juan", "juna") in got          # transposition caught
    assert ("jose", "rose") in got          # substitution caught
    assert ("mara", "maria") in got         # deletion caught
    assert ("anders", "santos") not in got  # decoy rejected


def test_symspell_no_self_pairs_and_ordering(spark):
    from name_matching_spark.operators.blocking import symspell_delete1_pairs

    df = spark.createDataFrame([("x",), ("y",), ("xy",)], "word string")
    rows = symspell_delete1_pairs(df).collect()
    assert all(r.w1 < r.w2 for r in rows)


def test_symspell_delete2_matches_brute_force_dl2(spark):
    """Delete-2 neighborhood join == exhaustive all-pairs DL<=2 scan
    (recall = 1), including double transpositions, transposition+edit
    combos, the "ca"/"abc" full-DL pin, and empty-variant short words."""
    from name_matching_spark.functions.kernels import batch_dl_distance
    from name_matching_spark.operators.blocking import symspell_delete_pairs

    vocab = [
        "maria", "miara",      # transposition
        "airam", "mraai",      # scrambles (some within 2, some not)
        "marla", "marlas",     # sub + insert
        "ca", "abc",           # full-DL pin: dist("ca","abc") = 2
        "a", "b", "ab", "ba",  # short words sharing the empty variant
        "juan", "nauj",        # reversal (far)
        "cruz", "zurc",
        "santos", "santso", "satnso",  # 1 and 2 transpositions
        "anders",
    ]
    df = spark.createDataFrame([(w,) for w in vocab], "word string")
    got = {
        (r.w1, r.w2)
        for r in symspell_delete_pairs(df, max_edits=2).collect()
        if batch_dl_distance([r.w1], [r.w2])[0] <= 2
    }
    want = set()
    for i, w1 in enumerate(vocab):
        for w2 in vocab[i + 1:]:
            a, b = sorted([w1, w2])
            if batch_dl_distance([a], [b])[0] <= 2:
                want.add((a, b))
    assert got == want
    assert ("abc", "ca") in got             # the pinned full-DL case
    assert ("santos", "satnso") in got      # two transpositions
    assert ("a", "b") in got                # via the empty shared variant
    assert ("juan", "nauj") not in got      # reversal is distance 3


def test_symspell_delete2_radius1_matches_delete1(spark):
    from name_matching_spark.operators.blocking import (
        symspell_delete1_pairs,
        symspell_delete_pairs,
    )

    df = spark.createDataFrame(
        [("maria",), ("mara",), ("mraia",), ("jose",), ("rose",)],
        "word string",
    )
    a = {(r.w1, r.w2) for r in symspell_delete1_pairs(df).collect()}
    b = {(r.w1, r.w2) for r in symspell_delete_pairs(df, max_edits=1).collect()}
    assert a == b


# ---------------------------------------------------------------------------
# ROC AUC (census-based Mann-Whitney)
# ---------------------------------------------------------------------------


def test_roc_auc_hand_computed_with_ties(spark):
    from name_matching_spark.operators.evaluation import roc_auc

    # sorted asc: 1(pos),1(neg) avg rank 1.5; 5(neg) 3; 7(neg) 4;
    # 10(pos),10(neg) avg rank 5.5 -> rank sum pos = 7, U = 4,
    # AUC = 4 / (2*4) = 0.5
    rows = [(10, True), (10, False), (5, False), (1, True), (1, False), (7, False)]
    df = spark.createDataFrame(rows, "score long, is_match boolean")
    r = roc_auc(df, "score").collect()[0]
    assert (r.n_pos, r.n_neg, r.u2, r.auc_ppm) == (2, 4, 8, 500000)


def test_roc_auc_perfect_separation(spark):
    from name_matching_spark.operators.evaluation import roc_auc

    rows = [(1, False), (2, False), (3, True), (4, True)]
    df = spark.createDataFrame(rows, "score long, is_match boolean")
    r = roc_auc(df, "score").collect()[0]
    assert r.auc_ppm == 1000000
    # reversed scorer -> AUC 0
    df2 = spark.createDataFrame(
        [(4, False), (3, False), (2, True), (1, True)],
        "score long, is_match boolean",
    )
    assert roc_auc(df2, "score").collect()[0].auc_ppm == 0


def test_meta_blocking_wnp_hand_computed(spark):
    """WNP keep rule on a hand-worked graph: the weak one-shared-block
    edge between two nodes that BOTH have a stronger neighborhood is
    pruned; every other edge survives via at least one endpoint."""
    from name_matching_spark.operators.blocking import meta_blocking_wnp

    blocks = spark.createDataFrame(
        [
            ("A", "k1"), ("B", "k1"),
            ("A", "k2"), ("B", "k2"),   # (A,B) cbs=2
            ("A", "k3"), ("E", "k3"),   # (A,E) cbs=1 — pruned (avgs 1.5/1.5)
            ("E", "k4"), ("F", "k4"),
            ("E", "k5"), ("F", "k5"),   # (E,F) cbs=2
        ],
        "record_id string, block_key string",
    )
    got = {(r.id1, r.id2): r.cbs for r in meta_blocking_wnp(blocks).collect()}
    assert got == {("A", "B"): 2, ("E", "F"): 2}


def test_meta_blocking_purges_oversized_blocks(spark):
    """Block purging: an oversized stopword-like block contributes no
    edges at all; duplicate (record, key) rows never inflate CBS."""
    from name_matching_spark.operators.blocking import meta_blocking_wnp

    rows = [("A", "k1"), ("B", "k1"), ("A", "k1")]  # dup membership row
    rows += [(x, "hot") for x in "ABCDEFGH"]
    blocks = spark.createDataFrame(rows, "record_id string, block_key string")
    got = {(r.id1, r.id2): r.cbs for r in meta_blocking_wnp(blocks, max_block_size=4).collect()}
    assert got == {("A", "B"): 1}
    # without the cap the hot block's edges appear
    full = meta_blocking_wnp(blocks).count()
    assert full == 8 * 7 // 2  # all pairs of the hot block (incl. (A,B))


def test_one_to_one_matching_greedy_reference(spark):
    """Iterated mutual-best == the Python greedy reference (rank pairs by
    (score desc, id1, id2); take a pair iff both endpoints unmatched after
    all strictly-better and tie-earlier preferences resolve round-wise)."""
    from name_matching_spark.operators.score_pairs import one_to_one_matching

    # bipartite: left ids 1..4 (even namespace via letters), right a..d
    pairs = [
        (1, "a", 90), (1, "b", 80),
        (2, "a", 85), (2, "b", 70),
        (3, "b", 60), (3, "c", 60),   # tie -> partner id asc: c? No: b < c
        (4, "d", 50), (4, "c", 50),
    ]
    df = spark.createDataFrame(pairs, "id1 long, id2 string, score long")

    def greedy(pairs, rounds=3):
        import collections
        remaining = list(pairs)
        matched = []
        for rnd in range(1, rounds + 1):
            best1, best2 = {}, {}
            for i1, i2, s in remaining:
                if best1.get(i1) is None or (-s, i2) < best1[i1]:
                    best1[i1] = (-s, i2)
                if best2.get(i2) is None or (-s, i1) < best2[i2]:
                    best2[i2] = (-s, i1)
            m = [
                (i1, i2, s, rnd)
                for i1, i2, s in remaining
                if best1[i1] == (-s, i2) and best2[i2] == (-s, i1)
            ]
            matched.extend(m)
            used1 = {x[0] for x in m}
            used2 = {x[1] for x in m}
            remaining = [
                p for p in remaining if p[0] not in used1 and p[1] not in used2
            ]
        return sorted(matched)

    got = sorted(
        (r["id1"], r["id2"], r["score"], r["round"])
        for r in one_to_one_matching(df, "score", rounds=3).collect()
    )
    assert got == greedy(pairs)
    # round 1: (1,a); 2 freed -> no, 2's best a is taken: 2-b round 2
    assert (1, "a", 90, 1) in got
    assert (2, "b", 70, 2) in got
    # every endpoint at most once
    assert len({g[0] for g in got}) == len(got)
    assert len({g[1] for g in got}) == len(got)
