"""End-to-end: Spark linkage plan == brute-force oracle, cell by cell."""

import pandas as pd
import pytest

from name_matching_spark.datagen import person_records
from name_matching_spark.operators.blocking import BlockingConfig
from name_matching_spark.operators.normalize import LinkageSchema
from name_matching_spark.operators.score_pairs import MatcherConfig
from name_matching_spark.plans.linkage import dedup_table, link_tables

from tests.oracle_pipeline import run_pipeline

SCHEMA = LinkageSchema(
    id_col="record_id",
    first_name="first_name",
    middle_name_last_name="middle_name_last_name",
    birthdate="birthdate",
    geo_fields=["province_name", "city_name"],
)


@pytest.fixture(scope="module")
def records():
    return person_records(n_entities=60, dup_rate=0.5, seed=11)


@pytest.fixture(scope="module")
def spark_results(spark, records):
    df = spark.createDataFrame(records.drop(columns=["entity_id"]))
    out = dedup_table(
        df,
        schema=SCHEMA,
        blocking=BlockingConfig(passes=["phonetic"], hot_block_cap=10_000),
        matcher=MatcherConfig(),
        keep_non_match=True,
    )
    return out.toPandas()


@pytest.fixture(scope="module")
def oracle_results(records):
    return run_pipeline(records.to_dict("records"), keep_non_match=True)


def test_pair_sets_equal(spark_results, oracle_results):
    got = set(zip(spark_results["id1"], spark_results["id2"]))
    want = set(oracle_results.keys())
    assert got == want
    assert len(got) > 50  # sanity: blocking actually produced work


def test_scores_and_classifications_match(spark_results, oracle_results):
    for row in spark_results.itertuples():
        score, cls, comps = oracle_results[(row.id1, row.id2)]
        assert row.score == pytest.approx(score, abs=1e-9), (row.id1, row.id2)
        assert row.classification == cls, (row.id1, row.id2)
        assert row.score_first_name == pytest.approx(comps["first_name"], abs=1e-9)
        assert row.score_middle_name == pytest.approx(comps["middle_name"], abs=1e-9)
        assert row.score_last_name == pytest.approx(comps["last_name"], abs=1e-9)
        assert row.score_full_name_sorted == pytest.approx(comps["full_name_sorted"], abs=1e-9)
        assert row.score_monge_elkan_dl == pytest.approx(comps["monge_elkan_dl"], abs=1e-9)
        assert row.score_monge_elkan_jw == pytest.approx(comps["monge_elkan_jw"], abs=1e-9)
        assert row.score_name_score == pytest.approx(comps["name_score"], abs=1e-9)
        assert row.score_birthdate == pytest.approx(comps["birthdate"], abs=1e-9)
        assert row.score_geography == pytest.approx(comps["geography"], abs=1e-9)


def test_salting_pair_set_invariance(spark, records):
    """Property from SURVEY §7.3 risk 3: the candidate-pair set must be
    IDENTICAL under any hot-block cap (exactly-once pairing)."""
    df = spark.createDataFrame(records.drop(columns=["entity_id"]))
    base = dedup_table(df, SCHEMA, BlockingConfig(hot_block_cap=100_000), keep_non_match=True)
    salted = dedup_table(df, SCHEMA, BlockingConfig(hot_block_cap=3), keep_non_match=True)
    a = {(r["id1"], r["id2"]) for r in base.select("id1", "id2").collect()}
    b = {(r["id1"], r["id2"]) for r in salted.select("id1", "id2").collect()}
    assert a == b
    # scores too (orientation must survive salting)
    pa = base.toPandas().set_index(["id1", "id2"])["score"].sort_index()
    pb = salted.toPandas().set_index(["id1", "id2"])["score"].sort_index()
    pd.testing.assert_series_equal(pa, pb)


def test_multi_pass_union_dedups(spark, records):
    df = spark.createDataFrame(records.drop(columns=["entity_id"]))
    multi = dedup_table(
        df, SCHEMA,
        BlockingConfig(passes=["phonetic", "token_sorted"]),
        keep_non_match=True,
    )
    pdf = multi.select("id1", "id2").toPandas()
    assert not pdf.duplicated(["id1", "id2"]).any()
    single = dedup_table(df, SCHEMA, BlockingConfig(passes=["phonetic"]), keep_non_match=True)
    assert multi.count() >= single.count()


def test_cross_linkage_orientation(spark, records):
    """link_tables keeps df1 as side 1 (Monge-Elkan asymmetry)."""
    half = len(records) // 2
    df1 = spark.createDataFrame(records.iloc[:half].drop(columns=["entity_id"]))
    df2 = spark.createDataFrame(records.iloc[half:].drop(columns=["entity_id"]))
    out = link_tables(df1, df2, SCHEMA, SCHEMA, keep_non_match=True).toPandas()
    ids1 = set(records.iloc[:half]["record_id"])
    ids2 = set(records.iloc[half:]["record_id"])
    assert set(out["id1"]).issubset(ids1)
    assert set(out["id2"]).issubset(ids2)
    assert len(out) > 0


def test_top_k_limit(spark, records):
    df = spark.createDataFrame(records.drop(columns=["entity_id"]))
    out = dedup_table(df, SCHEMA, top_k=1).toPandas()
    assert out.groupby("id1").size().max() <= 1


def test_pluggable_base_similarity_dl(spark, records):
    """The base-component-similarity slot (src/name_matcher.py:73,97):
    damerau_levenshtein base must match the oracle with the same plug."""
    import pytest as _pytest

    from name_matching_spark.core import damerau_levenshtein_similarity
    from tests.oracle_pipeline import blocked_pairs, score_pair

    sub = records.iloc[:40]
    df = spark.createDataFrame(sub.drop(columns=["entity_id"]))
    out = dedup_table(
        df, SCHEMA, matcher=MatcherConfig(base_similarity="damerau_levenshtein"),
        keep_non_match=True,
    ).toPandas()

    by_id = {r["record_id"]: r for r in sub.to_dict("records")}
    want = {}
    for id1, id2 in blocked_pairs(sub.to_dict("records")):
        score, cls, _ = score_pair(
            by_id[id1], by_id[id2], base_similarity=damerau_levenshtein_similarity
        )
        want[(id1, id2)] = (score, cls)
    got = {(r.id1, r.id2): (r.score, r.classification) for r in out.itertuples()}
    assert set(got) == set(want)
    for k, (s, c) in want.items():
        assert got[k][0] == _pytest.approx(s, abs=1e-9), k
        assert got[k][1] == c, k


def test_punctuation_token_in_name_matches_oracle(spark):
    """Standardization can delete a punctuation-only token ('Cruz & Santos'
    -> 'cruz  santos'); the sorted_full key must drop the resulting empty
    token like Python str.split() does (ADVICE r1: score_full_name_sorted
    diverged 0.8737 vs 1.0 before the fix)."""
    rows = [
        {"record_id": 1, "first_name": "Ana", "middle_name_last_name": "Cruz & Santos",
         "birthdate": "1990-01-01", "province_name": "Prov", "city_name": "City"},
        {"record_id": 2, "first_name": "Ana", "middle_name_last_name": "Cruz Santos",
         "birthdate": "1990-01-01", "province_name": "Prov", "city_name": "City"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = dedup_table(df, SCHEMA, keep_non_match=True).toPandas()
    want = run_pipeline(rows, keep_non_match=True)
    assert set(zip(out["id1"], out["id2"])) == set(want.keys())
    for row in out.itertuples():
        score, cls, comps = want[(row.id1, row.id2)]
        assert row.score == pytest.approx(score, abs=1e-9)
        assert row.classification == cls
        assert row.score_full_name_sorted == pytest.approx(
            comps["full_name_sorted"], abs=1e-9
        )
    # the pair's sorted-full similarity is exactly 1.0 once empties drop
    assert out.iloc[0]["score_full_name_sorted"] == pytest.approx(1.0)


def test_dict_encoded_scoring_is_value_exact(spark):
    """Dictionary-encoded scoring (class ids + closure dictionary) returns
    bit-identical results to the direct struct-payload path; the cap makes
    the auto switch fall back to direct on over-diverse corpora."""
    # heavy duplication: 8 distinct people x 25 copies, distinct ids
    rows = []
    for i in range(200):
        p = i % 8
        rows.append((i, f"Maria{p}", f"Cruz{p} Santos{p}", f"19{70+p}-01-0{p+1}", "Reg", "City"))
    df = spark.createDataFrame(
        rows,
        ["record_id", "first_name", "middle_name_last_name", "birthdate",
         "province_name", "city_name"],
    )
    direct = dedup_table(df, SCHEMA, keep_non_match=True, dict_encode=False)
    encoded = dedup_table(df, SCHEMA, keep_non_match=True, dict_encode=True)
    key = ["id1", "id2"]
    d1 = {tuple(r[k] for k in key): r.asDict() for r in direct.collect()}
    d2 = {tuple(r[k] for k in key): r.asDict() for r in encoded.collect()}
    assert d1.keys() == d2.keys() and len(d1) > 0
    for k, v in d1.items():
        assert v == d2[k], k  # exact equality incl. every score double
    # auto mode with a cap below the distinct-payload count (8) must fall
    # back to the direct path, not truncate the dictionary
    auto_small = dedup_table(
        df, SCHEMA, keep_non_match=True, dict_encode=None, dict_max_classes=4
    )
    d3 = {tuple(r[k] for k in key): r.asDict() for r in auto_small.collect()}
    assert d3 == d1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_table(df, SCHEMA, dict_encode=True, dict_max_classes=4)


def test_dedup_with_metaphone_pass(spark):
    """The metaphone blocking pass plugs into the full linkage plan and
    recalls a same-sound/different-spelling pair soundex also blocks on;
    union-of-passes stays pair-unique."""
    from name_matching_spark.operators.blocking import BlockingConfig
    from name_matching_spark.operators.normalize import LinkageSchema
    from name_matching_spark.operators.score_pairs import MatcherConfig
    from name_matching_spark.plans.linkage import dedup_table

    df = spark.createDataFrame(
        [
            (1, "Juan", "Smith"),
            (2, "Juan", "Smyth"),
            (3, "Maria", "Torres"),
        ],
        ["record_id", "first_name", "middle_name_last_name"],
    )
    out = dedup_table(
        df,
        LinkageSchema(id_col="record_id", birthdate=None, geo_fields=[]),
        blocking=BlockingConfig(passes=["phonetic", "metaphone"]),
        matcher=MatcherConfig(use_birthdate=False, geo_fields=[]),
        keep_non_match=True,
    ).toPandas()
    pairs = set(zip(out["id1"], out["id2"]))
    assert (1, 2) in pairs
    assert len(pairs) == len(out)  # no duplicate pairs across passes


def test_assign_to_anchors_incremental(spark, records):
    """Delta records anchor to their best base match; unseen names open new
    entities; exact duplicates anchor at score 1.0."""
    from pyspark.sql import functions as F

    from name_matching_spark.plans.linkage import assign_to_anchors

    base = spark.createDataFrame(records.drop(columns=["entity_id"]))
    dup_row = records.iloc[[0]].drop(columns=["entity_id"]).assign(record_id="new_dup")
    novel = pd.DataFrame(
        [
            {
                "record_id": "new_novel",
                "first_name": "Zebulon",
                "middle_name_last_name": "Qwerty Zzyzx",
                "birthdate": "1900-01-01",
                "province_name": "Nowhere",
                "city_name": "Nowhere City",
            }
        ]
    )
    delta = spark.createDataFrame(pd.concat([dup_row, novel]))
    out = {
        r["record_id"]: r
        for r in assign_to_anchors(delta, base, SCHEMA).collect()
    }
    assert len(out) == 2
    dup = out["new_dup"]
    assert dup["anchor_id"] == records.iloc[0]["record_id"]
    assert dup["best_score"] == pytest.approx(1.0)
    assert dup["is_new"] == 0
    nov = out["new_novel"]
    assert (nov["anchor_id"], nov["best_score"], nov["is_new"]) == ("-1", None, 1)
