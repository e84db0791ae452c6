"""Scoring/classification oracle tests (reference: tests/test_scorer.py,
tests/test_name_matcher.py behavioral layer)."""

import pytest

from name_matching_spark.core import (
    classify_match,
    compare_name_components,
    match_records,
    score_name_match,
    score_with_additional_fields,
)


class TestScoreNameMatch:
    def test_perfect(self):
        scores = {
            "first_name": 1.0, "middle_name": 1.0,
            "last_name": 1.0, "full_name_sorted": 1.0,
        }
        assert score_name_match(scores) == pytest.approx(1.0)

    def test_weighted(self):
        scores = {
            "first_name": 1.0, "middle_name": 0.0,
            "last_name": 1.0, "full_name_sorted": 0.0,
        }
        # (0.4*1 + 0.2*0 + 0.3*1 + 0.1*0) / 1.0
        assert score_name_match(scores) == pytest.approx(0.7)

    def test_missing_component_counts_as_zero(self):
        # reference fills missing components with 0.0 and keeps full weight
        # in the denominator (src/scorer.py:39-54)
        assert score_name_match({"first_name": 1.0}) == pytest.approx(0.4)

    def test_custom_weights(self):
        assert score_name_match({"a": 1.0, "b": 0.5}, {"a": 1.0, "b": 1.0}) == pytest.approx(0.75)

    def test_empty_weights(self):
        assert score_name_match({"a": 1.0}, {}) == 0.0 or score_name_match({"a": 1.0}) > 0


class TestClassify:
    def test_boundaries(self):
        # >= 0.75 match; < 0.55 non_match (STRICT); else manual_review
        assert classify_match(0.75) == "match"
        assert classify_match(0.99) == "match"
        assert classify_match(0.749999) == "manual_review"
        assert classify_match(0.55) == "manual_review"  # not strict-below
        assert classify_match(0.549999) == "non_match"
        assert classify_match(0.0) == "non_match"


class TestAdditionalFields:
    def test_passthrough_when_absent(self):
        assert score_with_additional_fields(0.9, None) == 0.9
        assert score_with_additional_fields(0.9, {}) == 0.9

    def test_blend(self):
        # name_weight = 1 - (0.3+0.3) = 0.4
        s = score_with_additional_fields(1.0, {"birthdate": 1.0, "geography": 1.0})
        assert s == pytest.approx(1.0)
        s = score_with_additional_fields(1.0, {"birthdate": 0.0, "geography": 1.0})
        assert s == pytest.approx(0.7)

    def test_absent_weight_mass_drops(self):
        # reference does NOT renormalize when an additional field is missing
        # (src/scorer.py:109-117): geography only -> max achievable is 0.7
        s = score_with_additional_fields(1.0, {"geography": 1.0})
        assert s == pytest.approx(0.4 + 0.3)

    def test_unknown_field_ignored(self):
        s = score_with_additional_fields(1.0, {"zzz": 1.0})
        assert s == pytest.approx(0.4)


class TestCompareComponents:
    def test_perfect(self):
        c = {"first_name": "juan", "middle_name": "cruz", "last_name": "santos"}
        scores = compare_name_components(c, dict(c))
        assert scores["first_name"] == 1.0
        assert scores["middle_name"] == 1.0
        assert scores["last_name"] == 1.0
        assert scores["full_name_sorted"] == 1.0

    def test_empty_components_score_one(self):
        # JW("","") == 1.0 — both-missing middles contribute full similarity
        c1 = {"first_name": "juan", "middle_name": "", "last_name": "santos"}
        c2 = {"first_name": "juan", "middle_name": "", "last_name": "santos"}
        scores = compare_name_components(c1, c2)
        assert scores["middle_name"] == 1.0


class TestMatchRecords:
    def test_identical_perfect(self):
        score, cls, comps = match_records(
            "Juan", "Cruz Santos", "Juan", "Cruz Santos",
            birthdate1="1990-01-01", birthdate2="1990-01-01",
            geo1={"province_name": "Manila", "city_name": "QC", "barangay_name": "B1"},
            geo2={"province_name": "Manila", "city_name": "QC", "barangay_name": "B1"},
        )
        assert score == pytest.approx(1.0)
        assert cls == "match"
        assert comps["name_score"] == pytest.approx(1.0)

    def test_typo_still_match(self):
        score, cls, _ = match_records(
            "Juan", "Cruz Santos", "Juan", "Crux Santos",
            birthdate1="1990-01-01", birthdate2="1990-01-01",
            geo1={"province_name": "Manila"}, geo2={"province_name": "Manila"},
        )
        assert score > 0.8
        assert cls == "match"

    def test_different_names_no_match(self):
        score, cls, _ = match_records(
            "Juan", "Cruz Santos", "Maria", "Reyes Garcia",
            birthdate1="1990-01-01", birthdate2="1985-05-15",
            geo1={"province_name": "Manila"}, geo2={"province_name": "Cebu"},
        )
        assert score < 0.75
        assert cls != "match"

    def test_birthdate_mismatch_pulls_down(self):
        score_same, _, _ = match_records(
            "Juan", "Cruz Santos", "Juan", "Cruz Santos",
            birthdate1="1990-01-01", birthdate2="1990-01-01",
        )
        score_diff, _, _ = match_records(
            "Juan", "Cruz Santos", "Juan", "Cruz Santos",
            birthdate1="1990-01-01", birthdate2="1991-01-01",
        )
        assert score_diff == pytest.approx(score_same - 0.3)

    def test_names_only(self):
        score, cls, comps = match_records("Juan", "Cruz Santos", "Juan", "Cruz Santos")
        assert score == pytest.approx(1.0)
        assert cls == "match"
        assert comps["monge_elkan_jw"] == pytest.approx(1.0)
        assert comps["monge_elkan_dl"] == pytest.approx(1.0)

    def test_token_swap_scores_high_on_sorted(self):
        _, _, comps = match_records("Robert", "Davis", "Davis", "Robert")
        assert comps["full_name_sorted"] == pytest.approx(1.0)
        assert comps["monge_elkan_jw"] == pytest.approx(1.0)

    def test_compound_surname_variants(self):
        score, _, _ = match_records("Pedro", "Dela Cruz", "Pedro", "De la Cruz")
        assert score > 0.8


def test_smith_waterman_base_similarity_ensemble(spark):
    """`base_similarity='smith_waterman'` plugs the SW kernel into the
    fused component ensemble end to end (engine extension; JW stays the
    reference default) and matches the scalar SW oracle per component."""
    from name_matching_spark.core.similarity import smith_waterman_similarity
    from name_matching_spark.operators.score_pairs import MatcherConfig, score_pairs
    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [
            ("a", "b",
             ("juan", "reyes", "santos"), ("juan", "reyes", "santoss")),
        ],
        "id1 string, id2 string, "
        "s1 struct<first_std:string,middle_std:string,last_std:string>, "
        "s2 struct<first_std:string,middle_std:string,last_std:string>",
    )
    cfg = MatcherConfig(
        base_similarity="smith_waterman", geo_fields=[], use_birthdate=False
    )
    row = score_pairs(pairs, cfg).collect()[0]
    assert row["score_first_name"] == smith_waterman_similarity("juan", "juan") == 1.0
    assert row["score_last_name"] == smith_waterman_similarity("santos", "santoss")
