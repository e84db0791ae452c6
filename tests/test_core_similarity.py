"""Golden-constant tests for the scalar oracle.

Values pinned by the reference's own test suite
(``/root/reference/tests/test_matcher.py``) and the published literature.
"""

import pytest

from name_matching_spark.core import (
    damerau_levenshtein_distance,
    damerau_levenshtein_similarity,
    jaccard_similarity,
    jaro_similarity,
    jaro_winkler_similarity,
    monge_elkan_similarity,
    soundex,
    soundex_similarity,
    token_sort_similarity,
)


class TestJaro:
    def test_golden(self):
        # tests/test_matcher.py:22-24
        assert jaro_similarity("MARTHA", "MARHTA") == pytest.approx(0.944, abs=1e-3)
        assert jaro_similarity("DIXON", "DICKSONX") == pytest.approx(0.767, abs=1e-3)
        assert jaro_similarity("JELLYFISH", "SMELLYFISH") == pytest.approx(0.896, abs=1e-3)

    def test_edges(self):
        assert jaro_similarity("", "") == 1.0
        assert jaro_similarity("a", "") == 0.0
        assert jaro_similarity("", "a") == 0.0
        assert jaro_similarity("abc", "abc") == 1.0
        assert jaro_similarity("abc", "xyz") == 0.0


class TestJaroWinkler:
    def test_golden(self):
        # tests/test_matcher.py:35-37
        assert jaro_winkler_similarity("MARTHA", "MARHTA") == pytest.approx(0.961, abs=1e-3)
        assert jaro_winkler_similarity("DIXON", "DICKSONX") == pytest.approx(0.813, abs=1e-3)
        assert jaro_winkler_similarity("JELLYFISH", "SMELLYFISH") == pytest.approx(0.896, abs=1e-3)

    def test_no_boost_gate(self):
        # Reference applies the prefix bonus at ANY jaro score
        # (src/matcher.py:185) — unlike textbook JW which gates at 0.7.
        j = jaro_similarity("abcdefgh", "abzzzzzz")
        assert j < 0.7
        jw = jaro_winkler_similarity("abcdefgh", "abzzzzzz")
        assert jw == pytest.approx(j + 2 * 0.1 * (1 - j))

    def test_prefix_cap_4(self):
        j = jaro_similarity("abcdefgh", "abcdefzz")
        jw = jaro_winkler_similarity("abcdefgh", "abcdefzz")
        assert jw == pytest.approx(j + 4 * 0.1 * (1 - j))

    def test_edges(self):
        assert jaro_winkler_similarity("", "") == 1.0
        assert jaro_winkler_similarity("x", "") == 0.0
        assert jaro_winkler_similarity("", "x") == 0.0


class TestDamerauLevenshtein:
    def test_full_dl_not_osa(self):
        # tests/test_matcher.py:61 pins jellyfish full-DL: dist("ca","abc")==2.
        # The OSA restriction would give 3.
        assert damerau_levenshtein_distance("ca", "abc") == 2

    def test_known_distances(self):
        assert damerau_levenshtein_distance("", "") == 0
        assert damerau_levenshtein_distance("abc", "") == 3
        assert damerau_levenshtein_distance("", "abc") == 3
        assert damerau_levenshtein_distance("abc", "abc") == 0
        assert damerau_levenshtein_distance("ab", "ba") == 1  # transposition
        assert damerau_levenshtein_distance("kitten", "sitting") == 3
        assert damerau_levenshtein_distance("MARTHA", "MARHTA") == 1

    def test_similarity(self):
        # tests/test_matcher.py:49: DIXON/DICKSONX -> 0.5 (dist 4, max_len 8)
        assert damerau_levenshtein_similarity("DIXON", "DICKSONX") == pytest.approx(0.5)
        assert damerau_levenshtein_similarity("", "") == 1.0
        assert damerau_levenshtein_similarity("a", "") == 0.0
        assert damerau_levenshtein_similarity("abc", "abc") == 1.0


class TestMongeElkan:
    def test_permutation_invariant_perfect(self):
        # tests/test_matcher.py:100-106
        assert monge_elkan_similarity(
            ["maria", "clara"], ["clara", "maria"], jaro_winkler_similarity
        ) == pytest.approx(1.0)

    def test_empty(self):
        assert monge_elkan_similarity([], ["a"], jaro_winkler_similarity) == 0.0
        assert monge_elkan_similarity(["a"], [], jaro_winkler_similarity) == 0.0
        assert monge_elkan_similarity([""], ["a"], jaro_winkler_similarity) == 0.0

    def test_asymmetric(self):
        t1 = ["juan"]
        t2 = ["juan", "zzz"]
        assert monge_elkan_similarity(t1, t2, jaro_winkler_similarity) == pytest.approx(1.0)
        # the other direction averages over two tokens
        assert monge_elkan_similarity(t2, t1, jaro_winkler_similarity) < 1.0

    def test_hand_computed(self):
        # mean over tokens1 of max-sim: single-token lists reduce to the
        # underlying similarity
        assert monge_elkan_similarity(
            ["martha"], ["marhta"], jaro_winkler_similarity
        ) == pytest.approx(jaro_winkler_similarity("martha", "marhta"))


class TestSoundex:
    def test_reference_values(self):
        # tests/test_matcher.py:120-142 and FIXTURES.md §5
        assert soundex("Robert") == "R163"
        assert soundex("Rupert") == "R163"
        assert soundex("Tymczak") == "T520"  # deviation: std is T522
        assert soundex("Pfister") == "P123"  # deviation: std is P236
        assert soundex("Santos") == "S532"
        assert soundex("Dela Cruz") == "D426"
        assert soundex("") == "0000"
        assert soundex("A") == "A000"

    def test_non_alpha(self):
        assert soundex("123") == "0000"
        assert soundex("123abc") == soundex("abc")

    def test_vowel_does_not_reset_dedup(self):
        # c(2) a z(2): the vowel between does not separate the duplicate 2s
        assert soundex("caz") == "C200"

    def test_similarity(self):
        assert soundex_similarity("Robert", "Rupert") == 1.0
        assert soundex_similarity("Robert", "Santos") == 0.0


class TestJaccard:
    def test_golden(self):
        # tests/test_matcher.py:156-165
        assert jaccard_similarity("Juan Cruz", "Juan Santos") == pytest.approx(1 / 3)
        assert jaccard_similarity("", "") == 1.0
        assert jaccard_similarity("a", "") == 0.0
        assert jaccard_similarity("Juan Cruz", "juan cruz") == 1.0


class TestTokenSort:
    def test_golden(self):
        # tests/test_matcher.py:170
        assert token_sort_similarity("Juan Cruz", "Cruz Juan") == pytest.approx(1.0)
        assert token_sort_similarity("", "") == 1.0
        assert token_sort_similarity("x", "") == 0.0
