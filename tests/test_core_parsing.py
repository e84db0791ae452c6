"""Parsing/standardization oracle tests (reference: tests/test_parser.py,
tests/test_standardizer.py semantics)."""

from name_matching_spark.core import (
    extract_name_components,
    parse_name,
    remove_name_prefixes,
    remove_name_suffixes,
    standardize_name,
    tokenize_name,
)


class TestStandardize:
    def test_basic(self):
        assert standardize_name("  Juan   Cruz ") == "juan cruz"
        assert standardize_name("JUAN") == "juan"
        assert standardize_name(None) == ""
        assert standardize_name("") == ""

    def test_accent_fold(self):
        assert standardize_name("José") == "jose"
        assert standardize_name("Muñoz") == "munoz"
        assert standardize_name("Émile") == "emile"

    def test_preserve_hyphen_apostrophe(self):
        assert standardize_name("O'Brien") == "o'brien"
        assert standardize_name("Smith-Jones") == "smith-jones"

    def test_strip_special(self):
        assert standardize_name("Juan@Cruz!") == "juancruz"
        assert standardize_name("Customer#000000001") == "customer000000001"

    def test_nfkc(self):
        # fullwidth compatibility characters fold to ASCII under NFKC
        assert standardize_name("Ｊｕａｎ") == "juan"


class TestParse:
    def test_first_plus_middle_last(self):
        assert parse_name("Juan", "Cruz Santos") == {
            "first_name": "Juan",
            "middle_name": "Cruz",
            "last_name": "Santos",
        }

    def test_only_last(self):
        assert parse_name("Juan", "Santos") == {
            "first_name": "Juan",
            "middle_name": "",
            "last_name": "Santos",
        }

    def test_compound_surname_glued(self):
        # reference tests/test_parser.py:26-39
        assert parse_name("Pedro", "Dela Cruz") == {
            "first_name": "Pedro",
            "middle_name": "",
            "last_name": "Dela Cruz",
        }
        assert parse_name("Pedro", "De la Cruz") == {
            "first_name": "Pedro",
            "middle_name": "",
            "last_name": "De la Cruz",
        }
        assert parse_name("Ana", "Reyes de los Santos") == {
            "first_name": "Ana",
            "middle_name": "Reyes",
            "last_name": "de los Santos",
        }

    def test_compound_in_middle_position(self):
        # left-to-right glue: "dela cruz" groups, then "santos" is last
        assert parse_name("Juan", "dela cruz santos") == {
            "first_name": "Juan",
            "middle_name": "dela cruz",
            "last_name": "santos",
        }

    def test_trailing_prefix_not_glued(self):
        # a compound prefix with no following token stays a plain token
        assert parse_name("Juan", "cruz san") == {
            "first_name": "Juan",
            "middle_name": "cruz",
            "last_name": "san",
        }

    def test_santa_not_san(self):
        # whole-token matching: "santa maria" glues as santa+maria, not san
        assert parse_name("X", "santa maria cruz") == {
            "first_name": "X",
            "middle_name": "santa maria",
            "last_name": "cruz",
        }

    def test_empty(self):
        assert parse_name("", "") == {"first_name": "", "middle_name": "", "last_name": ""}
        assert parse_name(None, None) == {"first_name": "", "middle_name": "", "last_name": ""}


class TestExtract:
    def test_token_counts(self):
        assert extract_name_components("Juan") == {
            "first_name": "Juan", "middle_name": "", "last_name": "",
        }
        assert extract_name_components("Juan Cruz") == {
            "first_name": "Juan", "middle_name": "", "last_name": "Cruz",
        }
        assert extract_name_components("Juan Cruz Santos") == {
            "first_name": "Juan", "middle_name": "Cruz", "last_name": "Santos",
        }
        assert extract_name_components("Juan dela Cruz") == {
            "first_name": "Juan", "middle_name": "", "last_name": "dela Cruz",
        }
        assert extract_name_components("") == {
            "first_name": "", "middle_name": "", "last_name": "",
        }


class TestAffixes:
    def test_prefixes(self):
        assert remove_name_prefixes("Mr Juan Cruz") == "Juan Cruz"
        assert remove_name_prefixes("Dr. Maria Santos") == "Maria Santos"
        assert remove_name_prefixes("Juan Cruz") == "Juan Cruz"

    def test_suffixes(self):
        assert remove_name_suffixes("Juan Cruz Jr") == "Juan Cruz"
        # reference matches the " iii" form first, so the comma survives
        # (src/standardizer.py:104-109 — the ", suffix" branch is dead code)
        assert remove_name_suffixes("Juan Cruz, III") == "Juan Cruz,"
        assert remove_name_suffixes("Juan Cruz,") == "Juan Cruz"
        assert remove_name_suffixes("Juan Cruz") == "Juan Cruz"


class TestTokenize:
    def test_basic(self):
        assert tokenize_name("  Juan   Cruz ") == ["Juan", "Cruz"]
        assert tokenize_name("") == []
        assert tokenize_name(None) == []
