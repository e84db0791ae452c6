"""INI config layer: round-trip, precedence, and validation."""

import pytest

from name_matching_spark.config import apply_overrides, load_linkage_config

INI = """
[schema]
id_col = person_id
first_name = fn
middle_name_last_name = mnl
birthdate =
geo_fields = region, town

[matching]
match_threshold = 0.8
non_match_threshold = 0.6
base_similarity = damerau_levenshtein

[weights]
first_name = 0.5
middle_name = 0.1
geography = 0.2

[blocking]
passes = phonetic, token_sorted
hot_block_cap = 250

[checkpoint]
num_ranges = 8
"""


@pytest.fixture
def ini_path(tmp_path):
    p = tmp_path / "config.ini"
    p.write_text(INI)
    return str(p)


def test_defaults_without_file():
    job = load_linkage_config(None)
    assert job.matcher.match_threshold == 0.75
    assert job.matcher.non_match_threshold == 0.55
    assert job.blocking.passes == ["phonetic"]
    assert job.num_ranges == 16


def test_file_roundtrip(ini_path):
    job = load_linkage_config(ini_path)
    assert job.schema.id_col == "person_id"
    assert job.schema.first_name == "fn"
    assert job.schema.birthdate is None  # empty value disables the field
    assert job.schema.geo_fields == ["region", "town"]
    assert job.matcher.match_threshold == 0.8
    assert job.matcher.non_match_threshold == 0.6
    assert job.matcher.base_similarity == "damerau_levenshtein"
    assert job.matcher.use_birthdate is False  # follows schema.birthdate=None
    assert job.matcher.geo_fields == ["region", "town"]
    assert job.matcher.name_weights["first_name"] == 0.5
    assert job.matcher.name_weights["middle_name"] == 0.1
    assert job.matcher.name_weights["last_name"] == 0.3  # default kept
    assert job.matcher.additional_weights["geography"] == 0.2
    assert job.matcher.additional_weights["birthdate"] == 0.3  # default kept
    assert job.blocking.passes == ["phonetic", "token_sorted"]
    assert job.blocking.hot_block_cap == 250
    assert job.num_ranges == 8


def test_cli_overrides_beat_file(ini_path):
    job = load_linkage_config(ini_path)
    apply_overrides(job, match_threshold=0.9, cap=77, passes=["soundex_full"],
                    geo_cols=["g1"])
    assert job.matcher.match_threshold == 0.9       # CLI wins
    assert job.matcher.non_match_threshold == 0.6   # file value kept
    assert job.blocking.hot_block_cap == 77
    assert job.blocking.passes == ["soundex_full"]
    assert job.schema.geo_fields == ["g1"]
    assert job.matcher.geo_fields == ["g1"]


def test_none_overrides_are_ignored(ini_path):
    job = load_linkage_config(ini_path)
    apply_overrides(job, match_threshold=None, cap=None)
    assert job.matcher.match_threshold == 0.8
    assert job.blocking.hot_block_cap == 250


def test_unknown_key_raises(tmp_path):
    p = tmp_path / "bad.ini"
    p.write_text("[matching]\nmatch_treshold = 0.9\n")  # typo'd key
    with pytest.raises(ValueError, match="unknown keys"):
        load_linkage_config(str(p))


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        load_linkage_config("/nonexistent/config.ini")


def test_sample_config_parses():
    job = load_linkage_config("/root/repo/config.ini.sample")
    assert job.matcher.match_threshold == 0.75
    assert job.schema.geo_fields == ["province_name", "city_name"]
    assert job.matcher.use_birthdate is True


def test_config_driven_run_matches_flag_driven(spark, tmp_path):
    """The same tiny linkage run driven by --config equals the flag-driven
    run (end-to-end through scripts/run_linkage.py main())."""
    import pandas as pd

    from name_matching_spark.datagen import person_records
    from scripts.run_linkage import main

    records = person_records(n_entities=25, dup_rate=0.4, seed=3)
    src = str(tmp_path / "input.parquet")
    spark.createDataFrame(records.drop(columns=["entity_id"])).write.parquet(src)

    ini = tmp_path / "run.ini"
    ini.write_text(
        "[schema]\nid_col = record_id\nbirthdate = birthdate\n"
        "geo_fields = province_name, city_name\n"
        "[blocking]\npasses = phonetic\nhot_block_cap = 500\n"
        "[checkpoint]\nnum_ranges = 4\n"
    )
    out_cfg = str(tmp_path / "out_cfg")
    out_flags = str(tmp_path / "out_flags")
    assert main(["--input", src, "--output", out_cfg, "--config", str(ini)]) == 0
    assert main([
        "--input", src, "--output", out_flags, "--ranges", "4",
        "--birthdate-col", "birthdate",
        "--geo-cols", "province_name", "city_name", "--cap", "500",
    ]) == 0
    a = pd.read_parquet(f"{out_cfg}/matches").sort_values(["id1", "id2"]).reset_index(drop=True)
    b = pd.read_parquet(f"{out_flags}/matches").sort_values(["id1", "id2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["id1", "id2", "score", "classification"]],
        b[["id1", "id2", "score", "classification"]],
    )
    assert len(a) > 0


def test_match_names_cli(capsys):
    """The match-names verb (reference src/cli.py:26-66): one pair through
    the scalar oracle with per-component breakdown."""
    import json as _json

    from name_matching_spark.core.scoring import match_records
    from scripts.match_names import main

    assert main(["Juan Cruz Santos", "Juan Crux Santos",
                 "--birthdate1", "1990-01-01", "--birthdate2", "1990-01-01"]) == 0
    got = _json.loads(capsys.readouterr().out)
    want_score, want_cls, want_comps = match_records(
        "Juan Cruz Santos", None, "Juan Crux Santos", None,
        birthdate1="1990-01-01", birthdate2="1990-01-01",
    )
    assert got["score"] == round(want_score, 6)
    assert got["classification"] == want_cls
    assert got["components"]["first_name"] == round(want_comps["first_name"], 6)
    assert got["components"]["birthdate"] == 1.0


def test_performance_section_round_trip(tmp_path):
    from name_matching_spark.config import load_linkage_config

    ini = tmp_path / "perf.ini"
    ini.write_text("[performance]\ndict_encode = false\ndict_max_classes = 123\n")
    job = load_linkage_config(str(ini))
    assert job.dict_encode is False
    assert job.dict_max_classes == 123
    ini.write_text("[performance]\ndict_encode = auto\n")
    assert load_linkage_config(str(ini)).dict_encode is None
    ini.write_text("[performance]\ndict_encode = maybe\n")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        load_linkage_config(str(ini))
