"""INI config layer: file-driven thresholds/weights/blocking/schema.

Spark-side analog of the reference's ini config system
(``/root/reference/src/config.py``, ``config.ini.sample``): the
``[matching]`` section keeps the reference's keys and defaults
(``match_threshold``/``non_match_threshold``, ``src/config.py:256-257``);
engine-specific sections map onto the dataclass configs. Precedence is the
reference's: dataclass defaults < INI file < explicit CLI flags
(``apply_overrides``). Database/GPU/logging sections are intentionally not
ported (no MySQL/GPU in the Spark engine; Spark has its own logging).
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass

from name_matching_spark.operators.blocking import BlockingConfig
from name_matching_spark.operators.normalize import LinkageSchema
from name_matching_spark.operators.score_pairs import MatcherConfig

__all__ = ["LinkageJobConfig", "load_linkage_config", "apply_overrides"]

_NAME_WEIGHT_KEYS = (
    "first_name", "middle_name", "last_name", "full_name_sorted",
    "monge_elkan_dl", "monge_elkan_jw",
)
_ADDITIONAL_WEIGHT_KEYS = ("birthdate", "geography")


@dataclass
class LinkageJobConfig:
    """Everything a linkage run needs, assembled from defaults + INI."""

    schema: LinkageSchema
    blocking: BlockingConfig
    matcher: MatcherConfig
    num_ranges: int = 16
    # None = adaptive (dictionary-encode the scoring payload when the
    # corpus has <= dict_max_classes distinct payloads; see plans.linkage)
    dict_encode: bool | None = None
    dict_max_classes: int = 65536


def _csv_list(raw: str) -> list[str]:
    return [p.strip() for p in raw.split(",") if p.strip()]


def load_linkage_config(path: str | None = None) -> LinkageJobConfig:
    """Build a :class:`LinkageJobConfig` from dataclass defaults overlaid
    with an INI file (when ``path`` is given).

    Recognized sections/keys::

        [schema]    id_col, first_name, middle_name_last_name,
                    birthdate (empty/absent -> no birthdate column),
                    geo_fields (comma list)
        [matching]  match_threshold, non_match_threshold,
                    base_similarity, use_birthdate
        [weights]   first_name, middle_name, last_name, full_name_sorted,
                    monge_elkan_dl, monge_elkan_jw (name-score weights);
                    birthdate, geography (additional-field weights)
        [blocking]  passes (comma list), hot_block_cap
        [checkpoint] num_ranges

    Unknown sections are ignored (forward compatibility, mirroring the
    reference's tolerant reader); unknown keys in known sections raise —
    a typo'd threshold silently keeping its default is the worst failure
    mode a config file can have.
    """
    schema = LinkageSchema()
    blocking = BlockingConfig()
    matcher = MatcherConfig()
    job = LinkageJobConfig(schema=schema, blocking=blocking, matcher=matcher)
    if path is None:
        return job

    cp = configparser.ConfigParser()
    read = cp.read(path)
    if not read:
        raise FileNotFoundError(f"config file not found or unreadable: {path}")

    def check_keys(section: str, allowed: set[str]) -> None:
        extra = set(cp[section]) - allowed
        if extra:
            raise ValueError(f"unknown keys in [{section}]: {sorted(extra)}")

    if cp.has_section("schema"):
        check_keys("schema", {"id_col", "first_name", "middle_name_last_name",
                              "birthdate", "geo_fields"})
        s = cp["schema"]
        schema.id_col = s.get("id_col", schema.id_col)
        schema.first_name = s.get("first_name", schema.first_name)
        schema.middle_name_last_name = s.get(
            "middle_name_last_name", schema.middle_name_last_name
        )
        if "birthdate" in s:
            schema.birthdate = s.get("birthdate") or None
        if "geo_fields" in s:
            schema.geo_fields = _csv_list(s.get("geo_fields"))

    if cp.has_section("matching"):
        check_keys("matching", {"match_threshold", "non_match_threshold",
                                "base_similarity", "use_birthdate"})
        m = cp["matching"]
        matcher.match_threshold = m.getfloat("match_threshold", matcher.match_threshold)
        matcher.non_match_threshold = m.getfloat(
            "non_match_threshold", matcher.non_match_threshold
        )
        matcher.base_similarity = m.get("base_similarity", matcher.base_similarity)
        matcher.use_birthdate = m.getboolean("use_birthdate", matcher.use_birthdate)

    if cp.has_section("weights"):
        check_keys("weights", set(_NAME_WEIGHT_KEYS) | set(_ADDITIONAL_WEIGHT_KEYS))
        w = cp["weights"]
        for key in _NAME_WEIGHT_KEYS:
            if key in w:
                matcher.name_weights[key] = w.getfloat(key)
        for key in _ADDITIONAL_WEIGHT_KEYS:
            if key in w:
                matcher.additional_weights[key] = w.getfloat(key)

    if cp.has_section("blocking"):
        check_keys("blocking", {"passes", "hot_block_cap"})
        b = cp["blocking"]
        if "passes" in b:
            blocking.passes = _csv_list(b.get("passes"))
        blocking.hot_block_cap = b.getint("hot_block_cap", blocking.hot_block_cap)

    if cp.has_section("checkpoint"):
        check_keys("checkpoint", {"num_ranges"})
        job.num_ranges = cp["checkpoint"].getint("num_ranges", job.num_ranges)

    if cp.has_section("performance"):
        check_keys("performance", {"dict_encode", "dict_max_classes"})
        p = cp["performance"]
        if "dict_encode" in p:
            raw = p.get("dict_encode").strip().lower()
            if raw == "auto":
                job.dict_encode = None
            elif raw in ("true", "false"):
                job.dict_encode = raw == "true"
            else:
                raise ValueError(
                    f"[performance] dict_encode must be auto/true/false, got {raw!r}"
                )
        job.dict_max_classes = p.getint("dict_max_classes", job.dict_max_classes)

    # keep matcher/schema geo coupling coherent: matcher scores the schema's
    # geo fields unless the file decoupled them on purpose
    matcher.geo_fields = list(schema.geo_fields)
    if schema.birthdate is None:
        matcher.use_birthdate = False
    return job


def apply_overrides(job: LinkageJobConfig, **overrides) -> LinkageJobConfig:
    """CLI layer: overlay explicitly-given values (``None`` = not given).

    Supported keys: id_col, first_col, mnl_col, birthdate_col, geo_cols,
    match_threshold, non_match_threshold, base_similarity, passes, cap,
    ranges.
    """
    o = {k: v for k, v in overrides.items() if v is not None}
    if "id_col" in o:
        job.schema.id_col = o["id_col"]
    if "first_col" in o:
        job.schema.first_name = o["first_col"]
    if "mnl_col" in o:
        job.schema.middle_name_last_name = o["mnl_col"]
    if "birthdate_col" in o:
        job.schema.birthdate = o["birthdate_col"] or None
        job.matcher.use_birthdate = bool(o["birthdate_col"])
    if "geo_cols" in o:
        job.schema.geo_fields = list(o["geo_cols"])
        job.matcher.geo_fields = list(o["geo_cols"])
    if "match_threshold" in o:
        job.matcher.match_threshold = o["match_threshold"]
    if "non_match_threshold" in o:
        job.matcher.non_match_threshold = o["non_match_threshold"]
    if "base_similarity" in o:
        job.matcher.base_similarity = o["base_similarity"]
    if "passes" in o:
        job.blocking.passes = list(o["passes"])
    if "cap" in o:
        job.blocking.hot_block_cap = o["cap"]
    if "ranges" in o:
        job.num_ranges = o["ranges"]
    return job
