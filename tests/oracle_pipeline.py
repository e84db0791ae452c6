"""Brute-force single-process oracle of the full linkage pipeline.

This is the reference's own J3 semantics (double loop,
``src/name_matcher.py:291-340``) restricted to blocked pairs — used to
verify the Spark plan cell-by-cell. Pure Python over the core oracle
functions; no Spark, no kernels.
"""

from __future__ import annotations

from datetime import datetime

from name_matching_spark.core import (
    match_records,
    parse_name,
    soundex,
    standardize_name,
)

DATE_FORMATS = ["%Y-%m-%d", "%m/%d/%Y", "%d/%m/%Y", "%B %d, %Y", "%d-%b-%Y"]


def standardize_date(s: str | None) -> str | None:
    if s is None:
        return None
    for fmt in DATE_FORMATS:
        try:
            return datetime.strptime(s, fmt).strftime("%Y-%m-%d")
        except ValueError:
            continue
    return None


def record_key_phonetic(first_raw: str, mnl_raw: str) -> str:
    """Mirror of blocking_key_column("phonetic") over a raw record."""
    comps = parse_name(first_raw, mnl_raw)
    first_std = standardize_name(comps["first_name"])
    last_std = standardize_name(comps["last_name"])
    first_char = first_std[:1].upper() if first_std else "UNKNOWN"
    return f"{first_char}|{soundex(last_std)}"


def blocked_pairs(records: list[dict], key_fn=record_key_phonetic) -> set[tuple[str, str]]:
    """All within-block unordered pairs, id-ordered."""
    blocks: dict[str, list[dict]] = {}
    for r in records:
        k = key_fn(r["first_name"], r["middle_name_last_name"])
        blocks.setdefault(k, []).append(r)
    pairs = set()
    for rows in blocks.values():
        rows = sorted(rows, key=lambda r: r["record_id"])
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                pairs.add((rows[i]["record_id"], rows[j]["record_id"]))
    return pairs


def score_pair(r1: dict, r2: dict, geo_fields=("province_name", "city_name"),
               use_birthdate=True, **cfg):
    """Oracle score for one ordered pair (r1 = smaller id side), using the
    pipeline's config-level birthdate convention (NULL==NULL -> 1.0)."""
    geo1 = {g: r1.get(g) or "" for g in geo_fields} if geo_fields else None
    geo2 = {g: r2.get(g) or "" for g in geo_fields} if geo_fields else None
    b1 = standardize_date(r1.get("birthdate")) if use_birthdate else None
    b2 = standardize_date(r2.get("birthdate")) if use_birthdate else None

    return match_records(
        r1["first_name"], r1["middle_name_last_name"],
        r2["first_name"], r2["middle_name_last_name"],
        birthdate1=b1, birthdate2=b2, compare_birthdate=use_birthdate or None,
        geo1=geo1, geo2=geo2, **cfg,
    )


def run_pipeline(records: list[dict], keep_non_match: bool = False):
    """Full oracle pipeline: blocked pairs + scores, as {(id1,id2): (score, cls, comps)}."""
    by_id = {r["record_id"]: r for r in records}
    out = {}
    for id1, id2 in blocked_pairs(records):
        score, cls, comps = score_pair(by_id[id1], by_id[id2])
        if keep_non_match or cls != "non_match":
            out[(id1, id2)] = (score, cls, comps)
    return out
