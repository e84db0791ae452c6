"""Component comparison, ensemble scoring, classification — semantic oracle.

Reproduces ``src/matcher.py:520-572``, ``src/scorer.py``, and the
``match_names`` composition at ``src/name_matcher.py:129-247``.
"""

from __future__ import annotations

from collections.abc import Callable

from name_matching_spark.core.parsing import (
    parse_name,
    standardize_name,
    standardize_name_components,
    tokenize_name,
)
from name_matching_spark.core.similarity import (
    damerau_levenshtein_similarity,
    jaro_winkler_similarity,
    monge_elkan_similarity,
    token_sort_similarity,
)

__all__ = [
    "DEFAULT_NAME_WEIGHTS",
    "DEFAULT_ADDITIONAL_WEIGHTS",
    "DEFAULT_MATCH_THRESHOLD",
    "DEFAULT_NON_MATCH_THRESHOLD",
    "GEO_FIELDS",
    "compare_name_components",
    "score_name_match",
    "classify_match",
    "score_with_additional_fields",
    "match_records",
]

# NameMatcher defaults (``src/name_matcher.py:69-70,98-107``); the
# scorer-local 0.85/0.65 defaults (``src/scorer.py:59-61``) are overridden
# everywhere and are NOT used.
DEFAULT_MATCH_THRESHOLD = 0.75
DEFAULT_NON_MATCH_THRESHOLD = 0.55
DEFAULT_NAME_WEIGHTS = {
    "first_name": 0.4,
    "middle_name": 0.2,
    "last_name": 0.3,
    "full_name_sorted": 0.1,
}
DEFAULT_ADDITIONAL_WEIGHTS = {"birthdate": 0.3, "geography": 0.3}
GEO_FIELDS = ["province_name", "city_name", "barangay_name"]


def compare_name_components(
    c1: dict[str, str],
    c2: dict[str, str],
    similarity_function: Callable[[str, str], float] = jaro_winkler_similarity,
) -> dict[str, float]:
    """Per-component similarity + token-sorted full-name similarity
    (``src/matcher.py:520-572``).

    first/middle/last are always scored (missing/None -> ""); the
    ``full_name_sorted`` component is token-sort JW over the space-join of
    the NON-EMPTY components, regardless of ``similarity_function``.
    """
    scores: dict[str, float] = {}
    for key in ("first_name", "middle_name", "last_name"):
        v1 = c1.get(key, "")
        v2 = c2.get(key, "")
        scores[key] = similarity_function(v1 or "", v2 or "")
    full1 = " ".join(
        filter(None, [c1.get("first_name", ""), c1.get("middle_name", ""), c1.get("last_name", "")])
    )
    full2 = " ".join(
        filter(None, [c2.get("first_name", ""), c2.get("middle_name", ""), c2.get("last_name", "")])
    )
    scores["full_name_sorted"] = token_sort_similarity(full1, full2)
    return scores


def score_name_match(
    component_scores: dict[str, float],
    weights: dict[str, float] | None = None,
) -> float:
    """Weighted mean over the weighted components, renormalized by the sum of
    weights whose component is present (``src/scorer.py:19-54``). Components
    named in ``weights`` but missing from ``component_scores`` are treated
    as 0.0 (and still count in the denominator)."""
    if not weights:
        weights = DEFAULT_NAME_WEIGHTS
    weighted_sum = 0.0
    total_weight = 0.0
    for component, weight in weights.items():
        weighted_sum += component_scores.get(component, 0.0) * weight
        total_weight += weight
    return weighted_sum / total_weight if total_weight > 0 else 0.0


def classify_match(
    score: float,
    match_threshold: float = DEFAULT_MATCH_THRESHOLD,
    non_match_threshold: float = DEFAULT_NON_MATCH_THRESHOLD,
) -> str:
    """``score >= t_match -> match``; ``score < t_non_match -> non_match``
    (STRICT less-than, ``src/scorer.py:73-78``); else ``manual_review``."""
    if score >= match_threshold:
        return "match"
    if score < non_match_threshold:
        return "non_match"
    return "manual_review"


def score_with_additional_fields(
    name_score: float,
    additional_scores: dict[str, float] | None,
    additional_weights: dict[str, float] | None = None,
) -> float:
    """Blend name score with additional-field scores
    (``src/scorer.py:81-117``, ``src/name_matcher.py:223-234``).

    IMPORTANT reference semantic: ``name_weight = 1 - sum(ALL additional
    weights)`` — weights of additional fields that happen to be absent from
    ``additional_scores`` are NOT redistributed; their mass simply drops.
    With no additional scores at all, the name score passes through.
    """
    if not additional_scores:
        return name_score
    if additional_weights is None:
        additional_weights = DEFAULT_ADDITIONAL_WEIGHTS
    name_weight = 1.0 - sum(additional_weights.values())
    total = name_score * name_weight
    for field, score in additional_scores.items():
        if field in additional_weights:
            total += score * additional_weights[field]
    return total


def match_records(
    first1: str,
    middle_last1: str,
    first2: str,
    middle_last2: str,
    birthdate1: str | None = None,
    birthdate2: str | None = None,
    compare_birthdate: bool | None = None,
    geo1: dict[str, str] | None = None,
    geo2: dict[str, str] | None = None,
    base_similarity: Callable[[str, str], float] = jaro_winkler_similarity,
    name_weights: dict[str, float] | None = None,
    additional_weights: dict[str, float] | None = None,
    match_threshold: float = DEFAULT_MATCH_THRESHOLD,
    non_match_threshold: float = DEFAULT_NON_MATCH_THRESHOLD,
) -> tuple[float, str, dict[str, float]]:
    """Full pairwise oracle: the ``match_names`` composition
    (``src/name_matcher.py:129-247``) over (first, middle+last) inputs.

    parse -> standardize components -> component scores -> Monge-Elkan
    (DL and JW secondaries over tokens of the standardized full names) ->
    weighted name score -> birthdate (exact string equality,
    ``name_matcher.py:207-209``) and geography (mean of JW over standardized
    geo fields present on BOTH sides, ``name_matcher.py:211-221``) ->
    overall blend -> classification.

    Birthdate presence has two valid conventions:

    - ``compare_birthdate=None`` (default): the reference's value-level rule
      (``name_matcher.py:206-209``) — the field participates only when both
      values are non-None.
    - ``compare_birthdate=True``: the pipeline's config-level rule — the
      field always participates, with NULL==NULL scoring 1.0 (the
      ``eqNullSafe`` semantics of ``operators/score_pairs``). Use this when
      oracling ``dedup_table``/``link_tables`` output.
    """
    c1 = standardize_name_components(parse_name(first1, middle_last1))
    c2 = standardize_name_components(parse_name(first2, middle_last2))

    component_scores = compare_name_components(c1, c2, base_similarity)

    full1 = " ".join(filter(None, [c1["first_name"], c1["middle_name"], c1["last_name"]]))
    full2 = " ".join(filter(None, [c2["first_name"], c2["middle_name"], c2["last_name"]]))
    tokens1 = tokenize_name(full1)
    tokens2 = tokenize_name(full2)
    if tokens1 and tokens2:
        component_scores["monge_elkan_dl"] = monge_elkan_similarity(
            tokens1, tokens2, damerau_levenshtein_similarity
        )
        component_scores["monge_elkan_jw"] = monge_elkan_similarity(
            tokens1, tokens2, jaro_winkler_similarity
        )
    else:
        component_scores["monge_elkan_dl"] = 0.0
        component_scores["monge_elkan_jw"] = 0.0

    name_score = score_name_match(component_scores, name_weights)

    additional_scores: dict[str, float] = {}
    if compare_birthdate:
        additional_scores["birthdate"] = 1.0 if birthdate1 == birthdate2 else 0.0
    elif compare_birthdate is None and birthdate1 is not None and birthdate2 is not None:
        additional_scores["birthdate"] = 1.0 if birthdate1 == birthdate2 else 0.0
    if geo1 is not None and geo2 is not None:
        geo_scores = [
            jaro_winkler_similarity(standardize_name(geo1[f]), standardize_name(geo2[f]))
            for f in GEO_FIELDS
            if f in geo1 and f in geo2
        ]
        if geo_scores:
            additional_scores["geography"] = sum(geo_scores) / len(geo_scores)

    overall = score_with_additional_fields(name_score, additional_scores, additional_weights)
    classification = classify_match(overall, match_threshold, non_match_threshold)

    component_scores.update(additional_scores)
    component_scores["name_score"] = name_score
    return overall, classification, component_scores
