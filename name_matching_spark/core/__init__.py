"""Pure-Python oracle core: exact reference semantics, shared by tests and UDFs.

These scalar functions are the single source of truth for the similarity /
parsing semantics (SURVEY.md §2.7/§2.8). The vectorized numpy kernels in
``name_matching_spark.functions.kernels`` are property-tested against them.
"""

from name_matching_spark.core.similarity import (  # noqa: F401
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
from name_matching_spark.core.parsing import (  # noqa: F401
    extract_name_components,
    parse_name,
    remove_name_prefixes,
    remove_name_suffixes,
    standardize_name,
    standardize_name_components,
    tokenize_name,
)
from name_matching_spark.core.scoring import (  # noqa: F401
    DEFAULT_ADDITIONAL_WEIGHTS,
    DEFAULT_MATCH_THRESHOLD,
    DEFAULT_NAME_WEIGHTS,
    DEFAULT_NON_MATCH_THRESHOLD,
    classify_match,
    compare_name_components,
    match_records,
    score_name_match,
    score_with_additional_fields,
)
