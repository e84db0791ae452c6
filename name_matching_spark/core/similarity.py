"""Scalar similarity functions — the semantic oracle.

Each function reproduces, bit-for-bit, the behavior of the reference
implementation (citations are ``file:line`` into ``/root/reference``); the
code is written from the published algorithm definitions, not copied.

All similarities return floats in [0, 1].
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

__all__ = [
    "jaro_similarity",
    "jaro_winkler_similarity",
    "damerau_levenshtein_distance",
    "damerau_levenshtein_similarity",
    "monge_elkan_similarity",
    "smith_waterman_score",
    "smith_waterman_similarity",
    "soundex",
    "soundex_similarity",
    "jaccard_similarity",
    "token_sort_similarity",
]


def jaro_similarity(s1: str, s2: str) -> float:
    """Standard Jaro similarity.

    Semantics per reference ``src/matcher.py:94-142`` (and the Numba twin at
    ``:33-92``): match window ``max(l1,l2)//2 - 1`` floored at 0,
    transpositions counted over matched-character sequences and halved.
    Both empty -> 1.0, one empty -> 0.0.
    """
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0

    window = max(max(len1, len2) // 2 - 1, 0)
    matched1 = [False] * len1
    matched2 = [False] * len2

    matches = 0
    for i in range(len1):
        lo = max(0, i - window)
        hi = min(i + window + 1, len2)
        for j in range(lo, hi):
            if not matched2[j] and s1[i] == s2[j]:
                matched1[i] = True
                matched2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0

    transpositions = 0
    k = 0
    for i in range(len1):
        if matched1[i]:
            while k < len2 and not matched2[k]:
                k += 1
            if k < len2 and s1[i] != s2[k]:
                transpositions += 1
            k += 1
    transpositions //= 2

    return (
        matches / len1
        + matches / len2
        + (matches - transpositions) / matches
    ) / 3.0


def jaro_winkler_similarity(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler, reference variant (``src/matcher.py:158-187``).

    Deviations from the textbook/jellyfish definition that MUST be kept:

    - NO 0.7 boost-threshold gate: the prefix bonus applies at any jaro
      score (``matcher.py:185``).
    - prefix length capped at 4 (``matcher.py:178``).
    - both empty -> 1.0, exactly one empty -> 0.0 (``matcher.py:166-173``).
    """
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    jaro = jaro_similarity(s1, s2)
    prefix_len = 0
    for i in range(min(4, len(s1), len(s2))):
        if s1[i] == s2[i]:
            prefix_len += 1
        else:
            break
    return jaro + prefix_len * prefix_weight * (1.0 - jaro)


def damerau_levenshtein_distance(s1: str, s2: str) -> int:
    """Full (unrestricted) Damerau-Levenshtein distance.

    The reference's primary path is ``jellyfish.damerau_levenshtein_distance``
    (``src/matcher.py:245``), i.e. FULL DL with adjacent transpositions, not
    the OSA restriction — its tests pin ``dist("ca","abc") == 2``
    (``tests/test_matcher.py:61``; OSA would give 3). Textbook DP with the
    last-occurrence alphabet table.
    """
    len1, len2 = len(s1), len(s2)
    maxdist = len1 + len2
    # d is offset by +1 in both axes: d[i+1][j+1] is the distance for
    # prefixes s1[:i], s2[:j]; row/col 0 hold the maxdist sentinel.
    d = [[0] * (len2 + 2) for _ in range(len1 + 2)]
    d[0][0] = maxdist
    for i in range(len1 + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(len2 + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j

    last_row: dict[str, int] = {}
    for i in range(1, len1 + 1):
        last_col = 0
        for j in range(1, len2 + 1):
            row_of_match = last_row.get(s2[j - 1], 0)
            col_of_match = last_col
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                last_col = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution / match
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[row_of_match][col_of_match]
                + (i - row_of_match - 1)
                + 1
                + (j - col_of_match - 1),  # transposition
            )
        last_row[s1[i - 1]] = i
    return d[len1 + 1][len2 + 1]


def damerau_levenshtein_similarity(s1: str, s2: str) -> float:
    """``1 - dist/max(len)`` with the reference's empty-string rules
    (``src/matcher.py:225-267``): both empty -> 1.0, one empty -> 0.0."""
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return 1.0 - damerau_levenshtein_distance(s1, s2) / max(len(s1), len(s2))


def monge_elkan_similarity(
    tokens1: Sequence[str],
    tokens2: Sequence[str],
    sim_func: Callable[[str, str], float],
) -> float:
    """Asymmetric Monge-Elkan (``src/matcher.py:270-319``).

    mean over non-empty tokens of ``tokens1`` of (max over non-empty tokens
    of ``tokens2`` of ``sim_func``); 0.0 if either side is empty or all of
    ``tokens1`` is empty strings.
    """
    if not tokens1 or not tokens2:
        return 0.0
    total = 0.0
    count = 0
    for t1 in tokens1:
        if not t1:
            continue
        count += 1
        best = 0.0
        for t2 in tokens2:
            if not t2:
                continue
            s = sim_func(t1, t2)
            if s > best:
                best = s
        total += best
    if count == 0:
        return 0.0
    return total / count


_SOUNDEX_DELETE = "AEIOUHWY"
_SOUNDEX_TABLE = str.maketrans(
    "BFPVCGJKQSXZDTLMNR",
    "111122222222334556",
    _SOUNDEX_DELETE,
)
_ADJACENT_DUP_RE = re.compile(r"(.)\1+")
_NON_ALPHA_RE = re.compile(r"[^A-Z]")


def soundex(s: str) -> str:
    """Reference soundex variant (``src/matcher.py:322-431``).

    Deviations from standard soundex that MUST be kept (pinned by
    ``tests/test_matcher.py:118-142``):

    - vowels do NOT reset the adjacent-duplicate suppression, so codes
      separated by a vowel still collapse (Tymczak -> T520, std T522);
    - the first letter never suppresses the first digit, even when it maps
      to the same code class (Pfister -> P123, std P236);
    - empty -> "0000"; all-non-alpha with non-alpha first char -> "0000";
      non-alpha chars are stripped before coding.
    """
    if not s:
        return "0000"
    upper = s.upper()
    first_raw = upper[0]
    alpha = _NON_ALPHA_RE.sub("", upper)
    if not alpha:
        if "A" <= first_raw <= "Z":
            return (first_raw + "000")[:4]
        return "0000"
    digits = alpha[1:].translate(_SOUNDEX_TABLE)
    collapsed = _ADJACENT_DUP_RE.sub(r"\1", digits)
    return (alpha[0] + collapsed + "000")[:4]


def soundex_similarity(s1: str, s2: str) -> float:
    """1.0 iff soundex codes are equal (``src/matcher.py:434-450``)."""
    return 1.0 if soundex(s1) == soundex(s2) else 0.0


def jaccard_similarity(s1: str, s2: str) -> float:
    """Token-set Jaccard over lowercase whitespace tokens
    (``src/matcher.py:453-485``; word tokens, despite the docstring there
    claiming n-grams). Both empty -> 1.0, one empty -> 0.0."""
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    set1 = set(s1.lower().split())
    set2 = set(s2.lower().split())
    if not set1 and not set2:
        return 1.0
    union = len(set1 | set2)
    if union == 0:
        return 1.0
    return len(set1 & set2) / union


def token_sort_similarity(s1: str, s2: str) -> float:
    """Jaro-Winkler on whitespace-tokenized, lowercased, sorted-and-rejoined
    strings (``src/matcher.py:488-517``)."""
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    sorted1 = " ".join(sorted(s1.lower().split()))
    sorted2 = " ".join(sorted(s2.lower().split()))
    return jaro_winkler_similarity(sorted1, sorted2)


def smith_waterman_score(
    s1: str, s2: str, match: int = 2, mismatch: int = -1, gap: int = -1
) -> int:
    """Smith-Waterman local-alignment score with integer scoring (classic
    record-linkage comparator, e.g. Febrl's stringcmp.sw; engine extension
    beyond the reference's comparator set — cited as such in COVERAGE.md).

    Textbook DP: ``H[i][j] = max(0, H[i-1][j-1]+s(a_i,b_j), H[i-1][j]+gap,
    H[i][j-1]+gap)``; the score is the matrix maximum. Integer scores keep
    the result engine-exact."""
    best = 0
    prev = [0] * (len(s2) + 1)
    for i in range(1, len(s1) + 1):
        cur = [0] * (len(s2) + 1)
        for j in range(1, len(s2) + 1):
            s = match if s1[i - 1] == s2[j - 1] else mismatch
            cur[j] = max(0, prev[j - 1] + s, prev[j] + gap, cur[j - 1] + gap)
            if cur[j] > best:
                best = cur[j]
        prev = cur
    return best


def smith_waterman_similarity(s1: str, s2: str) -> float:
    """Normalized SW similarity: ``score / (match * min(len1, len2))`` in
    [0, 1] (1.0 iff the shorter string aligns contiguously inside the
    longer), with the reference's empty rules (both empty -> 1.0, one
    empty -> 0.0). Exact-integer score, ONE IEEE division."""
    if not s1 and not s2:
        return 1.0
    if not s1 or not s2:
        return 0.0
    return smith_waterman_score(s1, s2) / float(2 * min(len(s1), len(s2)))
