"""Single-pair convenience CLI: score two names with a per-component
breakdown — the reference's ``match-names`` verb
(``/root/reference/src/cli.py:26-66,224-237``).

No Spark session: one pair runs through the pure-Python scalar oracle
(``core.scoring.match_records``), the exact semantics the Spark pipeline's
vectorized kernels are property-tested against.

Usage::

    python scripts/match_names.py "Juan Cruz Santos" "Juan Crux Santos" \
        --birthdate1 1990-01-01 --birthdate2 1990-01-01 \
        --province1 Manila --province2 Manila

Prints one JSON object: score, classification, component scores.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="score one name pair with breakdown")
    ap.add_argument("name1", help="first full name")
    ap.add_argument("name2", help="second full name")
    ap.add_argument("--birthdate1", help="YYYY-MM-DD")
    ap.add_argument("--birthdate2", help="YYYY-MM-DD")
    ap.add_argument("--province1")
    ap.add_argument("--province2")
    ap.add_argument("--city1")
    ap.add_argument("--city2")
    ap.add_argument("--match-threshold", type=float, default=0.75)
    ap.add_argument("--non-match-threshold", type=float, default=0.55)
    ap.add_argument("--base-similarity", default="jaro_winkler",
                    choices=["jaro_winkler", "damerau_levenshtein"])
    args = ap.parse_args(argv)

    from name_matching_spark.core.scoring import match_records
    from name_matching_spark.core.similarity import (
        damerau_levenshtein_similarity,
        jaro_winkler_similarity,
    )

    base = (jaro_winkler_similarity if args.base_similarity == "jaro_winkler"
            else damerau_levenshtein_similarity)

    # geography participates only for fields present on BOTH sides
    # (reference value-level rule, src/name_matcher.py:211-221)
    geo1: dict[str, str] = {}
    geo2: dict[str, str] = {}
    if args.province1 is not None and args.province2 is not None:
        geo1["province_name"] = args.province1
        geo2["province_name"] = args.province2
    if args.city1 is not None and args.city2 is not None:
        geo1["city_name"] = args.city1
        geo2["city_name"] = args.city2

    # middle_last=None routes each name through the full-string parse
    # (extract_name_components), exactly like NameMatcher.match_names(str, str)
    score, classification, components = match_records(
        args.name1, None, args.name2, None,
        birthdate1=args.birthdate1, birthdate2=args.birthdate2,
        geo1=geo1 or None, geo2=geo2 or None,
        base_similarity=base,
        match_threshold=args.match_threshold,
        non_match_threshold=args.non_match_threshold,
    )
    print(json.dumps({
        "score": round(score, 6),
        "classification": classification,
        "components": {k: round(v, 6) for k, v in components.items()},
    }, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
