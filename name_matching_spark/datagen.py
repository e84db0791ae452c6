"""Deterministic synthetic data for tests and benchmarks.

Two generators, both seeded (no wall-clock, no external data):

- :func:`person_records` — reference-shaped record table
  (FIXTURES.md §2; ``/root/reference/src/db/models.py:29-64``) with injected
  duplicate variants mirroring the perturbation classes of the reference's
  labeled corpus (``data/sample_benchmark_names.csv``: typos, token swaps,
  diacritics/case noise, compound-prefix variants) plus hot-surname skew
  (the 8-surnames x 125 pattern of ``blocking_implementation.py:195-211``).

- :func:`source_files` — the authoritative input shape per
  ``BASELINE.json.input_hint``: (repo, path, commit, lang, content) rows of
  a source-repository table, with duplicate repos under perturbed owner
  names and a ``content_sha256`` column for the per-row invariance check.

Ground truth: every row carries ``entity_id``; pairs with equal entity_id
are true matches.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

FIRST_NAMES = [
    "Juan", "Maria", "Jose", "Ana", "Carlos", "Rosa", "Antonio", "Carmen",
    "Pedro", "Luisa", "Miguel", "Elena", "Ramon", "Teresa", "Andres",
    "Josefina", "Emilio", "Victoria", "Roberto", "Patricia",
]
MIDDLE_NAMES = ["", "Reyes", "Cruz", "Bautista", "Garcia", "Navarro", "", ""]
# hot surnames first: repeated heavily to create skewed blocks
HOT_SURNAMES = ["Santos", "Cruz", "Garcia", "Reyes"]
SURNAMES = HOT_SURNAMES + [
    "Lopez", "Ramos", "Mendoza", "Torres", "Dela Cruz", "De los Santos",
    "San Jose", "Villanueva", "Aquino", "Ocampo", "Salazar", "Del Rosario",
]
PROVINCES = ["Manila", "Cebu", "Davao", "Iloilo", "Pampanga"]
CITIES = ["Quezon City", "Cebu City", "Davao City", "Iloilo City", "Angeles"]
LANGS = ["py", "js", "go", "rs", "java"]

_DIACRITIC_MAP = str.maketrans({"a": "á", "e": "é", "i": "í", "o": "ó", "n": "ñ"})


def _typo(rng: np.random.Generator, s: str) -> str:
    if len(s) < 3:
        return s
    i = int(rng.integers(1, len(s) - 1))
    kind = int(rng.integers(0, 3))
    if kind == 0:  # adjacent swap (transposition)
        return s[:i] + s[i + 1] + s[i] + s[i + 2:]
    if kind == 1:  # deletion
        return s[:i] + s[i + 1:]
    return s[:i] + "x" + s[i + 1:]  # substitution


def _perturb_pair(rng: np.random.Generator, first: str, mnl: str, birth: str):
    """One duplicate variant of (first, middle+last, birthdate)."""
    kind = int(rng.integers(0, 6))
    if kind == 0:  # typo in first name ("Jones/Jonse")
        return _typo(rng, first), mnl, birth
    if kind == 1:  # typo in surname
        return first, _typo(rng, mnl), birth
    if kind == 2:  # case noise
        return first.upper(), mnl.lower(), birth
    if kind == 3:  # diacritics ("da Vinci / Davinci" class)
        return first.translate(_DIACRITIC_MAP), mnl, birth
    if kind == 4:  # compound-prefix spacing variant
        out = mnl.replace("Dela ", "De la ").replace("De los ", "Delos ")
        return first, out, birth
    # date-format variant (5 accepted formats, csv_handler.py:111-117)
    y, m, d = birth.split("-")
    return first, mnl, f"{m}/{d}/{y}"


def person_records(
    n_entities: int = 100, dup_rate: float = 0.4, seed: int = 42, skew: bool = True
) -> pd.DataFrame:
    """Deterministic person table with ~``n_entities*(1+dup_rate)`` rows."""
    rng = np.random.default_rng(seed)
    rows = []
    rid = 0
    for e in range(n_entities):
        first = FIRST_NAMES[int(rng.integers(0, len(FIRST_NAMES)))]
        middle = MIDDLE_NAMES[int(rng.integers(0, len(MIDDLE_NAMES)))]
        if skew and e % 2 == 0:
            last = HOT_SURNAMES[int(rng.integers(0, len(HOT_SURNAMES)))]
        else:
            last = SURNAMES[int(rng.integers(0, len(SURNAMES)))]
        mnl = f"{middle} {last}".strip()
        birth = f"{1950 + int(rng.integers(0, 60))}-{1 + int(rng.integers(0, 12)):02d}-{1 + int(rng.integers(0, 28)):02d}"
        geo = int(rng.integers(0, len(PROVINCES)))
        base = {
            "first_name": first,
            "middle_name_last_name": mnl,
            "birthdate": birth,
            "province_name": PROVINCES[geo],
            "city_name": CITIES[geo],
        }
        rows.append({"record_id": f"r{rid:06d}", "entity_id": e, **base})
        rid += 1
        n_dups = int(rng.random() < dup_rate) + int(rng.random() < dup_rate / 4)
        for _ in range(n_dups):
            pf, pm, pb = _perturb_pair(rng, first, mnl, birth)
            rows.append(
                {
                    "record_id": f"r{rid:06d}",
                    "entity_id": e,
                    **{**base, "first_name": pf, "middle_name_last_name": pm, "birthdate": pb},
                }
            )
            rid += 1
    return pd.DataFrame(rows)


def source_files(
    n_repos: int = 50,
    files_per_repo: int = 4,
    dup_rate: float = 0.3,
    seed: int = 42,
) -> pd.DataFrame:
    """Deterministic source-repository table per ``BASELINE.json.input_hint``:
    (repo, path, commit, lang, content) + entity_id ground truth +
    ``content_sha256`` (per-row invariant)."""
    rng = np.random.default_rng(seed)
    words = [
        "parse", "index", "merge", "scan", "hash", "join", "sort", "util",
        "core", "codec", "net", "io",
    ]
    rows = []
    for e in range(n_repos):
        # realistic username diversity (entity-suffixed) — keeps the
        # similarity kernels honest: batch-level pair memoization cannot
        # collapse owner comparisons to a tiny distinct set
        owner = FIRST_NAMES[int(rng.integers(0, len(FIRST_NAMES)))].lower() + str(e % 9973)
        name = SURNAMES[int(rng.integers(0, len(SURNAMES)))].lower().replace(" ", "-")
        lang = LANGS[int(rng.integers(0, len(LANGS)))]
        variants = [owner]
        if rng.random() < dup_rate:
            variants.append(_typo(rng, owner))
        for v_i, owner_v in enumerate(variants):
            repo = f"{owner_v}/{name}"
            for f in range(files_per_repo):
                stem = words[int(rng.integers(0, len(words)))]
                path = f"src/{stem}_{f}.{lang}"
                content = f"// {repo}:{path}\n" + " ".join(
                    words[int(rng.integers(0, len(words)))] for _ in range(20)
                )
                commit = hashlib.sha1(f"{repo}:{path}:{seed}".encode()).hexdigest()[:12]
                rows.append(
                    {
                        "repo": repo,
                        "path": path,
                        "commit": commit,
                        "lang": lang,
                        "content": content,
                        "entity_id": e,
                        "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
                    }
                )
    return pd.DataFrame(rows)


def labeled_pairs(records: pd.DataFrame, max_non_match_per_entity: int = 2, seed: int = 7) -> pd.DataFrame:
    """Ground-truth labeled pairs (FIXTURES.md §3): all within-entity pairs
    labeled "match", plus seeded cross-entity pairs labeled "non-match"."""
    rng = np.random.default_rng(seed)
    by_entity = records.groupby("entity_id")["record_id"].apply(list)
    rows = []
    for _, ids in by_entity.items():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows.append({"id1": ids[i], "id2": ids[j], "true_label": "match"})
    entities = list(by_entity.index)
    all_ids = records.set_index("record_id")["entity_id"]
    rec_ids = sorted(records["record_id"])
    for _ in range(len(entities) * max_non_match_per_entity):
        a, b = rng.choice(len(rec_ids), size=2, replace=False)
        ra, rb = rec_ids[int(a)], rec_ids[int(b)]
        if all_ids[ra] != all_ids[rb]:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            rows.append({"id1": lo, "id2": hi, "true_label": "non-match"})
    out = pd.DataFrame(rows).drop_duplicates(["id1", "id2"]).reset_index(drop=True)
    return out
