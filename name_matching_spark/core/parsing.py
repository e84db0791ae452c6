"""Name standardization and parsing — semantic oracle.

Reproduces the reference's standardizer/parser semantics
(``src/standardizer.py``, ``src/parser.py``); citations are file:line into
``/root/reference``.
"""

from __future__ import annotations

import re
import unicodedata

__all__ = [
    "standardize_name",
    "standardize_name_components",
    "remove_name_prefixes",
    "remove_name_suffixes",
    "parse_name",
    "split_middle_name_last_name",
    "extract_name_components",
    "tokenize_name",
    "COMPOUND_SURNAME_PREFIXES",
]

_WS_RE = re.compile(r"\s+")
_KEEP_RE = re.compile(r"[^\w\s'-]")


def standardize_name(name: str | None) -> str:
    """Standardization chain per ``src/standardizer.py:13-44``:

    NFKC normalize -> lowercase -> collapse whitespace -> strip chars outside
    ``[\\w\\s'-]`` -> NFD + drop combining marks (accent fold).
    """
    if not name:
        return ""
    normalized = unicodedata.normalize("NFKC", name)
    lowered = normalized.lower()
    cleaned = _WS_RE.sub(" ", lowered).strip()
    kept = _KEEP_RE.sub("", cleaned)
    return "".join(
        c for c in unicodedata.normalize("NFD", kept) if not unicodedata.combining(c)
    )


def standardize_name_components(components: dict[str, str]) -> dict[str, str]:
    """Apply :func:`standardize_name` to each value (``standardizer.py:47-60``)."""
    return {k: standardize_name(v) for k, v in components.items()}


_PREFIXES = [
    "mr", "mr.", "mrs", "mrs.", "ms", "ms.", "miss", "dr", "dr.",
    "prof", "prof.", "rev", "rev.", "hon", "hon.", "atty", "atty.",
]

_SUFFIXES = [
    "jr", "jr.", "sr", "sr.", "ii", "iii", "iv", "v", "vi",
    "vii", "viii", "ix", "x", "phd", "md", "esq", "esq.",
]


def remove_name_prefixes(name: str) -> str:
    """Strip a leading honorific (``standardizer.py:63-84``). Note the
    reference keeps the trailing '.' of dotted prefixes inside the slice
    (``name[len(prefix):]`` after matching ``prefix + " "``) — we match the
    semantics of the startswith check exactly."""
    lowered = name.lower()
    for prefix in _PREFIXES:
        if lowered.startswith(prefix + " "):
            return name[len(prefix):].strip()
    return name


def remove_name_suffixes(name: str) -> str:
    """Strip a trailing generational/degree suffix (``standardizer.py:87-119``,
    minus the hardcoded test shim at ``:116-117`` which is not ported)."""
    lowered = name.lower()
    for suffix in _SUFFIXES:
        if lowered.endswith(" " + suffix):
            return name[: -(len(suffix) + 1)].strip()
        if lowered.endswith(", " + suffix):
            return name[: -(len(suffix) + 2)].strip()
    if name.endswith(","):
        return name[:-1].strip()
    return name


# Order matters: checked first-match-wins, whole-token, left-to-right
# (``src/parser.py:70``).
COMPOUND_SURNAME_PREFIXES = [
    "dela", "de la", "del", "de los", "de las", "san", "santa", "sto", "sta",
]


def split_middle_name_last_name(middle_name_last_name: str) -> list[str]:
    """Split the combined middle+last field into components, gluing compound
    surname prefixes to their following token (``src/parser.py:54-97``).

    A prefix only glues when it is a whole-token match AND a further token
    follows it (a trailing prefix stays a plain token). The scan is
    left-to-right and a glued group is not re-scanned.
    """
    name = middle_name_last_name.strip()
    if not name:
        return []
    parts = name.split()
    out: list[str] = []
    i = 0
    while i < len(parts):
        glued = False
        for prefix in COMPOUND_SURNAME_PREFIXES:
            plen = len(prefix.split())
            if i + plen <= len(parts):
                candidate = " ".join(parts[i : i + plen]).lower()
                if candidate == prefix and i + plen < len(parts):
                    out.append(" ".join(parts[i : i + plen + 1]))
                    i += plen + 1
                    glued = True
                    break
        if not glued:
            out.append(parts[i])
            i += 1
    return out


def parse_name(name_input, middle_name_last_name: str | None = None) -> dict[str, str]:
    """Parse into ``{first_name, middle_name, last_name}`` (``src/parser.py:11-51``).

    With only a string: delegate to :func:`extract_name_components`.
    With (first, middle+last): last split part -> last_name, rest -> middle.
    Missing value is always "" — never None (``parser.py:35``).
    """
    if isinstance(name_input, str) and middle_name_last_name is None:
        return extract_name_components(name_input)

    first_name = str(name_input) if name_input else ""
    result = {"first_name": first_name.strip(), "middle_name": "", "last_name": ""}
    if not middle_name_last_name:
        return result

    parts = split_middle_name_last_name(middle_name_last_name)
    if len(parts) == 1:
        result["last_name"] = parts[0]
    elif len(parts) >= 2:
        result["last_name"] = parts[-1]
        result["middle_name"] = " ".join(parts[:-1])
    return result


def extract_name_components(full_name: str) -> dict[str, str]:
    """Full-string split (``src/parser.py:100-127``): 1 token -> first;
    2 -> first+last; >=3 -> first + (middle... last) re-run through the
    compound-surname logic."""
    parts = full_name.strip().split()
    if not parts:
        return {"first_name": "", "middle_name": "", "last_name": ""}
    if len(parts) == 1:
        return {"first_name": parts[0], "middle_name": "", "last_name": ""}
    if len(parts) == 2:
        return {"first_name": parts[0], "middle_name": "", "last_name": parts[1]}
    first = parts[0]
    rest = " ".join(parts[1:])
    return parse_name(first, rest)


def tokenize_name(name: str | None) -> list[str]:
    """Whitespace tokens, empties dropped (``src/parser.py:130-145``)."""
    if not name:
        return []
    return [t.strip() for t in name.split() if t.strip()]
