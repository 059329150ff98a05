"""Scalar string pipeline for name cleaning.

Same behavior as the reference's scalar helpers
(``janitor/functions/utils.py:699-774``: ``_change_case``, ``_normalize_1``,
``_remove_special``, ``_strip_accents``, ``_strip_underscores_func``) —
re-implemented from the documented semantics.  Pure Python over strings;
used both for column-NAME cleaning (driver side) and as the blueprint for
the Column-expression version in ``operators/clean_names.py``.
"""

from __future__ import annotations

import re
import unicodedata

__all__ = ["clean_name", "make_unique"]

_UNDERSCORE_RUN = re.compile(r"_+")
# the reference's exact pattern [^A-Za-z_\d] (utils.py _remove_special):
# python3 \d is unicode Nd, so unicode digits SURVIVE the removal
_SPECIAL = re.compile(r"[^A-Za-z_\d]+")


def _change_case(s: str, case_type: str) -> str:
    if case_type == "preserve":
        return s
    if case_type == "upper":
        return s.upper()
    if case_type == "lower":
        return s.lower()
    if case_type == "snake":
        # camelCase / PascalCase boundaries -> underscore, then lower
        s = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", s)
        s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s)
        return s.lower()
    raise ValueError(
        f"case_type must be one of 'preserve','upper','lower','snake', got {case_type!r}"
    )


def _normalize_spaces(s: str) -> str:
    # the reference's exact _normalize_1 FIXES (clean_names.py:231):
    # space / : , ? ( ) . - and NBSP -> underscore, apostrophes REMOVED
    # (tabs/newlines pass through — pandas only cleans the listed set)
    s = re.sub("[ /:,?()\\.\\-\xa0]", "_", s)
    return re.sub("['’]", "", s)


def _strip_accents(s: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFD", s) if not unicodedata.combining(c)
    )


def clean_name(
    name: str,
    *,
    strip_underscores: str | bool | None = None,
    case_type: str = "lower",
    remove_special: bool = False,
    strip_accents: bool = True,
    enforce_string: bool = True,
    truncate_limit: int | None = None,
) -> str:
    """Clean one label. Mirrors ``_clean_names`` (``clean_names.py:172-201``)."""
    if enforce_string and not isinstance(name, str):
        name = str(name)
    s = _change_case(name, case_type)
    s = _normalize_spaces(s)
    # reference order (clean_names.py:188-193): remove_special runs
    # BEFORE strip_accents, so an accented char is REMOVED (it is not
    # [A-Za-z_\d]) rather than transliterated; a trailing .strip()
    # follows the removal
    if remove_special:
        s = _SPECIAL.sub("", s).strip()
    if strip_accents:
        s = _strip_accents(s)
    s = _UNDERSCORE_RUN.sub("_", s)
    s = _strip_underscores_func(s, strip_underscores)
    if truncate_limit:
        s = s[:truncate_limit]
    return s


def _strip_underscores_func(s: str, strip_underscores: str | bool | None) -> str:
    if strip_underscores in ("both", True):
        return s.strip("_")
    if strip_underscores == "left" or strip_underscores == "l":
        return s.lstrip("_")
    if strip_underscores == "right" or strip_underscores == "r":
        return s.rstrip("_")
    if strip_underscores in (None, False):
        return s
    raise ValueError(
        "strip_underscores must be one of None, True, 'left', 'right', 'both'"
    )


def make_unique(names: list[str]) -> list[str]:
    """De-duplicate names with _1/_2 suffixes (``limit_column_characters``
    semantics, ``limit_column_characters.py:59-90``)."""
    seen: dict[str, int] = {}
    out: list[str] = []
    for n in names:
        if n not in seen:
            seen[n] = 0
            out.append(n)
        else:
            seen[n] += 1
            out.append(f"{n}_{seen[n]}")
    return out
