"""Column-selection resolver: the ``select`` mini-language over a flat
list of column names.

Re-expresses the semantics of the reference's label-resolution engine
(``janitor/functions/select.py:555-833`` — string, glob via ``fnmatch``,
regex, slice, callable, iterable, and ``DropLabel`` inversion) as a pure
function over ``df.columns``.  Spark has no row index / MultiIndex, so the
resolver operates only on the flat column-name list; row selection is done
with ordinary ``filter`` predicates.

This is pure Python — no Spark involvement — so Catalyst sees only the
final explicit column list (full column pruning preserved).
"""

from __future__ import annotations

import fnmatch
import re
from collections.abc import Callable, Iterable
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame

__all__ = ["DropLabel", "patterns", "resolve_columns", "get_index_labels"]


def patterns(regex_pattern: str | re.Pattern) -> re.Pattern:
    """Compile a string into a regex Pattern usable as a column selector
    (ref ``functions/utils.py:140-164``).  Deprecated there and here —
    pass ``re.compile(...)`` directly; kept for drop-in API parity."""
    import warnings

    warnings.warn(
        "This function is deprecated. Kindly use `re.compile` instead.",
        DeprecationWarning,
        stacklevel=2,
    )
    if not isinstance(regex_pattern, (str, re.Pattern)):
        raise TypeError(
            "regular expression should be one of str, Pattern; "
            f"instead got type {type(regex_pattern).__name__}"
        )
    return re.compile(regex_pattern)


@dataclass(frozen=True)
class DropLabel:
    """Negated selector: keep everything EXCEPT what ``label`` resolves to.

    Mirrors the reference's ``DropLabel`` wrapper
    (``janitor/functions/select.py:538-552``).
    """

    label: Any


def _resolve_one(arg: Any, columns: list[str], dedupe: bool = True) -> list[str]:
    """Resolve a single selector against ``columns`` (ordered, may dup)."""
    # exact name match wins over glob interpretation
    if isinstance(arg, str):
        if arg in columns:
            return [c for c in columns if c == arg]
        # glob (fnmatch) — the reference treats any string with glob
        # metacharacters as a shell pattern (select.py:585-601)
        if any(ch in arg for ch in "*?["):
            hits = [c for c in columns if fnmatch.fnmatchcase(c, arg)]
            if hits:
                return hits
        raise KeyError(f"No match for column selector {arg!r}")
    if isinstance(arg, re.Pattern):
        hits = [c for c in columns if arg.search(c)]
        if not hits:
            raise KeyError(f"No column matches regex {arg.pattern!r}")
        return hits
    if isinstance(arg, slice):
        # label- or position-based slice over the ordered column list
        start, stop, step = arg.start, arg.stop, arg.step
        if isinstance(start, str) or isinstance(stop, str):
            i0 = columns.index(start) if isinstance(start, str) else 0
            i1 = (columns.index(stop) + 1) if isinstance(stop, str) else len(columns)
            return columns[i0:i1:step]
        return columns[arg]
    if isinstance(arg, int) and not isinstance(arg, bool):
        return [columns[arg]]
    if isinstance(arg, DropLabel):
        dropped = set(_resolve_many([arg.label], columns))
        return [c for c in columns if c not in dropped]
    if callable(arg):
        hits = [c for c in columns if arg(c)]
        if not hits:
            raise KeyError("Callable column selector matched nothing")
        return hits
    if isinstance(arg, Iterable):
        items = list(arg)
        # boolean mask over the column list (ref select.py:612-637):
        # must cover every column exactly
        if items and all(type(x).__name__ in ("bool", "bool_") for x in items):
            if len(items) != len(columns):
                raise ValueError(
                    f"Boolean mask has {len(items)} entries for "
                    f"{len(columns)} columns"
                )
            return [c for c, keep in zip(columns, items) if keep]
        return _resolve_many(items, columns, dedupe=dedupe)
    raise TypeError(f"Unsupported column selector: {type(arg)!r}")


def _resolve_many(
    args: list[Any], columns: list[str], dedupe: bool = True
) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    for a in args:
        for c in _resolve_one(a, columns, dedupe=dedupe):
            if dedupe:
                if c not in seen:
                    seen.add(c)
                    out.append(c)
            else:
                out.append(c)
    return out


def resolve_columns(
    df: DataFrame | list[str],
    *args: Any,
    invert: bool = False,
    dedupe: bool = True,
) -> list[str]:
    """Resolve selectors to an ordered column-name list.

    Selectors may be: exact names, shell globs (``"l_*"``), compiled
    regexes, slices (label or positional), ints, boolean masks,
    callables ``(name) -> bool``, ``DropLabel``, or iterables of any of
    these.  ``dedupe=False`` preserves repeats the way the reference's
    ``select`` does (overlapping selectors yield the column again);
    internal callers keep the deduplicated form.
    """
    columns = df.columns if isinstance(df, DataFrame) else list(df)
    if not args:
        resolved = list(columns)
    else:
        resolved = _resolve_many(list(args), columns, dedupe=dedupe)
    if invert:
        dropped = set(resolved)
        return [c for c in columns if c not in dropped]
    return resolved


def get_index_labels(df: DataFrame | list[str], *args: Any) -> list[str]:
    """Alias mirroring the reference's ``get_index_labels``
    (``janitor/functions/select.py:450-474``)."""
    return resolve_columns(df, *args)
