"""Time-series verbs (ref ``janitor/timeseries.py``, 399 LoC).

``fill_missing_timestamps`` lives in ``operators/complete.py``.
All window verbs take an optional ``by`` so the lag windows stay
partition-parallel; without ``by`` they are a global ordered window
(single-task final stage, documented — intrinsic to total-order lag).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pyjanitor_spark.errors import JanitorError
from pyjanitor_spark.utils.select import resolve_columns

__all__ = ["sort_timestamps_monotonically", "flag_jumps"]


def sort_timestamps_monotonically(
    df: DataFrame, column_name: str = "ts", direction: str = "increasing", strict: bool = False
) -> DataFrame:
    """Sort by timestamp; ``strict`` drops duplicate timestamps first
    (ref ``timeseries.py:107-164``)."""
    out = df
    if strict:
        w = Window.partitionBy(F.col(column_name)).orderBy(F.col(column_name))
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    order = F.col(column_name).asc() if direction == "increasing" else F.col(column_name).desc()
    return out.orderBy(order)


def flag_jumps(
    df: DataFrame,
    ts_column: str = "ts",
    columns: Any | None = None,
    scale: str | dict = "percentage",
    direction: str | dict = "any",
    threshold: float | dict = 0.0,
    by: Any | None = None,
    suffix: str = "_jump_flag",
    strict: bool = False,
) -> DataFrame:
    """Flag rows where the delta vs the previous row exceeds a threshold
    (ref ``flag_jumps`` engine ``timeseries.py:167-399``).

    ``scale`` ∈ absolute|percentage (diff vs pct_change), ``direction``
    ∈ increasing|decreasing|any, ``threshold`` >= 0 — each either one
    value for every column or a per-column dict (missing keys take the
    reference defaults percentage/any/0.0, ``timeseries.py:382-392``).
    ``strict=True`` requires at least one dict and flags ONLY the
    columns named in a dict (``timeseries.py:355-373``); otherwise the
    targets are ``columns`` (or every numeric non-ts column — the
    reference flags every frame column, but a pandas ``diff`` on a
    non-numeric column raises there, so numeric-only is the same
    effective surface stated up front).  Pure ``lag`` windows ordered by
    the timestamp; ``by`` partitions the window (the scale path)."""
    if strict:
        if not any(isinstance(a, dict) for a in (scale, direction, threshold)):
            raise JanitorError(
                "When enacting 'strict=True', 'scale', 'direction', or "
                "'threshold' must be a dictionary."
            )
        keys: set = set()
        for a in (scale, direction, threshold):
            if isinstance(a, dict):
                keys |= set(a)
        targets = sorted(keys)
        missing = [c for c in targets if c not in df.columns]
        if missing:
            raise KeyError(f"flag_jumps: columns not present: {missing}")
    elif columns is not None:
        targets = resolve_columns(df, columns)
    else:
        numeric = {
            "tinyint", "smallint", "int", "bigint", "float", "double", "decimal",
        }
        targets = [
            c
            for c, t in df.dtypes
            if t.split("(")[0] in numeric and c != ts_column
        ]
    # scalar-form args validate eagerly (reference check() order) even
    # when no column ends up flagged; dict entries validate per column
    if not isinstance(scale, dict) and scale not in ("absolute", "percentage"):
        raise JanitorError(f"bad scale {scale!r}")
    if not isinstance(direction, dict) and direction not in (
        "increasing", "decreasing", "any",
    ):
        raise JanitorError(f"bad direction {direction!r}")
    if not isinstance(threshold, dict) and threshold < 0:
        raise JanitorError("threshold must be >= 0 (deltas compare on magnitude)")
    part = resolve_columns(df, by) if by is not None else []
    w = Window.partitionBy(*part).orderBy(F.col(ts_column))
    updates = {}
    for c in targets:
        s = scale.get(c, "percentage") if isinstance(scale, dict) else scale
        d = direction.get(c, "any") if isinstance(direction, dict) else direction
        t = threshold.get(c, 0.0) if isinstance(threshold, dict) else threshold
        if s not in ("absolute", "percentage"):
            raise JanitorError(f"bad scale {s!r}")
        if d not in ("increasing", "decreasing", "any"):
            raise JanitorError(f"bad direction {d!r}")
        if t < 0:
            raise JanitorError(
                "threshold must be >= 0 (deltas compare on magnitude)"
            )
        prev = F.lag(F.col(c)).over(w)
        delta = (F.col(c) - prev) if s == "absolute" else (F.col(c) - prev) / prev
        if d == "increasing":
            jump = delta > t
        elif d == "decreasing":
            jump = -delta > t
        else:
            jump = F.abs(delta) > t
        # null current values (and null deltas generally) flag 0 like the
        # reference, where a NaN diff compares False against the threshold
        updates[f"{c}{suffix}"] = F.coalesce(jump.cast("int"), F.lit(0))
    return df.withColumns(updates)
