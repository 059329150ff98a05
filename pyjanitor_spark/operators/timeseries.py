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
    scale: str = "absolute",
    direction: str = "any",
    threshold: float = 0.0,
    by: Any | None = None,
    suffix: str = "_jump_flag",
) -> DataFrame:
    """Flag rows where the delta vs the previous row exceeds a threshold
    (ref ``flag_jumps`` engine ``timeseries.py:167-399``).

    ``scale`` ∈ absolute|percentage (diff vs pct_change), ``direction``
    ∈ increasing|decreasing|any.  Pure ``lag`` windows ordered by the
    timestamp; ``by`` partitions the window (the scale path)."""
    if threshold < 0:
        raise JanitorError("threshold must be >= 0 (deltas compare on magnitude)")
    if scale not in ("absolute", "percentage"):
        raise JanitorError(f"bad scale {scale!r}")
    if direction not in ("increasing", "decreasing", "any"):
        raise JanitorError(f"bad direction {direction!r}")
    part = resolve_columns(df, by) if by is not None else []
    w = Window.partitionBy(*part).orderBy(F.col(ts_column))
    numeric = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}
    targets = (
        resolve_columns(df, columns)
        if columns is not None
        else [c for c, t in df.dtypes if t.split("(")[0] in numeric and c != ts_column]
    )
    updates = {}
    for c in targets:
        prev = F.lag(F.col(c)).over(w)
        if scale == "absolute":
            delta = F.col(c) - prev
        else:
            delta = (F.col(c) - prev) / prev
        if direction == "increasing":
            jump = delta > threshold
        elif direction == "decreasing":
            jump = -delta > threshold
        else:
            jump = F.abs(delta) > threshold
        # null current values (and null deltas generally) flag 0 like the
        # reference, where a NaN diff compares False against the threshold
        updates[f"{c}{suffix}"] = F.coalesce(jump.cast("int"), F.lit(0))
    return df.withColumns(updates)
