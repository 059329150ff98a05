"""Skew handling: salting for hot keys.

The reference is single-process, so key skew never surfaces there; on a
1000-executor cluster a hot join/group key serializes one reducer.  AQE
(`spark.sql.adaptive.skewJoin`) re-splits skewed SORT-MERGE join
partitions at runtime; these helpers cover the cases AQE does not:

* a deliberately salted equi join (``skew_join``) when you know the hot
  keys up front and want the plan — not runtime repair — to spread them;
* exact distinct-count over skewed groups (``count_distinct_exact``):
  ``countDistinct`` builds per-group hash sets in one reducer per group,
  while the two-stage shape here spreads the dedup shuffle over
  (group, value) — the standard scalable rewrite.

Plain aggregations (sum/count/avg/min/max) need NO salting: Spark's
hash aggregate already combines map-side, so a hot group costs one
merged row per upstream partition, not one reducer scanning everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skew_join", "count_distinct_exact", "SALT_COL"]

SALT_COL = "__salt"


def skew_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi join with salted keys: left rows get a random salt in
    [0, salt); every right row is replicated once per salt value; the
    join key becomes (on..., salt).  A key holding p% of the left rows
    spreads over ``salt`` reducers instead of one.

    Cost: right side is materialized ``salt`` times — use for
    fact-to-medium-dim joins where the dim is too big to broadcast but
    cheap to replicate; broadcast() stays the answer for small dims."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("skew_join supports how='inner'|'left'")
    salted_left = left.withColumn(
        SALT_COL, (F.rand() * salt).cast("int")
    )
    salted_right = right.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_left.join(salted_right, on=keys + [SALT_COL], how=how)
    return out.drop(SALT_COL)


def count_distinct_exact(
    df: DataFrame, by: list[str] | str, column_name: str, dest: str = "n_distinct"
) -> DataFrame:
    """Exact distinct count per group, skew-safe.

    Stage 1 dedups on (group, value) — the shuffle key includes the
    value, so a hot group's values spread across reducers.  Stage 2
    counts per group (tiny input: one row per distinct value).  Same
    result as ``countDistinct`` with bounded per-task state."""
    keys = [by] if isinstance(by, str) else list(by)
    dedup = df.select(*keys, column_name).distinct()
    # count(col), not count(*): countDistinct excludes NULL, so must we
    return dedup.groupBy(*keys).agg(F.count(F.col(column_name)).alias(dest))
