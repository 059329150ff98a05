"""Deterministic, hash-based sampling for reproducible training-data
pipelines.

``df.sample()`` is seed-dependent on partitioning (a repartition changes
which rows you get), which makes pipeline re-runs non-reproducible at
cluster scale.  These verbs key the keep/drop decision on a hash of the
ROW's identity instead: the same row always makes the same decision, on
any cluster layout, in any engine (md5 is engine-portable, so the DuckDB
oracle recomputes the identical sample).

No reference analog (pyjanitor's ``shuffle``/``jitter`` are RNG-based);
this is the 100 TB-pipeline replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["deterministic_sample", "stratified_sample", "split_train_holdout"]

_MOD = 1_000_000


def _hash_bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) from md5 of the salted key — first 8
    hex chars = 32 uniform bits, mod 1e6."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _MOD


def deterministic_sample(
    df: DataFrame,
    column_name: str,
    fraction: float,
    salt: str = "",
    dest: str | None = None,
) -> DataFrame:
    """Keep each row iff ``hash(salt:key) mod 1e6 < fraction*1e6``.

    Per-row expression, no shuffle, no RNG — rerunning on a different
    partitioning/cluster yields byte-identical output.  ``dest`` keeps
    all rows and adds a boolean flag instead of filtering."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    keep = _hash_bucket(F.col(column_name), salt) < F.lit(int(fraction * _MOD))
    if dest is not None:
        return df.withColumn(dest, keep)
    return df.filter(keep)


def stratified_sample(
    df: DataFrame,
    strata_column: str,
    key_column: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible analog of
    ``df.sampleBy``) — e.g. downsample web text to 10% but keep 100% of
    books.  ``fractions`` maps stratum value -> keep fraction."""
    bad = {k: v for k, v in fractions.items() if not 0.0 <= v <= 1.0}
    if bad or not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"fractions must be in [0, 1]; bad: {bad or default_fraction}")
    bucket = _hash_bucket(F.col(key_column), salt)
    thresh = F.lit(int(default_fraction * _MOD))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_column) == F.lit(value), F.lit(int(frac * _MOD))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


def split_train_holdout(
    df: DataFrame,
    column_name: str,
    holdout_fraction: float = 0.01,
    salt: str = "split",
    dest: str = "is_holdout",
) -> DataFrame:
    """Stable train/holdout assignment: the same document lands on the
    same side across pipeline versions (critical for decontamination —
    a holdout doc must never drift into training data on a re-run)."""
    if not 0.0 < holdout_fraction < 1.0:
        raise ValueError("holdout_fraction must be in (0, 1)")
    return df.withColumn(
        dest, _hash_bucket(F.col(column_name), salt) < F.lit(int(holdout_fraction * _MOD))
    )
