"""Column pseudonymization for shareable training corpora.

Large-scale pipelines routinely need to strip direct identifiers before
data leaves the trust boundary (user ids joined from logs, emails in
metadata columns) while keeping JOINABILITY: the same identifier must
map to the same token everywhere, or downstream dedup / sessionization /
per-user aggregation breaks.  A salted one-way hash does exactly that —
it is a pure projection expression (no shuffle, no UDF, whole-stage
codegen) so it costs a scan at any scale.

Free-text PII scrubbing is the sibling verb ``pii_redact`` in
``text_analysis.py``; this module covers *structured* identifier
columns.  No reference analog (pyjanitor has no privacy verbs); part of
the training-data pipeline pack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_columns"]

_ALGOS = ("md5", "sha256", "xxhash64")


def hash_columns(
    df: DataFrame,
    column_names: str | list[str],
    salt: str = "",
    algo: str = "md5",
    truncate: int | None = None,
    suffix: str = "",
) -> DataFrame:
    """Replace each column's values with a salted one-way hash.

    * ``salt`` — prepended as ``"{salt}:"`` before hashing.  A secret
      salt defeats rainbow-table reversal of low-entropy identifiers;
      using the SAME salt across tables preserves joinability.
    * ``algo`` — ``md5`` / ``sha256`` (portable lowercase-hex output,
      reproducible in any engine) or ``xxhash64`` (fastest, bigint
      output, Spark-specific — use for ephemeral intra-pipeline keys).
    * ``truncate`` — keep only the first N hex chars (shorter keys,
      bounded collision risk: ~birthday(16^N)).  Must be within the
      digest's hex length; rejected for xxhash64 (bigint output).
    * ``suffix`` — if non-empty, write to ``<col><suffix>`` and keep the
      original column (for validation pipelines).

    NULL stays NULL (a hashed sentinel would silently create one giant
    join key).  Every hash is an elementwise expression: the plan is a
    pure projection, nothing moves.
    """
    if isinstance(column_names, str):
        column_names = [column_names]
    if algo not in _ALGOS:
        raise ValueError(f"algo must be one of {_ALGOS}, got {algo!r}")
    missing = [c for c in column_names if c not in df.columns]
    if missing:
        raise KeyError(f"columns not in DataFrame: {missing}")
    if truncate is not None:
        if algo == "xxhash64":
            raise ValueError("truncate= is not applicable to algo='xxhash64' (bigint output)")
        hex_len = 32 if algo == "md5" else 64
        if not 1 <= int(truncate) <= hex_len:
            raise ValueError(
                f"truncate must be in [1, {hex_len}] for algo={algo!r}, got {truncate}"
            )

    def hashed(c: str):
        salted = F.concat(F.lit(f"{salt}:"), F.col(c).cast("string"))
        if algo == "md5":
            h = F.md5(salted)
        elif algo == "sha256":
            h = F.sha2(salted, 256)
        else:
            # xxhash64(NULL) is a constant, not NULL — guard explicitly
            return F.when(
                F.col(c).isNotNull(), F.xxhash64(salted)
            ).otherwise(F.lit(None).cast("bigint"))
        if truncate is not None:
            h = F.substring(h, 1, int(truncate))
        return F.when(F.col(c).isNotNull(), h).otherwise(F.lit(None).cast("string"))

    return df.withColumns({f"{c}{suffix}": hashed(c) for c in column_names})
