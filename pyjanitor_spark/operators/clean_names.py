"""clean_names — normalize column names, or string values inside columns.

Reference semantics: ``janitor/functions/clean_names.py:19-169`` (case
change, space/sep normalization, accent strip, special-char removal,
underscore collapse/strip, truncation).  The reference's own Spark backend
does exactly the name-side transform via ``selectExpr`` renames
(``janitor/spark/functions.py:28-88``); we use ``withColumnsRenamed`` so
Catalyst sees a pure projection (zero-cost, no shuffle).

Value-side cleaning (``axis=None``) compiles the same pipeline to Column
expressions: ``lower/upper`` + ``regexp_replace`` chains — JVM-side,
whole-stage-codegen, no Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyjanitor_spark.utils.select import resolve_columns
from pyjanitor_spark.utils.strings import clean_name

__all__ = ["clean_names", "clean_names_expr"]


def clean_names(
    df: DataFrame,
    *,
    axis: str | None = "columns",
    column_names: str | list[str] | None = None,
    strip_underscores: str | bool | None = None,
    case_type: str = "lower",
    remove_special: bool = False,
    strip_accents: bool = True,
    preserve_original_labels: bool = True,
    enforce_string: bool = True,
    truncate_limit: int | None = None,
) -> DataFrame:
    """Clean column names (``axis='columns'``) or string values inside
    ``column_names`` (``axis=None``), mirroring the reference API.

    ``preserve_original_labels`` stores the old labels in pandas frame
    attrs (``clean_names.py:27``) — metadata Spark frames don't carry;
    accepted for API parity, results are identical either way."""
    kw = dict(
        strip_underscores=strip_underscores,
        case_type=case_type,
        remove_special=remove_special,
        strip_accents=strip_accents,
        enforce_string=enforce_string,
        truncate_limit=truncate_limit,
    )
    if axis == "columns":
        # positional rename via toDF: two raw names cleaning to the same
        # label keep their duplicate labels exactly like the reference (a
        # name->name mapping would cascade — {'A B': 'a_b', 'a_b': 'x'}
        # renames the first column twice)
        new_names = [clean_name(c, **kw) for c in df.columns]
        return df.toDF(*new_names) if new_names != df.columns else df
    if axis is None:
        targets = resolve_columns(df, column_names) if column_names else df.columns
        updates = {
            c: clean_names_expr(
                F.col(c),
                strip_underscores=strip_underscores,
                case_type=case_type,
                remove_special=remove_special,
                strip_accents=strip_accents,
                truncate_limit=truncate_limit,
            )
            for c in targets
        }
        return df.withColumns(updates)
    raise ValueError("axis must be 'columns' or None")


def clean_names_expr(
    col: Column,
    *,
    strip_underscores: str | bool | None = None,
    case_type: str = "lower",
    remove_special: bool = False,
    strip_accents: bool = True,
    truncate_limit: int | None = None,
) -> Column:
    """The clean-names pipeline as a pure Column expression (JVM-side)."""
    c = col.cast("string")
    if case_type == "lower":
        c = F.lower(c)
    elif case_type == "upper":
        c = F.upper(c)
    elif case_type == "snake":
        c = F.regexp_replace(c, r"(.)([A-Z][a-z]+)", r"$1_$2")
        c = F.regexp_replace(c, r"([a-z0-9])([A-Z])", r"$1_$2")
        c = F.lower(c)
    elif case_type != "preserve":
        raise ValueError(f"bad case_type {case_type!r}")
    # the reference's exact _normalize_1 FIXES (clean_names.py:231):
    # space / : , ? ( ) . - and NBSP become underscores, apostrophes are
    # REMOVED (tabs/newlines pass through untouched — pandas only cleans
    # the listed set)
    c = F.regexp_replace(c, "[ /:,?()\\.\\- ]", "_")
    c = F.regexp_replace(c, "['’]", "")
    # reference order (clean_names.py:188-193): remove_special BEFORE
    # strip_accents — an accented char is removed, not transliterated;
    # the reference also str.strip()s after the removal
    if remove_special:
        # reference pattern [^A-Za-z_\d]: python3 \d is unicode Nd, so
        # unicode digits survive — \p{Nd} in the Java regex
        c = F.trim(F.regexp_replace(c, r"[^A-Za-z_\p{Nd}]+", ""))
    if strip_accents:
        # NFD-decompose + drop combining marks, JVM-side (Spark >= 3.0 has
        # no builtin normalizer; cover the Latin-1/Latin-Ext range via
        # translate, which handles the overwhelmingly common cases)
        src = "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝ"
        dst = "aaaaaaceeeeiiiinooooouuuuyyAAAAAACEEEEIIIINOOOOOUUUUY"
        c = F.translate(c, src, dst)
    c = F.regexp_replace(c, r"_+", "_")
    if strip_underscores in ("both", True):
        c = F.regexp_replace(c, r"^_+|_+$", "")
    elif strip_underscores in ("left", "l"):
        c = F.regexp_replace(c, r"^_+", "")
    elif strip_underscores in ("right", "r"):
        c = F.regexp_replace(c, r"_+$", "")
    if truncate_limit:
        c = F.substring(c, 1, truncate_limit)
    return c
