"""Sources: parquet/CSV readers (ref ``janitor/io.py``).

``read_table`` is the canonical testdata loader: it transparently
handles parquet TIMESTAMP(NANOS) columns (written by pandas/pyarrow,
rejected by Spark's vectorized reader) by reading them as raw nanos and
converting to microsecond timestamps JVM-side (``timestamp_micros(ns div
1000)`` — integer division, no double-precision loss at 1e18 ns).

``read_csvs`` mirrors ``io.py:28-93``: a glob/list of CSVs becomes ONE
DataFrame via Spark's native multi-file reader (scales to any number of
files; schema drift surfaces as a per-file schema comparison).
"""

from __future__ import annotations

import glob as _glob
import subprocess
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "read_table",
    "read_csvs",
    "read_jsonl",
    "read_commandline",
    "xlsx_table",
    "xlsx_cells",
]

_NANO_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def read_table(spark: SparkSession, path: str, nano_cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Read parquet; convert TIMESTAMP(NANOS) columns (surfaced as long
    under ``nanosAsLong``) back to timestamps."""
    spark.conf.set(_NANO_CONF, "true")
    df = spark.read.parquet(path)
    for c in nano_cols:
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def read_csvs(
    spark: SparkSession,
    files_path: str | list[str],
    separate_df: bool = False,
    **kwargs: Any,
) -> DataFrame | dict[str, DataFrame]:
    """Glob/list of CSVs -> one DataFrame (or dict per file when
    ``separate_df``); ref ``io.py:28-93``."""
    paths = (
        sorted(_glob.glob(files_path)) if isinstance(files_path, str) else list(files_path)
    )
    if not paths:
        raise ValueError(f"no files match {files_path!r}")
    opts = {"header": "true", "inferSchema": "true", **{k: str(v) for k, v in kwargs.items()}}
    if separate_df:
        return {p: spark.read.options(**opts).csv(p) for p in paths}
    first = spark.read.options(**opts).csv(paths[0])
    for p in paths[1:]:
        other = spark.read.options(**opts).csv(p)
        if [f.name for f in other.schema.fields] != [f.name for f in first.schema.fields]:
            raise ValueError(f"schema of {p!r} does not match {paths[0]!r}")
    return spark.read.options(**opts).csv(paths)


def read_jsonl(
    spark: SparkSession,
    path: str | list[str],
    schema: str | T.StructType | None = None,
    sampling_ratio: float | None = None,
    corrupt_column: str | None = "_corrupt_record",
    **kwargs: Any,
) -> DataFrame:
    """Read JSON-lines (the canonical training-data interchange format).

    Scale contract: on a big corpus pass an explicit ``schema`` (zero
    inference scans) or ``sampling_ratio`` (inference reads that fraction
    only); full inference — an extra pass over ALL data — is the default
    only for convenience at test scale.  Malformed lines land in
    ``corrupt_column`` (PERMISSIVE mode) instead of failing the job or
    being silently dropped — filter or route them explicitly;
    ``corrupt_column=None`` switches to DROPMALFORMED.  The corrupt
    column is materialized via ``text`` + ``from_json`` rather than
    Spark's internal ``_corrupt_record`` (which cannot be the only
    column a query references — UNSUPPORTED_FEATURE), so filtering and
    counting bad records works like any other column.  Beyond-reference
    (``janitor/io.py`` has no JSON reader).
    """
    opts: dict[str, str] = {k: str(v) for k, v in kwargs.items()}
    opts.setdefault("multiLine", "false")  # JSONL: one object per line
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if schema is None:
        inf_opts = dict(opts)
        if sampling_ratio is not None:
            inf_opts["samplingRatio"] = str(sampling_ratio)
        inferred = spark.read.options(**inf_opts).json(path).schema
        schema = T.StructType(
            [f for f in inferred.fields if f.name != corrupt_column]
        )
    if corrupt_column is None:
        return (
            spark.read.schema(schema)
            .options(mode="DROPMALFORMED", **opts)
            .json(path)
        )
    # parse via text + from_json with an EXPLICIT corrupt field: unlike
    # Spark's internal _corrupt_record on a raw json scan (which cannot
    # be the only referenced column — UNSUPPORTED_FEATURE), this column
    # is ordinary data, so filtering/counting bad records just works
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_column, T.StringType())]
    )
    # forward user options down BOTH halves of this path: line-level ones
    # (lineSep, encoding, ...) to the text scan, the rest (dateFormat,
    # timestampFormat, locale, ...) into from_json — otherwise reader
    # kwargs silently apply only to schema inference
    text_opts = {
        k: v for k, v in opts.items() if k in ("lineSep", "encoding", "wholetext")
    }
    json_opts = {
        k: v for k, v in opts.items() if k not in ("multiLine", *text_opts)
    }
    json_opts.update(
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_column}
    )
    lines = spark.read.options(**text_opts).text(path)
    parsed = lines.select(
        F.from_json(F.col("value"), with_corrupt, json_opts).alias("__j")
    )
    return parsed.select("__j.*")


def read_commandline(spark: SparkSession, cmd: str, **kwargs: Any) -> DataFrame:
    """Run a shell command, parse its stdout as CSV (ref ``io.py:96-152``).
    Driver-side subprocess -> small DataFrame; for large pipes prefer
    writing to a file and ``read_csvs``."""
    import io as _io

    import pandas as pd

    out = subprocess.run(cmd, shell=True, capture_output=True, text=True, check=True)
    pdf = pd.read_csv(_io.StringIO(out.stdout), **kwargs)
    return spark.createDataFrame(pdf)


def xlsx_table(
    spark: SparkSession, path: str, table: str | None = None
) -> DataFrame | dict[str, DataFrame]:
    """Extract declared Excel tables (ref ``io.py:159-342``).  Excel is
    inherently single-machine: driver-side parse (bounded by the
    workbook size) -> DataFrame.  Implemented on the stdlib
    ``zipfile``+``xml.etree`` reader (``_xlsx.py``) — xlsx is a public
    documented format (ECMA-376), so no openpyxl gate.  Formula cells
    contribute their cached computed value, matching the reference's
    ``data_only`` read."""
    from pyjanitor_spark.sources._xlsx import Workbook

    wb = Workbook(path)
    out: dict[str, DataFrame] = {}
    for tname, (sheet, ref) in wb.tables.items():
        header, *data = wb.range_values(sheet, ref)
        cols = [str(h) for h in header]
        # per-column numeric unification: Spark's inference rejects a
        # column mixing int and float rows
        for j in range(len(cols)):
            vals = [r[j] for r in data]
            if any(isinstance(v, float) for v in vals):
                for i, v in enumerate(vals):
                    if isinstance(v, int) and not isinstance(v, bool):
                        data[i][j] = float(v)
        out[tname] = spark.createDataFrame([tuple(r) for r in data], schema=cols)
    if table is not None:
        if table not in out:
            raise KeyError(f"no table named {table!r} in {path!r}")
        return out[table]
    return out


def xlsx_cells(
    spark: SparkSession,
    path: str,
    sheetnames: list[str] | None = None,
    include_blank_cells: bool = False,
) -> DataFrame:
    """One-row-per-cell melt of a spreadsheet (ref ``io.py:345-617``):
    (sheet, row, column, coordinate, data_type, value) — the dict-valued
    formatting cells of the reference map to typed columns here.
    Driver-side stdlib parse (``_xlsx.py``, no openpyxl needed); like
    the reference's openpyxl read with ``data_only=False``, formula
    cells carry the formula string as their value (data_type ``f``)."""
    from pyjanitor_spark.sources._xlsx import Workbook

    wb = Workbook(path)
    rows = []
    for sheet, cells in wb.sheets.items():
        if sheetnames is not None and sheet not in sheetnames:
            continue
        for cell in cells:
            value = cell.formula if cell.formula is not None else cell.value
            if value is None and not include_blank_cells:
                continue
            rows.append(
                (
                    sheet,
                    int(cell.row),
                    int(cell.column),
                    cell.coordinate,
                    cell.data_type,
                    None if value is None else str(value),
                )
            )
    return spark.createDataFrame(
        rows,
        "sheet string, row int, column int, coordinate string, "
        "data_type string, value string",
    )
