"""Sinks: parquet/CSV/JSON writers with scale-aware layout control.

The reference (pyjanitor) delegates writing to pandas ``to_*`` — a
single-process file append.  At 100 TB the write layout IS the read
performance of every downstream job, so these writers make the three
decisions that matter explicit:

* **Hive partitioning** (``partition_by``): one directory per value →
  partition pruning at read.  We ``repartition`` on the partition
  columns first so each value is written by as few tasks as possible —
  otherwise every one of N tasks opens a file per value and a 32-task
  × 1000-value write produces 32k tiny files.
* **File sizing** (``max_records_per_file``): bounds individual file
  size so a skewed partition value still splits into reader-parallel
  chunks.
* **In-file ordering** (``sort_by``): ``sortWithinPartitions`` before
  write tightens parquet row-group min/max stats → row-group skipping
  for range predicates on the sort key.

``write_bucketed_table`` persists a bucketed+sorted table
(``bucketBy``/``sortBy`` + ``saveAsTable``): two tables bucketed the
same way on the join key equi-join WITHOUT a shuffle on either side —
the pre-partitioning is reused across every downstream job, which is
the single biggest shuffle win available for repeated large joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_parquet",
    "write_csv",
    "write_json",
    "write_bucketed_table",
]


def _prepare(
    df: DataFrame,
    partition_by: list[str] | None,
    sort_by: list[str] | None,
) -> DataFrame:
    if partition_by:
        # one shuffle keyed on the partition columns: each hive value
        # lands in few tasks -> few, large files instead of tasks×values
        df = df.repartition(*partition_by)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    return df


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    compression: str = "snappy",
) -> None:
    """Write parquet with explicit layout control (see module doc)."""
    out = _prepare(df, partition_by, sort_by).write.mode(mode)
    out = out.option("compression", compression)
    if max_records_per_file is not None:
        out = out.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        out = out.partitionBy(*partition_by)
    out.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    header: bool = True,
    **options: str,
) -> None:
    """CSV writer (hive-partition aware)."""
    out = _prepare(df, partition_by, None).write.mode(mode).option("header", str(header).lower())
    for k, v in options.items():
        out = out.option(k, str(v))
    if partition_by:
        out = out.partitionBy(*partition_by)
    out.csv(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """JSON-lines writer (hive-partition aware)."""
    out = _prepare(df, partition_by, None).write.mode(mode)
    for k, v in options.items():
        out = out.option(k, str(v))
    if partition_by:
        out = out.partitionBy(*partition_by)
    out.json(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Joining two tables bucketed identically on the join key produces a
    SortMergeJoin with NO Exchange on either side — the shuffle is paid
    once at write time and amortized over every downstream join.  Size
    ``num_buckets`` so one bucket of the LARGEST table fits an executor
    core's memory at target scale (e.g. 100 TB / 4096 buckets ≈ 25 GB
    per bucket per table → prefer 8192+ at that scale; 32 here matches
    the local test profile).
    """
    writer = df.write.format(format).mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        # external table: data at an explicit location instead of the
        # session warehouse dir (which is a static conf)
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def read_bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    """Load a table written by :func:`write_bucketed_table` (bucket
    metadata comes from the catalog, so reads via ``spark.table``)."""
    return spark.table(name)
