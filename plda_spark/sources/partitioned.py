"""Hive-partitioned sink/source: partition pruning at the directory level.

At 100 TB the cheapest byte is the one never read.  Writing a fact
table ``partitionBy`` a low-cardinality derived column (event date,
source, language) turns equality/range predicates on that column into
DIRECTORY pruning — the scan lists only matching partitions, so a
one-day query over a 3-year event log touches 1/1000th of the files
before a single row is decoded.  This is orthogonal to parquet's
row-group min/max skipping (which still applies inside each partition)
and to bucketing (which prunes shuffles, not input).

Rules of thumb encoded here: partition on columns with bounded
cardinality (dates, enums — NEVER ids: millions of tiny directories
kill the file listing), derive the partition column from the data so
readers don't have to know the layout, and keep per-partition file
counts low (the writer repartitions by the partition column so each
partition gets a handful of files, not one file per task).

``tests/test_plans.py`` pins the pruning mechanically: a date-filtered
read of a partitioned write must show the predicate under the scan's
``PartitionFilters`` with only the matching partitions scanned.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_partitioned_by_day", "read_partitioned"]


def write_partitioned_by_day(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    day_col: str = "event_date",
) -> None:
    """Write ``df`` partitioned by the calendar day of ``ts_col``.

    The repartition on the derived day column co-locates each day's
    rows before the write, so every partition directory holds a few
    well-sized files instead of one shard per upstream task — the
    small-files failure mode of naive partitioned writes.
    """
    out = df.withColumn(day_col, F.to_date(F.col(ts_col)).cast("string"))
    out.repartition(F.col(day_col)).write.mode("overwrite").partitionBy(
        day_col
    ).parquet(path)


def read_partitioned(
    spark: SparkSession,
    path: str,
    predicate: Column | None = None,
) -> DataFrame:
    """Read a partitioned dataset; pass the partition predicate HERE
    (e.g. ``F.col("event_date") == "2024-01-03"``) so it lands in the
    scan's PartitionFilters — pruning happens at file listing, before
    any I/O."""
    df = spark.read.parquet(path)
    return df.where(predicate) if predicate is not None else df
