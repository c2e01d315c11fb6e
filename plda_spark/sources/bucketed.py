"""Bucketed-table sink/source: co-located joins without a shuffle.

At 100 TB the dominant cost of a repeated fact⋈fact join is the
exchange of both sides on the join key.  Hive-style bucketing
(`DataFrameWriter.bucketBy`) pre-hashes each table into a fixed number
of buckets AT WRITE TIME; when two tables are bucketed on the same key
with compatible bucket counts, Catalyst plans the join with NO Exchange
on either side — the shuffle was paid once, at ingest, and every
downstream join rides it for free.  (The reference has no analogue: its
corpus is re-partitioned at load, mpi_lda.cc:139-151; bucketing is the
Spark-native way to make that partitioning durable.)

``tests/test_plans.py`` pins the no-Exchange property mechanically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table.  Sorting within buckets additionally removes the Sort from
    downstream sort-merge joins on the same key."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the bucket spec rides the catalog
    entry, so joins on the bucket column skip the exchange."""
    return spark.table(table)
