"""SQL entry point: the benchmark tables as named views + plain SQL.

The engine's relational surface is Catalyst's — anything expressible in
Spark SQL runs as-is.  This module is the convenience seam that makes
that concrete: register every test/benchmark table under its canonical
name once, then ``run_sql`` arbitrary ANSI SQL against them (the same
names the DuckDB oracle uses, so a query can be pasted between engines
verbatim).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from plda_spark.sources.tables import TABLES, load_table

__all__ = ["register_tables", "run_sql"]


def register_tables(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every benchmark table as a temp view named after the
    table (``region`` … ``embeddings``).  Returns the registered names.
    Views are lazy — nothing is read until a query touches a table, and
    all pushdown/pruning applies through the view."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return list(TABLES)


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run ``query`` against the benchmark tables (registering the
    views first).  The result is a normal DataFrame — compose, write,
    or explain it like any operator output."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
