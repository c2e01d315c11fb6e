"""Loader for the benchmark/test tables at ``$SPARK_GRAFT_SF_DIR``-style
directories (``TESTDATA.md``): TPC-H-ish star schema + events/documents/
embeddings, one parquet per table.

The ``events`` table is written with nanosecond timestamps, which
Spark's vectorized parquet reader rejects (``PARQUET_TYPE_ILLEGAL``).
We read it with ``spark.sql.legacy.parquet.nanosAsLong`` and convert
long-nanos → microsecond timestamps JVM-side — no data pass through the
driver.  All other tables load directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["TABLES", "load_table", "load_all"]

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    prev = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prev)
    if dict(df.dtypes).get("ts") == "bigint":
        # Integer div, not /1000.0: ns epochs (~1.7e18) exceed double's 53-bit
        # mantissa, so float division silently corrupts the microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
