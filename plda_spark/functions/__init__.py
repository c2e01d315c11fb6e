"""Curated column-function surface of the engine.

Everything here is a pure ``Column -> Column`` (or column-factory)
expression built from ``pyspark.sql.functions`` — JVM-evaluated under
whole-stage codegen, no Python in the hot path — and each has an exact
ANSI-SQL twin used by the DuckDB correctness oracle.
"""

from plda_spark.operators.dedup import _md5_long as md5_long
from plda_spark.operators.similarity import cosine
from plda_spark.operators.text import tokens_col

__all__ = ["cosine", "md5_long", "tokens_col"]
