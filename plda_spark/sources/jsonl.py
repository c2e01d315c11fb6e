"""JSONL document source/sink — the de-facto interchange format for LLM
training corpora (one JSON object per line: ``{"id": …, "text": …,
"meta": {…}}``).

Reader contract:

- Schema is DECLARED, never inferred — at 100 TB a schema-inference
  pre-pass reads the whole dataset twice; the declared schema also makes
  column pruning reach the scan.
- PERMISSIVE mode with a captured ``_corrupt_record`` column: web-scale
  crawls always contain malformed lines, and dropping them silently
  (DROPMALFORMED) makes row counts irreproducible.  ``read_jsonl``
  returns clean rows; ``read_jsonl_with_errors`` returns
  ``(clean, corrupt)`` so pipelines can quarantine bad lines to a side
  output instead of failing or losing them.

Sink contract (``write_dataset``): deterministic sharded output —
``repartition(shards, key)`` + sort-within-partitions so the SAME rows
always land in the SAME shard file in the SAME order, making output
diffable/resumable across runs; ``maxRecordsPerFile`` bounds file size
regardless of skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["DOC_SCHEMA", "read_jsonl", "read_jsonl_stream", "read_jsonl_with_errors", "write_dataset"]

# The documents-table shape; pass a custom schema for other layouts.
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def _read(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    # text scan + from_json (rather than spark.read.json): the JSON
    # datasource forbids projecting only its corrupt-record column, and
    # this form keeps the corrupt marker an ordinary struct field with
    # no such restriction.  PERMISSIVE from_json routes any malformed
    # line's raw text into the embedded _corrupt_record field.
    # (StructType.add mutates in place — build a fresh struct so the
    # caller's schema object is never modified.)
    with_err = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    return lines.select(
        F.from_json(
            "value",
            with_err,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j")
    ).select("j.*")


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Clean rows only (malformed lines dropped *after* being counted as
    corrupt — use :func:`read_jsonl_with_errors` to keep them)."""
    df = _read(spark, path, schema or DOC_SCHEMA)
    return df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """STREAMING JSONL reader: watch a directory for newly-landed
    ``.jsonl``/``.jsonl.gz`` dump files and emit parsed rows
    incrementally — the same declared-schema + PERMISSIVE contract as
    :func:`read_jsonl` (shared ``from_json`` expression, no drift), the
    same arrival pattern as the WET/WARC streaming twins, and the same
    downstream: pipe into ``streaming.windows.incremental_exact_dedup``
    / ``incremental_minhash_dedup`` for the exactly-once crawl-ingest
    pipeline.  File tracking lives in the checkpoint, so each dump file
    is parsed exactly once per query.

    ``keep_corrupt=True`` keeps the ``_corrupt_record`` marker column
    (NULL for clean rows) so a ``foreachBatch`` sink can quarantine bad
    lines; the default drops malformed lines AFTER capture, mirroring
    ``read_jsonl``."""
    sch = schema or DOC_SCHEMA
    with_err = T.StructType(
        list(sch.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    lines = spark.readStream.text(path).where(F.length(F.trim("value")) > 0)
    parsed = lines.select(
        F.from_json(
            "value",
            with_err,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("j")
    ).select("j.*")
    if keep_corrupt:
        return parsed
    return parsed.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")


def read_jsonl_with_errors(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> tuple[DataFrame, DataFrame]:
    """``(clean, corrupt)`` — corrupt carries the raw offending line."""
    df = _read(spark, path, schema or DOC_SCHEMA)
    clean = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return clean, corrupt


def write_dataset(
    df: DataFrame,
    path: str,
    key_col: str = "doc_id",
    shards: int = 32,
    fmt: str = "parquet",
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Deterministic sharded write: hash-repartition on ``key_col`` into
    ``shards``, sort each shard by the key, bound file sizes.  Output
    bytes are a pure function of (rows, shards) — independent of input
    partitioning — so re-runs produce identical shard layouts (the
    auditability contract training-data pipelines need).

    The per-shard sort tiebreaks on a full-row digest: with a NON-unique
    ``key_col`` (e.g. sharding by language), equal-key rows would
    otherwise land in shuffle-fetch order, which varies run to run and
    silently breaks the byte-determinism contract.  Byte-identical
    duplicate rows remain interchangeable, which preserves it."""
    row_digest = F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])
    )
    (
        df.repartition(shards, F.col(key_col))
        .sortWithinPartitions(F.col(key_col), row_digest)
        .write.option("maxRecordsPerFile", max_records_per_file)
        .format(fmt)
        .mode(mode)
        .save(path)
    )
