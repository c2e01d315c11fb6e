"""CSV source with declared schema + corrupt-row quarantine — the other
interchange format curation pipelines ingest (metadata sheets, label
exports, crawl manifests).

Same contract as the JSONL connector (``sources/jsonl.py``):

- Schema is DECLARED, never inferred — at 100 TB an inference pre-pass
  reads the dataset twice, and inference is sample-dependent (two runs
  can disagree); the declared schema also makes column pruning reach
  the scan.
- PERMISSIVE with a captured ``_corrupt_record``: malformed rows (wrong
  arity, bad casts) are quarantined, never silently dropped
  (DROPMALFORMED makes row counts irreproducible) and never fatal
  (FAILFAST at web scale means one bad row kills a 1000-executor job).

Two physical paths:

- default (``multiLine=False``): splittable line scan + ``F.from_csv``,
  the corrupt marker an ordinary struct field — same shape as the JSONL
  reader, no datasource restriction on projecting it, header lines
  dropped by literal match.  Fields may embed quoted commas/quotes but
  NOT newlines.
- ``multiLine=True``: the CSV datasource parses whole files
  (non-splittable — keep off at scale unless fields embed newlines);
  the parsed frame is cached per Spark's documented recipe because the
  datasource forbids corrupt-only projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from plda_spark.sources.jsonl import DOC_SCHEMA

__all__ = ["DOC_SCHEMA", "read_csv", "read_csv_with_errors", "write_csv"]

_CSV_OPTS = {
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": "_corrupt_record",
    "escape": '"',  # RFC-4180 double-quote escaping (writer default)
}


def _read(
    spark: SparkSession, path: str, schema: T.StructType, options: dict
) -> DataFrame:
    opts = {**_CSV_OPTS, **{k: str(v) for k, v in options.items()}}
    opts.setdefault("header", "true")
    with_err = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    if opts.get("multiLine", "false").lower() == "true":
        df = spark.read.options(**opts).schema(with_err).csv(path)
        # The CSV datasource disallows referencing only its corrupt
        # column; Spark's documented recipe is to cache the parsed frame
        # before splitting it into clean/corrupt views.  Only this
        # non-splittable path pays the cache.
        return df.cache()
    # Header removal honors the effective delimiter (from_csv uses the
    # same opts); only applies when headers are on.
    sep = opts.get("sep", opts.get("delimiter", ","))
    header_line = sep.join(f.name for f in schema.fields)
    if opts["header"].lower() != "true":
        header_line = None
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    if header_line is not None:
        lines = lines.where(F.col("value") != header_line)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in with_err.fields
    )
    return lines.select(
        F.from_csv("value", ddl, opts).alias("r"), "value"
    ).select(
        # from_csv's PERMISSIVE mode nulls the corrupt field's siblings
        # but (unlike from_json) fills the marker with the parsed-enough
        # prefix, so recover the RAW line for the quarantine column.
        *[f"r.{f.name}" for f in schema.fields],
        F.when(F.col("r._corrupt_record").isNotNull(), F.col("value"))
        .alias("_corrupt_record"),
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None, **options
) -> DataFrame:
    """Clean rows only (malformed rows dropped after being marked, not
    silently — use :func:`read_csv_with_errors` to keep them).

    Extra ``options`` merge over the defaults; pass ``multiLine=True``
    when fields embed newlines (non-splittable whole-file parsing —
    keep off at scale unless the data needs it).
    """
    df = _read(spark, path, schema or DOC_SCHEMA, options)
    return df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")


def read_csv_with_errors(
    spark: SparkSession, path: str, schema: T.StructType | None = None, **options
) -> tuple[DataFrame, DataFrame]:
    """``(clean, corrupt)`` — corrupt carries the raw offending line."""
    df = _read(spark, path, schema or DOC_SCHEMA, options)
    clean = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return clean, corrupt


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Header'd, RFC-4180-quoted CSV write (quoting on so embedded
    delimiters/quotes round-trip through the PERMISSIVE reader)."""
    df.write.options(header="true", escape='"').mode(mode).csv(path)
