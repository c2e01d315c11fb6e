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
  (non-splittable — keep off at scale unless fields embed newlines).
  The datasource forbids projecting ONLY its corrupt column; both
  views are materialized through a call-scoped cache that is released
  before returning (a bare .cache() would live in the session
  CacheManager forever).

Header ambiguity: the line-scan path drops lines byte-identical to the
header.  For an ALL-string schema a data row equal to the header is
indistinguishable from a header — CSV's inherent ambiguity — so
``write_csv`` quotes every field (RFC-4180 permits it); quoted data
rows can never collide with the bare header, making the round trip
loss-free even for all-string schemas.  Externally-produced unquoted
CSVs keep the ambiguity; use ``multiLine=True`` (real header handling)
if it matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from plda_spark.sources.jsonl import DOC_SCHEMA

__all__ = ["DOC_SCHEMA", "read_csv", "read_csv_stream", "read_csv_with_errors", "write_csv"]

_CSV_OPTS = {
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": "_corrupt_record",
    "escape": '"',  # RFC-4180 double-quote escaping (writer default)
}


def _is_multiline(options: dict) -> bool:
    """Spark CSV option keys are case-insensitive ('multiline' works on
    spark.read.csv); honoring only the exact 'multiLine' spelling would
    silently route such calls down the line-scan path, where
    embedded-newline records fragment and are quarantined instead of
    parsed."""
    for k, v in options.items():
        if k.lower() == "multiline":
            return str(v).lower() == "true"
    return False


def _parse_lines(
    lines: DataFrame, schema: T.StructType, opts: dict
) -> DataFrame:
    """Line rows → parsed rows + quarantine marker (shared by the batch
    and STREAMING line-scan paths — one parse expression, no drift)."""
    with_err = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    # Header removal honors the effective delimiter (from_csv uses the
    # same opts); only applies when headers are on.
    sep = opts.get("sep", opts.get("delimiter", ","))
    header_line = sep.join(f.name for f in schema.fields)
    if opts["header"].lower() != "true":
        header_line = None
    lines = lines.where(F.length(F.trim("value")) > 0)
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


def _read(
    spark: SparkSession, path: str, schema: T.StructType, options: dict
) -> DataFrame:
    opts = {**_CSV_OPTS, **{k: str(v) for k, v in options.items()}}
    opts.setdefault("header", "true")
    if _is_multiline(opts):
        with_err = T.StructType(
            list(schema.fields)
            + [T.StructField("_corrupt_record", T.StringType())]
        )
        return spark.read.options(**opts).schema(with_err).csv(path)
    return _parse_lines(spark.read.text(path), schema, opts)


def read_csv_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    keep_corrupt: bool = False,
    **options,
) -> DataFrame:
    """STREAMING CSV reader (line-scan path only): watch a directory
    for newly-landed ``.csv``/``.csv.gz`` files and emit parsed rows
    incrementally — the same declared-schema + PERMISSIVE quarantine
    contract as :func:`read_csv` via the SAME parse expression, the
    fourth crawl-ingest streaming twin (JSONL / WET / raw WARC are the
    others).  ``multiLine`` is a whole-file batch path by contract and
    is rejected here.  ``keep_corrupt=True`` keeps the
    ``_corrupt_record`` marker column for foreachBatch quarantine."""
    opts = {**_CSV_OPTS, **{k: str(v) for k, v in options.items()}}
    opts.setdefault("header", "true")
    if _is_multiline(opts):
        raise ValueError(
            "read_csv_stream supports only the splittable line-scan "
            "path; multiLine CSVs are whole-file batch reads"
        )
    parsed = _parse_lines(
        spark.readStream.text(path), schema or DOC_SCHEMA, opts
    )
    if keep_corrupt:
        return parsed
    return parsed.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")


def _split_multiline(
    df: DataFrame, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Scoped materialization for the multiLine datasource: referencing
    its corrupt column makes any downstream query that prunes the data
    columns (``.count()``!) trip the corrupt-only-projection
    restriction, and Spark's documented workaround — ``.cache()`` —
    lives in the CacheManager for the whole session if never released.
    So: cache, materialize both views into their own (GC-cleaned)
    checkpoint blocks, release the cache before returning.  multiLine
    is by contract the non-splittable small-data path (module
    docstring), so the materialization is bounded by design."""
    clean = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    df.cache()
    try:
        clean = clean.localCheckpoint(eager=True)
        corrupt = corrupt.localCheckpoint(eager=True)
    finally:
        df.unpersist()
    return clean, corrupt


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None, **options
) -> DataFrame:
    """Clean rows only (malformed rows dropped after being marked, not
    silently — use :func:`read_csv_with_errors` to keep them).

    Extra ``options`` merge over the defaults; pass ``multiLine=True``
    when fields embed newlines (non-splittable whole-file parsing —
    keep off at scale unless the data needs it).
    """
    sch = schema or DOC_SCHEMA
    df = _read(spark, path, sch, options)
    if _is_multiline(options):
        clean, _ = _split_multiline(df, sch)
        return clean
    return df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")


def read_csv_with_errors(
    spark: SparkSession, path: str, schema: T.StructType | None = None, **options
) -> tuple[DataFrame, DataFrame]:
    """``(clean, corrupt)`` — corrupt carries the raw offending line."""
    sch = schema or DOC_SCHEMA
    df = _read(spark, path, sch, options)
    if _is_multiline(options):
        return _split_multiline(df, sch)
    clean = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = df.where(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return clean, corrupt


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Header'd, RFC-4180-quoted CSV write.  ``quoteAll`` so every data
    field is quoted: embedded delimiters/quotes round-trip, AND no data
    row can be byte-identical to the (unquoted) header line — which the
    line-scan reader drops by literal match (see module docstring)."""
    df.write.options(header="true", escape='"', quoteAll="true").mode(mode).csv(path)
