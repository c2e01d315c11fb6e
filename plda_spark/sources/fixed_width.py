"""Fixed-width (columnar text) source and sink.

The classic mainframe/enterprise interchange format the reference's
text-file corpus loader family belongs to (plda's own corpus format —
``common.cc:34-66`` — is a delimited cousin; see
``sources/plda_text.py``): every record is one line, every field a
fixed byte range, no delimiters, no quoting.  COBOL copybooks, bank
clearing files, and census extracts still arrive this way, so a
migration pipeline needs a SPLITTABLE reader for it.

Spark-first shape: the writer renders each field with JVM ``rpad``
into one concatenated line column and writes ``text`` (splittable,
per-partition files, no Python in the row path); the reader is
``spark.read.text`` + ``substring``/``trim``/``cast`` projections —
pure whole-stage-codegen expressions, so a 100 TB fixed-width dump
scans with full parallelism and column pruning (unused fields are
never projected).

Schema spec: ``[(name, width, dtype)]`` — widths in CHARACTERS
(fixed-width files are single-byte-per-char in practice; the reader
slices by character exactly like the mainframe consumer).  Values are
LEFT-aligned and right-padded with spaces (the most common layout);
the reader ``rtrim``s before casting, so embedded leading spaces
survive but trailing ones do not — stated because true copybooks
sometimes zero-pad numerics on the left (pass them as strings and
cast downstream if that distinction matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_fixed_width", "read_fixed_width"]


def _validate_spec(spec) -> None:
    if not spec:
        raise ValueError("fixed_width: empty field spec")
    seen = set()
    for name, width, _dtype in spec:
        if width < 1:
            raise ValueError(
                f"fixed_width: field {name!r} has width {width} < 1"
            )
        if name in seen:
            raise ValueError(f"fixed_width: duplicate field {name!r}")
        seen.add(name)


def write_fixed_width(
    df: DataFrame,
    path: str,
    spec: list,
    mode: str = "overwrite",
) -> None:
    """Render ``df`` as fixed-width text at ``path``.

    ``spec`` is ``[(name, width, dtype)]`` in OUTPUT column order
    (``dtype`` is the read-back type; the writer only needs the
    width).  NULLs render as all-spaces (indistinguishable from an
    empty string by design — the format has no null marker; keep a
    sentinel column upstream if you need the distinction).  A value
    longer than its field fails the write with a named error — the
    guard is ``raise_error`` INSIDE the write projection, so the same
    scan that renders a value checks it: a separate pre-scan would
    double the corpus read AND, for a non-deterministic input
    (sampling, ``rand``, shuffling reads), could pass on one
    evaluation while the re-computed write evaluation silently
    truncates a longer value.  Spark's commit protocol only promotes
    task files on success, so no committed output ever holds a
    truncated value; note ``mode="overwrite"`` clears the target
    before writing, so point a pipeline whose old output matters at a
    fresh path."""
    _validate_spec(spec)
    rendered = [
        F.coalesce(F.col(name).cast("string"), F.lit("")).alias(name)
        for name, _w, _t in spec
    ]
    staged = df.select(*rendered)

    def _guarded(name: str, width: int):
        col = F.col(name)
        return F.when(
            F.length(col) <= width, F.rpad(col, width, " ")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"fixed_width: field {name!r} has a value of "
                        "length "
                    ),
                    F.length(col).cast("string"),
                    F.lit(
                        f" > declared width {width}; widen the field "
                        "or truncate upstream (the writer never "
                        "truncates silently)."
                    ),
                )
            )
        )

    line = F.concat(
        *[_guarded(name, width) for name, width, _t in spec]
    ).alias("value")
    try:
        staged.select(line).write.mode(mode).text(path)
    except Exception as exc:  # unwrap the raise_error guard
        msg = str(exc)
        if "fixed_width: field" in msg:
            start = msg.index("fixed_width: field")
            raise ValueError(
                msg[start:].split(" SQLSTATE")[0].strip()
            ) from exc
        raise


def read_fixed_width(
    spark: SparkSession,
    path: str,
    spec: list,
) -> DataFrame:
    """Read a fixed-width file written by :func:`write_fixed_width`
    (or any system emitting the same layout): ``spark.read.text`` +
    one ``substring``/``rtrim``/``cast`` projection per field — all
    JVM expressions, splittable, and column-prunable (project fewer
    fields and the extra substrings fold away).  Lines shorter than
    the record length yield NULL/empty tails (substring past the end
    is empty — the lenient mainframe convention); an all-spaces field
    reads as empty string for strings and NULL for casts."""
    _validate_spec(spec)
    cols = []
    pos = 1
    for name, width, dtype in spec:
        raw = F.substring(F.col("value"), pos, width)
        trimmed = F.rtrim(raw)
        if dtype == "string":
            cols.append(trimmed.alias(name))
        else:
            # empty -> NULL, then cast (ANSI-safe for blank fields)
            cols.append(
                F.when(trimmed != "", trimmed).cast(dtype).alias(name)
            )
        pos += width
    return spark.read.text(path).select(*cols)
