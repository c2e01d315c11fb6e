"""plda corpus text format — reader/writer (O1/O16 format surface).

Format (``README.md:44-58``): one document per line,
``word1 count1 word2 count2 …`` whitespace-separated; blank lines and
lines starting with ``#``/CR/LF are skipped (parser ``lda.cc:56-79``).

Doc ids are assigned by line order, matching the reference's implicit
line-number document identity.  ``zipWithIndex`` is the one RDD touch in
the repo: it is the only distributed primitive that yields stable,
contiguous line numbers without collapsing to a single partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_plda_corpus", "write_plda_corpus"]

_LINE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("line", T.StringType()),
    ]
)


def read_plda_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Read plda-format text → canonical ``(doc_id, word, count)`` triples."""
    lines = spark.read.text(path)
    kept = lines.where(
        (F.length(F.trim("value")) > 0) & ~F.col("value").startswith("#")
    )
    # Stable line-order ids (lda.cc assigns doc identity by input order).
    indexed = kept.rdd.map(lambda r: r["value"]).zipWithIndex().map(
        lambda t: (t[1], t[0])
    )
    df = spark.createDataFrame(indexed, _LINE_SCHEMA)
    tokens = F.split(F.trim("line"), r"\s+")
    # (word, count) pairs: even positions are words, odd are counts.
    pairs = F.filter(
        F.transform(tokens, lambda x, i: F.struct(x.alias("tok"), i.alias("i"))),
        lambda s: s["i"] % 2 == 0,
    )
    counts = F.filter(
        F.transform(tokens, lambda x, i: F.struct(x.alias("tok"), i.alias("i"))),
        lambda s: s["i"] % 2 == 1,
    )
    return (
        df.select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.transform(pairs, lambda s: s["tok"]).alias("word"),
                    # try_cast: a malformed count (or a dangling word with no
                    # count) yields NULL and the pair is dropped below —
                    # the reference's atoi() returns 0 for garbage and the
                    # occurrence loop then adds nothing (lda.cc:61-79), so
                    # silent-skip is parity; ANSI cast would abort the job.
                    F.transform(counts, lambda s: s["tok"].try_cast("int")).alias(
                        "count"
                    ),
                )
            ).alias("p"),
        )
        .select("doc_id", F.col("p.word").alias("word"), F.col("p.count").alias("count"))
        .where(F.col("count").isNotNull() & (F.col("count") > 0))
    )


def write_plda_corpus(corpus: DataFrame, path: str) -> None:
    """Canonical triples → plda-format text, one doc per line, words in
    lexicographic order within a line (deterministic round-trip)."""
    (
        corpus.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("word", "count"))).alias("pairs"))
        .orderBy("doc_id")
        .select(
            F.array_join(
                F.transform(
                    "pairs",
                    lambda p: F.concat_ws(" ", p["word"], p["count"].cast("string")),
                ),
                " ",
            ).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
