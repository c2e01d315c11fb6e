"""Vocabulary construction and word-id remapping.

Adopts the reference's *MPI* convention — lexicographically sorted word
ids (``mpi_lda.cc:197-207``) — everywhere, because it is deterministic;
the single-node first-seen convention (``lda.cc:71-77``) is order
dependent and is not reproduced.

Scale notes: the global sort is a single shuffle of the *distinct* word
set (tiny relative to the corpus); the remap join broadcasts the vocab,
so the corpus itself never shuffles for id assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_vocab", "remap_words"]


def build_vocab(corpus: DataFrame, word_col: str = "word") -> DataFrame:
    """``DataFrame[word, word_id]`` with dense 0-based lexicographic ids.

    Mirrors the sort + position-id of ``mpi_lda.cc:197-207``.  Ids come
    from ``zipWithIndex`` over the range-partitioned (sorted) distinct
    word set — deterministic dense ids with NO single-partition window
    (a global ``row_number`` window would funnel the whole vocabulary
    through one task; ``zipWithIndex`` instead takes per-partition
    counts and offsets them, staying parallel at any vocabulary size).
    """
    spark = corpus.sparkSession
    distinct_sorted = (
        corpus.select(F.col(word_col).alias("word")).distinct().orderBy("word")
    )
    indexed = distinct_sorted.rdd.map(lambda r: r["word"]).zipWithIndex()
    return spark.createDataFrame(indexed, "word string, word_id long")


def remap_words(corpus: DataFrame, vocab: DataFrame, word_col: str = "word", how: str = "inner") -> DataFrame:
    """Replace word strings with dense ids via a broadcast-hash join.

    Spark-side equivalent of ``LDADocument::ResetWordIndex``
    (``document.cc:125-129``).  ``how='inner'`` drops out-of-vocabulary
    words — the inference-time OOV filter of ``infer.cc:77-80``.
    """
    return corpus.join(F.broadcast(vocab), corpus[word_col] == vocab["word"], how).drop(
        vocab["word"]
    )
