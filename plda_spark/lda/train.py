"""Distributed LDA training — AD-LDA on Spark (the reference's mpi_lda on
DataFrames).

Per iteration, exactly like ``mpi_lda.cc:213-235``:

1. broadcast the current V×K model to all partitions (the reference
   replicates it per rank, ``README.md:125``);
2. each partition sweeps its documents sequentially with a *local* model
   copy (``applyInPandas``-free: a ``mapInPandas`` pass — no shuffle, the
   packed corpus keeps its hash partitioning across iterations);
3. rebuild the global model from the new assignments with Spark's
   partial+final aggregation — the ``groupBy(word_id, topic).count``
   shuffle is the moral equivalent of the reference's chunked
   SUM-AllReduce (``mpi_lda.cc:58-110``); map-side combine bounds the
   shuffle at ≤ V·K rows per partition regardless of corpus size;
4. collect (≤ V·K rows) and re-broadcast.

Within an iteration cross-partition counts are one iteration stale —
precisely the AD-LDA relaxation the reference itself makes across MPI
ranks (Newman et al., NIPS 2007; ``README.md:267``).

Two output modes (SURVEY.md §3.2): post-burn-in averaging (single-node
``lda`` semantics, ``lda.cc:137-145``) and raw final-iteration counts
(``mpi_lda`` semantics — no averaging, ``mpi_lda.cc:234-241``).

Unlike the reference (``srand(time(NULL))``, ``lda.cc:114``) training is
deterministic for a fixed (seed, num_partitions): RNG streams are keyed
by (seed, partition, iteration).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import kernel
from .corpus import pack_docs
from .model import LDAModel
from .vocab import build_vocab, remap_words

__all__ = ["TrainConfig", "TrainResult", "train", "train_documents"]

_SWEEP_SCHEMA = "doc_id long, word_occ array<int>, z array<int>, ll double"


@dataclass
class TrainConfig:
    """Mirrors the reference CLI flags + their validators (cmd_flags.cc:74-105)."""

    num_topics: int
    alpha: float = 0.1
    beta: float = 0.01
    total_iterations: int = 150
    burn_in_iterations: int = 100
    compute_likelihood: bool = False
    average_model: bool = True  # True = lda semantics; False = mpi_lda raw counts
    seed: int = 42
    num_partitions: int | None = None

    def validate(self) -> None:
        if self.num_topics < 2:
            raise ValueError("num_topics must be >= 2")
        if self.alpha <= 0 or self.beta <= 0:
            raise ValueError("alpha and beta must be > 0")
        if self.total_iterations <= 0:
            raise ValueError("total_iterations must be > 0")
        if not (0 <= self.burn_in_iterations < self.total_iterations):
            raise ValueError("need 0 <= burn_in_iterations < total_iterations")


@dataclass
class TrainResult:
    model: LDAModel                      # averaged or raw per config.average_model
    raw_model: LDAModel                  # final-iteration raw counts (mpi_lda output)
    log_likelihood: list[float] = field(default_factory=list)  # one per iteration if computed


def _zinit_fn(num_topics: int, seed: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        rng = kernel.make_rng(seed, pid, 0)
        for pdf in batches:
            z = [
                kernel.init_assignments(len(occ), num_topics, rng)
                for occ in pdf["word_occ"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "word_occ": pdf["word_occ"],
                    "z": z,
                    "ll": np.zeros(len(pdf)),
                }
            )

    return fn


def _sweep_fn(bc_nwk, bc_nk, alpha: float, beta: float, seed: int, iteration: int,
              compute_likelihood: bool):
    """mapInPandas sweep: partition-local model copy, sequential Gibbs.

    The local copy is made once per partition and shared across Arrow
    batches, matching the reference's per-rank replica; the pre-sweep
    log-likelihood (lda.cc:128-136 computes LL before the sweep) is
    emitted per doc in the ``ll`` column.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        rng = kernel.make_rng(seed, pid, iteration + 1)
        local_nwk = None
        local_nk = None
        for pdf in batches:
            if local_nwk is None:
                local_nwk = bc_nwk.value.copy()
                local_nk = bc_nk.value.copy()
            lens = pdf["word_occ"].map(len).to_numpy()
            offsets = np.zeros(len(pdf) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            word_occ = (
                np.concatenate(list(pdf["word_occ"])).astype(np.int32)
                if len(pdf) else np.empty(0, np.int32)
            )
            z = (
                np.concatenate(list(pdf["z"])).astype(np.int32)
                if len(pdf) else np.empty(0, np.int32)
            )
            lls = np.zeros(len(pdf))
            if compute_likelihood:
                K = local_nk.shape[0]
                for d in range(len(pdf)):
                    s, e = offsets[d], offsets[d + 1]
                    ndk = np.bincount(z[s:e], minlength=K).astype(np.float64)
                    uw, cnt = np.unique(word_occ[s:e], return_counts=True)
                    lls[d] = kernel.doc_log_likelihood(
                        uw, cnt.astype(np.float64), ndk, local_nwk, local_nk, alpha, beta
                    )
            kernel.sweep_docs(
                word_occ, z, offsets, local_nwk, local_nk, alpha, beta, rng,
                update_model=True,
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "word_occ": pdf["word_occ"],
                    "z": list(np.split(z, offsets[1:-1])) if len(pdf) else [],
                    "ll": lls,
                }
            )

    return fn


def _partial_counts_fn(vocab_size: int, num_topics: int):
    """Per-partition dense bincount of (word, topic) pairs, emitted as
    pre-combined sparse triples — the Arrow analog of the reference's
    per-rank local count rebuild (mpi_lda.cc:99-110).  One numpy pass
    replaces a JVM explode of one row per token (~10× cheaper: the
    explode materializes N_tokens rows; this emits ≤ nnz(V×K))."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        size = vocab_size * num_topics
        acc = np.zeros(size, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            occ = np.concatenate(list(pdf["word_occ"])).astype(np.int64)
            zz = np.concatenate(list(pdf["z"])).astype(np.int64)
            acc += np.bincount(occ * num_topics + zz, minlength=size)
        nz = np.flatnonzero(acc)
        yield pd.DataFrame(
            {
                "word_id": nz // num_topics,
                "topic": (nz % num_topics).astype(np.int32),
                "c": acc[nz],
            }
        )

    return fn


def _aggregate_model(df_z: DataFrame, vocab_size: int, num_topics: int) -> np.ndarray:
    """Rebuild n_wk from assignments — Spark partial+final agg ≙ AllReduce
    (mpi_lda.cc:58-110).  Per-partition numpy partials, then a shuffle of
    ≤ P·nnz(V×K) pre-combined triples, then an Arrow collect of ≤ V·K
    rows with a vectorized scatter."""
    pdf = (
        df_z.mapInPandas(
            _partial_counts_fn(vocab_size, num_topics),
            schema="word_id long, topic int, c long",
        )
        .groupBy("word_id", "topic")
        .agg(F.sum("c").alias("c"))
        .toPandas()
    )
    nwk = np.zeros((vocab_size, num_topics), dtype=np.int64)
    nwk[pdf["word_id"].to_numpy(), pdf["topic"].to_numpy()] = pdf["c"].to_numpy()
    return nwk


def train(corpus: DataFrame, config: TrainConfig) -> TrainResult:
    """Train on canonical ``(doc_id, word, count)`` triples."""
    config.validate()
    spark = corpus.sparkSession
    sc = spark.sparkContext
    P = config.num_partitions or sc.defaultParallelism

    vocab = build_vocab(corpus)
    words = [r["word"] for r in vocab.orderBy("word_id").collect()]
    V, K = len(words), config.num_topics
    if V == 0:
        raise ValueError("empty vocabulary")

    corpus_ids = remap_words(corpus, vocab).select("doc_id", "word_id", "count")
    packed = pack_docs(corpus_ids, P)

    # z-init (O1's random init, distributed) then initial model (O4).
    df_z = packed.select("doc_id", "word_occ").mapInPandas(
        _zinit_fn(K, config.seed), schema=_SWEEP_SCHEMA
    )
    df_z = df_z.localCheckpoint(eager=True)
    nwk = _aggregate_model(df_z, V, K)

    accum = np.zeros((V, K), dtype=np.float64)
    lls: list[float] = []
    n_avg = config.total_iterations - config.burn_in_iterations

    for it in range(config.total_iterations):
        bc_nwk = sc.broadcast(nwk)
        bc_nk = sc.broadcast(nwk.sum(axis=0))
        swept = df_z.mapInPandas(
            _sweep_fn(
                bc_nwk, bc_nk, config.alpha, config.beta, config.seed, it,
                config.compute_likelihood,
            ),
            schema=_SWEEP_SCHEMA,
        )
        new_df_z = swept.localCheckpoint(eager=True)
        if config.compute_likelihood:
            lls.append(new_df_z.agg(F.sum("ll")).collect()[0][0])
        df_z.unpersist()
        df_z = new_df_z
        nwk = _aggregate_model(df_z, V, K)
        bc_nwk.destroy()
        bc_nk.destroy()
        if it >= config.burn_in_iterations:
            accum += nwk

    raw_model = LDAModel(nwk, words, config.alpha, config.beta)
    if config.average_model:
        model = LDAModel(accum / n_avg, words, config.alpha, config.beta)
    else:
        model = raw_model
    df_z.unpersist()
    return TrainResult(model=model, raw_model=raw_model, log_likelihood=lls)


def train_documents(
    docs: DataFrame, config: TrainConfig, text_col: str = "text", id_col: str = "doc_id"
) -> TrainResult:
    """Train directly on a ``documents(doc_id, text, …)`` table."""
    from .corpus import doc_term_counts, tokenize

    return train(doc_term_counts(tokenize(docs, text_col, id_col)), config)
