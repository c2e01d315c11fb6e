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

# word_occ / z travel as raw little-endian int32 bytes, not array<int>:
# binary columns cross the Arrow boundary as one buffer per row
# (np.frombuffer decode, ~zero-copy) instead of a Python list/ndarray
# materialization per row — a large constant-factor win when the corpus
# round-trips the JVM<->Python boundary every Gibbs iteration.
_SWEEP_SCHEMA = "doc_id long, word_occ binary, z binary, ll double"


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
    # Fault tolerance for long jobs: every ``checkpoint_every`` iterations
    # the assignments (parquet) + driver state (npz) land in
    # ``checkpoint_dir``; ``train(..., resume_from=dir)`` continues there.
    checkpoint_dir: str | None = None
    checkpoint_every: int = 10
    # Model-rebuild reduce strategy.  "driver": read the P sparse payload
    # rows straight to the driver and sum there (one job, no shuffle —
    # best while P·nnz fits driver bandwidth).  "shuffle": pre-combine
    # payloads with a groupBy(flat_idx).sum so the driver receives at
    # most nnz(V×K) rows no matter how many partitions exist — the
    # tree-reduce analog of the reference's recursive AllReduce
    # (mpi_lda.cc:58-92), one extra shuffle per iteration.  "auto" cuts
    # over at _SHUFFLE_AGG_MIN_PARTITIONS.
    aggregate_mode: str = "auto"

    def validate(self) -> None:
        if self.num_topics < 2:
            raise ValueError("num_topics must be >= 2")
        if self.alpha <= 0 or self.beta <= 0:
            raise ValueError("alpha and beta must be > 0")
        if self.total_iterations <= 0:
            raise ValueError("total_iterations must be > 0")
        if not (0 <= self.burn_in_iterations < self.total_iterations):
            raise ValueError("need 0 <= burn_in_iterations < total_iterations")
        if self.aggregate_mode not in ("auto", "driver", "shuffle"):
            raise ValueError("aggregate_mode must be auto|driver|shuffle")


# Auto-partitioning targets (used when TrainConfig.num_partitions is None).
# Each Gibbs iteration is one job whose per-task fixed cost (scheduling,
# Arrow round-trip, Python worker dispatch) is amortized over the tokens in
# the partition — so partitions are sized by token volume, not row count:
#   P = min(parallelism, ceil(tokens / _TOKENS_PER_PARTITION))   # small corpora
#   P = max(P, ceil(tokens / _MAX_TOKENS_PER_PARTITION), 1)      # memory floor
# A sf0.1-sized corpus (~1M tokens) gets 4 partitions instead of 32 (8x less
# fixed overhead per iteration); a 100M-token corpus saturates the cluster;
# the floor bounds per-task occ+z memory (~8 bytes/token) regardless of
# parallelism.  More partitions than cores is never useful here: AD-LDA
# staleness and payload volume both grow with P (lda_paper.pdf §4.1).
_TOKENS_PER_PARTITION = 250_000
_MAX_TOKENS_PER_PARTITION = 64_000_000


def _auto_partitions(total_tokens: int, parallelism: int) -> int:
    p = min(parallelism, -(-total_tokens // _TOKENS_PER_PARTITION) or 1)
    return max(p, -(-total_tokens // _MAX_TOKENS_PER_PARTITION), 1)


@dataclass
class TrainResult:
    model: LDAModel                      # averaged or raw per config.average_model
    raw_model: LDAModel                  # final-iteration raw counts (mpi_lda output)
    log_likelihood: list[float] = field(default_factory=list)  # one per iteration if computed


def _count_payload_row(
    pid: int, acc_flat: np.ndarray, ll_total: float = 0.0
) -> pd.DataFrame:
    """Encode a partition's sparse (word,topic) counts as one synthetic
    row: ``doc_id = -(pid+1)``, ``z`` = interleaved [flat_idx, count, …],
    ``ll`` = the partition's summed pre-sweep log-likelihood.

    This rides the sweep's own output schema, so the per-iteration model
    rebuild reads P tiny payload rows from the checkpoint instead of
    re-decoding every token array in a second Arrow pass — the shuffle-
    free end of the reference's local-count-then-AllReduce
    (mpi_lda.cc:99-110).  Piggybacking the LL partial on the same row
    means a likelihood-enabled iteration still launches exactly ONE
    post-sweep job (the payload read), not a second full-scan agg.
    """
    nz = np.flatnonzero(acc_flat)
    assert acc_flat.shape[0] < 2**31, "V*K exceeds int32 payload indexing"
    assert nz.shape[0] == 0 or acc_flat[nz].max() < 2**31
    packed = np.empty(2 * nz.shape[0], dtype=np.int32)
    packed[0::2] = nz
    packed[1::2] = acc_flat[nz]
    return pd.DataFrame(
        {
            "doc_id": np.array([-(pid + 1)], dtype=np.int64),
            "word_occ": [b""],
            "z": [packed.tobytes()],
            "ll": np.array([ll_total], dtype=np.float64),
        }
    )


def _zinit_fn(num_topics: int, vocab_size: int, seed: int):
    """Consumes packed ``(doc_id, word_occ: array<int>)``; emits the
    binary-column sweep layout plus this partition's count payload."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        rng = kernel.make_rng(seed, pid, 0)
        acc = np.zeros(vocab_size * num_topics, dtype=np.int64)
        for pdf in batches:
            occs = [np.asarray(o, dtype=np.int32) for o in pdf["word_occ"]]
            zs = [kernel.init_assignments(len(o), num_topics, rng) for o in occs]
            if occs:
                occ_all = (
                    np.concatenate(occs).astype(np.int64)
                    if occs else np.empty(0, np.int64)
                )
                z_all = np.concatenate(zs) if zs else np.empty(0, np.int64)
                if occ_all.shape[0]:
                    acc += np.bincount(
                        occ_all * num_topics + z_all, minlength=acc.shape[0]
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "word_occ": [o.tobytes() for o in occs],
                    "z": [zz.tobytes() for zz in zs],
                    "ll": np.zeros(len(pdf)),
                }
            )
        yield _count_payload_row(pid, acc)

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
        acc = None
        ll_total = 0.0
        for pdf in batches:
            if local_nwk is None:
                local_nwk = bc_nwk.value.copy()
                local_nk = bc_nk.value.copy()
                acc = np.zeros(local_nwk.size, dtype=np.int64)
            # Binary columns: one frombuffer over the batch-concatenated
            # bytes (no per-row ndarray materialization).
            lens = (pdf["word_occ"].map(len).to_numpy() // 4).astype(np.int64)
            offsets = np.zeros(len(pdf) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            word_occ = np.frombuffer(
                b"".join(pdf["word_occ"]), dtype=np.int32
            ).copy() if len(pdf) else np.empty(0, np.int32)
            z = np.frombuffer(
                b"".join(pdf["z"]), dtype=np.int32
            ).copy() if len(pdf) else np.empty(0, np.int32)
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
                ll_total += float(lls.sum())
            kernel.sweep_docs(
                word_occ, z, offsets, local_nwk, local_nk, alpha, beta, rng,
                update_model=True,
            )
            if word_occ.shape[0]:
                K = local_nk.shape[0]
                acc += np.bincount(
                    word_occ.astype(np.int64) * K + z, minlength=acc.shape[0]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "word_occ": pdf["word_occ"],
                    "z": [
                        z[offsets[d]:offsets[d + 1]].tobytes()
                        for d in range(len(pdf))
                    ],
                    "ll": lls,
                }
            )
        if acc is None:  # empty partition still reports (zero) counts
            acc = np.zeros(bc_nwk.value.size, dtype=np.int64)
        yield _count_payload_row(pid, acc, ll_total)

    return fn


# "auto" aggregate_mode switches from driver-side payload summing to the
# shuffle pre-combine at this partition count: below it, one collect of
# P sparse rows beats an extra shuffle; above it, driver bandwidth
# (P·nnz ints) becomes the bottleneck the pre-combine removes.
_SHUFFLE_AGG_MIN_PARTITIONS = 256


def _aggregate_model_shuffle(
    df_z: DataFrame, vocab_size: int, num_topics: int
) -> tuple[np.ndarray, float]:
    """Shuffle-combined model rebuild: decode each payload row into
    (flat_idx, count) pairs executor-side, groupBy(flat_idx).sum (map-side
    combined), and collect at most nnz(V×K) summed rows — driver traffic
    independent of partition count, the tree end of the reference's
    chunked AllReduce (mpi_lda.cc:58-92)."""
    import pandas as pd

    payload = df_z.where(F.col("doc_id") < 0).select("z", "ll")

    def decode(batches):
        for pdf in batches:
            for buf in pdf["z"]:
                a = np.frombuffer(buf, dtype=np.int32)
                yield pd.DataFrame(
                    {"idx": a[0::2].astype(np.int64), "cnt": a[1::2].astype(np.int64)}
                )

    pairs = payload.select("z").mapInPandas(decode, schema="idx long, cnt long")
    summed = pairs.groupBy("idx").agg(F.sum("cnt").alias("cnt")).toPandas()
    flat = np.zeros(vocab_size * num_topics, dtype=np.int64)
    if len(summed):
        flat[summed["idx"].to_numpy()] = summed["cnt"].to_numpy()
    ll = payload.agg(F.sum("ll")).collect()[0][0] or 0.0
    return flat.reshape(vocab_size, num_topics), float(ll)


def _aggregate_model(
    df_z: DataFrame, vocab_size: int, num_topics: int
) -> tuple[np.ndarray, float]:
    """Rebuild n_wk from the per-partition count payloads emitted by the
    z-init / sweep passes — the reduce end of the reference's AllReduce
    (mpi_lda.cc:58-110).  Reads P payload rows from the checkpoint (no
    token-array re-decode, no shuffle) and sums the sparse partials
    driver-side; driver traffic is ≤ P·nnz(V×K) ints, the same volume
    the reference's rank-0 receives per AllReduce.  Returns
    ``(n_wk, corpus_ll)`` — the LL partial rides the same rows, so the
    whole reduce is one job.  Payloads are summed in pid order for a
    deterministic float result."""
    pdf = (
        df_z.where(F.col("doc_id") < 0)
        .select("doc_id", "z", "ll")
        .toPandas()
        .sort_values("doc_id", ascending=False)
    )
    flat = np.zeros(vocab_size * num_topics, dtype=np.int64)
    for buf in pdf["z"]:
        a = np.frombuffer(buf, dtype=np.int32).astype(np.int64)
        flat[a[0::2]] += a[1::2]
    return flat.reshape(vocab_size, num_topics), float(pdf["ll"].sum())


def _save_checkpoint(df_z: DataFrame, path: str, it: int, nwk, accum, lls, words) -> None:
    df_z.write.mode("overwrite").parquet(f"{path}/assignments")
    np.savez(
        f"{path}/state.npz",
        next_iteration=it + 1,
        nwk=nwk,
        accum=accum,
        lls=np.asarray(lls, dtype=np.float64),
        words=np.asarray(words, dtype=object),
    )


def train(corpus: DataFrame, config: TrainConfig, resume_from: str | None = None) -> TrainResult:
    """Train on canonical ``(doc_id, word, count)`` triples.

    ``resume_from`` restarts from a checkpoint written by
    ``config.checkpoint_dir`` (assignments re-hashed to the same
    partition count, so the continued run is a valid AD-LDA chain;
    results are statistically — not bit — identical to an uninterrupted
    run because shuffle gather order differs after the restart).
    """
    config.validate()
    spark = corpus.sparkSession
    sc = spark.sparkContext
    if config.num_partitions:
        P = config.num_partitions
    else:
        total_tokens = int(
            corpus.agg(F.sum("count")).collect()[0][0] or 0
        )
        P = _auto_partitions(total_tokens, sc.defaultParallelism)
    if config.aggregate_mode == "shuffle" or (
        config.aggregate_mode == "auto" and P >= _SHUFFLE_AGG_MIN_PARTITIONS
    ):
        agg_model = _aggregate_model_shuffle
    else:
        agg_model = _aggregate_model

    if resume_from is None:
        vocab = build_vocab(corpus)
        words = [r["word"] for r in vocab.orderBy("word_id").collect()]
        V, K = len(words), config.num_topics
        if V == 0:
            raise ValueError("empty vocabulary")

        corpus_ids = remap_words(corpus, vocab).select("doc_id", "word_id", "count")
        packed = pack_docs(corpus_ids, P)

        # z-init (O1's random init, distributed) then initial model (O4).
        df_z = packed.select("doc_id", "word_occ").mapInPandas(
            _zinit_fn(K, V, config.seed), schema=_SWEEP_SCHEMA
        )
        # LAZY checkpoint: the payload collect inside agg_model is the
        # first action, so one job computes the init pass, persists the
        # blocks (truncating lineage), and returns the payload rows —
        # no separate materialization job.
        df_z = df_z.localCheckpoint(eager=False)
        nwk, _ = agg_model(df_z, V, K)
        accum = np.zeros((V, K), dtype=np.float64)
        lls: list[float] = []
        start_it = 0
    else:
        state = np.load(f"{resume_from}/state.npz", allow_pickle=True)
        words = [str(w) for w in state["words"]]
        V, K = len(words), config.num_topics
        nwk = state["nwk"]
        accum = state["accum"]
        lls = [float(x) for x in state["lls"]]
        start_it = int(state["next_iteration"])
        df_z = (
            spark.read.parquet(f"{resume_from}/assignments")
            .repartition(P, "doc_id")
            .localCheckpoint(eager=True)
        )

    n_avg = config.total_iterations - config.burn_in_iterations

    for it in range(start_it, config.total_iterations):
        bc_nwk = sc.broadcast(nwk)
        bc_nk = sc.broadcast(nwk.sum(axis=0))
        # Payload rows (doc_id < 0) carry the previous pass's counts and
        # must not enter the sweep; the filter is narrow (no shuffle).
        swept = df_z.where(F.col("doc_id") >= 0).mapInPandas(
            _sweep_fn(
                bc_nwk, bc_nk, config.alpha, config.beta, config.seed, it,
                config.compute_likelihood,
            ),
            schema=_SWEEP_SCHEMA,
        )
        # localCheckpoint (not persist): it truncates lineage, which is
        # REQUIRED here — the sweep closure captures this iteration's
        # broadcasts, which are destroyed below, so any retained lineage
        # would reference dead broadcasts and fail on recompute
        # (persist(MEMORY_AND_DISK) crashes by iteration 2 for that
        # reason).  The checkpoint is LAZY: agg_model's payload collect
        # is the first action, so ONE job runs the sweep, persists the
        # blocks, and returns the payload rows — fusing what were a
        # materialization job and a payload-scan job (~25% of steady
        # iteration wall at sf0.1).  The old generation is unpersisted
        # only AFTER that job: its blocks are the checkpoint data the
        # sweep reads, and its truncated lineage cannot recompute them.
        new_df_z = swept.localCheckpoint(eager=False)
        nwk, ll = agg_model(new_df_z, V, K)
        df_z.unpersist()
        df_z = new_df_z
        if config.compute_likelihood:
            lls.append(ll)
        bc_nwk.destroy()
        bc_nk.destroy()
        if it >= config.burn_in_iterations:
            accum += nwk
        if config.checkpoint_dir and (it + 1) % config.checkpoint_every == 0:
            _save_checkpoint(df_z, config.checkpoint_dir, it, nwk, accum, lls, words)

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
