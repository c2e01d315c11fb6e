"""Batch inference (scoring) — the reference's ``infer`` binary (O18).

Per unseen document (``infer.cc:37-101``): drop OOV words, random z-init,
``total_iterations`` frozen-model sweeps, average the per-doc topic
histogram over post-burn-in iterations.  Documents are independent, so
this is a single embarrassingly-parallel ``mapInPandas`` job with the
model broadcast once — no per-iteration sync at all (the reference
streams docs one at a time through a single process).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import kernel
from .corpus import pack_docs
from .model import LDAModel
from .vocab import remap_words

__all__ = ["transform", "write_inference_result"]

_OUT_SCHEMA = "doc_id long, topic_weights array<double>"


def _infer_fn(bc_nwk, bc_nk, alpha: float, beta: float,
              total_iterations: int, burn_in_iterations: int, seed: int):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        rng = kernel.make_rng(seed, pid, 0)
        nwk = bc_nwk.value
        nk = bc_nk.value
        K = nk.shape[0]
        n_avg = total_iterations - burn_in_iterations
        for pdf in batches:
            out = []
            for occ in pdf["word_occ"]:
                occ = np.asarray(occ, dtype=np.int32)
                z = kernel.init_assignments(len(occ), K, rng)
                offsets = np.array([0, len(occ)], dtype=np.int64)
                acc = np.zeros(K, dtype=np.float64)
                for it in range(total_iterations):
                    kernel.sweep_docs(
                        occ, z, offsets, nwk, nk, alpha, beta, rng,
                        update_model=False,
                    )
                    if it >= burn_in_iterations:
                        acc += np.bincount(z, minlength=K)
                out.append(acc / n_avg)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "topic_weights": out})

    return fn


def transform(
    model: LDAModel,
    corpus: DataFrame,
    total_iterations: int = 15,
    burn_in_iterations: int = 10,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """``(doc_id, word, count)`` → ``(doc_id, topic_weights: array<double>)``.

    ``topic_weights`` are the unnormalized averaged θ_d numerators, the
    same quantity ``infer.cc:94-98`` writes.  OOV words are silently
    dropped (``infer.cc:77-80``) by the inner vocab join.
    """
    if not (0 <= burn_in_iterations < total_iterations):
        raise ValueError("need 0 <= burn_in_iterations < total_iterations")
    spark = corpus.sparkSession
    sc = spark.sparkContext
    P = num_partitions or sc.defaultParallelism

    vocab = spark.createDataFrame(
        [(w, i) for i, w in enumerate(model.words)], "word string, word_id long"
    )
    corpus_ids = remap_words(corpus, vocab).select("doc_id", "word_id", "count")
    packed = pack_docs(corpus_ids, P)

    bc_nwk = sc.broadcast(model.nwk.astype(np.float64))
    bc_nk = sc.broadcast(model.nk.astype(np.float64))
    return packed.mapInPandas(
        _infer_fn(
            bc_nwk, bc_nk, model.alpha, model.beta,
            total_iterations, burn_in_iterations, seed,
        ),
        schema=_OUT_SCHEMA,
    )


def write_inference_result(result: DataFrame, path: str, single_file: bool = False) -> None:
    """Text-format parity with ``infer.cc:94-98``: one line per doc, K
    space-separated averaged topic counts, in doc order.

    ``single_file=True`` streams lines through the driver into one plain
    file (the reference's single-process writer shape — used by the
    CLI); the default writes a Spark text directory (the scale path).
    """
    lines = result.orderBy("doc_id").select(
        F.array_join(
            F.transform(
                "topic_weights",
                lambda v: F.when(
                    v == F.floor(v), v.cast("long").cast("string")
                ).otherwise(F.format_number(v, 6)),
            ),
            " ",
        ).alias("value")
    )
    if single_file:
        with open(path, "w", encoding="utf-8") as f:
            for row in lines.toLocalIterator():
                f.write(row["value"] + "\n")
    else:
        lines.coalesce(1).write.mode("overwrite").text(path)
