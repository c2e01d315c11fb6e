"""Linear quality classifier for corpus curation.

The CCNet/LLaMA-style curation step: train a tiny classifier to separate
a trusted corpus (wiki/books) from raw crawl using cheap per-doc
features (the ``text.quality_score`` signals), then score EVERY document
and keep the high-scoring tail.  At 100 TB the scoring pass dominates,
so it must be a pure JVM expression — and it is: the fitted model folds
back onto raw features, making ``logreg_score`` a sigmoid of a codegen'd
linear combination (SQL-expressible, broadcast-free, shuffle-free).

Fitting is full-batch gradient descent with the same distributed shape
as ``similarity.kmeans_fit``: weights ride the task closure, each
iteration is ONE job emitting a (d+2)-float partial per partition
(gradient, loss, count — an Arrow matmul per batch), and the driver
reduces P tiny rows and steps.  Features are standardized from a
one-pass moment aggregation so the step size is scale-free; the
returned weights are re-expressed in RAW feature units.  Partials are
summed in partition order, so a fit is bit-deterministic for a fixed
partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["logreg_fit", "logreg_score", "logreg_score_col"]


def logreg_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iterations: int = 100,
    lr: float = 1.0,
    l2: float = 1e-6,
) -> np.ndarray:
    """Fit binary logistic regression; returns ``(d+1,)`` raw-feature
    weights — ``w[0]`` is the intercept, ``w[1:]`` aligns with
    ``feature_cols``.  ``label_col`` must be numeric 0/1.

    Each of the ``iterations`` epochs is one Spark job over the corpus;
    driver traffic per epoch is P·(d+2) floats.
    """
    import pandas as pd
    from collections.abc import Iterator

    from pyspark import TaskContext

    cols = list(feature_cols)
    d = len(cols)
    if d == 0:
        raise ValueError("need at least one feature column")

    moments = df.agg(
        *[F.avg(F.col(c).cast("double")).alias(f"m{i}") for i, c in enumerate(cols)],
        *[
            F.stddev_pop(F.col(c).cast("double")).alias(f"s{i}")
            for i, c in enumerate(cols)
        ],
    ).collect()[0]
    mean = np.array([float(moments[f"m{i}"]) for i in range(d)])
    std = np.array([float(moments[f"s{i}"]) or 0.0 for i in range(d)])
    std = np.where(std > 0, std, 1.0)  # constant feature → contributes 0

    src = df.select(
        *[F.col(c).cast("double").alias(f"x{i}") for i, c in enumerate(cols)],
        F.col(label_col).cast("double").alias("y"),
    )
    w = np.zeros(d + 1)  # [intercept, w_std...] in STANDARDIZED space

    for _ in range(iterations):
        cw = w  # rebind: capture THIS epoch's value in the closure

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            pid = TaskContext.get().partitionId()
            g = np.zeros(d + 1)
            n = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                X = (pdf[[f"x{i}" for i in range(d)]].to_numpy() - mean) / std
                y = pdf["y"].to_numpy()
                p = 1.0 / (1.0 + np.exp(-(X @ cw[1:] + cw[0])))
                err = p - y
                g[0] += err.sum()
                g[1:] += X.T @ err
                n += len(pdf)
            if n:
                yield pd.DataFrame({"pid": [pid], "grad": [g], "n": [n]})

        pdf = (
            src.mapInPandas(partials, schema="pid int, grad array<double>, n long")
            .toPandas()
            .sort_values("pid")
        )
        g = np.zeros(d + 1)
        n = 0
        for row_g, row_n in zip(pdf["grad"], pdf["n"]):
            g += np.asarray(row_g)
            n += int(row_n)
        if n == 0:
            raise ValueError("empty training set")
        reg = np.concatenate([[0.0], l2 * cw[1:]])  # don't penalize intercept
        w = cw - lr * (g / n + reg)

    # Fold standardization back: score(raw x) = b_std + Σ w_i (x_i−μ_i)/σ_i
    out = np.empty(d + 1)
    out[1:] = w[1:] / std
    out[0] = w[0] - float((w[1:] * mean / std).sum())
    return out


def logreg_score_col(weights: np.ndarray, feature_cols: Sequence[str]) -> Column:
    """The scoring expression alone: ``sigmoid(w·x + b)`` as a JVM column
    (rounded 1e-6 for oracle reproducibility)."""
    z: Column = F.lit(float(weights[0]))
    for wi, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(wi)) * F.col(c).cast("double")
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def logreg_score(
    df: DataFrame,
    weights: np.ndarray,
    feature_cols: Sequence[str],
    out_col: str = "score",
) -> DataFrame:
    """Append the classifier score to every row — a pure per-row
    projection (no shuffle, no Python), safe at any corpus size."""
    return df.withColumn(out_col, logreg_score_col(weights, feature_cols))
