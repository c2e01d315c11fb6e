"""Distribution statistics over groups: quantiles and heavy hitters.

Dataset-curation pipelines profile quality signals (doc length, token
counts, scores) per domain/language before choosing filter thresholds;
these operators are that profiling step, with an exact variant for
oracle checks and a sketch variant as the 100 TB path.

- ``group_quantiles`` — exact ``percentile`` (linear interpolation,
  matches ANSI ``percentile_cont``).  Exact quantiles buffer each
  group's values; use for bounded group counts / verification.
- ``approx_group_quantiles`` — ``percentile_approx`` (KLL-style sketch,
  bounded memory per group, map-side combined).  The scale path: one
  shuffle of sketch partials, never of raw values.
- ``frequent_items`` — per-group top-k values by count via a single
  two-key groupBy + rank window.  Exact (unlike count-min), and the
  two-phase shuffle keys (``(group, value)`` then ``group``) keep hot
  groups from serializing through one task until the final k-row rank.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "group_quantiles",
    "approx_group_quantiles",
    "frequent_items",
    "correlation_matrix",
]


def _quantile_agg(fn, value_col: str, qs: Sequence[float]) -> list:
    return [
        fn(value_col, F.lit(q)).alias(f"q{str(q).replace('.', '_')}")
        for q in qs
    ]


def group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact interpolated quantiles of ``value_col`` per group; one
    output column per q, named ``q0_5`` etc."""
    return df.groupBy(*group_cols).agg(
        *_quantile_agg(F.percentile, value_col, qs)
    )


def approx_group_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch-based quantiles (error ≤ 1/accuracy relative rank) —
    same output shape as :func:`group_quantiles`."""
    return df.groupBy(*group_cols).agg(
        *[
            F.percentile_approx(value_col, F.lit(q), F.lit(accuracy)).alias(
                f"q{str(q).replace('.', '_')}"
            )
            for q in qs
        ]
    )


def frequent_items(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` most frequent ``value_col`` values per group:
    ``(*group_cols, value, cnt, rank)``, ties broken by value for
    determinism."""
    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("cnt"), F.col(value_col)
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .withColumnRenamed(value_col, "value")
    )


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlation of numeric columns, long format:
    ``(col_a, col_b, corr)`` for every a < b pair (lexicographic).

    ONE aggregation job computes all d·(d−1)/2 coefficients (each an
    `F.corr` partial — map-side combined, constant state per pair), then
    the 1-row result unpivots driver-free via stack.  Never collects or
    shuffles the data itself, so it holds at any corpus size; cost is
    O(d²) aggregation state, the inherent size of the answer.
    """
    pairs = [
        (a, b) for i, a in enumerate(sorted(cols)) for b in sorted(cols)[i + 1 :]
    ]
    if not pairs:
        raise ValueError("need at least two columns")
    agg = df.agg(
        *[F.corr(a, b).alias(f"__c_{i}") for i, (a, b) in enumerate(pairs)]
    )
    stack_expr = ", ".join(
        f"'{a}', '{b}', round(__c_{i}, 6)" for i, (a, b) in enumerate(pairs)
    )
    return agg.selectExpr(
        f"stack({len(pairs)}, {stack_expr}) as (col_a, col_b, corr)"
    )
