"""Filter-pipeline curation with an audit trail.

Corpus curation applies a stack of quality rules (length bounds,
repetition caps, language allowlists, contamination flags) and must
report how many documents each rule rejected — both for tuning
thresholds and for the dataset datasheet.  Naively that is one count
job per rule; ``apply_filters`` instead evaluates every rule as a
boolean column and gets all reject counts plus the survivor count in a
SINGLE aggregation pass (map-side combined, one scan), then returns the
survivors as a lazily-filtered view of the input (second scan only when
the survivors are consumed; at 100 TB both passes are embarrassingly
parallel scans with full pushdown).

Rules are plain Column predicates (True = keep), so any engine
expression — including outputs of :mod:`plda_spark.operators.text`
signals — composes without UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_filters", "mixture_rates", "calibrate_scores"]


def apply_filters(
    docs: DataFrame, rules: Sequence[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """``(survivors, audit)`` for an AND-composed rule stack.

    ``audit`` has one row per rule — ``(rule, n_rejected, n_rejected_solely)``:

    - ``n_rejected`` — docs failing this rule (regardless of others),
      the signal for threshold tuning;
    - ``n_rejected_solely`` — docs ONLY this rule rejects, the rule's
      marginal contribution (what you'd regain by dropping it);

    plus a final ``__kept__`` row carrying the survivor count.
    """
    if not rules:
        raise ValueError("apply_filters needs at least one rule")
    flags = [p.cast("boolean").alias(f"__f{i}") for i, (_, p) in enumerate(rules)]
    flagged = docs.select("*", *flags)
    fcols = [F.col(f"__f{i}") for i in range(len(rules))]
    # coalesce(False): a NULL predicate (e.g. comparison against NULL
    # text) must count as a reject, not vanish from both tallies.
    keeps = [F.coalesce(c, F.lit(False)) for c in fcols]
    n_fail = [F.sum(F.when(~k, 1).otherwise(0)) for k in keeps]
    all_others = [
        F.aggregate(
            F.array(*[o for j, o in enumerate(keeps) if j != i]),
            F.lit(True),
            lambda acc, x: acc & x,
        )
        if len(rules) > 1
        else F.lit(True)
        for i in range(len(rules))
    ]
    n_sole = [
        F.sum(F.when(~k & oth, 1).otherwise(0))
        for k, oth in zip(keeps, all_others)
    ]
    kept_all = F.aggregate(F.array(*keeps), F.lit(True), lambda a, x: a & x)
    row = flagged.agg(
        *[c.alias(f"nf{i}") for i, c in enumerate(n_fail)],
        *[c.alias(f"ns{i}") for i, c in enumerate(n_sole)],
        F.sum(F.when(kept_all, 1).otherwise(0)).alias("nkept"),
    ).collect()[0]
    spark = docs.sparkSession
    audit = spark.createDataFrame(
        [
            (name, int(row[f"nf{i}"] or 0), int(row[f"ns{i}"] or 0))
            for i, (name, _) in enumerate(rules)
        ]
        + [("__kept__", int(row["nkept"] or 0), 0)],
        "rule string, n_rejected long, n_rejected_solely long",
    )
    survivor_pred = rules[0][1].cast("boolean")
    for _, p in rules[1:]:
        survivor_pred = survivor_pred & p.cast("boolean")
    survivors = docs.where(F.coalesce(survivor_pred, F.lit(False)))
    return survivors, audit


def mixture_rates(
    docs: DataFrame,
    source_col: str,
    target_weights: dict[str, float],
    token_count_col: str | None = None,
) -> DataFrame:
    """Domain-mixture planning: given target mixture weights per source
    (the "30% web, 30% code, 40% books" recipe every pretraining corpus
    is built from), compute each source's current token share and the
    deterministic DOWN-sampling rate that realizes the target mixture
    without upsampling any source.

    ``rate_s ∝ target_s / share_s``, normalized so the largest rate is
    exactly 1 (that source is taken whole; everything else downsamples
    proportionally).  Sources absent from ``target_weights`` get weight
    0 (rate 0 — dropped).  Weights are normalized to sum to 1.

    Returns ``(source, n_tokens, share, target, rate)``, all rounded to
    6 decimals for cross-engine hash stability.  Feed ``rate`` into
    ``sampling.stratified_hash_sample`` (as per-source percentages) for
    the deterministic realization pass.

    Scale shape: ONE map-side-combined aggregation over the corpus
    (token sums per source — |sources| rows), then pure arithmetic on
    that tiny frame; the rate normalization is a 1-row max broadcast
    back.  The corpus itself is never shuffled or collected.
    """
    if not target_weights:
        raise ValueError("target_weights must be non-empty")
    wsum = float(sum(target_weights.values()))
    if wsum <= 0:
        raise ValueError("target_weights must sum to a positive value")
    norm = {k: v / wsum for k, v in target_weights.items()}
    tokens = (
        F.col(token_count_col).cast("long")
        if token_count_col
        else F.size(F.split(F.col("text"), r"\s+"))
    )
    per_source = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(tokens).alias("n_tokens")
    )
    total = per_source.agg(F.sum("n_tokens").alias("__total"))
    target = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(w))
            for s, w in sorted(norm.items())
        ],
        F.lit(0.0),
    ) if norm else F.lit(0.0)
    shared = (
        per_source.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("n_tokens") / F.col("__total"))
        .withColumn("target", target)
        .withColumn("__raw", F.col("target") / F.col("share"))
    )
    mx = shared.agg(F.max("__raw").alias("__mx"))
    return (
        shared.crossJoin(F.broadcast(mx))
        .select(
            "source",
            "n_tokens",
            F.round("share", 6).alias("share"),
            F.round("target", 6).alias("target"),
            F.round(
                F.when(F.col("__mx") > 0, F.col("__raw") / F.col("__mx"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("rate"),
        )
    )


def calibrate_scores(
    docs: DataFrame,
    score_col: str,
    group_col: str,
    out_col: str = "calibrated",
) -> DataFrame:
    """Cross-domain score calibration: replace each document's raw score
    with its percentile rank WITHIN its domain (``percent_rank``, ties
    share a rank; 0 = domain minimum, 1 = domain maximum).

    Quality scores are not comparable across domains — a length-based
    or classifier score that means "good" for web text means something
    else for code — so a single global threshold over raw scores skews
    the mixture.  Calibrating to within-domain percentiles makes ONE
    threshold select the same fraction everywhere (the common fix before
    a global quality cutoff).

    Appends ``out_col`` (double in [0, 1]); all input columns pass
    through.  Scale shape: one shuffle on the domain key and a per-key
    sort — the standard windowed-operator contract (domains are few and
    large: this is the one operator family where a genuinely monstrous
    single domain should be range-partitioned by score first; the
    percentile is then a prefix-count, same math, two aggregations).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(score_col))
    return docs.withColumn(out_col, F.percent_rank().over(w))
