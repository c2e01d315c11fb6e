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

__all__ = [
    "apply_filters",
    "mixture_rates",
    "calibrate_scores",
    "dsir_weights",
    "dsir_select",
    "temperature_mixture",
    "ppl_buckets",
    "mixture_drift",
    "token_budget_mixture",
    "embedding_drift",
    "quantile_normalize",
    "winsorize",
    "effective_sample_size",
    "pareto_front_2d",
    "dataset_card",
    "theil_decomposition",
]


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


def _source_shares(
    docs: DataFrame, source_col: str, token_count_col: str | None
) -> DataFrame:
    """``(source, n_tokens, share)`` — ONE map-side-combined aggregation
    to |sources| rows plus a 1-row total broadcast (shared by both
    mixture planners)."""
    tokens = (
        F.col(token_count_col).cast("long")
        if token_count_col
        else F.size(F.split(F.col("text"), r"\s+"))
    )
    per_source = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(tokens).alias("n_tokens")
    )
    total = per_source.agg(F.sum("n_tokens").alias("__total"))
    return per_source.crossJoin(F.broadcast(total)).withColumn(
        "share", F.col("n_tokens") / F.col("__total")
    )


def _realize_rates(shared: DataFrame) -> DataFrame:
    """``(…, share, target)`` → the planner output frame: rate ∝
    target/share normalized so the largest rate is exactly 1 (guarding
    the all-zero-targets case), everything rounded for cross-engine
    hash stability."""
    shared = shared.withColumn("__raw", F.col("target") / F.col("share"))
    mx = shared.agg(F.max("__raw").alias("__mx"))
    return shared.crossJoin(F.broadcast(mx)).select(
        "source",
        "n_tokens",
        F.round("share", 6).alias("share"),
        F.round("target", 6).alias("target"),
        F.round(
            F.when(F.col("__mx") > 0, F.col("__raw") / F.col("__mx")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("rate"),
    )


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
    target = F.coalesce(
        *[
            F.when(F.col("source") == s, F.lit(w))
            for s, w in sorted(norm.items())
        ],
        F.lit(0.0),
    )
    shared = _source_shares(docs, source_col, token_count_col).withColumn(
        "target", target
    )
    return _realize_rates(shared)


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


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    num_buckets: int = 10_000,
    smoothing: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance log-weights (Xie et al., "Data
    Selection for Language Models via Importance Resampling", NeurIPS
    2023 — public paper; no reference-repo counterpart, the reference is
    an LDA trainer).

    Both the raw corpus and the (much smaller) ``target`` exemplar set
    are reduced to hashed-unigram bag-of-words distributions over
    ``num_buckets`` md5 buckets with add-``smoothing`` Laplace
    estimates; each raw document's weight is the log-likelihood ratio

        ``log w(d) = sum_b c_d(b) * (log p_target(b) - log q_raw(b))``

    Resampling raw data proportionally to ``w`` approximates sampling
    from the target distribution.  ``dsir_select`` applies the
    deterministic top-quota variant.

    Returns ``(doc_id, n_toks, dsir_logweight)`` with the weight rounded
    to 6 decimals for cross-engine hash stability.

    Scale shape: tokenization is a per-row projection; the two
    distribution estimates are map-side-combined aggregations producing
    at most ``num_buckets`` rows each, joined into one tiny weight table
    that is **broadcast** to the per-doc bucket counts (the corpus
    shuffles once, on ``(doc_id, bucket)``, for the per-doc counts —
    partial-aggregated before the exchange).  Nothing is ever collected
    to the driver and no corpus-sized table is ever on the build side.
    """
    from plda_spark.lda.corpus import tokenize
    from plda_spark.operators.sampling import hash_bucket

    if num_buckets <= 0:
        raise ValueError("num_buckets must be positive")
    if smoothing <= 0:
        raise ValueError("smoothing must be positive (Laplace estimate)")
    # An empty exemplar set would silently yield NULL weights (the
    # n_tgt scalar goes NULL); fail loudly instead.  One 1-row probe job
    # — negligible next to the corpus pass.
    if target.limit(1).count() == 0:
        raise ValueError("target exemplar set is empty")

    def bucketed(src: DataFrame) -> DataFrame:
        return tokenize(src, text_col=text_col, id_col=id_col).select(
            F.col("doc_id"),
            hash_bucket(F.col("word"), num_buckets).alias("bucket"),
        )

    # Per-doc bucket counts first: the raw-corpus distribution estimate
    # is then derived FROM this aggregate (sum of c by bucket), so the
    # raw corpus is tokenized and md5-hashed exactly once — only the
    # (much smaller) target set gets its own scan.
    per_doc = bucketed(docs).groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    q_raw = per_doc.groupBy("bucket").agg(F.sum("c").alias("c_raw"))
    p_tgt = bucketed(target).groupBy("bucket").agg(F.count(F.lit(1)).alias("c_tgt"))
    n_raw = q_raw.agg(F.sum("c_raw").alias("n_raw"))
    n_tgt = p_tgt.agg(F.sum("c_tgt").alias("n_tgt"))
    b = float(num_buckets)
    weights = (
        q_raw.join(p_tgt, "bucket", "full_outer")
        .crossJoin(F.broadcast(n_raw))
        .crossJoin(F.broadcast(n_tgt))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(smoothing))
                    / (F.col("n_tgt") + F.lit(smoothing * b))
                )
                - F.log(
                    (F.coalesce(F.col("c_raw"), F.lit(0)) + F.lit(smoothing))
                    / (F.col("n_raw") + F.lit(smoothing * b))
                )
            ).alias("lw"),
        )
    )

    return (
        per_doc.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_toks"),
            F.round(F.sum(F.col("c") * F.col("lw")), 6).alias("dsir_logweight"),
        )
    )


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    quota: int,
    num_buckets: int = 10_000,
    smoothing: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic DSIR selection: the ``quota`` raw documents with the
    highest importance log-weight (ties broken by ``doc_id`` so the
    output is partition-invariant).  The paper's Gumbel-top-k resampling
    variant is one extra seeded-noise column on top of this; the
    deterministic form is the hash-stable one.

    Scale shape: ``dsir_weights`` plus a TakeOrdered top-k (per-partition
    heaps, no global sort materialization) and one semi-join back to the
    full rows.  The ``chosen`` side is quota-sized — production quotas
    run to millions of rows, past the broadcast limit — so the join is
    only force-broadcast below a conservative row threshold; above it
    AQE picks the strategy (and will still broadcast when the id table
    fits).
    """
    w = dsir_weights(docs, target, num_buckets, smoothing, text_col, id_col)
    chosen = (
        w.orderBy(F.desc("dsir_logweight"), F.asc("doc_id"))
        .limit(int(quota))
        .select("doc_id", "dsir_logweight")
    ).withColumnRenamed("doc_id", id_col)
    if int(quota) <= 1_000_000:  # ~24 MB of (id, double) rows — safely broadcastable
        chosen = F.broadcast(chosen)
    return docs.join(chosen, id_col, "inner")


def temperature_mixture(
    docs: DataFrame,
    source_col: str,
    temperature: float = 2.0,
    token_count_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled mixture planning: derive target mixture
    weights from the CURRENT token shares as ``target_s ∝
    share_s^(1/T)`` and return the same ``(source, n_tokens, share,
    target, rate)`` frame as :func:`mixture_rates`.

    ``T = 1`` reproduces the natural distribution; ``T → ∞`` approaches
    uniform.  This is the standard recipe for up-weighting low-resource
    domains/languages without hand-picking weights (used for the
    multilingual sampling in the XLM-R and mT5 papers — public work; no
    reference-repo counterpart).  ``rate`` is the deterministic
    down-sampling realization with the largest rate pinned to 1, as in
    :func:`mixture_rates`.

    Scale shape: identical to :func:`mixture_rates` — ONE map-side-
    combined aggregation to |sources| rows, then arithmetic on that tiny
    frame (the exponent and both normalizations are 1-row broadcasts).
    The corpus is never shuffled or collected.
    """
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    scaled = _source_shares(docs, source_col, token_count_col).withColumn(
        "__p", F.pow(F.col("share"), F.lit(1.0 / temperature))
    )
    z = scaled.agg(F.sum("__p").alias("__z"))
    shared = scaled.crossJoin(F.broadcast(z)).withColumn(
        "target", F.col("__p") / F.col("__z")
    )
    return _realize_rates(shared)


def ppl_buckets(
    docs: DataFrame,
    n_buckets: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every doc with the add-k bigram LM (:func:`plda_spark.operators.
    text.lm_score`), then bucket by exact perplexity quantiles —
    the standard stratification for perplexity-based sampling (keep the
    low-perplexity head, downsample the tail).

    Scale shape: deliberately NOT an ``ntile`` global window (a global
    sort single-partitions 100 TB).  Instead ONE aggregation computes
    the ``n_buckets - 1`` exact interpolated cut points, they broadcast
    as a single row, and the bucket id is a per-row comparison count —
    scan + 1-row agg + codegen'd compare.  Cut points round to 4
    decimals so the bucket boundaries are engine-exact (the DuckDB twin
    computes the same ``quantile_cont`` values; rounding removes
    last-ulp interpolation drift).

    Returns ``(doc_id, perplexity, ppl_bucket)`` with buckets 1..n
    (1 = lowest perplexity).  Docs with no bigrams are absent, like
    ``lm_score``.
    """
    from plda_spark.operators.text import lm_score

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    # lm_score already aliases its id column to doc_id, whatever id_col
    # the source used.  The scored frame feeds BOTH the cut-point
    # aggregate and the bucket-assignment scan, so materialize it once —
    # without that the whole bigram-LM pipeline (the dominant cost)
    # would run twice per action.  Lifecycle contract (round 6, after
    # measuring all four options): LAZY ``persist()``.  Within one
    # action the broadcast cut-point subtree populates the cache and
    # the probe scan reads it (single compute); repeated calls on the
    # same input plan-match the same cache entry and skip the LM
    # pipeline entirely.  The entry lives until the session ends or
    # ``spark.catalog.clearCache()`` — one slim 2-column frame per
    # distinct input, the deliberate cost.  The round-5 alternative
    # (``localCheckpoint``) released blocks on plan GC but paid ~1 s of
    # RDD-conversion planning per call, benched 2x slower, and forfeited
    # lineage recovery on executor loss; persist keeps lineage.
    scored = (
        lm_score(docs, text_col=text_col, id_col=id_col)
        .select("doc_id", "perplexity")
        .persist()
    )
    qs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = scored.agg(
        F.transform(
            F.percentile("perplexity", F.array([F.lit(q) for q in qs])),
            lambda x: F.round(x, 4),
        ).alias("__cuts")
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            "doc_id",
            "perplexity",
            (
                F.lit(1)
                + F.size(
                    F.filter(F.col("__cuts"), lambda c: F.col("perplexity") > c)
                )
            ).cast("int").alias("ppl_bucket"),
        )
    )


def mixture_drift(
    before: DataFrame,
    after: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Composition-drift report between two corpus versions — the
    monitoring pass a curation pipeline runs after every filter/dedup
    stage to catch a rule silently gutting one domain or language.

    Per ``group_col`` value: row counts and shares in both versions,
    the share delta, the retention rate (after/before within the
    group), and the group's term of KL(after ‖ before) in nats —
    ``share_after · ln(share_after / share_before)`` (0 when the group
    vanished; groups NEW in ``after`` get null KL since the reference
    share is 0 and the divergence is infinite — surfaced, not hidden).
    ``sum(kl_term)`` over the output is the full divergence.

    Two map-side-combined aggregations + one full-outer join on the
    (small) group key — never touches row data beyond the group column.
    """

    def shares(df: DataFrame, n_name: str, s_name: str) -> DataFrame:
        counts = df.groupBy(F.col(group_col).alias("grp")).agg(
            F.count(F.lit(1)).alias(n_name)
        )
        total = counts.agg(F.sum(n_name).alias("__t"))
        return counts.crossJoin(F.broadcast(total)).select(
            "grp", n_name, (F.col(n_name) / F.col("__t")).alias(s_name)
        )

    b = shares(before, "n_before", "share_before")
    a = shares(after, "n_after", "share_after")
    # eqNullSafe: a NULL group (unlabeled slice) must be ONE row with a
    # real retention, not a vanished-row + new-row pair — the unlabeled
    # slice is exactly what a drift monitor is watching.
    j = (
        b.alias("b")
        .join(a.alias("a"), F.col("b.grp").eqNullSafe(F.col("a.grp")), "full_outer")
        .select(
            F.coalesce(F.col("b.grp"), F.col("a.grp")).alias("grp"),
            F.col("b.n_before").alias("n_before"),
            F.col("a.n_after").alias("n_after"),
            F.col("b.share_before").alias("share_before"),
            F.col("a.share_after").alias("share_after"),
        )
    ).select(
        F.col("grp").alias(group_col),
        F.coalesce("n_before", F.lit(0)).alias("n_before"),
        F.coalesce("n_after", F.lit(0)).alias("n_after"),
        F.coalesce("share_before", F.lit(0.0)).alias("__sb"),
        F.coalesce("share_after", F.lit(0.0)).alias("__sa"),
    )
    kl = F.when(F.col("__sa") == 0, F.lit(0.0)).otherwise(
        F.when(
            F.col("__sb") > 0,
            F.col("__sa") * F.log(F.col("__sa") / F.col("__sb")),
        )  # new group: share_before = 0 -> infinite divergence -> null
    )
    return j.select(
        group_col,
        "n_before",
        "n_after",
        F.round("__sb", 6).alias("share_before"),
        F.round("__sa", 6).alias("share_after"),
        F.round(F.col("__sa") - F.col("__sb"), 6).alias("share_delta"),
        F.round(
            F.when(
                F.col("n_before") > 0, F.col("n_after") / F.col("n_before")
            ),
            6,
        ).alias("retention"),
        F.round(kl, 6).alias("kl_term"),
    )


def token_budget_mixture(
    docs: DataFrame,
    source_col: str,
    budget_tokens: int,
    token_count_col: str,
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Plan per-source sampling rates to hit an ABSOLUTE token budget —
    "give me a 10B-token mix at these weights" — honoring capacity: a
    source whose fair allocation exceeds its corpus SATURATES (rate 1)
    and its unused allocation redistributes to the rest (water-filling).

    Closed form, no iteration: sorted by capacity-per-weight
    ``r_s = tokens_s / w_s`` ascending, the saturated set is a PREFIX,
    and row k saturates iff ``r_k ≤ (B − T_{k-1}) / (W − W_{k-1})``
    (prefix cumulative sums) — each row decides from its own prefix, so
    the whole plan is two windows over the |sources|-row table.  The
    water level θ then prices every unsaturated source's rate
    ``θ·w_s/tokens_s``.

    Returns ``(source, n_tokens, weight, saturated, rate,
    planned_tokens)``; Σ planned_tokens = min(budget, corpus total).
    Scale shape: one map-side-combined aggregation to |sources| rows,
    then windows/arithmetic on that tiny frame — the corpus is never
    shuffled or collected.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    from pyspark.sql import Window

    counts = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count_col).cast("double").alias("n_tokens")
    )
    if weights is not None:
        if any(w <= 0 for w in weights.values()):
            raise ValueError(
                "weights must all be positive (a zero weight would make "
                "the capacity ratio undefined; drop the source instead)"
            )
        wmap = F.create_map(
            *[F.lit(x) for kv in weights.items() for x in kv]
        )
        # missing-weight detection stays IN the plan (raise_error fires
        # at run time) — an eager .count() here would pay a full corpus
        # aggregation at build time and again at materialization,
        # breaking the planners' lazy contract.
        counts = counts.withColumn(
            "__w",
            F.coalesce(
                wmap[F.col("source")],
                F.raise_error(
                    F.concat(
                        F.lit("token_budget_mixture: no weight for source "),
                        F.col("source"),
                    )
                ).cast("double"),
            ),
        )
    else:
        # natural mix: weight = the source's own tokens; empty sources
        # carry no capacity and no weight — omit them (their rate is
        # vacuous, and 0/0 would poison the capacity ratio)
        counts = counts.withColumn("__w", F.col("n_tokens")).where(
            F.col("n_tokens") > 0
        )
    tot = counts.agg(F.sum("__w").alias("__w_all"))
    b = F.lit(float(budget_tokens))
    staged = counts.crossJoin(F.broadcast(tot)).withColumn(
        "__r", F.col("n_tokens") / F.col("__w")
    )
    w_ord = Window.orderBy(F.asc("__r"), F.asc("source"))
    staged = staged.select(
        "*",
        (F.sum("n_tokens").over(w_ord) - F.col("n_tokens")).alias("__t_prev"),
        (F.sum("__w").over(w_ord) - F.col("__w")).alias("__w_prev"),
    ).withColumn(
        "saturated",
        F.col("__r") * (F.col("__w_all") - F.col("__w_prev"))
        <= (b - F.col("__t_prev")),
    )
    unsat_w = F.coalesce(
        F.sum(F.when(~F.col("saturated"), F.col("__w"))), F.lit(0.0)
    )
    level = staged.agg(
        F.when(
            unsat_w > 0,
            (
                b
                - F.coalesce(
                    F.sum(F.when(F.col("saturated"), F.col("n_tokens"))),
                    F.lit(0.0),
                )
            )
            / unsat_w,
        )
        .otherwise(F.lit(0.0))  # every source saturated: theta unused
        .alias("__theta")
    )
    out = staged.crossJoin(F.broadcast(level)).select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("__w") / F.col("__w_all"), 6).alias("weight"),
        "saturated",
        F.round(
            F.when(F.col("saturated"), F.lit(1.0)).otherwise(
                F.col("__theta") * F.col("__w") / F.col("n_tokens")
            ),
            6,
        ).alias("rate"),
        F.round(
            F.when(F.col("saturated"), F.col("n_tokens")).otherwise(
                F.col("__theta") * F.col("__w")
            ),
            2,
        ).alias("planned_tokens"),
    )
    return out


def embedding_drift(
    before: DataFrame,
    after: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
) -> DataFrame:
    """EMBEDDING-SPACE drift between two corpus versions, per group:
    the semantic sibling of :func:`composition_drift` (which tracks
    count shares) — a group can keep its share while its CONTENT moves,
    and the centroid direction is the cheap first-moment witness of
    that move (the monitor retrieval/curation teams check before
    re-training on a refreshed corpus).

    Returns ``(group, n_before, n_after, centroid_cosine)`` — cosine
    between the group's element-wise mean vectors, rounded to 6; null
    when the group is absent on either side (or a centroid is zero).

    Scale shape: each side is ONE posexplode + (group, dim-index)
    average — map-side-combined partials, dim·rows exploded once, never
    the vectors joined row-to-row; the centroid tables are
    |groups|·dim rows, joined on their natural key.  Entirely JVM and
    SQL-expressible.
    """

    def centroids(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(
                F.col(group_col).alias("grp"),
                F.posexplode(F.col(vec_col)).alias("i", "v"),
            )
            .groupBy("grp", "i")
            .agg(
                F.avg(F.col("v").cast("double")).alias(f"c_{tag}"),
                F.count(F.lit(1)).alias(f"n_{tag}"),
            )
        )

    b, a = centroids(before, "b"), centroids(after, "a")
    joined = b.join(a, ["grp", "i"], "full_outer")
    dot = F.sum(F.col("c_b") * F.col("c_a"))
    nb = F.sqrt(F.sum(F.col("c_b") * F.col("c_b")))
    na = F.sqrt(F.sum(F.col("c_a") * F.col("c_a")))
    return joined.groupBy("grp").agg(
        F.max("n_b").alias("n_before"),
        F.max("n_a").alias("n_after"),
        F.round(
            F.when((nb > 0) & (na > 0), dot / (nb * na)), 6
        ).alias("centroid_cosine"),
    ).select(
        F.col("grp").alias("group"), "n_before", "n_after", "centroid_cosine"
    )


def quantile_normalize(
    docs: DataFrame,
    score_col: str,
    group_col: str,
    n_cuts: int = 100,
    out_col: str = "normalized",
    mode: str = "exact",
) -> DataFrame:
    """Cross-source QUANTILE NORMALIZATION: map each document's score
    to the POOLED corpus value at its within-source percentile — the
    step beyond :func:`calibrate_scores` (which outputs ranks in
    [0, 1]): here every source's distribution is reshaped onto the
    pooled one, so normalized scores keep the pooled scale and units
    and one global threshold means the same thing everywhere (the
    microarray quantile-normalization recipe, Bolstad et al. 2003,
    applied to quality scores).

    Mechanics: within-source ``percent_rank`` p, then linear
    interpolation into the pooled quantile table — ``n_cuts + 1``
    pooled cut points computed in ONE aggregation and broadcast as a
    literal-free array (the |cuts|-sized table is the only thing that
    moves).  ``mode="exact"`` uses exact pooled percentiles (oracle-
    checkable; buffers values in the aggregation — verification scale),
    ``mode="approx"`` uses ``percentile_approx`` sketches (bounded
    memory — the 100 TB path; same downstream arithmetic).

    Appends ``out_col``; other columns pass through.  Scale shape: one
    window shuffle on the source key (the calibrate_scores contract)
    plus one 1-row broadcast."""
    from pyspark.sql import Window

    if n_cuts < 1:
        raise ValueError(f"n_cuts must be >= 1, got {n_cuts}")
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    qs = [i / n_cuts for i in range(n_cuts + 1)]
    val = F.col(score_col).cast("double")
    if mode == "exact":
        agg = F.percentile(val, F.array(*[F.lit(q) for q in qs]))
    else:
        agg = F.percentile_approx(
            val, F.array(*[F.lit(q) for q in qs]), F.lit(10_000)
        )
    cuts = docs.agg(agg.alias("__cuts"))
    w = Window.partitionBy(group_col).orderBy(val)
    ranked = docs.withColumn("__p", F.percent_rank().over(w)).crossJoin(
        F.broadcast(cuts)
    )
    # interpolate: idx = p * n_cuts, between cut[floor] and cut[floor+1]
    scaled = F.col("__p") * F.lit(float(n_cuts))
    lo = F.floor(scaled).cast("int")
    frac = scaled - lo
    lo1 = F.least(lo + 1, F.lit(n_cuts))
    interp = F.element_at(F.col("__cuts"), lo + 1) * (F.lit(1.0) - frac) + (
        F.element_at(F.col("__cuts"), lo1 + 1) * frac
    )
    return ranked.withColumn(out_col, F.round(interp, 6)).drop("__p", "__cuts")


def winsorize(
    docs: DataFrame,
    value_col: str,
    group_col: str | None = None,
    lo: float = 0.01,
    hi: float = 0.99,
    out_col: str = "winsorized",
    mode: str = "exact",
) -> DataFrame:
    """Winsorize a signal: clip values outside the [lo, hi] percentile
    band to the band's edges — the standard outlier treatment before a
    mean/std-based quality threshold (a single 10 MB document otherwise
    owns the length statistics of its whole source).

    Per-``group_col`` percentiles when given (each source clipped
    against its own distribution), pooled otherwise.  ``mode="exact"``
    uses exact interpolated percentiles (oracle-checkable),
    ``mode="approx"`` the KLL sketch (bounded memory — corpus scale).

    Appends ``out_col`` (rounded to 6); all columns pass through.
    Scale shape: ONE percentile aggregation producing a |groups|-row
    (or 1-row) table broadcast back — the input is never sorted or
    re-shuffled."""
    if not (0.0 <= lo < hi <= 1.0):
        raise ValueError(f"need 0 <= lo < hi <= 1, got ({lo}, {hi})")
    if mode not in ("exact", "approx"):
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    val = F.col(value_col).cast("double")
    fn = F.percentile if mode == "exact" else (
        lambda c, q: F.percentile_approx(c, q, F.lit(10_000))
    )
    aggs = [
        fn(val, F.lit(lo)).alias("__plo"),
        fn(val, F.lit(hi)).alias("__phi"),
    ]
    if group_col is None:
        cuts = docs.agg(*aggs)
        joined = docs.crossJoin(F.broadcast(cuts))
    else:
        cuts = docs.groupBy(group_col).agg(*aggs)
        joined = docs.join(F.broadcast(cuts), group_col)
    clipped = F.least(F.greatest(val, F.col("__plo")), F.col("__phi"))
    return joined.withColumn(out_col, F.round(clipped, 6)).drop(
        "__plo", "__phi"
    )


def effective_sample_size(
    weighted: DataFrame,
    weight_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Kish effective sample size of an importance-weighted corpus:
    ``ESS = (Σw)² / Σw²`` — the one-number answer to "after DSIR/
    quality weighting, how many INDEPENDENT documents is this really
    worth?" (a corpus of 1M docs where 10 carry all the weight trains
    like a corpus of ~10).  Reported per ``group_col`` when given,
    pooled otherwise, with the ratio ``ess / n`` (1 = uniform weights,
    → 0 = degenerate concentration).

    Returns ``(group?, n, weight_sum, ess, ess_ratio)`` rounded to 4.
    Scale shape: ONE map-side-combined aggregation — two sums and a
    count; nothing else touches the data."""
    w = F.col(weight_col).cast("double")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(w).alias("sw"),
        F.sum(w * w).alias("sww"),
    ]
    per = (
        weighted.groupBy(group_col).agg(*aggs)
        if group_col is not None
        else weighted.agg(*aggs)
    )
    ess = F.when(F.col("sww") > 0, F.col("sw") * F.col("sw") / F.col("sww"))
    cols = [group_col] if group_col is not None else []
    return per.select(
        *cols,
        "n",
        F.round("sw", 4).alias("weight_sum"),
        F.round(ess, 4).alias("ess"),
        F.round(ess / F.col("n"), 4).alias("ess_ratio"),
    )


def pareto_front_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str = "doc_id",
    max_distinct: int = 100_000,
) -> DataFrame:
    """2-D Pareto frontier (the SKYLINE operator, Börzsönyi et al.
    ICDE'01) maximizing BOTH columns: keep every row no other row
    weakly dominates — the multi-criteria selection primitive ("the
    longest AND most lexically rich documents", "cheapest AND
    freshest") that single-score ranking flattens away.

    A row is dominated iff another row is ≥ in both coordinates and >
    in at least one; duplicate (x, y) points on the frontier all
    survive.  In 2-D the frontier is the classic sort-scan: per-x max
    y, then a running exclusive max over x DESCENDING — a pair
    survives iff its y strictly exceeds every higher-x max.  (To
    MINIMIZE a column, negate it upstream.)

    Returns the input row's ``(id, x, y)`` for every frontier member.

    Scale shape: one (x) aggregation, ONE ordered window over the
    |distinct x| frame, one join back to recover ids — the
    :func:`~plda_spark.operators.stats.ks_test` bounded-cardinality
    contract, ENFORCED by the ``max_distinct`` pre-check on x
    (quantize continuous criteria upstream; a grid-partitioned
    skyline is the unbounded-domain alternative, deliberately not
    fused in)."""
    from pyspark.sql import Window

    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    clean = df.where(x.isNotNull() & y.isNotNull()).select(
        F.col(id_col).alias("id"), x.alias("x"), y.alias("y")
    )
    ndv = clean.agg(F.approx_count_distinct("x").alias("__ndv")).first()[
        "__ndv"
    ]
    if ndv > max_distinct:
        raise ValueError(
            f"pareto_front_2d: {x_col!r} has ~{ndv} distinct values > "
            f"max_distinct={max_distinct}; quantize upstream (the "
            "frontier scan is one ordered window over distinct x)."
        )
    perx = clean.groupBy("x").agg(F.max("y").alias("ymax"))
    wprev = Window.orderBy(F.col("x").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    front = (
        perx.withColumn("__prev", F.max("ymax").over(wprev))
        .where(F.col("__prev").isNull() | (F.col("ymax") > F.col("__prev")))
        .select("x", F.col("ymax").alias("y"))
    )
    return clean.join(front, ["x", "y"]).select(
        F.col("id").alias(id_col),
        F.col("x").alias(x_col),
        F.col("y").alias(y_col),
    )


def dataset_card(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    source_col: str = "source",
) -> DataFrame:
    """One-row dataset card (the quantitative half of Gebru et al.
    2021's "Datasheets for Datasets"): corpus size, exact-duplicate
    rate, token volume, and language/source composition — the summary
    a release review reads FIRST, before any per-operator audit.

    Returns ONE row ``(n_docs, n_null_text, n_distinct_texts,
    exact_dup_rate, total_tokens, mean_tokens, n_langs, top_lang,
    top_lang_share, n_sources, top_source, top_source_share)``
    rounded to 6.  The duplicate rate is md5-of-text exact (the
    :mod:`dedup` exact criterion) with NULL text counted as its OWN
    distinct value (so missing text surfaces as ``n_null_text``
    instead of silently inflating the dup rate); tokens are the
    shared ``tokens_col`` convention (NULL text contributes zero
    tokens and is reported, not hidden).  NULL langs/sources group as
    NULL and can win top share — a mostly-unlabeled corpus SHOULD say
    so.

    Scale shape: ONE corpus aggregation (token count + md5-distinct,
    map-side combined where possible) + one |langs| and one |sources|
    aggregation with bounded top-1 argmins, met in broadcast cross
    joins of 1-row frames.  Nothing unbounded survives any stage."""
    from plda_spark.operators.text import tokens_col

    base = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.col(text_col).isNull().cast("long")
        ).cast("long").alias("n_null_text"),
        # NULL text coalesces to a sentinel no real md5 hex collides
        # with, so missing text is ONE distinct value, not dropped
        F.countDistinct(
            F.coalesce(F.md5(F.col(text_col)), F.lit("__null_text__"))
        ).alias("n_distinct_texts"),
        F.sum(F.size(tokens_col(text_col))).cast("long").alias(
            "total_tokens"
        ),
    )
    langs = docs.groupBy(F.col(lang_col).alias("__l")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    top_lang = langs.orderBy(
        F.col("__c").desc(), F.col("__l").asc_nulls_last()
    ).limit(1)
    n_langs = langs.agg(F.count(F.lit(1)).alias("n_langs"))
    sources = docs.groupBy(F.col(source_col).alias("__s")).agg(
        F.count(F.lit(1)).alias("__cs")
    )
    top_source = sources.orderBy(
        F.col("__cs").desc(), F.col("__s").asc_nulls_last()
    ).limit(1)
    n_sources = sources.agg(F.count(F.lit(1)).alias("n_sources"))
    n = F.col("n_docs").cast("double")
    return (
        base.crossJoin(F.broadcast(n_langs))
        .crossJoin(F.broadcast(top_lang))
        .crossJoin(F.broadcast(n_sources))
        .crossJoin(F.broadcast(top_source))
        .select(
            "n_docs",
            "n_null_text",
            "n_distinct_texts",
            F.round(
                F.lit(1.0) - F.col("n_distinct_texts") / n, 6
            ).alias("exact_dup_rate"),
            "total_tokens",
            F.round(F.col("total_tokens") / n, 6).alias("mean_tokens"),
            F.col("n_langs").cast("long").alias("n_langs"),
            F.col("__l").alias("top_lang"),
            F.round(F.col("__c") / n, 6).alias("top_lang_share"),
            F.col("n_sources").cast("long").alias("n_sources"),
            F.col("__s").alias("top_source"),
            F.round(F.col("__cs") / n, 6).alias("top_source_share"),
        )
    )


def theil_decomposition(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Theil T inequality index of ``value_col``, DECOMPOSED between
    and within groups (Theil 1967): unlike Gini, T is additively
    decomposable — ``T = T_between + Σ_g share_g·T_g`` exactly — so
    it answers the question corpus reviews actually ask: "is our
    token-volume inequality driven BY source imbalance, or is it
    inside the sources?".  The between term is maximal when sources
    have very different means; the within terms localize skew to the
    slice that owns it.

    Non-positive values are dropped (ln); all terms come from the
    closed forms ``T_g = (Σ_g x·ln x)/X_g − ln μ_g`` and
    ``T_between = Σ_g (X_g/X)·ln(μ_g/μ)``.  Returns one row per
    group ``(group, n, value_share, mean_value, theil_within_g)``
    plus the identical decomposition columns on every row
    ``(theil_total, theil_between, theil_within)`` — verify
    ``theil_total = theil_between + theil_within`` to machine
    precision.

    Scale shape: ONE group-keyed aggregation carrying (n, Σx,
    Σ x·ln x) per group — map-side combined, |groups| rows survive —
    then the totals are the groups' sums (broadcast 1-row) and every
    term is a scalar identity.  No second pass over rows."""
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull() & (x > 0)).select(
        F.col(group_col).alias("__g"), x.alias("__x")
    )
    per = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__x") * F.log("__x")).alias("__sxl"),
    )
    tot = per.agg(
        F.sum("__n").alias("__tn"),
        F.sum("__sx").alias("__tsx"),
        F.sum("__sxl").alias("__tsxl"),
    )
    j = per.crossJoin(F.broadcast(tot))
    mu_g = F.col("__sx") / F.col("__n")
    mu = F.col("__tsx") / F.col("__tn")
    share = F.col("__sx") / F.col("__tsx")
    t_g = F.col("__sxl") / F.col("__sx") - F.log(mu_g)
    t_total = F.col("__tsxl") / F.col("__tsx") - F.log(mu)
    staged = j.select(
        "__g",
        "__n",
        share.alias("__share"),
        mu_g.alias("__mu_g"),
        t_g.alias("__tg"),
        t_total.alias("__tt"),
        (share * F.log(mu_g / mu)).alias("__bterm"),
        (share * t_g).alias("__wterm"),
    )
    decomp = staged.agg(
        F.sum("__bterm").alias("__tb"),
        F.sum("__wterm").alias("__tw"),
    )
    return (
        staged.crossJoin(F.broadcast(decomp))
        .select(
            F.col("__g").alias("group"),
            F.col("__n").cast("long").alias("n"),
            F.round("__share", 6).alias("value_share"),
            F.round("__mu_g", 6).alias("mean_value"),
            F.round("__tg", 6).alias("theil_within_g"),
            F.round("__tt", 6).alias("theil_total"),
            F.round("__tb", 6).alias("theil_between"),
            F.round("__tw", 6).alias("theil_within"),
        )
    )
