"""Positional inverted index + phrase / boolean search.

The classic IR substrate a curation pipeline needs for *phrase-level*
decontamination and benchmark-leak auditing ("does any training doc
contain this exact k-token span?") — a capability the n-gram overlap
operators (``dedup.decontaminate``) approximate but cannot answer
positionally.

Index layout: one row per token — ``(token, df, tf_total,
postings: array<struct<doc_id, positions>>)`` with postings sorted by
``doc_id`` and positions ascending.  Tokenization is the engine-wide
rule (``lda/corpus.py TOKEN_RE`` + min length), so the index is the
positional twin of the LDA vocabulary scan; positions are 0-based
offsets in the FILTERED token sequence.

Scale shape (100 TB): the build is two keyed aggregations —
``(token, doc)`` → positions, then ``token`` → postings — both
map-side combinable; no join, no driver state.  Stopword-class tokens
produce corpus-sized postings rows: cap them with ``df_cap`` (classic
stop-listing by document frequency) or rely on the fact that queries
touch only their own tokens.  Searches filter the index with a literal
``IN`` over the query's tokens — on a token-sorted parquet index that
is row-group pruning, not a scan — then regroup only the surviving
postings (rows ≈ |query tokens| × df).  Nothing in search is
proportional to corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens_col

__all__ = ["build_inverted_index", "phrase_search", "term_search", "rrf_fuse", "rank_eval"]


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    df_cap: int | None = None,
) -> DataFrame:
    """Build the positional index: ``(token, df, tf_total, postings)``.

    ``df_cap`` drops tokens appearing in more than that many documents
    (document-frequency stop-listing — bounds the largest postings row,
    the one skew concern at corpus scale)."""
    if df_cap is not None and df_cap < 1:
        raise ValueError(f"df_cap must be >= 1, got {df_cap}")
    flat = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "token"),
    )
    per_doc = flat.groupBy("token", "doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("positions")
    )
    idx = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum(F.size("positions")).alias("tf_total"),
        F.array_sort(F.collect_list(F.struct("doc_id", "positions"))).alias(
            "postings"
        ),
    )
    if df_cap is not None:
        idx = idx.filter(F.col("df") <= df_cap)
    return idx


def _postings_for(index: DataFrame, tokens: list[str]) -> DataFrame:
    """Flatten the postings of just the query's tokens:
    ``(token, doc_id, positions)``.  The IN-filter is the only contact
    with the (corpus-vocabulary-sized) index."""
    return (
        index.filter(F.col("token").isin(tokens))
        .select("token", F.explode("postings").alias("p"))
        .select(
            "token",
            F.col("p.doc_id").alias("doc_id"),
            F.col("p.positions").alias("positions"),
        )
    )


def phrase_search(index: DataFrame, phrase: list[str]) -> DataFrame:
    """Exact consecutive-phrase matches via positional intersection.

    Slot ``i`` of the phrase contributes the offset-adjusted position
    set ``{p - i}``; a document matches wherever the intersection of
    all slots' adjusted sets is non-empty (the standard positional-
    index phrase algorithm, e.g. Manning et al. IIR §2.4).  Returns
    ``(doc_id, n_matches, first_pos)`` — overlapping occurrences each
    count (positions are distinct, so "x x x" matches "x x" twice).

    Plan: tiny broadcast slots join + ONE groupBy over the phrase
    tokens' postings; the intersection fold is a JVM array expression.
    """
    phrase = [t.lower() for t in phrase]
    if not phrase:
        raise ValueError("phrase must contain at least one token")
    n = len(phrase)
    spark = index.sparkSession
    slots = spark.createDataFrame(
        [(i, t) for i, t in enumerate(phrase)], "slot int, token string"
    )
    per_slot = _postings_for(index, sorted(set(phrase))).join(
        F.broadcast(slots), "token"
    ).select(
        "doc_id",
        "slot",
        F.transform("positions", lambda p: p - F.col("slot")).alias("adj"),
    )
    agged = per_slot.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_slots"),
        F.array_sort(F.collect_list(F.struct("slot", "adj"))).alias("arrs"),
    )
    if n == 1:
        mpos = F.col("arrs")[0]["adj"]
    else:
        mpos = F.aggregate(
            F.slice("arrs", 2, n - 1),
            F.col("arrs")[0]["adj"],
            lambda acc, s: F.array_intersect(acc, s["adj"]),
        )
    return (
        agged.filter(F.col("n_slots") == n)
        .select("doc_id", mpos.alias("mpos"))
        .filter(F.size("mpos") > 0)
        .select(
            "doc_id",
            F.size("mpos").cast("long").alias("n_matches"),
            F.array_min("mpos").cast("long").alias("first_pos"),
        )
    )


def term_search(
    index: DataFrame, terms: list[str], mode: str = "and"
) -> DataFrame:
    """Boolean multi-term search over the index: ``(doc_id,
    n_terms_matched, tf_total)``.  ``mode="and"`` keeps only documents
    containing every distinct term (conjunctive retrieval); ``"or"``
    keeps any match.  Same contact pattern as :func:`phrase_search`:
    an IN-filter on the index, one per-doc aggregation."""
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    uniq = sorted({t.lower() for t in terms})
    if not uniq:
        raise ValueError("terms must contain at least one token")
    agged = (
        _postings_for(index, uniq)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms_matched"),
            F.sum(F.size("positions")).cast("long").alias("tf_total"),
        )
    )
    if mode == "and":
        agged = agged.filter(F.col("n_terms_matched") == len(uniq))
    return agged


def rrf_fuse(
    rankings: DataFrame,
    system_col: str = "system",
    doc_col: str = "doc_id",
    score_col: str = "score",
    query_col: str | None = None,
    k: int = 60,
    top_n: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion of multiple rankers' scored lists
    (Cormack, Clarke & Büttcher 2009) — THE standard hybrid-retrieval
    combiner (lexical BM25 + embedding ANN, or any mix): each system's
    scores reduce to ranks, and a document's fused score is
    ``Σ_systems 1/(k + rank)``.  Rank-space fusion needs no score
    normalization, which is why it beats linear score mixing across
    heterogeneous rankers.

    ``rankings`` is the UNION of the systems' lists: one row per
    (system, doc, score), plus ``query_col`` when fusing per query.
    Ranks break ties on the doc id (deterministic, engine-replayable);
    a document missing from a system's list simply contributes nothing
    for that system.  Returns the ``top_n`` fused docs (per query if
    given): ``([query,] doc, rrf, n_systems)``.

    Scale shape: one rank window PARTITIONED by (query, system) — the
    per-list sort, parallel across queries — one (query, doc)
    aggregation, then a per-query top-n window (or a distributed
    TakeOrdered when fusing a single global list).  Never a global
    sort of the corpus."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    part = [query_col] if query_col else []
    wr = Window.partitionBy(*(part + [system_col])).orderBy(
        F.col(score_col).desc(), F.col(doc_col).asc()
    )
    ranked = rankings.select(
        *part,
        F.col(doc_col).alias("__doc"),
        F.row_number().over(wr).alias("__rnk"),
    )
    fused = ranked.groupBy(*(part + ["__doc"])).agg(
        F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("__rnk"))).alias("__rrf"),
        F.count(F.lit(1)).alias("n_systems"),
    )
    out_cols = [
        *part,
        F.col("__doc").alias(doc_col),
        F.round("__rrf", 6).alias("rrf"),
        "n_systems",
    ]
    if query_col:
        wq = Window.partitionBy(query_col).orderBy(
            F.col("__rrf").desc(), F.col("__doc").asc()
        )
        return (
            fused.withColumn("__r", F.row_number().over(wq))
            .where(F.col("__r") <= top_n)
            .select(*out_cols)
        )
    return (
        fused.orderBy(F.col("__rrf").desc(), F.col("__doc").asc())
        .limit(top_n)
        .select(*out_cols)
    )


def rank_eval(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query retrieval-quality metrics of a ranked ``run`` against
    graded ``qrels`` — the TREC trio (Järvelin & Kekäläinen 2002 for
    nDCG; Voorhees 1999 for MRR; the classic AP): the evaluation step
    that turns "we swapped the retrieval stage" into a number, for
    search/RAG pipelines built on :func:`term_search` / BM25 /
    :func:`rrf_fuse` outputs.

    ``run`` rows are ranked per query by ``(score desc, doc asc)`` — a
    deterministic total order both engines replay.  Metrics per query:

    - ``ndcg_at_k`` — exponential-gain DCG@k ``Σ (2^rel − 1)/log2(r+1)``
      over the run order, normalized by the ideal DCG@k from the
      query's qrels (NULL when the query has no positive qrels);
    - ``mrr`` — reciprocal rank of the first relevant (rel > 0) result
      over the FULL run (NULL when none retrieved);
    - ``ap`` — Σ precision@r at relevant ranks / |relevant in qrels|
      (the full-run convention: misses hurt the denominator).

    Queries present only in ``qrels`` are not emitted (no run = nothing
    to evaluate); run docs missing from qrels count as rel 0.  Returns
    ``(query_id, n_ranked, n_rel, ndcg_at_k, mrr, ap)`` rounded to 6.

    Scale shape: the candidate-list contract shared with
    :func:`rrf_fuse` — ``run`` is a per-query CANDIDATE LIST (a top-k
    retrieval output), so the per-query rank windows are bounded by
    the list length, never corpus-sized; qrels joins are equi-joins on
    (query, doc); everything after the per-query aggregation is
    |queries| rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    r = run.select(
        F.col(query_col).alias("__q"),
        F.col(doc_col).alias("__d"),
        F.col(score_col).cast("double").alias("__s"),
    )
    w = Window.partitionBy("__q").orderBy(
        F.col("__s").desc(), F.col("__d").asc()
    )
    ranked = r.withColumn("__r", F.row_number().over(w))
    # TREC qrels commonly carry duplicate (query, doc) rows from merged
    # assessment rounds; un-deduped they'd fan out the run join and
    # double-count DCG/AP terms — keep the max grade per pair
    qr = (
        qrels.select(
            F.col(query_col).alias("__q"),
            F.col(doc_col).alias("__d"),
            F.col(rel_col).cast("double").alias("__rel"),
        )
        .where(F.col("__rel").isNotNull())
        .groupBy("__q", "__d")
        .agg(F.max("__rel").alias("__rel"))
    )
    j = ranked.join(qr, ["__q", "__d"], "left").withColumn(
        "__rel", F.coalesce(F.col("__rel"), F.lit(0.0))
    )
    wc = (
        Window.partitionBy("__q")
        .orderBy("__r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = j.withColumn(
        "__cum", F.sum((F.col("__rel") > 0).cast("long")).over(wc)
    )
    rr = F.col("__r").cast("double")
    dcg_term = F.when(
        F.col("__r") <= k,
        (F.pow(F.lit(2.0), F.col("__rel")) - 1) / F.log2(rr + 1),
    )
    prec_term = F.when(
        F.col("__rel") > 0, F.col("__cum").cast("double") / rr
    )
    mrr_term = F.when(F.col("__rel") > 0, F.lit(1.0) / rr)
    perq = j.groupBy("__q").agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        F.sum(dcg_term).alias("__dcg"),
        F.sum(prec_term).alias("__apnum"),
        F.max(mrr_term).alias("__mrr"),
    )
    wi = Window.partitionBy("__q").orderBy(
        F.col("__rel").desc(), F.col("__d").asc()
    )
    ideal = (
        qr.where(F.col("__rel") > 0)
        .withColumn("__ir", F.row_number().over(wi))
        .groupBy("__q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rel"),
            F.sum(
                F.when(
                    F.col("__ir") <= k,
                    (F.pow(F.lit(2.0), F.col("__rel")) - 1)
                    / F.log2(F.col("__ir").cast("double") + 1),
                )
            ).alias("__idcg"),
        )
    )
    out = perq.join(ideal, "__q", "left")
    return out.select(
        F.col("__q").alias(query_col),
        "n_ranked",
        F.coalesce(F.col("n_rel"), F.lit(0)).cast("long").alias("n_rel"),
        F.round(
            F.when(
                F.col("__idcg") > 0, F.col("__dcg") / F.col("__idcg")
            ),
            6,
        ).alias("ndcg_at_k"),
        F.round("__mrr", 6).alias("mrr"),
        F.round(
            F.when(
                F.col("n_rel") > 0,
                F.col("__apnum") / F.col("n_rel").cast("double"),
            ),
            6,
        ).alias("ap"),
    )
