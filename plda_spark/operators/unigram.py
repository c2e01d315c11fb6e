"""Distributed unigram-LM subword tokenizer (Kudo 2018, the
SentencePiece "unigram" model) — training and Viterbi encoding.

The other public subword algorithm next to BPE (operators/bpe.py): model
a word as a sequence of independent pieces, learn piece probabilities by
EM over all segmentations, prune to the target vocabulary, and encode
with the Viterbi segmentation.  Following the same trick as BPE, all of
it runs over the WORD-FREQUENCY table, never the corpus:

- the corpus is scanned ONCE (tokenize + groupBy) into a
  vocabulary-sized ``(word, n)`` table — every EM iteration after that
  is corpus-size-independent;
- the SEED vocabulary is every substring of length 2..``max_piece_len``
  scored by occurrence-weighted frequency (one JVM explode + map-side
  combined aggregation + deterministic top-k), plus ALL single
  characters (kept unconditionally, so every word always segments);
- each EM iteration is ONE Spark job: piece log-probs broadcast to the
  executors (vocab · ~16 B — a few MB at production vocab sizes), an
  Arrow ``mapInPandas`` pass runs the forward-backward lattice per word
  and emits per-partition partial expected counts (map-side combined in
  the pandas batch), and a groupBy-sum reduces them to ≤ |vocab| rows
  collected on the driver — the k-means/LDA broadcast-mode shape;
- pruning drops the lowest expected-count multi-char pieces by
  ``shrink`` per round until ``vocab_size`` remains (single characters
  are never pruned — Kudo's coverage guarantee).  SentencePiece ranks
  prune candidates by exact likelihood-loss; expected-count ranking is
  the simpler criterion in the same spirit and is documented here as a
  deliberate deviation, not an oversight.

Driver state is the vocabulary only; no stage touches O(corpus) after
the first scan.  The pytest gate checks the distributed trainer against
a pure-Python sequential reference of the identical spec (vocab
bit-equal, probabilities to float tolerance) and Viterbi-encode parity.

Reference: Taku Kudo, "Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates" (ACL 2018).  The
reference repo (an LDA trainer, see SURVEY.md) has no tokenizer surface;
this extends the engine's tokenizer family alongside BPE.
"""

from __future__ import annotations

import math
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["unigram_train", "unigram_encode", "viterbi_segment", "UNK_PENALTY"]

# A character outside the trained vocabulary scores this many nats below
# the worst vocab piece at encode time (training never needs it: every
# training character is in the seed and single chars are never pruned).
UNK_PENALTY = 10.0


def _word_freqs(docs: DataFrame, text_col: str) -> DataFrame:
    """Corpus -> (word, n) — the one corpus-sized scan (BPE's tokenize:
    lowercase runs of [a-z0-9])."""
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda x: F.length(x) > 0,
        )
    ).alias("word")
    return docs.select(toks).groupBy("word").agg(F.count(F.lit(1)).alias("n"))


def _substring_counts(words: DataFrame, max_piece_len: int) -> DataFrame:
    """(piece, cnt): occurrence-weighted counts of every substring of
    length 1..max_piece_len — one nested-transform explode, no Python."""
    # substring(word, i, L) closes over both nested lambda variables —
    # expressed via expr() since the Python lambda DSL shadows the outer
    # loop variable in nested transforms.
    subs = F.expr(
        "flatten(transform(sequence(1, length(word)), i -> "
        f"transform(sequence(1, least({int(max_piece_len)}, length(word) - i + 1)), "
        "L -> substring(word, i, L))))"
    )
    return (
        words.select(F.explode(subs).alias("piece"), "n")
        .groupBy("piece")
        .agg(F.sum("n").alias("cnt"))
    )


def _seed_vocab(
    words: DataFrame, seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Initial piece log-probs: all single characters plus the
    ``seed_size``-best multi-char substrings by (count desc, piece asc),
    probabilities proportional to occurrence-weighted counts."""
    counts = _substring_counts(words, max_piece_len)
    chars = counts.where(F.length("piece") == 1).collect()
    multi = (
        counts.where(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(max(seed_size - len(chars), 0))
        .collect()
    )
    raw = {r["piece"]: float(r["cnt"]) for r in chars}
    raw.update({r["piece"]: float(r["cnt"]) for r in multi})
    if not raw:
        raise ValueError("empty corpus: no tokens to train on")
    total = sum(raw.values())
    return {p: math.log(c / total) for p, c in raw.items()}


def _lattice_expected_counts(
    word: str, freq: float, logp: dict[str, float], max_len: int
) -> tuple[dict[str, float], float]:
    """Forward-backward over the segmentation lattice of one word:
    returns (piece -> expected count · freq, loglik · freq).  Pure
    Python on purpose — called from the Arrow batch loop where words are
    short and the dict lookup dominates; numpy wins nothing here."""
    m = len(word)
    NEG = float("-inf")
    alpha = [NEG] * (m + 1)
    beta = [NEG] * (m + 1)
    alpha[0] = 0.0
    beta[m] = 0.0
    spans: list[tuple[int, int, str, float]] = []
    for i in range(m):
        for j in range(i + 1, min(i + max_len, m) + 1):
            lp = logp.get(word[i:j])
            if lp is not None:
                spans.append((i, j, word[i:j], lp))
    for i, j, _, lp in spans:  # spans are sorted by i: forward pass
        v = alpha[i] + lp
        if v != NEG:
            a = alpha[j]
            alpha[j] = v if a == NEG else max(a, v) + math.log1p(
                math.exp(-abs(a - v))
            )
    for i, j, _, lp in reversed(spans):  # sorted by i desc: backward
        v = beta[j] + lp
        if v != NEG:
            b = beta[i]
            beta[i] = v if b == NEG else max(b, v) + math.log1p(
                math.exp(-abs(b - v))
            )
    z = alpha[m]
    if z == NEG:  # unreachable while single chars are in-vocab
        return {}, 0.0
    out: dict[str, float] = {}
    for i, j, piece, lp in spans:
        post = alpha[i] + lp + beta[j] - z
        if post > -60.0:  # exp underflow guard
            out[piece] = out.get(piece, 0.0) + math.exp(post) * freq
    return out, z * freq


def _em_step(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> tuple[dict[str, float], float]:
    """One distributed E-step: broadcast ``logp``, one mapInPandas pass
    emitting per-batch partial (piece, cnt, ll) rows, one groupBy-sum,
    one ≤ |vocab|-row collect.  Returns (expected counts, loglik)."""
    spark = words.sparkSession
    bc = spark.sparkContext.broadcast((logp, max_piece_len))

    def part(batches: Iterator) -> Iterator:
        import pandas as pd

        lp, mlen = bc.value
        acc: dict[str, float] = {}
        ll = 0.0
        for pdf in batches:
            for word, n in zip(pdf["word"], pdf["n"]):
                cnts, wll = _lattice_expected_counts(word, float(n), lp, mlen)
                ll += wll
                for p, c in cnts.items():
                    acc[p] = acc.get(p, 0.0) + c
        if acc:
            yield pd.DataFrame(
                {"piece": list(acc) + ["\x00ll"], "cnt": list(acc.values()) + [ll]}
            )

    partials = words.mapInPandas(part, schema="piece string, cnt double")
    rows = partials.groupBy("piece").agg(F.sum("cnt").alias("cnt")).collect()
    counts = {r["piece"]: r["cnt"] for r in rows}
    ll = counts.pop("\x00ll", 0.0)
    return counts, ll


def _normalize(counts: dict[str, float]) -> dict[str, float]:
    total = sum(counts.values())
    if total <= 0:
        raise ValueError("EM produced no mass — corpus/vocab mismatch")
    floor = 1e-12 * total  # keep log() finite for never-used pieces
    return {p: math.log(max(c, floor) / total) for p, c in counts.items()}


def unigram_train(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    max_piece_len: int = 8,
    seed_multiplier: int = 4,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> list[tuple[str, float]]:
    """Train a unigram-LM tokenizer; returns ``[(piece, logprob)]``
    sorted by piece (deterministic given the corpus).

    ``vocab_size`` is the target vocabulary (must cover at least the
    corpus alphabet); seeding starts from ``seed_multiplier ×
    vocab_size`` candidate substrings and each pruning round keeps the
    best ``shrink`` fraction (by expected count; single characters are
    exempt) with ``em_iters`` EM iterations in between, then a final
    ``em_iters`` refit — the published training loop with expected-count
    pruning (see module doc).
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if not (0.0 < shrink < 1.0):
        raise ValueError("shrink must be in (0, 1)")
    if max_piece_len < 1 or em_iters < 1 or seed_multiplier < 1:
        raise ValueError("max_piece_len, em_iters, seed_multiplier must be >= 1")
    words = _word_freqs(docs, text_col).localCheckpoint(eager=False)
    logp = _seed_vocab(words, seed_multiplier * vocab_size, max_piece_len)
    n_chars = sum(1 for p in logp if len(p) == 1)
    if vocab_size < n_chars:
        raise ValueError(
            f"vocab_size {vocab_size} cannot cover the corpus alphabet "
            f"({n_chars} characters)"
        )
    counts: dict[str, float] = {}
    while True:
        for _ in range(em_iters):
            counts, _ll = _em_step(words, logp, max_piece_len)
            # pieces the E-step never used keep zero mass; they are the
            # first pruned.  Re-add them so the vocab is stable between
            # iterations (floor handled in _normalize).
            for p in logp:
                counts.setdefault(p, 0.0)
            logp = _normalize(counts)
        if len(logp) <= vocab_size:
            break
        chars = {p for p in logp if len(p) == 1}
        keep_multi = max(
            vocab_size - len(chars),
            int((len(logp) - len(chars)) * shrink),
        )
        ranked = sorted(
            ((p, c) for p, c in counts.items() if p not in chars),
            key=lambda pc: (-pc[1], pc[0]),
        )
        kept = {p for p, _ in ranked[:keep_multi]} | chars
        logp = _normalize({p: counts[p] for p in kept})
    return sorted(logp.items())


def viterbi_segment(
    word: str, logp: dict[str, float], max_len: int, unk_logp: float
) -> list[str]:
    """Best segmentation of ``word`` under the unigram model; ties break
    toward FEWER pieces, then lexicographically-first piece at the last
    split (deterministic).  Characters outside the vocab become
    single-char pieces at ``unk_logp``."""
    m = len(word)
    best: list[tuple[float, int, int]] = [(0.0, 0, 0)] + [
        (float("-inf"), 0, 0)
    ] * m  # (score, n_pieces, split_from)
    for j in range(1, m + 1):
        cand = (float("-inf"), 0, 0)
        for i in range(max(0, j - max_len), j):
            lp = logp.get(word[i:j])
            if lp is None:
                if j - i > 1:
                    continue
                lp = unk_logp
            s, n, _ = best[i]
            c = (s + lp, n + 1, i)
            if cand[0] < c[0] or (
                cand[0] == c[0]
                and (c[1] < cand[1] or (c[1] == cand[1] and i < cand[2]))
            ):
                cand = c
        best[j] = cand
    out: list[str] = []
    j = m
    while j > 0:
        i = best[j][2]
        out.append(word[i:j])
        j = i
    return out[::-1]


def unigram_encode(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Viterbi-encode ``docs`` with a trained vocabulary:
    ``(doc_id, tokens array<string>, n_tokens)`` — one Arrow
    ``mapInPandas`` pass, vocabulary broadcast in the task closure
    (|vocab| · ~16 B), no shuffle."""
    if not vocab:
        raise ValueError("vocab must be non-empty")
    logp = dict(vocab)
    max_len = max(len(p) for p in logp)
    unk = min(logp.values()) - UNK_PENALTY
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast((logp, max_len, unk))
    src = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    def part(batches: Iterator) -> Iterator:
        import re as _re

        import pandas as pd

        lp, mlen, unk_lp = bc.value
        word_re = _re.compile(r"[a-z0-9]+")
        for pdf in batches:
            toks = [
                [
                    piece
                    for w in word_re.findall(str(t).lower())
                    for piece in viterbi_segment(w, lp, mlen, unk_lp)
                ]
                for t in pdf["text"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return src.mapInPandas(
        part, schema="doc_id long, tokens array<string>, n_tokens int"
    )
