"""Unigram-LM tokenizer (operators/unigram.py): distributed trainer vs
an INDEPENDENT pure-Python reference of the identical spec — the
reference computes EM expected counts by enumerating EVERY segmentation
of every word (exponential, fine at test scale), so it shares no lattice
code with the module under test."""

import math
import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from plda_spark.operators import unigram as ug

CORPUS = [
    "the lowering river flows lower and lower",
    "new newer newest renewing the news",
    "a widow窗 widened the window widely",  # non-ascii char is dropped by tokenize
    "renew the lowering window news flow",
    "the the the widest river news",
]


def _docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(CORPUS)]
    )


# ---------- independent sequential reference (same spec) ----------


def _ref_word_freqs(texts):
    freqs = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


def _ref_seed(freqs, seed_size, max_len):
    cnt = {}
    for w, n in freqs.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_len, len(w)) + 1):
                cnt[w[i:j]] = cnt.get(w[i:j], 0) + n
    chars = {p: c for p, c in cnt.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(seed_size - len(chars), 0)]
    raw = dict(chars)
    raw.update(dict(multi))
    total = sum(raw.values())
    return {p: math.log(c / total) for p, c in raw.items()}


def _ref_segmentations(word, vocab, max_len):
    """Every way to split ``word`` into in-vocab pieces."""
    if word == "":
        return [[]]
    out = []
    for L in range(1, min(max_len, len(word)) + 1):
        head = word[:L]
        if head in vocab:
            for rest in _ref_segmentations(word[L:], vocab, max_len):
                out.append([head] + rest)
    return out


def _ref_em_counts(freqs, logp, max_len):
    counts = {}
    for w, n in freqs.items():
        segs = _ref_segmentations(w, logp, max_len)
        probs = [math.exp(sum(logp[p] for p in seg)) for seg in segs]
        z = sum(probs)
        for seg, pr in zip(segs, probs):
            for piece in seg:
                counts[piece] = counts.get(piece, 0.0) + n * pr / z
    return counts


def _ref_normalize(counts):
    total = sum(counts.values())
    floor = 1e-12 * total
    return {p: math.log(max(c, floor) / total) for p, c in counts.items()}


def _ref_train(texts, vocab_size, max_len=4, seed_multiplier=4, em_iters=2,
               shrink=0.75):
    freqs = _ref_word_freqs(texts)
    logp = _ref_seed(freqs, seed_multiplier * vocab_size, max_len)
    counts = {}
    while True:
        for _ in range(em_iters):
            counts = _ref_em_counts(freqs, logp, max_len)
            for p in logp:
                counts.setdefault(p, 0.0)
            logp = _ref_normalize(counts)
        if len(logp) <= vocab_size:
            break
        chars = {p for p in logp if len(p) == 1}
        keep_multi = max(
            vocab_size - len(chars), int((len(logp) - len(chars)) * shrink)
        )
        ranked = sorted(
            ((p, c) for p, c in counts.items() if p not in chars),
            key=lambda pc: (-pc[1], pc[0]),
        )
        kept = {p for p, _ in ranked[:keep_multi]} | chars
        logp = _ref_normalize({p: counts[p] for p in kept})
    return sorted(logp.items())


# ---------- parity + behavior ----------


def test_train_matches_sequential_reference(spark):
    got = ug.unigram_train(
        _docs(spark), vocab_size=40, max_piece_len=4, em_iters=2
    )
    want = _ref_train(CORPUS, vocab_size=40, max_len=4, em_iters=2)
    assert [p for p, _ in got] == [p for p, _ in want]
    for (gp, gl), (_, wl) in zip(got, want):
        assert gl == pytest.approx(wl, abs=1e-9), gp
    # target respected, alphabet fully covered
    assert len(got) <= 40
    alphabet = {c for w in _ref_word_freqs(CORPUS) for c in w}
    assert alphabet <= {p for p, _ in got if len(p) == 1}


def test_train_seed_already_small_skips_pruning(spark):
    # huge target: vocab = full seed after refit, still reference-equal
    got = ug.unigram_train(
        _docs(spark), vocab_size=500, max_piece_len=3, em_iters=1
    )
    want = _ref_train(CORPUS, vocab_size=500, max_len=3, em_iters=1)
    assert [p for p, _ in got] == [p for p, _ in want]


def test_encode_viterbi_and_unk(spark):
    vocab = ug.unigram_train(_docs(spark), vocab_size=40, max_piece_len=4)
    logp = dict(vocab)
    max_len = max(len(p) for p in logp)
    unk = min(logp.values()) - ug.UNK_PENALTY
    enc = ug.unigram_encode(_docs(spark), vocab).orderBy("doc_id").collect()
    assert len(enc) == len(CORPUS)
    for r in enc:
        words = re.findall(r"[a-z0-9]+", CORPUS[r["doc_id"]].lower())
        want = [
            p for w in words for p in ug.viterbi_segment(w, logp, max_len, unk)
        ]
        assert list(r["tokens"]) == want
        assert r["n_tokens"] == len(want)
        # segmentation is lossless: pieces re-concatenate to the words
        assert "".join(r["tokens"]) == "".join(words)

    # a char never seen in training ("7") comes through as a 1-char piece
    oov = spark.createDataFrame([Row(doc_id=0, text="news 777 flow")])
    toks = ug.unigram_encode(oov, vocab).collect()[0]["tokens"]
    assert "7" in toks and "".join(toks) == "news777flow"


def test_em_increases_likelihood(spark):
    docs = _docs(spark)
    words = ug._word_freqs(docs, "text").localCheckpoint(eager=False)
    logp = ug._seed_vocab(words, 160, 4)
    lls = []
    for _ in range(3):
        counts, ll = ug._em_step(words, logp, 4)
        lls.append(ll)
        for p in logp:
            counts.setdefault(p, 0.0)
        logp = ug._normalize(counts)
    assert lls[1] >= lls[0] - 1e-9 and lls[2] >= lls[1] - 1e-9


def test_validation_raises(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="vocab_size"):
        ug.unigram_train(docs, 0)
    with pytest.raises(ValueError, match="shrink"):
        ug.unigram_train(docs, 40, shrink=1.5)
    with pytest.raises(ValueError, match="alphabet"):
        ug.unigram_train(docs, 2)  # fewer than corpus alphabet
    with pytest.raises(ValueError, match="empty"):
        ug.unigram_train(docs.where(F.lit(False)), 40)
    with pytest.raises(ValueError, match="non-empty"):
        ug.unigram_encode(docs, [])
