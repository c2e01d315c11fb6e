"""Unit tests for the Spark-free Gibbs kernel (SURVEY.md §5.2-1)."""

import numpy as np
import pytest

from plda_spark.lda import kernel


def test_topic_conditional_hand_computed():
    # V=3 words, K=2 topics. nwk for word 0 = [2, 1]; nk = [5, 4]; ndk = [3, 1].
    nwk_row = np.array([2, 1], dtype=np.int64)
    nk = np.array([5, 4], dtype=np.int64)
    ndk = np.array([3.0, 1.0])
    alpha, beta, V = 0.1, 0.01, 3

    # Training, current topic = 0: subtract 1 from all three factors at k=0.
    p = kernel.topic_conditional(nwk_row, nk, ndk, 0, alpha, beta, V, train=True)
    exp0 = (2 - 1 + 0.01) * (3 - 1 + 0.1) / (5 - 1 + 3 * 0.01)
    exp1 = (1 + 0.01) * (1 + 0.1) / (4 + 3 * 0.01)
    assert p == pytest.approx([exp0, exp1])

    # Inference: no adjustment anywhere even at the current topic.
    p = kernel.topic_conditional(nwk_row, nk, ndk, 0, alpha, beta, V, train=False)
    exp0 = (2 + 0.01) * (3 + 0.1) / (5 + 3 * 0.01)
    assert p == pytest.approx([exp0, exp1])


def test_inverse_cdf_sample_boundaries():
    p = np.array([1.0, 2.0, 1.0])  # cumsum 1,3,4
    assert kernel.inverse_cdf_sample(p, 0.0) == 0
    assert kernel.inverse_cdf_sample(p, 0.24) == 0  # 0.24*4 = 0.96 <= 1
    assert kernel.inverse_cdf_sample(p, 0.25) == 0  # exactly 1.0 -> first k with cum >= 1
    assert kernel.inverse_cdf_sample(p, 0.26) == 1
    assert kernel.inverse_cdf_sample(p, 0.74) == 1
    assert kernel.inverse_cdf_sample(p, 0.999) == 2
    # Zero-probability head must never be selected for u > 0.
    p = np.array([0.0, 1.0])
    assert kernel.inverse_cdf_sample(p, 0.5) == 1


def test_inverse_cdf_sample_distribution_chi2():
    rng = kernel.make_rng(123)
    p = np.array([0.1, 0.5, 0.2, 0.2])
    n = 20000
    draws = np.array([kernel.inverse_cdf_sample(p, u) for u in rng.random(n)])
    observed = np.bincount(draws, minlength=4)
    expected = p * n
    chi2 = float(((observed - expected) ** 2 / expected).sum())
    # df=3; 0.999 quantile ~ 16.27
    assert chi2 < 16.27


def test_count_nwk_and_sweep_conserve_counts():
    rng = kernel.make_rng(7)
    V, K = 20, 4
    word_occ = rng.integers(0, V, size=300).astype(np.int32)
    doc_offsets = np.array([0, 100, 180, 300])
    z = kernel.init_assignments(300, K, rng)
    nwk = kernel.count_nwk(word_occ, z, V, K)
    nk = nwk.sum(axis=0)
    assert nk.sum() == 300
    kernel.sweep_docs(word_occ, z, doc_offsets, nwk, nk, 0.1, 0.01, rng)
    # Total mass conserved; per-word row sums unchanged (only topics move).
    assert nwk.sum() == 300
    assert np.array_equal(nwk.sum(axis=1), np.bincount(word_occ, minlength=V))
    assert np.array_equal(nk, nwk.sum(axis=0))
    # Model matches a from-scratch rebuild from the new assignments.
    assert np.array_equal(nwk, kernel.count_nwk(word_occ, z, V, K))


def test_sweep_inference_freezes_model():
    rng = kernel.make_rng(11)
    V, K = 10, 3
    word_occ = rng.integers(0, V, size=50).astype(np.int32)
    doc_offsets = np.array([0, 50])
    z = kernel.init_assignments(50, K, rng)
    nwk = np.full((V, K), 5, dtype=np.int64)
    nk = nwk.sum(axis=0)
    nwk0, nk0 = nwk.copy(), nk.copy()
    kernel.sweep_docs(word_occ, z, doc_offsets, nwk, nk, 0.1, 0.01, rng, update_model=False)
    assert np.array_equal(nwk, nwk0)
    assert np.array_equal(nk, nk0)


def test_log_likelihood_matches_bruteforce():
    rng = kernel.make_rng(3)
    V, K = 15, 3
    word_occ = rng.integers(0, V, size=120).astype(np.int32)
    doc_offsets = np.array([0, 60, 120])
    z = kernel.init_assignments(120, K, rng)
    nwk = kernel.count_nwk(word_occ, z, V, K)
    nk = nwk.sum(axis=0)
    alpha, beta = 0.1, 0.01

    # Brute force, occurrence-at-a-time exactly as sampler.cc:116-166.
    expected = 0.0
    for d in range(2):
        s, e = doc_offsets[d], doc_offsets[d + 1]
        ndk = np.bincount(z[s:e], minlength=K)
        theta = (ndk + alpha) / ((e - s) + alpha * K)
        for i in range(s, e):
            w = word_occ[i]
            phi = (nwk[w] + beta) / (nk + V * beta)
            expected += np.log(float(phi @ theta))

    got = kernel.corpus_log_likelihood(word_occ, z, doc_offsets, nwk, nk, alpha, beta)
    assert got == pytest.approx(expected, rel=1e-12)


def test_rng_streams_deterministic_and_distinct():
    a = kernel.make_rng(42, 0, 1).random(5)
    b = kernel.make_rng(42, 0, 1).random(5)
    c = kernel.make_rng(42, 1, 1).random(5)
    d = kernel.make_rng(42, 0, 2).random(5)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert not np.array_equal(a, d)


def test_gibbs_concentrates_on_separable_corpus():
    """Statistical sanity: two disjoint-vocab topics are recovered."""
    rng = kernel.make_rng(99)
    K, V = 2, 20
    docs = []
    for d in range(40):
        topic_words = np.arange(0, 10) if d % 2 == 0 else np.arange(10, 20)
        docs.append(rng.choice(topic_words, size=30))
    word_occ = np.concatenate(docs).astype(np.int32)
    doc_offsets = np.arange(0, 41) * 30
    z = kernel.init_assignments(word_occ.shape[0], K, rng)
    nwk = kernel.count_nwk(word_occ, z, V, K)
    nk = nwk.sum(axis=0)
    ll0 = kernel.corpus_log_likelihood(word_occ, z, doc_offsets, nwk, nk, 0.1, 0.01)
    for _ in range(30):
        kernel.sweep_docs(word_occ, z, doc_offsets, nwk, nk, 0.1, 0.01, rng)
    ll1 = kernel.corpus_log_likelihood(word_occ, z, doc_offsets, nwk, nk, 0.1, 0.01)
    assert ll1 > ll0  # likelihood rises (the reference's de-facto oracle)
    # Each vocab block should be dominated by a single topic.
    block0 = nwk[:10].sum(axis=0)
    block1 = nwk[10:].sum(axis=0)
    assert block0.max() / block0.sum() > 0.9
    assert block1.max() / block1.sum() > 0.9
    assert block0.argmax() != block1.argmax()
