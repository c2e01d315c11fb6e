"""C sweep kernel: bit-identity with the numpy reference path.

The C kernel consumes the same pre-drawn uniforms and evaluates the
same double-precision expressions in the same order as the numpy loop,
so for any (seed, data) the two paths must agree exactly — both for
training (int64 counts, in-place model updates) and inference (float64
frozen model).
"""

import os

import numpy as np
import pytest

from plda_spark.lda import _ckernel, kernel


def _mkdata(n, v, k, seed):
    rng = kernel.make_rng(seed, 0, 0)
    occ = rng.integers(0, v, n).astype(np.int32)
    z = kernel.init_assignments(n, k, rng)
    offs = np.unique(
        np.concatenate([[0], np.sort(rng.integers(1, n, 20)), [n]])
    ).astype(np.int64)
    nwk = kernel.count_nwk(occ, z, v, k)
    return occ, z, offs, nwk, nwk.sum(axis=0)


@pytest.fixture(autouse=True)
def _reset_ckernel():
    yield
    os.environ.pop("PLDA_SPARK_NO_CKERNEL", None)
    _ckernel._tried = False


def _run(use_c, train, seed):
    if use_c:
        os.environ.pop("PLDA_SPARK_NO_CKERNEL", None)
    else:
        os.environ["PLDA_SPARK_NO_CKERNEL"] = "1"
    _ckernel._tried = False
    occ, z, offs, nwk, nk = _mkdata(5000, 50, 7, seed)
    if not train:
        nwk = nwk.astype(np.float64)
        nk = nk.astype(np.float64)
    rng = kernel.make_rng(seed + 1, 3, 2)
    kernel.sweep_docs(occ, z, offs, nwk, nk, 0.1, 0.01, rng, update_model=train)
    return z, nwk, nk


def test_c_kernel_builds():
    _ckernel._tried = False
    assert _ckernel.get_sweep_fn() is not None


@pytest.mark.parametrize("train", [True, False])
@pytest.mark.parametrize("seed", [1, 42])
def test_c_matches_numpy_bitwise(train, seed):
    z_np, nwk_np, nk_np = _run(False, train, seed)
    z_c, nwk_c, nk_c = _run(True, train, seed)
    assert np.array_equal(z_np, z_c)
    assert np.array_equal(nwk_np, nwk_c)
    assert np.array_equal(nk_np, nk_c)
