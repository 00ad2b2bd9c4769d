"""Packed int8 GRM operator: exact-int8-slice matvec vs the f64 reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from saigegds_tpu.ops.grm import build_grm
from saigegds_tpu.ops.packed_grm import (build_packed_grm, _slice_i8,
                                         packed_grm_matvec)


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 3, size=(400, 1537)).astype(np.int8)
    codes[rng.random(codes.shape) < 0.03] = 3
    codes[5] = 0                     # monomorphic variant (af=0, inv=0)
    codes[6] = np.where(codes[6] == 3, 3, 2)   # af ~ 1 variant
    return codes, build_grm(codes), build_packed_grm(codes)


def test_slice_reconstruction():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(257, 3)) * np.array([1.0, 1e6, 1e-6])
    d, scale = _slice_i8(jnp.asarray(x), 8)
    d = np.asarray(d, dtype=np.float64)
    w = np.asarray(scale)[None, :, None] / 64.0 \
        * (1.0 / 128.0) ** np.arange(8)[None, None, :]
    rec = (d * w).sum(-1)
    err = np.abs(rec - x) / np.abs(x).max(axis=0)
    assert err.max() < 1e-15
    assert np.abs(d).max() <= 64


@pytest.mark.parametrize("precision", ["f64", "exact_i8"])
def test_matvec_matches_reference(problem, precision):
    codes, g0, pg = problem
    rng = np.random.default_rng(1)
    b = rng.normal(size=(codes.shape[1], 4)) * np.array([1, 1e4, 1e-4, 1])
    want = np.asarray(g0.matvec(jnp.asarray(b)))
    got = np.asarray(pg.matvec(jnp.asarray(b), precision=precision))
    scale = np.abs(want).max(axis=0)
    np.testing.assert_array_less(np.abs(got - want) / scale, 1e-12)


def test_matvec_1d(problem):
    codes, g0, pg = problem
    b = np.random.default_rng(2).normal(size=codes.shape[1])
    want = np.asarray(g0.matvec(jnp.asarray(b)))
    got = np.asarray(pg.matvec(jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-12 * np.abs(want).max())


def test_diag_matches(problem):
    _, g0, pg = problem
    np.testing.assert_allclose(np.asarray(pg.diag), np.asarray(g0.diag),
                               rtol=1e-12)


def test_no_missing_genotypes():
    """nnz == 0 exercises the all-padding sparse-correction path."""
    rng = np.random.default_rng(3)
    codes = rng.integers(0, 3, size=(64, 256)).astype(np.int8)
    g0, pg = build_grm(codes), build_packed_grm(codes)
    b = rng.normal(size=256)
    np.testing.assert_allclose(np.asarray(pg.matvec(jnp.asarray(b))),
                               np.asarray(g0.matvec(jnp.asarray(b))),
                               atol=1e-13)


def test_streamed_build_matches(problem):
    from saigegds_tpu.ops.packed_grm import build_packed_grm_streamed

    codes, g0, pg = problem
    def blocks():
        for s in range(0, codes.shape[0], 97):
            yield np.arange(s, min(s + 97, codes.shape[0])), codes[s:s + 97]
    sg = build_packed_grm_streamed(blocks(), codes.shape[1])
    b = np.random.default_rng(4).normal(size=codes.shape[1])
    np.testing.assert_allclose(np.asarray(sg.matvec(jnp.asarray(b))),
                               np.asarray(pg.matvec(jnp.asarray(b))),
                               atol=1e-13)
    np.testing.assert_allclose(np.asarray(sg.diag), np.asarray(pg.diag),
                               rtol=1e-12)
