"""ACAT Cauchy-combination tests (mirrors test.pACAT, test_SAIGE.R:136-158)."""

import numpy as np
import pytest

from saigegds_tpu.ops.acat import acat_pval, beta_weights
from saigegds_tpu.utils.stats import acat_p, acat_p_maf


def _acat_ref(ps, ws=None):
    """Straight-line numpy reimplementation of the Cauchy combination.

    Evaluates tan(pi*(0.5 - p)) literally: Rmath's ``tanpi(x)`` reduces x
    mod 1 (0.5-p is already reduced for p in (0,1)) and then computes
    tan(M_PI*x) — so this exact form IS the reference's arithmetic.
    The algebraically equal cot(pi p) = 1/tan(pi p) differs near p=1,
    where pi*p suffers argument-reduction error while 0.5-p is exact.
    """
    ps = np.asarray(ps, float)
    ws = np.ones_like(ps) if ws is None else np.asarray(ws, float)
    terms = np.where(ps >= 1e-15, np.tan(np.pi * (0.5 - ps)),
                     1.0 / ps / np.pi)       # reference's series branch
    T = np.sum(ws * terms) / ws.sum()
    if T > 5e14:
        return 1.0 / T / np.pi
    return 0.5 - np.arctan(T) / np.pi


def test_acat_grid():
    ps = 10.0 ** -np.arange(1, 15.1, 0.1)
    for i in range(0, len(ps), 7):
        for j in range(0, len(ps), 7):
            got = float(acat_pval(np.array([ps[i], ps[j]])))
            want = _acat_ref([ps[i], ps[j]])
            assert got == pytest.approx(want, rel=1e-10, abs=1e-300)


def test_acat_tiny_pvalues():
    # p < 1e-15 switches to the series branch 1/(pi p)
    p = np.array([1e-20, 1e-18])
    got = float(acat_pval(p))
    T = (1 / p[0] / np.pi + 1 / p[1] / np.pi) / 2
    assert got == pytest.approx(1.0 / T / np.pi, rel=1e-12)


def test_acat_weights_and_nan():
    p = np.array([0.01, np.nan, 0.5])
    w = np.array([1.0, 5.0, 2.0])
    got = float(acat_pval(p, w))
    want = _acat_ref([0.01, 0.5], [1.0, 2.0])
    assert got == pytest.approx(want, rel=1e-12)


def test_acat_batch_axis():
    ps = np.array([[0.01, 0.2], [0.5, 0.6]])
    out = np.asarray(acat_pval(ps, axis=1))
    assert out[0] == pytest.approx(_acat_ref([0.01, 0.2]), rel=1e-12)
    assert out[1] == pytest.approx(_acat_ref([0.5, 0.6]), rel=1e-12)


def test_pacat2_beta_weights():
    maf = np.array([0.01, 0.02, 0.3])
    w = np.asarray(beta_weights(maf, 1.0, 25.0))
    from scipy.stats import beta as sbeta
    np.testing.assert_allclose(w, sbeta.pdf(maf, 1.0, 25.0), rtol=1e-12)
    p = acat_p_maf([0.01, 0.5, 0.9], maf)
    assert 0 < p < 1


def test_acat_near_one_and_invalid():
    """p near 1: the tan(pi*(0.5-p)) form (= Rmath tanpi) is exact where
    1/tan(pi*p) loses ~1e-1 relative; finite p outside [0,1] -> NaN like
    the reference's non-throwing path (src/saige_main.cpp:1024-1030)."""
    p = np.array([1.0 - 1e-16, 0.01])
    got = float(acat_pval(p))
    want = _acat_ref(p)
    assert got == pytest.approx(want, rel=1e-14)
    assert np.isnan(float(acat_pval(np.array([1.5, 0.01]))))
    assert np.isnan(float(acat_pval(np.array([-0.1, 0.01]))))
