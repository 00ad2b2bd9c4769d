"""Isolated SPA engine units: analytic CGF root + tail-probability sanity.

With identical weights g_i = 1 and identical mu, K1(t) = n mu e^t /
(1 - mu + mu e^t), so the saddlepoint K1(t) = q has the closed form
e^t = q (1 - mu) / (mu (n - q)) — an exact pin for the damped-Newton
root finder (getroot_K1, reference src/SPATest.cpp:92-135)."""

import jax.numpy as jnp
import numpy as np
import pytest

from saigegds_tpu.ops.spa import _getroot_K1, _saddle_prob, saddle_prob_batch


def _setup(n=512, mu0=0.13, qfrac=1.35):
    g = jnp.ones((1, n))
    mu = jnp.full((1, n), mu0)
    mask = jnp.ones((1, n), bool)
    q = jnp.asarray([qfrac * n * mu0])      # above the mean -> t > 0
    zero = jnp.zeros(1)
    g_pos = jnp.asarray([float(n)])
    g_neg = jnp.zeros(1)
    return q, g, mu, mask, zero, g_pos, g_neg


def test_root_matches_closed_form():
    n, mu0, qfrac = 512, 0.13, 1.35
    q, g, mu, mask, zero, g_pos, g_neg = _setup(n, mu0, qfrac)
    root, conv = _getroot_K1(q, g, mu, mask, zero, zero, g_pos, g_neg)
    assert bool(conv[0])
    qv = qfrac * n * mu0
    t_exact = np.log(qv * (1 - mu0) / (mu0 * (n - qv)))
    assert abs(float(root[0]) - t_exact) < 1e-4   # reference tol eps^0.25


def test_root_out_of_range():
    q, g, mu, mask, zero, g_pos, g_neg = _setup()
    root, conv = _getroot_K1(jnp.asarray([600.0]), g, mu, mask,
                             zero, zero, g_pos, g_neg)
    assert bool(conv[0]) and np.isinf(float(root[0]))


def test_saddle_tail_matches_exact_binomial():
    """SPA of a sum of iid Bernoullis vs the exact binomial tail."""
    from scipy.stats import binom

    n, mu0 = 2000, 0.05
    for k in (130, 150):
        # continuity correction: the binomial is a lattice statistic, so
        # evaluate the (continuous) saddlepoint at k - 1/2
        q, g, mu, mask, zero, g_pos, g_neg = _setup(
            n, mu0, (k - 0.5) / (n * mu0))
        root, conv = _getroot_K1(q, g, mu, mask, zero, zero, g_pos, g_neg)
        p1 = float(_saddle_prob(root[0:1], g, mu, mask, zero, zero, q)[0])
        exact = float(binom.sf(k - 1, n, mu0))   # P(X >= k)
        assert abs(p1 - exact) / exact < 0.05, (k, p1, exact)


def test_mixed_mode_matches_exact_mode():
    rng = np.random.default_rng(0)
    n, Bv = 4096, 16
    g = jnp.asarray(np.abs(rng.normal(size=(Bv, n))) *
                    (rng.random((Bv, n)) < 0.1))
    mu = jnp.asarray(np.clip(rng.uniform(0.02, 0.3, size=n), 0, 1))
    mask = g != 0
    m1 = jnp.sum(g * mu[None, :], axis=1)
    var2 = jnp.sum(g * g * (mu * (1 - mu))[None, :], axis=1)
    q = m1 + 3.0 * jnp.sqrt(var2)
    p_exact, c_exact = saddle_prob_batch(q, m1, var2, g, mu, mask)
    p_mixed, c_mixed = saddle_prob_batch(q, m1, var2, g, mu, mask, mixed=True)
    np.testing.assert_array_equal(np.asarray(c_exact), np.asarray(c_mixed))
    np.testing.assert_allclose(np.asarray(p_mixed), np.asarray(p_exact),
                               rtol=1e-3)
