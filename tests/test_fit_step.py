"""The fully-jitted sharded training step reproduces the host-driven fitter's
inner-IRLS + AI-REML arithmetic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from saigegds_tpu.config import NullModelConfig
from saigegds_tpu.models.fitnull import (_Binomial, _CoeffState, _get_coeff,
                                         _get_ai_score_binary)
from saigegds_tpu.ops.grm import build_grm
from saigegds_tpu.parallel.fit_step import glmm_fit_step_binary, shard_fit_step
from saigegds_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(3)
    n, m, k, r = 64, 128, 3, 8
    codes = rng.integers(0, 3, size=(m, n)).astype(np.int8)
    grm = build_grm(codes)
    X = np.column_stack([np.ones(n), rng.normal(size=(n, k - 1))])
    beta = np.array([0.2, -0.3, 0.1])
    mu = 1 / (1 + np.exp(-(X @ beta)))
    y = (rng.random(n) < mu).astype(np.float64)
    eta = np.full(n, np.log(y.mean() / (1 - y.mean())))
    U = rng.choice([-1.0, 1.0], size=(n, r))
    tau = np.array([1.0, 0.5])
    return grm, y, X, tau, eta, U


def _host_reference(grm, y, X, tau, eta, U, tol_pcg=1e-9, maxiter_pcg=200):
    """Replicate the step with the host fitter's building blocks."""
    fam = _Binomial()
    mu = fam.linkinv(eta)
    mu2 = mu * (1 - mu)
    Y = eta + (y - mu) / mu2
    W = mu2
    from saigegds_tpu.ops.pcg import pcg_solve
    B = np.concatenate([Y[:, None], X, U], axis=1)
    sol, _, _ = pcg_solve(grm.std_geno, grm.diag, jnp.asarray(W),
                          jnp.asarray(tau), jnp.asarray(B),
                          tol_pcg, maxiter_pcg)
    sol = np.asarray(sol)
    Si_Y, Si_X, Si_U = sol[:, 0], sol[:, 1:1 + X.shape[1]], sol[:, 1 + X.shape[1]:]
    cov = np.linalg.inv(X.T @ Si_X)
    alpha = cov @ (Si_X.T @ Y)
    PY = Si_Y - Si_X @ (cov @ (Si_X.T @ Y))
    APY = np.asarray(grm.matvec(jnp.asarray(PY)))
    YPAPY = PY @ APY
    PU = Si_U - Si_X @ (cov @ (Si_X.T @ U))
    AU = np.asarray(grm.matvec(jnp.asarray(U)))
    trace = np.mean(np.sum(AU * PU, axis=0))
    return alpha, YPAPY, trace


def test_fit_step_matches_host(problem):
    grm, y, X, tau, eta, U = problem
    out = glmm_fit_step_binary(grm.std_geno, grm.diag, jnp.asarray(y),
                               jnp.asarray(X), jnp.asarray(tau),
                               jnp.asarray(eta), jnp.asarray(U),
                               jnp.asarray(1e-9), 200)
    alpha, YPAPY, trace = _host_reference(grm, y, X, tau, eta, U)
    np.testing.assert_allclose(np.asarray(out.alpha), alpha, rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_allclose(float(out.yapy), YPAPY, rtol=1e-6)
    np.testing.assert_allclose(float(out.trace), trace, rtol=1e-6)
    assert float(out.tau[1]) >= 0.0


def test_fit_step_sharded_matches_single(problem):
    grm, y, X, tau, eta, U = problem
    want = glmm_fit_step_binary(grm.std_geno, grm.diag, jnp.asarray(y),
                                jnp.asarray(X), jnp.asarray(tau),
                                jnp.asarray(eta), jnp.asarray(U),
                                jnp.asarray(1e-9), 200)
    mesh = make_mesh(8)
    step, put = shard_fit_step(mesh)
    args = put(grm.std_geno, grm.diag, jnp.asarray(y), jnp.asarray(X),
               jnp.asarray(tau), jnp.asarray(eta), jnp.asarray(U))
    got = step(*args, jnp.asarray(1e-9), 200)
    np.testing.assert_allclose(np.asarray(got.alpha), np.asarray(want.alpha),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got.tau), np.asarray(want.tau),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got.eta), np.asarray(want.eta),
                               rtol=1e-10)


def test_graft_entry_points():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out.pval)).sum() > 0
    ge.dryrun_multichip(8)
