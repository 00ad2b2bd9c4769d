"""Fully-on-device null-GLMM fit: the whole AI-REML loop in one program.

The host-driven fitter (``fitnull.py``) replays the reference bit-for-bit
but dispatches one device program per PCG solve — on a far-away accelerator
(or a many-host pod where every dispatch synchronizes the fleet) the round
trips dominate.  This module compiles the ENTIRE outer loop — inner IRLS
coefficient iteration, Hutchinson trace, AI-REML tau update, convergence
test — into a single ``lax.while_loop`` program: one dispatch per fit.

Host-path semantics carried over (src/saige_fitnull.cpp):
* first moment-based tau update before the Newton loop (:1024);
* trace-CV escalation (:644-665): the caller passes a probe POOL
  ``U [N, R]``; every probe is solved in the batched PCG (the marginal
  cost of extra RHS columns is negligible next to the GRM stream), and
  the trace estimate uses the first ``r`` probes, escalating ``r += 10``
  until the CV is below ``trace_cv_cutoff`` or the pool is exhausted —
  identical to the host's escalation whenever the pool is big enough;
* tau-blow-up retry (:1039-1066): on ``max(tau) > 1/tol^2`` the
  iteration restarts from its starting state with tau[1] halved, up to
  10 times; the 11th failure sets ``converged=False`` (the host raises).

Remaining deliberate difference: probes come from the caller (replay R's
stream via utils.rrandom for host parity, or use jax.random).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.pcg import pcg_solve_op


class DeviceFit(NamedTuple):
    coefficients: jnp.ndarray   # [K]
    tau: jnp.ndarray            # [2]
    eta: jnp.ndarray            # [N] linear predictor
    mu: jnp.ndarray             # [N] fitted values
    cov: jnp.ndarray            # [K, K]
    iterations: jnp.ndarray     # [] outer iterations taken
    converged: jnp.ndarray      # [] bool


def _sym_inv(m):
    # Cholesky + triangular solve: TPU f64 has no LU (jnp.linalg.inv path)
    c = jnp.linalg.cholesky((m + m.T) / 2.0)
    ic = jax.scipy.linalg.solve_triangular(
        c, jnp.eye(m.shape[0], dtype=m.dtype), lower=True)
    return ic.T @ ic


def _masked_trace(t_all, nrun, cutoff):
    """Mean of the first r probe estimates, escalating r += 10 while the
    CV (= sd / (mean * r), the reference's calcCV :618-623) exceeds
    ``cutoff`` and the pool has more probes."""
    R = t_all.shape[0]
    idx = jnp.arange(R)

    def stats(r):
        mask = (idx < r).astype(t_all.dtype)
        m = jnp.sum(t_all * mask) / r
        var = jnp.sum(((t_all - m) * mask) ** 2) / (r - 1)
        cv = jnp.sqrt(var) / (m * r)
        return m, cv

    def cond(r):
        _, cv = stats(r)
        return (cv > cutoff) & (r + 10 <= R)

    r_fin = jax.lax.while_loop(cond, lambda r: r + 10,
                               jnp.minimum(jnp.asarray(nrun), R))
    mean, _ = stats(r_fin)
    return mean


@partial(jax.jit, static_argnames=("maxiter", "maxiter_pcg", "maxiter_coef"))
def fit_glmm_binary_device(op, y, X, tau_init, eta_init, U,
                           tol, tol_pcg,
                           maxiter: int = 20, maxiter_pcg: int = 500,
                           maxiter_coef: int = 20, nrun=30,
                           trace_cv_cutoff=0.0025) -> DeviceFit:
    """Binary-trait null GLMM fit as one device program.

    op: GRM operator pytree (.matvec/.diag); y [N]; X [N, K]; U [N, R]
    Rademacher probe pool (R >= nrun; extra columns feed the trace-CV
    escalation); tau_init [2]; eta_init [N].
    """
    N, K = X.shape
    tol_inv_2 = 1.0 / (tol * tol)

    def get_coeff(tau, eta, alpha0):
        """Inner IRLS to coefficient rel-tol 0.1 (get_coeff, :766-813)."""
        def step(carry):
            eta, alpha_prev, _, it = carry
            mu = jax.nn.sigmoid(eta)
            W = mu * (1.0 - mu)
            Y = eta + (y - mu) / W
            B = jnp.concatenate([Y[:, None], X], axis=1)
            sol, _, _ = pcg_solve_op(op, W, tau, B, tol_pcg, maxiter_pcg)
            Si_Y, Si_X = sol[:, 0], sol[:, 1:]
            cov = _sym_inv(X.T @ Si_X)
            alpha = cov @ (Si_X.T @ Y)
            eta1 = Y - tau[0] * (Si_Y - Si_X @ alpha) / W
            return eta1, alpha, (Y, W, cov, Si_Y, Si_X), it + 1

        # fori-style loop with early-exit mask on alpha change
        def body(carry):
            eta, alpha, aux, it, done = carry
            eta1, alpha1, aux1, _ = step((eta, alpha, aux, it))
            delta = jnp.max(jnp.abs(alpha1 - alpha) /
                            (jnp.abs(alpha1) + jnp.abs(alpha) + 0.1))
            done1 = done | (delta < 0.1)
            keep = ~done
            eta_o = jnp.where(keep, eta1, eta)
            alpha_o = jnp.where(keep, alpha1, alpha)
            aux_o = jax.tree_util.tree_map(
                lambda a, b: jnp.where(keep, b, a), aux, aux1)
            return eta_o, alpha_o, aux_o, it + 1, done1

        def wcond(carry):
            *_, it, done = carry
            return (~done) & (it < maxiter_coef)

        mu0 = jax.nn.sigmoid(eta)
        W0 = mu0 * (1.0 - mu0)
        aux0 = (eta, W0, jnp.eye(K), eta, jnp.zeros((N, K)))
        eta1, alpha1, aux, _, _ = jax.lax.while_loop(
            wcond, body, (eta, alpha0, aux0, jnp.zeros((), jnp.int32),
                          jnp.zeros((), bool)))
        Y, W, cov, Si_Y, Si_X = aux
        return eta1, alpha1, Y, W, cov, Si_Y, Si_X

    # GRM @ probes is tau-invariant: stream the GRM over the probe pool
    # ONCE, not per outer iteration (XLA hoists the loop constant)
    AU_const = op.matvec(U)

    def ai_update(tau, Y, W, cov, Si_Y, Si_X, moment):
        """AI-REML tau step with CV-escalated Hutchinson trace (:816-890).

        ``moment=True`` applies the first moment-based update
        tau1 <- max(0, tau1 + tau1^2 (YPAPY - tr)/n) (:1024) instead of
        the Newton step score/AI."""
        proj = lambda v, Siv: Siv - Si_X @ (cov @ (Si_X.T @ v))
        PY = proj(Y, Si_Y)
        APY = op.matvec(PY)
        YPAPY = PY @ APY
        B = jnp.concatenate([APY[:, None], U], axis=1)
        sol, _, _ = pcg_solve_op(op, W, tau, B, tol_pcg, maxiter_pcg)
        PAPY = proj(sol[:, 0], sol[:, 0])
        AI = APY @ PAPY
        Si_U = sol[:, 1:]
        PU = Si_U - Si_X @ (cov @ (Si_X.T @ U))
        trace = _masked_trace(jnp.sum(AU_const * PU, axis=0), nrun,
                              trace_cv_cutoff)
        score = YPAPY - trace
        # Newton step; sub-tol values clamp to 0 (fitglmmaiRPCG, :860-890)
        t1n = tau[1] + score / AI
        t1n = jnp.where(t1n < tol, 0.0, t1n)
        # moment step (:1024)
        t1m = jnp.maximum(tau[1] + tau[1] ** 2 * score / N, 0.0)
        return jnp.stack([tau[0], jnp.where(moment, t1m, t1n)])

    def outer_body(state):
        tau, eta, alpha, it, retries, done, failed = state
        eta1, alpha1, Y, W, cov, Si_Y, Si_X = get_coeff(tau, eta, alpha)
        tau1 = ai_update(tau, Y, W, cov, Si_Y, Si_X,
                         jnp.zeros((), bool))
        blow = jnp.max(tau1) > tol_inv_2
        can_retry = blow & (retries < 10)
        fail = blow & (retries >= 10)
        delta = jnp.max(jnp.abs(tau1 - tau) /
                        (jnp.abs(tau1) + jnp.abs(tau) + tol))
        done1 = done | (~blow & ((delta < tol) | (tau1[1] == 0.0))) | fail
        keep = ~done
        # retry restarts the iteration from its starting eta/alpha with
        # tau[1] halved (the host's itry loop, :1039-1066)
        tau_n = jnp.where(can_retry, jnp.stack([tau[0], tau[1] * 0.5]),
                          tau1)
        eta_n = jnp.where(can_retry, eta, eta1)
        alpha_n = jnp.where(can_retry, alpha, alpha1)
        return (jnp.where(keep, tau_n, tau), jnp.where(keep, eta_n, eta),
                jnp.where(keep, alpha_n, alpha),
                it + jnp.where(can_retry, 0, 1),
                # the reference's itry budget is PER ITERATION
                # (src/saige_fitnull.cpp:1039-1066: itry resets each
                # outer iteration); reset once the iteration completes
                jnp.where(can_retry, retries + 1, 0),
                done1, failed | fail)

    def outer_cond(state):
        _, _, _, it, _, done, _ = state
        return (~done) & (it < maxiter)

    # pre-loop: coefficient solve at tau_init + first moment update (:1024)
    alpha0 = jnp.zeros(K, X.dtype)
    _eta_i, alpha_i, Y, W, cov, Si_Y, Si_X = get_coeff(tau_init, eta_init,
                                                       alpha0)
    tau_m = ai_update(tau_init, Y, W, cov, Si_Y, Si_X,
                      jnp.ones((), bool))

    state = (tau_m, eta_init, alpha_i, jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32), jnp.zeros((), bool),
             jnp.zeros((), bool))
    tau, eta, alpha, iters, _retries, done, failed = jax.lax.while_loop(
        outer_cond, outer_body, state)

    # final coefficient solve at the converged tau
    eta_f, alpha_f, Y, W, cov, Si_Y, Si_X = get_coeff(tau, eta, alpha)
    mu_f = jax.nn.sigmoid(eta_f)
    return DeviceFit(coefficients=alpha_f, tau=tau, eta=eta_f, mu=mu_f,
                     cov=cov, iterations=iters,
                     converged=done & ~failed)


@partial(jax.jit, static_argnames=("maxiter", "maxiter_pcg"))
def fit_glmm_quant_device(op, y, X, tau_init, U,
                          tol, tol_pcg,
                          maxiter: int = 20,
                          maxiter_pcg: int = 500, nrun=30,
                          trace_cv_cutoff=0.0025) -> DeviceFit:
    """Quantitative-trait (gaussian identity-link) device fit.

    Both variance components are free; the 2x2 average-information system
    mirrors ``get_AI_score_q``/``fitglmmaiRPCG_q``
    (src/saige_fitnull.cpp:893-928).  The gaussian working response equals
    y, so the inner IRLS collapses to a single solve per outer iteration.
    Stops at the reference's 2% relative-change rule — no extra polish,
    so the fit agrees with the host/golden path's stopping point.
    """
    N, K = X.shape

    def coeff(tau):
        W = jnp.ones(N, y.dtype)
        B = jnp.concatenate([y[:, None], X, U], axis=1)
        sol, _, _ = pcg_solve_op(op, W, tau, B, tol_pcg, maxiter_pcg)
        Si_Y, Si_X, Si_U = sol[:, 0], sol[:, 1:1 + K], sol[:, 1 + K:]
        cov = _sym_inv(X.T @ Si_X)
        alpha = cov @ (Si_X.T @ y)
        eta = y - tau[0] * (Si_Y - Si_X @ alpha)
        return alpha, eta, cov, Si_Y, Si_X, Si_U

    AU_const = op.matvec(U)    # tau-invariant: one GRM stream, not per iter

    def traces(Si_X, cov, Si_U):
        """CV-escalated trace(P*GRM) and trace(P) from the probe pool."""
        PU = Si_U - Si_X @ (cov @ (Si_X.T @ U))
        t1 = jnp.sum(AU_const * PU, axis=0)
        t0 = jnp.sum(U * PU, axis=0)
        # shared escalation count: escalate while EITHER CV is above the
        # cutoff (the host loop checks both, fitnull._get_trace)
        R = t1.shape[0]
        idx = jnp.arange(R)

        def stats(t, r):
            mask = (idx < r).astype(t.dtype)
            m = jnp.sum(t * mask) / r
            var = jnp.sum(((t - m) * mask) ** 2) / (r - 1)
            return m, jnp.sqrt(var) / (m * r)

        def cond(r):
            _, cv1 = stats(t1, r)
            _, cv0 = stats(t0, r)
            return (jnp.maximum(cv0, cv1) > trace_cv_cutoff) & (r + 10 <= R)

        r_fin = jax.lax.while_loop(cond, lambda r: r + 10,
                                   jnp.minimum(jnp.asarray(nrun), R))
        return stats(t0, r_fin)[0], stats(t1, r_fin)[0]

    def ai_step(tau):
        alpha, eta, cov, Si_Y, Si_X, Si_U = coeff(tau)
        proj = lambda v, Siv: Siv - Si_X @ (cov @ (Si_X.T @ v))
        PY = proj(y, Si_Y)
        APY = op.matvec(PY)
        YPAPY = PY @ APY
        YPA0PY = PY @ PY
        trace0, trace1 = traces(Si_X, cov, Si_U)
        B2 = jnp.stack([PY, APY], axis=1)
        sol2, _, _ = pcg_solve_op(op, jnp.ones(N, y.dtype), tau, B2,
                                  tol_pcg, maxiter_pcg)
        PA0PY = proj(sol2[:, 0], sol2[:, 0])
        PAPY = proj(sol2[:, 1], sol2[:, 1])
        AI = jnp.array([[PY @ PA0PY, PY @ PAPY],
                        [APY @ PA0PY, APY @ PAPY]])
        AI = (AI + AI.T) / 2.0
        score = jnp.array([YPA0PY - trace0, YPAPY - trace1])
        # closed-form 2x2 solve (TPU f64 has no LU for jnp.linalg.solve)
        det = AI[0, 0] * AI[1, 1] - AI[0, 1] * AI[1, 0]
        dtau = jnp.array([
            (AI[1, 1] * score[0] - AI[0, 1] * score[1]) / det,
            (AI[0, 0] * score[1] - AI[1, 0] * score[0]) / det,
        ])
        # fitglmmaiRPCG_q (:893-928): components that entered at ~0 clamp
        # back to 0 (zero_v) so they never drive the halving loop; genuine
        # negativity of live components step-halves until non-negative
        zero_v = tau < tol
        def clamp(t):
            return jnp.where(zero_v & (t < tol), 0.0, t)
        def halve(carry):
            _, step = carry
            step = step * 0.5
            return clamp(tau + step * dtau), step
        def neg(carry):
            return jnp.any(carry[0] < 0.0)
        t1, _ = jax.lax.while_loop(neg, halve, (clamp(tau + dtau), 1.0))
        t1 = jnp.where(t1 < tol, 0.0, t1)
        return t1, alpha, eta, cov

    def body(state):
        tau, alpha, eta, cov, it, done = state
        tau1, alpha1, eta1, cov1 = ai_step(tau)
        delta = jnp.max(jnp.abs(tau1 - tau) /
                        (jnp.abs(tau1) + jnp.abs(tau) + tol))
        done1 = done | (delta < tol)
        keep = ~done
        sel = lambda a, b: jnp.where(keep, b, a)
        return (sel(tau, tau1), sel(alpha, alpha1), sel(eta, eta1),
                sel(cov, cov1), it + 1, done1)

    def cond(state):
        *_, it, done = state
        return (~done) & (it < maxiter)

    # initial moment-based update (reference saige_fit_AI_PCG_quant
    # :1160-1170): tau_k <- max(0, tau_k + tau_k^2 (YP A_k PY - tr) / n)
    def moment_update(tau):
        _, _, cov, Si_Y, Si_X, Si_U = coeff(tau)
        proj = lambda v, Siv: Siv - Si_X @ (cov @ (Si_X.T @ v))
        PY = proj(y, Si_Y)
        APY = op.matvec(PY)
        trace0, trace1 = traces(Si_X, cov, Si_U)
        s0 = PY @ PY - trace0
        s1 = PY @ APY - trace1
        return jnp.maximum(
            tau + tau ** 2 * jnp.stack([s0, s1]) / N, 0.0)

    tau1 = moment_update(tau_init)
    state = (tau1, jnp.zeros(K, X.dtype), y, jnp.eye(K, dtype=X.dtype),
             jnp.zeros((), jnp.int32), jnp.zeros((), bool))
    tau, alpha, eta, cov, iters, done = jax.lax.while_loop(cond, body, state)
    alpha_f, eta_f, cov_f, *_ = coeff(tau)
    return DeviceFit(coefficients=alpha_f, tau=tau, eta=eta_f, mu=eta_f,
                     cov=cov_f, iterations=iters, converged=done)
