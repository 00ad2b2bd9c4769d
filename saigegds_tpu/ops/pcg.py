"""Preconditioned conjugate gradient for Sigma x = b, batched over RHS.

Sigma = tau0 * diag(1/W) + tau1 * GRM applied matrix-free (the reference's
``PCG_diag_sigma``, src/saige_fitnull.cpp:581-614): Jacobi preconditioner
with a 1e-4 floor on diag(Sigma) (:553), stop when sum(r^2) <= tolPCG or
maxiterPCG.  The reference solves each RHS sequentially; here R right-hand
sides run as one batched ``lax.while_loop`` with per-column freezing, so
each column performs exactly the iterations its sequential solve would —
identical arithmetic, one device program, matmuls batched on the MXU.
Non-convergence is a warning, not an error (:610-611).
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("maxiter",))
def pcg_solve_op(op, w, tau, B, tol, maxiter: int):
    """Operator-generic PCG: ``op`` is any pytree with ``.matvec([N, R])``
    and ``.diag`` (GRMOperator or PackedGRM)."""
    return _pcg_body(op.matvec, op.diag, w, tau, B, tol, maxiter)


@partial(jax.jit, static_argnames=("maxiter",))
def pcg_solve(std_geno, diag_grm, w, tau, B, tol, maxiter: int):
    """Solve Sigma X = B.

    Parameters
    ----------
    std_geno : [M, N] standardized genotypes (GRM operator state)
    diag_grm : [N] diag(GRM)
    w : [N] working weights W
    tau : [2] variance components (tau0, tau1)
    B : [N, R] right-hand sides
    tol : PCG tolerance on sum(r^2) (the reference's tolPCG)
    maxiter : iteration bound

    Returns (X [N, R], iters [R], converged [R]).
    """
    M = std_geno.shape[0]

    def grm_mv(P):
        return (std_geno.T @ (std_geno @ P)) / M

    return _pcg_body(grm_mv, diag_grm, w, tau, B, tol, maxiter)


def _pcg_body(grm_mv, diag_grm, w, tau, B, tol, maxiter: int):
    """``w`` may be [N] (shared weights) or [N, R] (per-column weights) and
    ``tau`` [2] (shared) or [2, R] (per-column) — the per-column forms let
    callers batch systems from DIFFERENT models (e.g. GxG pairs) into one
    solve sharing the GRM stream; arithmetic per column is identical to a
    separate solve."""
    N, R = B.shape
    tau0, tau1 = tau[0], tau[1]      # scalars or [R]

    inv_w = 1.0 / w
    if inv_w.ndim == 1:
        inv_w = inv_w[:, None]

    def sigma_mv(P):  # [N, R] -> [N, R]
        return tau0 * inv_w * P + tau1 * grm_mv(P)

    d = tau0 * inv_w + tau1 * diag_grm[:, None]
    d = jnp.maximum(d, 1e-4)
    minv = jnp.broadcast_to(1.0 / d, B.shape)

    r = B
    z = minv * r
    p = z
    x = jnp.zeros_like(B)
    rr = jnp.sum(r * r, axis=0)
    active0 = rr > tol

    def cond(s):
        return s["active"].any() & (s["it"] < maxiter)

    def body(s):
        act = s["active"]
        Ap = sigma_mv(s["p"])
        rz = jnp.sum(s["r"] * s["z"], axis=0)
        pAp = jnp.sum(s["p"] * Ap, axis=0)
        a = jnp.where(act, rz / pAp, 0.0)
        x = s["x"] + a * s["p"]
        r1 = s["r"] - a * Ap
        z1 = minv * r1
        rz1 = jnp.sum(z1 * r1, axis=0)
        bet = jnp.where(act, rz1 / rz, 0.0)
        p1 = jnp.where(act, z1 + bet * s["p"], s["p"])
        rr1 = jnp.sum(r1 * r1, axis=0)
        it = s["it"] + 1
        iters = jnp.where(act, it, s["iters"])
        active = act & (rr1 > tol) & (it < maxiter)
        rr = jnp.where(act, rr1, s["rr"])
        return dict(x=x, r=jnp.where(act, r1, s["r"]),
                    z=jnp.where(act, z1, s["z"]), p=p1, rr=rr,
                    active=active, it=it, iters=iters)

    state = dict(x=x, r=r, z=z, p=p, rr=rr, active=active0,
                 it=jnp.zeros((), jnp.int32), iters=jnp.zeros(R, jnp.int32))
    out = jax.lax.while_loop(cond, body, state)
    converged = out["rr"] <= tol
    return out["x"], out["iters"], converged
