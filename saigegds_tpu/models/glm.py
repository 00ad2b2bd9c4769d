"""R-compatible GLM fitting and the SPAtest-style null-model projections.

Host-side (numpy, float64): these are tiny dense problems solved once per
fit; matching R's ``glm`` IRLS and SPAtest's ``ScoreTest_wSaddleApprox_
NULL_Model`` semantics exactly (the reference calls them at
``R/saige_main.r:480-488`` and hand-builds the quantitative analog at
``:560-570``) is what matters, not device placement.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class GlmFit:
    coefficients: np.ndarray      # [K]
    linear_predictors: np.ndarray  # [N] eta
    fitted_values: np.ndarray     # [N] mu
    residuals: np.ndarray         # [N] working residuals (y-mu)/mu'
    y: np.ndarray
    family: str                   # "binomial" | "gaussian"

    @property
    def offset(self):
        return np.zeros_like(self.y)


def glm_binomial(X: np.ndarray, y: np.ndarray, maxit: int = 25,
                 epsilon: float = 1e-8) -> GlmFit:
    """R's glm(family=binomial) IRLS with the same start/convergence rules."""
    n = len(y)
    mu = (y + 0.5) / 2.0
    eta = np.log(mu / (1.0 - mu))
    dev = _binomial_deviance(y, mu)
    beta = np.zeros(X.shape[1])
    eps = np.finfo(float).eps
    for _ in range(maxit):
        # R's logit mu.eta floors at .Machine$double.eps (make.link), so
        # quasi-separated fits stay finite instead of dividing by zero
        mu_eta = np.maximum(mu * (1.0 - mu), eps)
        z = eta + (y - mu) / mu_eta
        W = mu_eta                         # weights: mu'(eta)^2 / var(mu)
        WX = X * W[:, None]
        beta = np.linalg.solve(X.T @ WX, WX.T @ z)
        eta = X @ beta
        # R's linkinv clamps eta to ~ +-30 (plogis saturation guard)
        mu = 1.0 / (1.0 + np.exp(-np.clip(eta, -30.0, 30.0)))
        dev_new = _binomial_deviance(y, mu)
        if abs(dev_new - dev) / (abs(dev_new) + 0.1) < epsilon:
            dev = dev_new
            break
        dev = dev_new
    return GlmFit(coefficients=beta, linear_predictors=eta, fitted_values=mu,
                  residuals=(y - mu) / (mu * (1.0 - mu)), y=y,
                  family="binomial")


def glm_gaussian(X: np.ndarray, y: np.ndarray) -> GlmFit:
    """R's glm() with gaussian family = ordinary least squares."""
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    eta = X @ beta
    return GlmFit(coefficients=beta, linear_predictors=eta, fitted_values=eta,
                  residuals=y - eta, y=y, family="gaussian")


def _binomial_deviance(y, mu):
    eps = 1e-300
    t1 = np.where(y > 0, y * np.log(np.maximum(y, eps) / mu), 0.0)
    t0 = np.where(y < 1, (1 - y) * np.log(np.maximum(1 - y, eps) / (1 - mu)), 0.0)
    return 2.0 * np.sum(t1 + t0)


def get_x1(X1: np.ndarray) -> np.ndarray:
    """SPAtest:::ScoreTest_wSaddleApprox_Get_X1: drop duplicate/rank-deficient
    columns (identical first two columns; SVD basis if rank-deficient)."""
    q1 = X1.shape[1]
    if q1 >= 2 and np.sum(np.abs(X1[:, 0] - X1[:, 1])) == 0:
        X1 = X1[:, 1:]
        q1 -= 1
    # SPAtest uses qr(X1)$rank: LINPACK pivoted QR with tol=1e-7 —
    # much looser than numpy's matrix_rank default, so near-collinear
    # designs reduce the way the reference reduces them
    r_diag = np.abs(np.diag(np.linalg.qr(X1, mode="r")))
    rank = int(np.sum(r_diag > 1e-7 * r_diag.max())) if r_diag.size else 0
    if rank < q1:
        u, s, vt = np.linalg.svd(X1, full_matrices=False)
        X1 = u[:, :rank]
    return X1


@dataclass
class ObjNoK:
    """The SA_NULL projection state (SPAtest's obj.noK)."""

    y: np.ndarray
    mu: np.ndarray
    res: np.ndarray
    V: np.ndarray
    X1: np.ndarray         # [N, K]
    XV: np.ndarray         # [K, N]
    XXVX_inv: np.ndarray   # [N, K]


def obj_nok_binary(X1: np.ndarray, y: np.ndarray) -> ObjNoK:
    """SPAtest:::ScoreTest_wSaddleApprox_NULL_Model (binomial)."""
    X1 = get_x1(X1)
    fit = glm_binomial(X1, y)
    mu = fit.fitted_values
    V = mu * (1.0 - mu)
    XV = (X1 * V[:, None]).T
    XVX_inv = np.linalg.inv(X1.T @ (X1 * V[:, None]))
    XXVX_inv = X1 @ XVX_inv
    return ObjNoK(y=y.astype(np.float64), mu=mu, res=y - mu, V=V, X1=X1,
                  XV=XV, XXVX_inv=XXVX_inv)


def obj_nok_quant(X1: np.ndarray, fit: GlmFit) -> ObjNoK:
    """The reference's hand-built quantitative analog (R/saige_main.r:560-570)."""
    X1 = get_x1(X1)
    y = fit.y
    mu = fit.fitted_values
    return ObjNoK(y=y.astype(np.float64), mu=mu, res=y - mu,
                  V=np.ones_like(y), X1=X1, XV=X1.T,
                  XXVX_inv=X1 @ np.linalg.inv(X1.T @ X1))


def rank_norm(x: np.ndarray) -> np.ndarray:
    """R's .rank_norm: qnorm((rank(x) - 0.5) / length(x)) with average ties."""
    from scipy.stats import rankdata, norm
    r = rankdata(x, method="average")
    return norm.ppf((r - 0.5) / len(x))


def qr_transform(X: np.ndarray):
    """The reference's X.transform (R/saige_main.r:356-387): drop collinear
    columns, then X_new = qr.Q(X) * sqrt(n).  Returns (X_new, R, keep): R
    is the qr.R factor used to un-rotate coefficients afterwards
    (:616-623) and ``keep`` the retained-column mask (the reference
    recaptures X_name after the exclusion, :370-377)."""
    n = X.shape[0]
    # multicollinearity: lm(y ~ X - 1) NA coefficients <-> rank deficiency
    q, r = np.linalg.qr(X)
    keep = np.abs(np.diag(r)) > np.finfo(float).eps * abs(r[0, 0]) * max(X.shape)
    if not keep.all():
        X = X[:, keep]
        q, r = np.linalg.qr(X)
    # numpy's Householder QR (dgeqrf) matches R's qr() sign conventions
    # (verified against the reference fixture's obj.noK$X1 to 3e-13)
    return q * np.sqrt(n), r, keep
