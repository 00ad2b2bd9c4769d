"""Scalar special functions (float64) used across the test engines.

Thin wrappers of jax.scipy special functions matching the R primitives the
reference relies on (``Rf_pchisq``, ``Rf_qnorm5``, ``Rf_pnorm5``)."""

import jax.numpy as jnp
from jax.scipy import special as jsp

_SQRT2 = 1.4142135623730951


def pchisq1_sf(x):
    """Upper-tail of chi-square with 1 df: P(X > x) = erfc(sqrt(x/2))."""
    return jsp.erfc(jnp.sqrt(jnp.maximum(x, 0.0) / 2.0))


def pnorm_sf(z):
    """Upper-tail of the standard normal: P(Z > z)."""
    return 0.5 * jsp.erfc(z / _SQRT2)


def pnorm_cdf(z):
    return 0.5 * jsp.erfc(-z / _SQRT2)


def qnorm(p):
    """Standard normal quantile (lower tail)."""
    return jsp.ndtri(p)


def qchisq1_sf(p):
    """Inverse of pchisq1_sf: value x with P(X > x) = p (1 df)."""
    # chi2(1) upper quantile = qnorm(p/2)^2
    return jsp.ndtri(p / 2.0) ** 2
