"""Failure-semantics parity: the reference's fallbacks are part of the
output contract (SURVEY.md §5) — exercise them."""

import io
import contextlib

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from saigegds_tpu.config import NullModelConfig
from saigegds_tpu.models.fitnull import _mat_inv, _pcg, fit_null_glmm
from saigegds_tpu.ops.grm import build_grm


def test_mat_inv_singular_fallback(capsys):
    """Singular X'Sigma^-1 X falls back to a general inverse with a warning
    (src/saige_fitnull.cpp:721-733)."""
    m = np.array([[1.0, 2.0], [2.0, 1.0]])   # indefinite: Cholesky fails
    out = _mat_inv(m)
    captured = capsys.readouterr().out
    assert "singular or not positive definite" in captured
    assert np.all(np.isfinite(out))


def test_pcg_nonconvergence_warns(capsys):
    """PCG hitting maxiter warns and keeps going
    (src/saige_fitnull.cpp:610-611)."""
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 3, size=(64, 128)).astype(np.int8)
    grm = build_grm(codes)
    w = np.full(128, 1e-6)          # terrible conditioning
    B = rng.normal(size=(128, 1))
    X = _pcg(grm, w, np.array([1.0, 50.0]), B, 1e-30, 2)
    assert "PCG does not converge" in capsys.readouterr().out
    assert X.shape == (128, 1)


def test_fit_determinism():
    """Same inputs + seed -> bit-identical model (counter-free replay)."""
    pheno = pd.read_csv("/root/reference/inst/extdata/pheno.txt.gz", sep="\t")
    gds = "/root/reference/inst/extdata/grm1k_10k_snp.gds"
    cfg = NullModelConfig(trait_type="binary")
    m1 = fit_null_glmm("y ~ x1 + x2", pheno, gds, cfg)
    m2 = fit_null_glmm("y ~ x1 + x2", pheno, gds, cfg)
    np.testing.assert_array_equal(m1.tau, m2.tau)
    np.testing.assert_array_equal(m1.coefficients, m2.coefficients)
    np.testing.assert_array_equal(m1.fitted_values, m2.fitted_values)
    np.testing.assert_array_equal(m1.var_ratio["ratio"],
                                  m2.var_ratio["ratio"])


def test_binary_trait_validation():
    pheno = pd.read_csv("/root/reference/inst/extdata/pheno.txt.gz", sep="\t")
    pheno = pheno.copy()
    pheno["y"] = pheno["y"] + 0.5       # not 0/1
    with pytest.raises(ValueError, match="0/1"):
        fit_null_glmm("y ~ x1 + x2", pheno,
                      "/root/reference/inst/extdata/grm1k_10k_snp.gds",
                      NullModelConfig(trait_type="binary"))


def test_no_common_samples():
    pheno = pd.read_csv("/root/reference/inst/extdata/pheno.txt.gz", sep="\t")
    pheno = pheno.copy()
    pheno["sample.id"] = ["zz" + str(i) for i in range(len(pheno))]
    with pytest.raises(ValueError, match="No common sample.id"):
        fit_null_glmm("y ~ x1 + x2", pheno,
                      "/root/reference/inst/extdata/grm1k_10k_snp.gds",
                      NullModelConfig(trait_type="binary"))
