"""Single-dispatch on-device fit vs the host-driven exact fitter."""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from saigegds_tpu.config import NullModelConfig
from saigegds_tpu.models.fit_device import fit_glmm_binary_device
from saigegds_tpu.models.fitnull import fit_null_glmm, _genotype_codes
from saigegds_tpu.models.glm import glm_binomial
from saigegds_tpu.io.seqarray import SeqData
from saigegds_tpu.ops.grm import build_grm
from saigegds_tpu.ops.packed_grm import build_packed_grm
from saigegds_tpu.models.nullmodel import NullModel
from saigegds_tpu.utils.rrandom import RRandom

GDS = "/root/reference/inst/extdata/grm1k_10k_snp.gds"


@pytest.mark.parametrize("packed", [False, True])
def test_device_fit_matches_host(packed):
    ref = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    pheno = pd.read_csv("/root/reference/inst/extdata/pheno.txt.gz", sep="\t")
    seq = SeqData(GDS)
    codes = _genotype_codes(seq)
    # same variant filtering as the driver: reuse the model's variant ids
    keep = np.isin(seq.variant_id, ref.variant_id)
    codes = codes[keep]
    grm = build_packed_grm(codes) if packed else build_grm(codes)

    # covariates after the driver's QR transform: use the model's X1
    X = np.asarray(ref.X1)
    y = np.asarray(ref.y)
    fit0 = glm_binomial(X, y)
    rng = RRandom(200)
    U = np.stack([rng.rademacher(len(y)).astype(np.float64)
                  for _ in range(30)], axis=1)

    out = fit_glmm_binary_device(grm, jnp.asarray(y), jnp.asarray(X),
                                 jnp.asarray([1.0, 0.5]),
                                 jnp.asarray(fit0.linear_predictors),
                                 jnp.asarray(U), 0.02, 1e-5)
    assert bool(out.converged)
    tau = np.asarray(out.tau)
    np.testing.assert_allclose(tau, np.asarray(ref.tau), atol=5e-3)
    # coefficients in the rotated basis: compare fitted values instead
    np.testing.assert_allclose(np.asarray(out.mu),
                               np.asarray(ref.fitted_values), atol=2e-3)


def test_quant_device_fit_matches_host():
    from saigegds_tpu.models.fit_device import fit_glmm_quant_device

    ref = NullModel.load(
        "/root/reference/inst/unitTests/saige_model_quant.rds")
    seq = SeqData(GDS)
    codes = _genotype_codes(seq)
    codes = codes[np.isin(seq.variant_id, ref.variant_id)]
    grm = build_packed_grm(codes)

    # the quant driver's working y (inv-norm applied) is stored in the model
    X = np.asarray(ref.X1)
    y = np.asarray(ref.y)
    rng = RRandom(200)
    U = np.stack([rng.rademacher(len(y)).astype(np.float64)
                  for _ in range(30)], axis=1)
    tau0 = np.var(y, ddof=1) * np.array([0.5, 0.5])

    out = fit_glmm_quant_device(grm, jnp.asarray(y), jnp.asarray(X),
                                jnp.asarray(tau0), jnp.asarray(U),
                                0.02, 1e-5)
    assert bool(out.converged)
    np.testing.assert_allclose(np.asarray(out.tau), np.asarray(ref.tau),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(out.eta),
                               np.asarray(ref.linear_predictors), atol=5e-2)


def test_device_fit_trace_escalation_and_host_bound():
    """Probe-pool CV escalation + host comparison: the device fit's tau
    must track the host fitter (same stopping semantics) tightly."""
    from saigegds_tpu.models.fitnull import fit_ai_pcg
    from saigegds_tpu.models.glm import obj_nok_binary

    ref = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    seq = SeqData(GDS)
    codes = _genotype_codes(seq)
    codes = codes[np.isin(seq.variant_id, ref.variant_id)]
    grm = build_packed_grm(codes)
    X = np.asarray(ref.X1)
    y = np.asarray(ref.y)
    fit0 = glm_binomial(X, y)

    # pool of 60 probes: escalation headroom past the initial 30
    rng = RRandom(200)
    U = np.stack([rng.rademacher(len(y)).astype(np.float64)
                  for _ in range(60)], axis=1)

    host = fit_ai_pcg(grm, fit0, X, np.array([1.0, 0.5]),
                      NullModelConfig(trait_type="binary"), binary=True)
    out = fit_glmm_binary_device(grm, jnp.asarray(y), jnp.asarray(X),
                                 jnp.asarray([1.0, 0.5]),
                                 jnp.asarray(fit0.linear_predictors),
                                 jnp.asarray(U), 0.02, 1e-5)
    assert bool(out.converged)
    # explicit quantitative bound vs the golden host path: both stop at
    # the 2% AI-REML rule, so the convergence metric itself is the bound
    a, b = float(out.tau[1]), float(host.tau[1])
    assert abs(a - b) / (abs(a) + abs(b) + 0.02) < 0.02, (a, b)
    np.testing.assert_allclose(np.asarray(out.mu),
                               np.asarray(host.fitted_values), atol=2e-3)


def test_device_fit_tau_retry_on_blowup():
    """A degenerate tiny problem that blows tau up must exercise the
    halving retry and still terminate with finite tau."""
    rng = np.random.default_rng(0)
    n = 64
    codes = rng.integers(0, 3, size=(16, n)).astype(np.int8)
    grm = build_grm(codes)
    X = np.column_stack([np.ones(n)])
    y = (rng.random(n) < 0.5).astype(np.float64)
    eta = np.full(n, np.log(y.mean() / (1 - y.mean())))
    U = rng.choice([-1.0, 1.0], size=(n, 30))
    # absurd starting tau forces max(tau) > 1/tol^2 retries
    out = fit_glmm_binary_device(grm, jnp.asarray(y), jnp.asarray(X),
                                 jnp.asarray([1.0, 1e7]), jnp.asarray(eta),
                                 jnp.asarray(U), 0.02, 1e-5)
    tau = np.asarray(out.tau)
    assert np.all(np.isfinite(tau)) and np.all(tau >= 0.0)
    assert tau[1] < 1.0 / 0.02 ** 2
