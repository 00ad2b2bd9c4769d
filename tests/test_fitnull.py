"""Golden regression tests for null-GLMM fitting.

Mirrors ``test.saige_fit_null_model`` (reference inst/unitTests/
test_SAIGE.R:44-76): fit binary + quantitative null models on the bundled
1000-sample data and compare against the pickled model fixtures.  Reference
contract: tolerance 1e-4 (mean relative); thanks to exact R-RNG replication
we hold ~1e-10 elementwise.
"""

import numpy as np
import pandas as pd
import pytest

from saigegds_tpu.config import NullModelConfig
from saigegds_tpu.models.fitnull import fit_null_glmm
from saigegds_tpu.models.nullmodel import NullModel

GDS = "/root/reference/inst/extdata/grm1k_10k_snp.gds"
PHENO = "/root/reference/inst/extdata/pheno.txt.gz"


@pytest.fixture(scope="module")
def pheno():
    return pd.read_csv(PHENO, sep="\t")


def _compare(model, ref, tol=1e-8):
    np.testing.assert_allclose(model.tau, ref.tau, rtol=0, atol=tol)
    np.testing.assert_allclose(model.coefficients, ref.coefficients,
                               rtol=tol, atol=tol)
    for f in ("linear_predictors", "fitted_values", "residuals", "cov",
              "y", "mu", "res", "V", "X1", "XV", "XXVX_inv"):
        a = np.asarray(getattr(model, f))
        b = np.asarray(getattr(ref, f))
        assert a.shape == b.shape, f
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-7, err_msg=f)
    assert model.converged == ref.converged
    # variance ratio: marker ids must match exactly (R RNG replication)
    np.testing.assert_array_equal(model.var_ratio["id"], ref.var_ratio["id"])
    np.testing.assert_allclose(model.var_ratio["ratio"],
                               ref.var_ratio["ratio"], rtol=1e-10)
    np.testing.assert_array_equal(model.variant_id, ref.variant_id)


def test_fit_binary_golden(pheno):
    m = fit_null_glmm("y ~ x1 + x2", pheno, GDS,
                      NullModelConfig(trait_type="binary"))
    ref = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    _compare(m, ref)


def test_fit_quant_golden(pheno):
    m = fit_null_glmm("yy ~ x1 + x2", pheno, GDS,
                      NullModelConfig(trait_type="quantitative"))
    ref = NullModel.load(
        "/root/reference/inst/unitTests/saige_model_quant.rds")
    _compare(m, ref)


@pytest.mark.parametrize("impl", ["dense", "packed2"])
def test_fit_binary_grm_impls(pheno, impl):
    """Every GRM operator (dense f64, 2-bit HBM-resident) reproduces the
    fixture; the default 'packed' is covered by test_fit_binary_golden."""
    m = fit_null_glmm("y ~ x1 + x2", pheno, GDS,
                      NullModelConfig(trait_type="binary", grm_impl=impl))
    ref = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    _compare(m, ref)


def test_fit_then_scan_roundtrip(pheno, tmp_path):
    """Full pipeline: our fit -> save/load -> our scan == reference pvals."""
    import saigegds_tpu as st
    from saigegds_tpu.config import ScanConfig
    from saigegds_tpu.io.rds import read_rds, strip

    m = fit_null_glmm("y ~ x1 + x2", pheno, GDS,
                      NullModelConfig(trait_type="binary"))
    fn = str(tmp_path / "model.npz")
    m.save(fn)
    df = st.assoc_spa(GDS, fn, ScanConfig(mac=4))
    ref = read_rds("/root/reference/inst/unitTests/saige_pval.rds")
    pv = np.asarray(strip(ref["pval"]))
    rel = np.abs(df["pval"].to_numpy() - pv) / np.maximum(np.abs(pv), 1e-300)
    assert np.nanmax(rel) < 1e-7


def test_fit_binary_streamed_golden(pheno):
    """stream_geno=True (out-of-core ingestion) reproduces the fixture."""
    m = fit_null_glmm("y ~ x1 + x2", pheno, GDS,
                      NullModelConfig(trait_type="binary", grm_impl="packed",
                                      stream_geno=True))
    ref = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    _compare(m, ref)


def test_marker_rows_loader_fallback():
    """Streamed-fit marker cache misses fall back to random-access reads."""
    from saigegds_tpu.models.fitnull import _MarkerRows

    calls = []
    mr = _MarkerRows(2, loader=lambda k: calls.append(k) or np.full(4, k))
    mr[0] = np.zeros(4)
    np.testing.assert_array_equal(mr[7], np.full(4, 7))   # miss -> loader
    assert calls == [7]
    np.testing.assert_array_equal(mr[7], np.full(4, 7))   # now cached
    assert calls == [7]


# ---------------------------------------------------------------------------
# formula machinery (interactions, crossing, I() arithmetic terms;
# reference hands these to R's model.matrix, R/saige_main.r:345-352)


def test_formula_terms_and_matrix():
    from saigegds_tpu.models.fitnull import (_parse_formula, _model_matrix,
                                             _term_vars)

    resp, terms = _parse_formula("y ~ a + b:c + a*d + I(log(e) + 1)")
    assert resp == "y"
    assert terms == ["a", "b:c", "d", "a:d", "I(log(e) + 1)"]
    assert _term_vars(terms) == ["a", "b", "c", "d", "e"]

    df = pd.DataFrame({
        "a": [1.0, 2.0, 3.0], "b": [0.5, 1.5, 2.5], "c": [2.0, 0.0, 1.0],
        "d": [1.0, 0.0, 2.0], "e": [1.0, np.e, np.e ** 2]})
    X, names = _model_matrix(df, terms)
    assert names == ["(Intercept)", "a", "b:c", "d", "a:d", "I(log(e) + 1)"]
    np.testing.assert_allclose(X[:, 2], df.b * df.c)
    np.testing.assert_allclose(X[:, 4], df.a * df.d)
    np.testing.assert_allclose(X[:, 5], np.log(df.e) + 1)


def test_formula_factor_interaction():
    from saigegds_tpu.models.fitnull import _model_matrix

    df = pd.DataFrame({"g": ["u", "v", "u", "w"], "x": [1.0, 2.0, 3.0, 4.0]})
    X, names = _model_matrix(df, ["g", "x", "g:x"])
    assert names == ["(Intercept)", "g_v", "g_w", "x", "g_v:x", "g_w:x"]
    np.testing.assert_allclose(X[:, 4], (df.g == "v") * df.x)
    np.testing.assert_allclose(X[:, 5], (df.g == "w") * df.x)


def test_fit_with_interaction_formula(pheno):
    """x1*x2 fit == fit with the product precomputed as a plain column."""
    ph = pheno.copy()
    ph["x12"] = ph.x1 * ph.x2
    cfg = NullModelConfig(trait_type="binary")
    m1 = fit_null_glmm("y ~ x1 * x2", pheno, GDS, cfg)
    m2 = fit_null_glmm("y ~ x1 + x2 + x12", ph, GDS, cfg)
    np.testing.assert_allclose(m1.tau, m2.tau, rtol=0, atol=1e-12)
    np.testing.assert_allclose(m1.coefficients, m2.coefficients,
                               rtol=1e-10, atol=1e-12)


def test_fit_variant_id_panel(pheno):
    """variant_id= replaces the maf/missing filter (R/saige_main.r:314-323);
    passing the fixture's own panel reproduces the golden model."""
    ref = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    m = fit_null_glmm("y ~ x1 + x2", pheno, GDS,
                      NullModelConfig(trait_type="binary"),
                      variant_id=ref.variant_id)
    _compare(m, ref)
    np.testing.assert_array_equal(m.variant_id, ref.variant_id)


def test_fit_variant_id_subset(pheno):
    """A small explicit panel fits and records exactly those variants."""
    from saigegds_tpu.io.seqarray import SeqData

    seq = SeqData(GDS)
    panel = seq.variant_id[10:510]
    m = fit_null_glmm("y ~ x1 + x2", pheno, GDS,
                      NullModelConfig(trait_type="binary"),
                      variant_id=panel)
    np.testing.assert_array_equal(m.variant_id, panel)
    assert m.converged
    with pytest.raises(ValueError, match="matches no variants"):
        fit_null_glmm("y ~ x1 + x2", pheno, GDS,
                      NullModelConfig(trait_type="binary"),
                      variant_id=np.asarray([-1, -2]))


def test_fit_telemetry_log(pheno):
    """Structured convergence telemetry (reference verbose prints,
    machine-readable): iteration taus, per-marker variance ratios."""
    m = fit_null_glmm("y ~ x1 + x2", pheno, GDS,
                      NullModelConfig(trait_type="binary"))
    log = m.fit_log
    assert log is not None
    iters = [e for e in log if e["event"] == "iteration"]
    assert len(iters) >= 2
    assert [e["iter"] for e in iters] == list(range(1, len(iters) + 1))
    # the last logged tau converges to the model's tau within the 2% rule
    last = np.asarray(iters[-1]["tau"], float)
    np.testing.assert_allclose(last, np.asarray(m.tau), rtol=0.05)
    markers = [e for e in log if e["event"] == "var_ratio_marker"]
    assert len(markers) == len(m.var_ratio["ratio"])
    np.testing.assert_allclose(sorted(e["ratio"] for e in markers),
                               sorted(np.asarray(m.var_ratio["ratio"])),
                               rtol=1e-12)


def test_fit_telemetry_escalation(pheno):
    """A tight trace-CV cutoff must surface escalation events.

    The reference escalates +10 probes unboundedly until the CV passes
    (src/saige_fitnull.cpp:644-663); an unreachable 1e-6 cutoff would
    loop forever, so this also exercises the opt-in ``nrun_max`` cap."""
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        m = fit_null_glmm("y ~ x1 + x2", pheno, GDS,
                          NullModelConfig(trait_type="binary",
                                          trace_cv_cutoff=1e-6, maxiter=2,
                                          nrun_max=60))
    esc = [e for e in m.fit_log if e["event"] == "trace_escalation"]
    assert [e["n_runs"] for e in esc[:3]] == [40, 50, 60]
    assert all(e["cv"] > 1e-6 for e in esc)
    capped = [e for e in m.fit_log if e["event"] == "trace_capped"]
    assert capped and all(e["n_runs"] == 60 for e in capped)


def test_unconverged_fit_reports_false():
    """Exhausting maxiter without meeting the tau tolerance must report
    converged=False (the reference's iter<=maxiter works because C leaves
    iter=maxiter+1; a verbatim port always returned True)."""
    import pandas as pd
    from saigegds_tpu import fit_null_glmm
    from saigegds_tpu.config import NullModelConfig

    pheno = pd.read_csv("/root/reference/inst/extdata/pheno.txt.gz", sep="\t")
    m = fit_null_glmm("y ~ x1 + x2", pheno,
                      "/root/reference/inst/extdata/grm1k_10k_snp.gds",
                      config=NullModelConfig(maxiter=1, max_num_snp=2000))
    assert m.converged == False  # noqa: E712


def test_collinear_covariate_drops_name():
    """A collinear covariate column is dropped by the QR transform; the
    coefficient names must follow (reference recaptures X_name,
    R/saige_main.r:370-377)."""
    import pandas as pd
    from saigegds_tpu import fit_null_glmm
    from saigegds_tpu.config import NullModelConfig

    pheno = pd.read_csv("/root/reference/inst/extdata/pheno.txt.gz", sep="\t")
    pheno["x3"] = 2.0 * pheno["x1"] - pheno["x2"]      # exactly collinear
    m = fit_null_glmm("y ~ x1 + x2 + x3", pheno,
                      "/root/reference/inst/extdata/grm1k_10k_snp.gds",
                      config=NullModelConfig(max_num_snp=2000))
    assert len(m.coef_names) == len(m.coefficients) == 3
