"""fit_null_glmm_multi: PheWAS-mode batched null fits vs the single fit.

The batched fit's engine is the device fitter (2%-stopping parity with
the host bit-replay path), so lane results match fit_null_glmm within the
device-fit tolerances (cf. tests/test_fit_device.py), and all lanes share
ONE resident GRM build.
"""

import numpy as np
import pandas as pd
import pytest

from saigegds_tpu.config import NullModelConfig
from saigegds_tpu.models.fitnull import fit_null_glmm, fit_null_glmm_multi

GDS = "/root/reference/inst/extdata/grm1k_10k_snp.gds"


def _pheno():
    df = pd.read_csv("/root/reference/inst/extdata/pheno.txt.gz", sep="\t")
    # a second binary phenotype: deterministic transform with signal
    rng = np.random.default_rng(42)
    z = df["yy"].to_numpy() + rng.normal(0, 1, len(df))
    df["y2"] = (z > np.median(z)).astype(float)
    return df


@pytest.fixture(scope="module")
def fits():
    df = _pheno()
    cfg = NullModelConfig(trait_type="binary", maf=0.01, missing_rate=0.01)
    multi = fit_null_glmm_multi(["y ~ x1 + x2", "y2 ~ x1 + x2"], df, GDS,
                                cfg)
    singles = [fit_null_glmm(f, df, GDS, cfg)
               for f in ("y ~ x1 + x2", "y2 ~ x1 + x2")]
    return multi, singles


def test_multi_fit_matches_single(fits):
    multi, singles = fits
    assert len(multi) == 2
    for m, s in zip(multi, singles):
        assert m.converged and s.converged
        np.testing.assert_allclose(np.asarray(m.tau), np.asarray(s.tau),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(m.fitted_values),
                                   np.asarray(s.fitted_values), atol=2e-3)
        np.testing.assert_allclose(np.asarray(m.coefficients),
                                   np.asarray(s.coefficients), atol=5e-3)
        # variance ratios ride the SAME marker replay; the fits differ
        # only within the 2% stopping rule
        np.testing.assert_allclose(np.asarray(m.var_ratio["ratio"]),
                                   np.asarray(s.var_ratio["ratio"]),
                                   rtol=2e-2)
        assert list(m.var_ratio["id"]) == list(s.var_ratio["id"])


def test_multi_fit_scans_like_single(fits, tmp_path):
    """The multi-fit model drives the scan end to end."""
    from saigegds_tpu.assoc.single import assoc_spa
    from saigegds_tpu.config import ScanConfig
    multi, singles = fits
    cfg = ScanConfig(mac=5.0)
    a = assoc_spa(GDS, multi[0], cfg)
    b = assoc_spa(GDS, singles[0], cfg)
    assert len(a) == len(b)
    # p-values agree to the engine tolerance (not bit-replay: taus differ
    # within the 2% stopping rule)
    lp_a = np.log10(np.maximum(a["pval"].to_numpy(), 1e-300))
    lp_b = np.log10(np.maximum(b["pval"].to_numpy(), 1e-300))
    assert np.max(np.abs(lp_a - lp_b)) < 0.05


def test_multi_fit_validation():
    df = _pheno()
    with pytest.raises(ValueError, match="covariate terms"):
        fit_null_glmm_multi(["y ~ x1 + x2", "y2 ~ x1"], df, GDS)
    with pytest.raises(ValueError, match="duplicate"):
        fit_null_glmm_multi(["y ~ x1", "y ~ x1"], df, GDS)
    with pytest.raises(ValueError, match="pattern|'{}'"):
        fit_null_glmm_multi(["y ~ x1", "y2 ~ x1"], df, GDS,
                            model_savefn="model.npz")
    with pytest.raises(ValueError, match="Invalid trait type"):
        fit_null_glmm_multi(
            ["yy ~ x1"], df, GDS, NullModelConfig(trait_type="poisson"))


def test_multi_fit_quantitative():
    """Quantitative PheWAS fit end-to-end vs the single fit."""
    df = _pheno()
    rng = np.random.default_rng(7)
    df["yy2"] = df["yy"].to_numpy() + rng.normal(0, 0.5, len(df))
    cfg = NullModelConfig(trait_type="quantitative", maf=0.01)
    multi = fit_null_glmm_multi(["yy ~ x1 + x2", "yy2 ~ x1 + x2"], df,
                                GDS, cfg)
    single = fit_null_glmm("yy ~ x1 + x2", df, GDS, cfg)
    assert multi[0].converged and multi[1].converged
    np.testing.assert_allclose(np.asarray(multi[0].tau),
                               np.asarray(single.tau), rtol=3e-2)
    np.testing.assert_allclose(np.asarray(multi[0].var_ratio["ratio"]),
                               np.asarray(single.var_ratio["ratio"]),
                               rtol=3e-2)


def test_multi_fit_save_pattern(tmp_path):
    df = _pheno()
    cfg = NullModelConfig(trait_type="binary", maf=0.01)
    pat = str(tmp_path / "m_{}.npz")
    models = fit_null_glmm_multi(["y ~ x1 + x2", "y2 ~ x1 + x2"], df, GDS,
                                 cfg, model_savefn=pat)
    from saigegds_tpu.models.nullmodel import NullModel
    for p, m in enumerate(models):
        got = NullModel.load(pat.format(p))
        np.testing.assert_allclose(np.asarray(got.tau), np.asarray(m.tau),
                                   rtol=1e-12)


def test_cli_pheno_cols(tmp_path, capsys):
    """CLI `fit --pheno-cols a,b` runs the PheWAS-mode batched fit and
    writes one model per column through the '{}' pattern."""
    from saigegds_tpu.__main__ import main
    df = _pheno()
    ph = tmp_path / "pheno.tsv"
    df.to_csv(ph, sep="\t", index=False)
    out = str(tmp_path / "model_{}.npz")
    rc = main(["fit", "--formula", "ignored ~ x1 + x2",
               "--pheno-cols", "y,y2", "--pheno", str(ph),
               "--gds", GDS, "--out", out, "--maf", "0.01"])
    assert rc == 0
    from saigegds_tpu.models.nullmodel import NullModel
    for p in range(2):
        m = NullModel.load(out.format(p))
        assert m.converged and m.trait_type == "binary"


def test_calc_var_ratio_multi_matches_serial():
    """The stacked multi-phenotype variance ratio reproduces P serial
    calc_var_ratio passes lane for lane (same markers, same escalation,
    ratios to float tolerance)."""
    from saigegds_tpu.models import fitnull
    from saigegds_tpu.models.glm import glm_binomial, obj_nok_binary
    from saigegds_tpu.ops.packed_grm import build_packed_grm
    from saigegds_tpu.utils.rrandom import RRandom

    rng = np.random.default_rng(21)
    n, m, P = 600, 400, 3
    codes = rng.binomial(2, rng.uniform(0.05, 0.5, size=(m, 1)),
                         size=(m, n)).astype(np.int8)
    grm = build_packed_grm(codes)
    X = np.column_stack([np.ones(n), rng.normal(size=(n, 2))])
    cfg = NullModelConfig()
    marker_order = RRandom(cfg.seed).sample_int(m, m)
    fit0s, glmms, noks = [], [], []
    for p in range(P):
        y = (rng.random(n) < 0.3).astype(np.float64)
        f0 = glm_binomial(X, y)
        fit0s.append(f0)
        noks.append(obj_nok_binary(X, y))
        glmms.append(fitnull.GlmmFit(
            coefficients=f0.coefficients, tau=np.array([1.0, 0.2 + 0.1 * p]),
            linear_predictors=f0.linear_predictors,
            fitted_values=f0.fitted_values, residuals=f0.residuals,
            cov=np.eye(X.shape[1]), converged=True))
    multi = fitnull.calc_var_ratio_multi(grm, codes, fit0s, glmms, noks,
                                         cfg, marker_order, binary=True)
    for p in range(P):
        serial = fitnull.calc_var_ratio(grm, codes, fit0s[p], glmms[p],
                                        noks[p], cfg, marker_order,
                                        binary=True)
        assert multi[p]["id"] == serial["id"]
        np.testing.assert_allclose(multi[p]["ratio"], serial["ratio"],
                                   rtol=1e-10)
        np.testing.assert_allclose(multi[p]["var1"], serial["var1"],
                                   rtol=1e-10)
