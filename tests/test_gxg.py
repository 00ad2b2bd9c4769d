"""GxG interaction test checks (no reference fixture exists; validated by
internal consistency with the fitting machinery)."""

import numpy as np
import pandas as pd
import pytest

from saigegds_tpu.assoc.gxg import gxg_spa, _minor_allele_geno
from saigegds_tpu.config import NullModelConfig

GDS = "/root/reference/inst/extdata/grm1k_10k_snp.gds"


@pytest.fixture(scope="module")
def pheno():
    return pd.read_csv("/root/reference/inst/extdata/pheno.txt.gz", sep="\t")


def test_minor_allele_geno():
    g = np.array([2.0, 2.0, 1.0, np.nan])
    out = _minor_allele_geno(g)
    # mean-impute (5/3), then af > 1 -> flip
    assert out[3] == pytest.approx(2 - 5 / 3)
    assert out[0] == 0.0 and out[2] == 1.0


@pytest.fixture(scope="module")
def result(pheno):
    pairs = pd.DataFrame({"snp1": [100], "snp2": [200]})
    return gxg_spa("y ~ x1 + x2", pheno, GDS, pairs)


def test_gxg_columns(result):
    assert list(result.columns) == ["id1", "snp1", "maf1", "id2", "snp2",
                                    "maf2", "beta", "SE", "n_nonzero", "pval",
                                    "p.norm", "converged", "tau_G"]


def test_gxg_values_sane(result):
    row = result.iloc[0]
    assert 0 < row["pval"] <= 1
    assert row["n_nonzero"] > 0
    assert 0 < row["tau_G"] < 1
    assert row["converged"]


def test_gxg_approx_tau_uses_global_tau(pheno):
    pairs = pd.DataFrame({"snp1": [100], "snp2": [200]})
    out = gxg_spa("y ~ x1 + x2", pheno, GDS, pairs, use_approx_tau=True)
    # the pre-fitted null tau_G on this data is 0.3322 (reference fixture)
    assert out["tau_G"].iloc[0] == pytest.approx(0.33220629, abs=1e-6)


def test_gxg_quant_unimplemented(pheno):
    pairs = pd.DataFrame({"snp1": [100], "snp2": [200]})
    with pytest.raises(NotImplementedError):
        gxg_spa("yy ~ x1 + x2", pheno, GDS, pairs,
                config=NullModelConfig(trait_type="quantitative"))


def test_gxg_glm_threshold_screen(pheno):
    """glm_threshold screens pairs with a plain-GLM p-value first
    (R/saige_interaction.r:496-516): p.glm columns appear, and pairs
    failing the screen skip the GLMM refit (pval == NaN or from GLM)."""
    pairs = pd.DataFrame({"id1": [1, 3], "id2": [2, 4]})
    out = gxg_spa("y ~ x1 + x2", pheno, GDS, pairs, glm_threshold=0.99)
    assert "p.glm" in out.columns and "p.glm.norm" in out.columns
    assert len(out) == 2
    assert np.isfinite(out["p.glm"]).all()
    # with an impossible threshold no pair runs the GLMM
    out2 = gxg_spa("y ~ x1 + x2", pheno, GDS, pairs, glm_threshold=1e-30)
    assert not np.isfinite(out2["pval"]).any() or \
        (out2["pval"] == out2["p.glm"]).all()
