"""Golden regression tests for the single-variant scan.

Mirrors ``test.saige_pval`` (reference inst/unitTests/test_SAIGE.R:79-106):
scan grm1k_10k_snp.gds with the pickled null models and compare against the
pickled p-value fixtures.  The reference contract is tolerance 1e-7 (mean
relative); we check max elementwise relative error, which is stricter.
"""

import numpy as np
import pytest

import saigegds_tpu as st
from saigegds_tpu.config import ScanConfig
from saigegds_tpu.io.rds import read_rds, strip

GDS = "/root/reference/inst/extdata/grm1k_10k_snp.gds"
TOL = 1e-7


def _ref_table(path):
    ref = read_rds(path)
    return {k: np.asarray(strip(ref[k])) for k in ref.names}


@pytest.fixture(scope="module")
def binary_scan():
    df = st.assoc_spa(GDS, "/root/reference/inst/unitTests/saige_model.rds",
                      ScanConfig(mac=4))
    return df, _ref_table("/root/reference/inst/unitTests/saige_pval.rds")


@pytest.fixture(scope="module")
def quant_scan():
    df = st.assoc_spa(GDS, "/root/reference/inst/unitTests/saige_model_quant.rds",
                      ScanConfig(mac=4))
    return df, _ref_table("/root/reference/inst/unitTests/saige_pval_quant.rds")


def _check(df, ref, cols):
    assert len(df) == len(ref["id"])
    np.testing.assert_array_equal(df["id"].to_numpy(), ref["id"])
    np.testing.assert_array_equal(df["pos"].to_numpy(), ref["pos"])
    for k in cols:
        a = df[k].to_numpy()
        b = ref[k]
        rel = np.abs(a - b) / np.maximum(np.abs(b), 1e-300)
        assert np.nanmax(rel) < TOL, f"{k}: max rel err {np.nanmax(rel):.3e}"


def test_binary_scan_golden(binary_scan):
    df, ref = binary_scan
    _check(df, ref, ["AF.alt", "mac", "beta", "SE", "pval", "p.norm"])
    np.testing.assert_array_equal(
        df["converged"].to_numpy(), ref["converged"].astype(bool))


def test_quant_scan_golden(quant_scan):
    df, ref = quant_scan
    _check(df, ref, ["AF.alt", "mac", "beta", "SE", "pval"])


def test_scan_column_names(binary_scan):
    df, _ = binary_scan
    assert list(df.columns) == ["id", "chr", "pos", "rs.id", "ref", "alt",
                                "AF.alt", "mac", "num", "beta", "SE", "pval",
                                "p.norm", "converged"]


def test_spa_mixed_mode_close():
    """spa_mixed=True agrees with the exact mode to ~1e-4 with equal flags."""
    import saigegds_tpu as st
    from saigegds_tpu.config import ScanConfig
    import numpy as np

    gds = "/root/reference/inst/extdata/grm1k_10k_snp.gds"
    model = "/root/reference/inst/unitTests/saige_model.rds"
    exact = st.assoc_spa(gds, model, ScanConfig(mac=4))
    mixed = st.assoc_spa(gds, model, ScanConfig(mac=4, spa_mixed=True))
    np.testing.assert_array_equal(mixed["converged"].to_numpy(),
                                  exact["converged"].to_numpy())
    rel = np.abs(mixed["pval"].to_numpy() - exact["pval"].to_numpy()) \
        / np.maximum(exact["pval"].to_numpy(), 1e-300)
    assert np.nanmax(rel) < 1e-3


def test_scan_ds_dosage_node():
    """Scans over annotation/format/DS dosage files (non-integer dosages,
    the .dsnode auto-detect branch, R/assoc_single.r:69-85)."""
    import saigegds_tpu as st
    from saigegds_tpu.config import ScanConfig
    import numpy as np

    df = st.assoc_spa("/root/reference/inst/extdata/assoc_100snp.gds",
                      "/root/reference/inst/unitTests/saige_model.rds",
                      ScanConfig(mac=4))
    assert len(df) > 0
    assert np.isfinite(df["pval"]).all()
    # fractional dosages force the dense f64 kernel (no genotype node)
    assert df["AF.alt"].between(0, 1).all()


def test_scan_block_size_invariance():
    """Results are identical across block sizes (guards the pipelined
    phase-1 window and the nnz-sorted, bucketed phase-2 batching)."""
    import pandas as pd
    import saigegds_tpu as st
    from saigegds_tpu.config import ScanConfig

    gds = "/root/reference/inst/extdata/grm1k_10k_snp.gds"
    model = "/root/reference/inst/unitTests/saige_model.rds"
    a = st.assoc_spa(gds, model, ScanConfig(mac=4, block_size=512))
    b = st.assoc_spa(gds, model, ScanConfig(mac=4, block_size=4096))
    pd.testing.assert_frame_equal(a, b)
