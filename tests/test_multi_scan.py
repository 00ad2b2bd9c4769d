"""PheWAS-mode multi-model scan: P null models over one genotype pass.

`assoc_spa_multi` shares the host decode, transport build, and upload of
every block across models (the reference re-streams the GDS per model,
R/assoc_single.r:202-222).  Contract: each returned table equals the
corresponding single-model `assoc_spa` EXACTLY — same kernels, same
payloads, same phase-2 refinement — so these tests assert bit equality.
"""

import dataclasses

import numpy as np
import pandas as pd
import pytest

import saigegds_tpu as st
from saigegds_tpu.config import ScanConfig
from saigegds_tpu.models.nullmodel import NullModel

GDS = "/root/reference/inst/extdata/grm1k_10k_snp.gds"
BIN = "/root/reference/inst/unitTests/saige_model.rds"
QUANT = "/root/reference/inst/unitTests/saige_model_quant.rds"
CFG = ScanConfig(mac=4, block_size=2048)


def _assert_df_equal(a: pd.DataFrame, b: pd.DataFrame):
    assert list(a.columns) == list(b.columns)
    for k in a.columns:
        va, vb = a[k].to_numpy(), b[k].to_numpy()
        if va.dtype.kind in "fc":
            np.testing.assert_array_equal(va, vb, err_msg=k)
        else:
            assert (va == vb).all(), k


@pytest.mark.parametrize("sparse", [False, True])
def test_multi_equals_single(sparse):
    cfg = dataclasses.replace(CFG, packed_sparse=sparse)
    multi = st.assoc_spa_multi(GDS, [BIN, QUANT], cfg)
    single_b = st.assoc_spa(GDS, BIN, cfg)
    single_q = st.assoc_spa(GDS, QUANT, cfg)
    assert len(multi) == 2
    _assert_df_equal(multi[0], single_b)
    _assert_df_equal(multi[1], single_q)


def test_multi_three_models_shared_variants():
    # same model twice + quant: tables 0 and 1 identical, all share the
    # variant set/order
    multi = st.assoc_spa_multi(GDS, [BIN, BIN, QUANT], CFG)
    _assert_df_equal(multi[0], multi[1])
    np.testing.assert_array_equal(multi[0]["id"], multi[2]["id"])


def test_multi_mesh():
    # compare against the mesh single-model scan: the sharded kernel's
    # summation order differs from the unsharded one at ~1e-16 on the SPA
    # subset, so bit equality holds within the mesh path, not across paths
    from saigegds_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8)
    multi = st.assoc_spa_multi(GDS, [BIN, QUANT], CFG, mesh=mesh)
    single_b = st.assoc_spa(GDS, BIN, CFG, mesh=mesh)
    _assert_df_equal(multi[0], single_b)


def test_multi_sample_mismatch_raises():
    m = NullModel.load(BIN)
    n = m.n_samples - 8
    sliced = dataclasses.replace(
        m,
        linear_predictors=m.linear_predictors[:n],
        fitted_values=m.fitted_values[:n], residuals=m.residuals[:n],
        y=m.y[:n], mu=m.mu[:n], res=m.res[:n], V=m.V[:n],
        X1=m.X1[:n], XV=m.XV[:, :n], XXVX_inv=m.XXVX_inv[:n],
        sample_id=np.asarray(m.sample_id)[:n])
    with pytest.raises(ValueError, match="same GDS sample columns"):
        st.assoc_spa_multi(GDS, [m, sliced], CFG)


def test_cli_multi_model_scan(tmp_path, capsys):
    from saigegds_tpu.__main__ import main
    out = str(tmp_path / "res_{}.csv")
    assert main(["scan", "--gds", GDS, "--model", BIN, "--model", QUANT,
                 "--mac", "4", "--out", out]) == 0
    assert "x2 models" in capsys.readouterr().out
    a = pd.read_csv(tmp_path / "res_0.csv")
    b = pd.read_csv(tmp_path / "res_1.csv")
    assert len(a) == len(b) > 0 and "p.norm" in a and "p.norm" not in b


def test_multi_save_pattern(tmp_path):
    out = str(tmp_path / "res_{}.csv")
    multi = st.assoc_spa_multi(GDS, [BIN], CFG, res_savefn=out)
    got = pd.read_csv(tmp_path / "res_0.csv")
    assert len(got) == len(multi[0])
    with pytest.raises(ValueError, match="res_savefn"):
        st.assoc_spa_multi(GDS, [BIN], CFG, res_savefn=str(tmp_path / "x.csv"))


def test_model_batch_grouping(tmp_path):
    """model_batch groups models into multiple passes; results and saved
    files match the single-pass run exactly."""
    one = st.assoc_spa_multi(GDS, [BIN, QUANT, BIN], CFG)
    out = str(tmp_path / "g_{}.csv")
    grouped = st.assoc_spa_multi(GDS, [BIN, QUANT, BIN], CFG,
                                 res_savefn=out, model_batch=2)
    assert len(grouped) == 3
    for a, b in zip(one, grouped):
        pd.testing.assert_frame_equal(a, b)
    for i in range(3):
        back = pd.read_csv(out.format(i))
        assert len(back) == len(one[i])
