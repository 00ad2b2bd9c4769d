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


def test_spa_packed_phase2_unpack():
    """Device-side 2-bit unpack is the exact inverse of the host pack, and
    spa_refine_binary(packed_n=) equals the dense-f64 call bit-for-bit."""
    import jax.numpy as jnp

    from saigegds_tpu.ops.packed_grm import pack_codes_2bit
    from saigegds_tpu.ops.score import spa_refine_binary, unpack_codes_2bit_f64

    rng = np.random.default_rng(4)
    B = 8
    from saigegds_tpu.models.nullmodel import NullModel
    model = NullModel.load(
        "/root/reference/inst/unitTests/saige_model.rds").scan_model()
    N = int(model.y.shape[0])
    codes = rng.integers(0, 3, size=(B, N)).astype(np.int8)
    codes[rng.random((B, N)) < 0.02] = 3
    packed = pack_codes_2bit(codes)
    G = np.asarray(unpack_codes_2bit_f64(jnp.asarray(packed), N))
    exp = np.where(codes == 3, np.nan, codes).astype(np.float64)
    np.testing.assert_array_equal(G, exp)
    p1, c1, b1, s1 = spa_refine_binary(model, jnp.asarray(exp))
    p2, c2, b2, s2 = spa_refine_binary(model, jnp.asarray(packed),
                                       packed_n=N)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))


def test_spa_nnz_codes_matches_f64():
    """The int8-codes nnz/cap shortcut equals the f64 computation."""
    from saigegds_tpu.assoc.single import _spa_cap, _spa_nnz

    rng = np.random.default_rng(6)
    for _ in range(5):
        B, N = 32, 257
        codes = rng.integers(0, 3, size=(B, N)).astype(np.int8)
        codes[rng.random((B, N)) < 0.05] = 3
        # force some flips (af > 0.5) and a monomorphic row
        codes[:4] = 2 - np.clip(codes[:4], 0, 2)
        codes[5] = 0
        f = np.where(codes == 3, np.nan, codes).astype(np.float64)
        np.testing.assert_array_equal(_spa_nnz(codes), _spa_nnz(f))
        assert _spa_cap(codes) == _spa_cap(f)


def test_f32_transport_shrink_lossless():
    """Dense dosage blocks ship f32 when exactly representable (DS scans:
    half the transport) and f64 otherwise — results identical either way."""
    from saigegds_tpu.assoc.single import _shrink_f32
    from saigegds_tpu.models.nullmodel import NullModel
    from saigegds_tpu.ops.score import ScanParams, score_stats_binary
    import jax.numpy as jnp

    model = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    sm = model.scan_model()
    n = sm.y.shape[0]
    rng = np.random.default_rng(5)
    # f32-representable fractional dosages (dFloat32-sourced DS analog)
    G = rng.uniform(0, 2, size=(64, n)).astype(np.float32) \
        .astype(np.float64)
    G[rng.random((64, n)) < 0.02] = np.nan
    assert _shrink_f32(G).dtype == np.float32
    # a genuinely f64 value must NOT shrink
    G64 = G.copy()
    G64[0, 0] = 0.1234567890123456789
    assert _shrink_f32(G64).dtype == np.float64

    params = ScanParams(maf=-1.0, mac=4.0, missing=0.1, spa_pval=0.05)
    want = score_stats_binary(sm, params, jnp.asarray(G))
    got = score_stats_binary(sm, params, jnp.asarray(_shrink_f32(G)))
    v = np.asarray(want.valid)
    np.testing.assert_array_equal(np.asarray(got.valid), v)
    for f in ("af", "mac", "beta", "se", "pval"):
        np.testing.assert_array_equal(np.asarray(getattr(got, f))[v],
                                      np.asarray(getattr(want, f))[v],
                                      err_msg=f)


def test_incremental_spa_flush_invariance(monkeypatch):
    """Results are identical when phase-2 SPA flushes incrementally
    (bounded flagged-set memory) vs one end-of-scan pass."""
    import saigegds_tpu.assoc.single as single_mod

    model = "/root/reference/inst/unitTests/saige_model.rds"
    want = st.assoc_spa(GDS, model, ScanConfig(mac=4))
    monkeypatch.setattr(single_mod, "SPA_FLUSH_BYTES", 1)  # flush per block
    got = st.assoc_spa(GDS, model, ScanConfig(mac=4))
    for c in want.columns:
        if want[c].dtype.kind == "f":
            np.testing.assert_array_equal(got[c].to_numpy(),
                                          want[c].to_numpy(), err_msg=c)
        else:
            assert (got[c] == want[c]).all(), c
