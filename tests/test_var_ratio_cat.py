"""MAC-categorized variance ratios (opt-in newer-SAIGEgds feature).

The reference (v1.12.5) applies ONE pooled ratio to every variant
(R/assoc_single.r:156-157); `NullModelConfig.var_ratio_mac_cat` estimates
a ratio per minor-AC bin (models/fitnull.calc_var_ratio_cat) and the scan
kernels look each variant's ratio up by its MAC (ops/score.variant_var_ratio).
"""

import numpy as np
import pandas as pd
import pytest

import saigegds_tpu as st
from saigegds_tpu.config import NullModelConfig, ScanConfig
from saigegds_tpu.ops.score import (ScanModel, ScanParams,
                                    score_stats_binary, variant_var_ratio)
from saigegds_tpu.ops.score_packed import (pack_scan_model,
                                           score_stats_binary_packed)

import jax.numpy as jnp


def _toy_model(n, rng, vr_edges=None, vr_ratios=None, var_ratio=1.0):
    X = np.column_stack([np.ones(n), rng.normal(size=n)])
    eta = X @ np.array([-1.0, 0.3])
    mu = 1 / (1 + np.exp(-eta))
    y = (rng.random(n) < mu).astype(float)
    W = mu * (1 - mu)
    XV = (X * W[:, None]).T
    XXVX_inv = X @ np.linalg.inv(X.T @ (X * W[:, None]))
    return ScanModel(
        trait_binary=True, tau=jnp.asarray([1.0, 0.5]),
        y=jnp.asarray(y), mu=jnp.asarray(mu), y_mu=jnp.asarray(y - mu),
        mu2=jnp.asarray(W), XV=jnp.asarray(XV),
        XXVX_inv=jnp.asarray(XXVX_inv), var_ratio=var_ratio,
        vr_edges=None if vr_edges is None else jnp.asarray(vr_edges),
        vr_ratios=None if vr_ratios is None else jnp.asarray(vr_ratios))


def test_lookup_bins():
    m = _toy_model(50, np.random.default_rng(0),
                   vr_edges=[10.5, 20.5], vr_ratios=[2.0, 1.5, 0.5])
    mac = jnp.asarray([1.0, 10.5, 10.6, 20.5, 20.6, 500.0])
    got = np.asarray(variant_var_ratio(m, mac))
    # bins are (lo, hi]: mac == edge belongs to the lower category
    np.testing.assert_array_equal(got, [2.0, 2.0, 1.5, 1.5, 0.5, 0.5])


def test_kernel_applies_categorical_ratio():
    """Oracle: the categorical kernel equals the scalar kernel run with
    each category's ratio, spliced by each variant's MAC."""
    rng = np.random.default_rng(1)
    n = 400
    edges, ratios = [10.5], [2.0, 0.8]
    m_cat = _toy_model(n, rng, vr_edges=edges, vr_ratios=ratios)
    params = ScanParams(maf=-1.0, mac=-1.0, missing=1.0, spa_pval=0.05)
    # block with both rare (mac <= 10) and common variants
    G = np.zeros((8, n))
    for b in range(4):
        G[b, rng.choice(n, 3 + b, replace=False)] = 1.0     # rare
    for b in range(4, 8):
        G[b] = rng.binomial(2, 0.3, n).astype(float)        # common
    res = score_stats_binary(m_cat, params, jnp.asarray(G))
    mac = np.asarray(res.mac)
    for b in range(8):
        r = ratios[0] if mac[b] <= edges[0] else ratios[1]
        m_s = m_cat._replace(vr_edges=None, vr_ratios=None, var_ratio=r)
        ref = score_stats_binary(m_s, params, jnp.asarray(G[b:b + 1]))
        np.testing.assert_allclose(res.pval[b], ref.pval[0], rtol=1e-12)
        np.testing.assert_allclose(res.beta[b], ref.beta[0], rtol=1e-12)
    # the packed integer kernel agrees with the dense one
    pm = pack_scan_model(m_cat)
    pres = score_stats_binary_packed(pm, params,
                                     jnp.asarray(G.astype(np.int8)))
    np.testing.assert_allclose(np.asarray(pres.pval), np.asarray(res.pval),
                               rtol=1e-10)


@pytest.fixture(scope="module")
def cat_fit(tmp_path_factory):
    """Small synthetic fit with rare + common GRM markers."""
    from saigegds_tpu.io.gds_write import write_seqarray_gds
    rng = np.random.default_rng(7)
    n, m = 500, 400
    af = np.concatenate([rng.uniform(0.002, 0.01, m // 2),    # rare
                         rng.uniform(0.05, 0.5, m - m // 2)])  # common
    rng.shuffle(af)
    codes = rng.binomial(2, af[:, None], size=(m, n)).astype(np.int8)
    path = str(tmp_path_factory.mktemp("vrc") / "grm.gds")
    write_seqarray_gds(path, codes,
                       sample_id=np.asarray([f"s{i}" for i in range(n)],
                                            object))
    X1 = rng.normal(size=n)
    eta = -1.0 + 0.3 * X1
    y = (rng.random(n) < 1 / (1 + np.exp(-eta))).astype(float)
    data = pd.DataFrame({"sample.id": [f"s{i}" for i in range(n)],
                         "y": y, "x1": X1})
    cfg = NullModelConfig(maf=0.0, missing_rate=1.0, num_marker=10,
                          var_ratio_mac_cat=(10.5, 20.5))
    model = st.fit_null_glmm("y ~ x1", data, path, cfg)
    return model, path, codes


def test_fit_categorical_table(cat_fit):
    model, _, _ = cat_fit
    vr = model.var_ratio
    assert "mac_cat" in vr and "mac_bins" in vr
    np.testing.assert_array_equal(vr["mac_bins"], [10.5, 20.5])
    mac = np.asarray(vr["mac"], float)
    cat = np.asarray(vr["mac_cat"], int)
    bounds = [(0, 10.5), (10.5, 20.5), (20.5, np.inf)]
    for c, (lo, hi) in enumerate(bounds):
        sel = mac[cat == c]
        assert sel.size >= 1
        assert ((sel > lo) & (sel <= hi)).all()
    # a marker never appears twice across categories
    assert len(np.unique(vr["id"])) == len(vr["id"])


def test_scan_model_category_means(cat_fit):
    model, _, _ = cat_fit
    sm = model.scan_model()
    vr = model.var_ratio
    cat = np.asarray(vr["mac_cat"], int)
    rat = np.asarray(vr["ratio"], float)
    np.testing.assert_array_equal(np.asarray(sm.vr_edges), [10.5, 20.5])
    for c in range(3):
        np.testing.assert_allclose(np.asarray(sm.vr_ratios)[c],
                                   rat[cat == c].mean(), rtol=1e-12)
    # explicit scalar override disables the categorical lookup
    sm2 = model.scan_model(var_ratio=0.9)
    assert sm2.vr_edges is None and sm2.var_ratio == 0.9


def test_roundtrip_npz_rds(cat_fit, tmp_path):
    model, _, _ = cat_fit
    for ext in ("npz", "rds"):
        p = str(tmp_path / f"m.{ext}")
        model.save(p)
        m2 = st.NullModel.load(p)
        np.testing.assert_allclose(np.asarray(m2.var_ratio["mac_bins"]),
                                   [10.5, 20.5])
        np.testing.assert_array_equal(
            np.asarray(m2.var_ratio["mac_cat"], int),
            np.asarray(model.var_ratio["mac_cat"], int))
        sm = m2.scan_model()
        np.testing.assert_allclose(np.asarray(sm.vr_ratios),
                                   np.asarray(model.scan_model().vr_ratios))


def test_scan_end_to_end_categorical(cat_fit):
    """assoc_spa with a categorical model: every variant's pval matches a
    rerun with that variant's category ratio as the scalar override."""
    model, path, codes = cat_fit
    df = st.assoc_spa(path, model, ScanConfig(mac=1.0))
    sm = model.scan_model()
    edges = np.asarray(sm.vr_edges)
    ratios = np.asarray(sm.vr_ratios)
    mac = df["mac"].to_numpy()
    cats = np.searchsorted(edges, mac, side="left")
    for c in np.unique(cats):
        df_c = st.assoc_spa(path, model,
                            ScanConfig(mac=1.0, var_ratio=float(ratios[c])))
        sel = cats == c
        np.testing.assert_allclose(df["pval"].to_numpy()[sel],
                                   df_c["pval"].to_numpy()[sel], rtol=1e-10)
