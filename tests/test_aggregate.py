"""Aggregate-test consistency checks (mirrors test.saige_acta_o,
reference inst/unitTests/test_SAIGE.R:109-133)."""

import numpy as np
import pytest

from saigegds_tpu.assoc.aggregate import (assoc_acat_o, assoc_acat_v,
                                          assoc_burden, sliding_windows)
from saigegds_tpu.io.seqarray import SeqData

GDS = "/root/reference/inst/extdata/grm1k_10k_snp.gds"
MODEL = "/root/reference/inst/unitTests/saige_model.rds"


@pytest.fixture(scope="module")
def seq():
    return SeqData(GDS)


@pytest.fixture(scope="module")
def units(seq):
    return sliding_windows(seq, win_size=200, win_shift=100)


@pytest.fixture(scope="module")
def results(seq, units):
    o = assoc_acat_o(seq, MODEL, units)
    v = assoc_acat_v(seq, MODEL, units)
    b = assoc_burden(seq, MODEL, units)
    return o, v, b


def _assert_equal_col(a, b):
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
    m = np.isfinite(a)
    np.testing.assert_allclose(a[m], b[m], rtol=1e-12)


def test_acato_matches_burden(results):
    o, v, b = results
    _assert_equal_col(o["pval.b1_1"], b["pval.b1_1"])
    _assert_equal_col(o["pval.b1_25"], b["pval.b1_25"])


def test_acato_matches_acatv(results):
    o, v, b = results
    _assert_equal_col(o["pval.v1_1"], v["pval.v1_1"])
    _assert_equal_col(o["pval.v1_25"], v["pval.v1_25"])


def test_acato_combined_is_cauchy_combination(results):
    from saigegds_tpu.utils.stats import acat_p
    o, _, _ = results
    row = o.iloc[0]
    parts = np.asarray([row["pval.b1_1"], row["pval.v1_1"],
                        row["pval.b1_25"], row["pval.v1_25"]])
    want = acat_p(parts[np.isfinite(parts)])
    assert row["pval"] == pytest.approx(want, rel=1e-12)


def test_burden_sanity(results, units):
    _, _, b = results
    assert len(b) == len(units)
    p = b["pval.b1_1"].to_numpy()
    assert np.isfinite(p).sum() > 90
    assert ((p[np.isfinite(p)] >= 0) & (p[np.isfinite(p)] <= 1)).all()


def test_single_snp_units_match_single_variant_scan(seq):
    """A unit holding one common SNP: ACAT-V's single-variant part must
    equal the plain scan p-value for that SNP."""
    import saigegds_tpu as st
    from saigegds_tpu.assoc.aggregate import VariantUnits
    from saigegds_tpu.config import ScanConfig
    import pandas as pd

    idx = [np.array([0]), np.array([1]), np.array([2])]
    units = VariantUnits(desp=pd.DataFrame({"set": ["a", "b", "c"]}), index=idx)
    v = assoc_acat_v(seq, MODEL, units)
    df = st.assoc_spa(seq, MODEL, ScanConfig(mac=0, missing=1.0))
    for i in range(3):
        assert v["pval.v1_1"].iloc[i] == pytest.approx(
            df["pval"].iloc[i], rel=1e-9)


def test_sliding_windows_variant_mask():
    """Windows honor a region selection (filter-then-window idiom)."""
    import numpy as np
    from saigegds_tpu.assoc.aggregate import sliding_windows
    from saigegds_tpu.io.seqarray import SeqData

    seq = SeqData("/root/reference/inst/extdata/grm1k_10k_snp.gds")
    mask = seq.variant_selection(chromosome="1", position_range=(2000, 4000))
    units = sliding_windows(seq, win_size=200, win_shift=100,
                            variant_mask=mask)
    assert len(units) > 0
    sel = np.concatenate(units.index)
    assert mask[sel].all()                       # only selected variants
    assert set(units.desp["chr"]) == {"1"}
    full = sliding_windows(seq, win_size=200, win_shift=100)
    assert len(units) < len(full)


def test_shard_units_merge_equals_single(seq, units, results):
    """Unit-range sharding + concat == single-host run (the multi-host
    seqUnitApply(parallel=) analog)."""
    import pandas as pd
    from saigegds_tpu.assoc.aggregate import shard_units

    o, _, _ = results
    parts = [assoc_acat_o(seq, MODEL, shard_units(units, i, 3))
             for i in range(3)]
    assert sum(len(p) for p in parts) == len(o)
    merged = pd.concat(parts, ignore_index=True)
    for c in ("pval", "pval.b1_1", "pval.v1_25"):
        _assert_equal_col(merged[c], o[c])


def test_unit_source_random_access_mode(seq, units, results):
    """Forcing the frame-random-access path (big-file mode) gives the
    same results as the whole-matrix cache."""
    import saigegds_tpu.assoc.aggregate as agg

    o, _, _ = results
    orig = agg._UnitSource.CACHE_LIMIT
    try:
        agg._UnitSource.CACHE_LIMIT = 0     # everything is "big"
        o2 = assoc_acat_o(seq, MODEL, units)
    finally:
        agg._UnitSource.CACHE_LIMIT = orig
    for c in ("pval", "pval.b1_1", "pval.v1_1"):
        _assert_equal_col(o2[c], o[c])


def test_kernel_stream_batching_invariance(seq, units, results):
    """Device batch size must not change burden results."""
    from saigegds_tpu.config import AggregateConfig

    _, _, b = results
    b2 = assoc_burden(seq, MODEL, units, AggregateConfig(block_size=17))
    for c in ("pval.b1_1", "beta.b1_25", "summac.b1_1"):
        _assert_equal_col(b2[c], b[c])


def test_device_collapse_matches_host_rows(seq, units):
    """The device burden collapse (codes ship, rows built on device via
    exact integer-slice matmuls) agrees with the host f64 collapse path
    to solver precision (~1e-12)."""
    from saigegds_tpu.io.seqarray import SeqData

    b_dev = assoc_burden(seq, MODEL, units)          # geno -> jobs path
    v_dev = assoc_acat_v(seq, MODEL, units)
    seq2 = SeqData(GDS)
    seq2.has_genotype = lambda: False                # force host row path
    b_host = assoc_burden(seq2, MODEL, units)
    v_host = assoc_acat_v(seq2, MODEL, units)
    for dev, host in ((b_dev, b_host), (v_dev, v_host)):
        assert len(dev) == len(host)
        for c in dev.columns:
            if dev[c].dtype.kind != "f":
                continue
            a = dev[c].to_numpy()
            b = host[c].to_numpy()
            np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b),
                                          err_msg=c)
            m = np.isfinite(a)
            np.testing.assert_allclose(a[m], b[m], rtol=1e-10, err_msg=c)


def test_burden_job_affine_matches_collapse():
    """_BurdenJob's affine coefficients reproduce _burden_collapse exactly
    (host algebra check, incl. all-missing SNPs and NaN-masked weights)."""
    from saigegds_tpu.assoc.aggregate import (_BurdenJob, _CodeTallies,
                                              _burden_collapse)

    rng = np.random.default_rng(11)
    S, N = 13, 97
    codes = rng.choice(np.int8([0, 0, 0, 1, 2, 3]), size=(S, N))
    codes[4] = 3                     # all-missing SNP
    codes[7] = 2                     # flips (af = 1)
    w = rng.uniform(0.1, 2.0, S)
    w[2] = np.nan                    # masked weight
    t = _CodeTallies(codes)
    clean = codes[[0, 1, 2, 3, 5, 6, 7, 8]]       # no all-missing SNP
    wc = w[[0, 1, 2, 3, 5, 6, 7, 8]]
    for cd, wrow in ((codes, w),                  # all-missing SNP -> NaN
                     (codes, np.where(np.arange(S) == 4, 0.0, w)),
                     (clean, wc)):
        tt = _CodeTallies(cd)
        job = _BurdenJob(cd, wrow[None, :], tt)
        ds = np.where(cd == 3, np.nan, cd).astype(np.float64)
        want = _burden_collapse(ds, wrow)
        g0 = np.where(cd == 3, 0, cd).astype(np.float64)
        mm = (cd == 3).astype(np.float64)
        got = job.A[0] @ g0 + job.Bm[0] @ mm + job.C[0]
        if np.isnan(want).any():
            assert np.isnan(want).all()
            assert np.isnan(got).all() and np.isnan(job.row_sums[0])
        else:
            np.testing.assert_allclose(got, want, rtol=1e-13)
            np.testing.assert_allclose(job.row_sums[0], want.sum(),
                                       rtol=1e-12)


def test_oversize_unit_device_collapse(seq):
    """A unit larger than the burden batch SNP cap dispatches alone with a
    bucketed S axis and still matches the host collapse path."""
    from saigegds_tpu.assoc.aggregate import VariantUnits
    from saigegds_tpu.io.seqarray import SeqData
    from saigegds_tpu.ops.score_packed import BURDEN_S_CAP
    import pandas as pd

    S = BURDEN_S_CAP + 500
    units = VariantUnits(desp=pd.DataFrame({"set": ["big", "small"]}),
                         index=[np.arange(S), np.arange(S, S + 40)])
    dev = assoc_burden(seq, MODEL, units)
    seq2 = SeqData(GDS)
    seq2.has_genotype = lambda: False
    host = assoc_burden(seq2, MODEL, units)
    for c in dev.columns:
        if dev[c].dtype.kind != "f":
            continue
        a, b = dev[c].to_numpy(), host[c].to_numpy()
        np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
        m = np.isfinite(a)
        np.testing.assert_allclose(a[m], b[m], rtol=1e-9, err_msg=c)


def test_burden_quant_trait(seq, units):
    """Quantitative-trait burden (saige_burden_test_quant analog): the
    device collapse + quant score path, vs the host row path."""
    from saigegds_tpu.io.seqarray import SeqData

    qmodel = "/root/reference/inst/unitTests/saige_model_quant.rds"
    dev = assoc_burden(seq, qmodel, units)
    assert len(dev) == len(units)
    assert np.isfinite(dev["pval.b1_1"]).sum() > len(units) // 2
    seq2 = SeqData(GDS)
    seq2.has_genotype = lambda: False
    host = assoc_burden(seq2, qmodel, units)
    for c in ("beta.b1_1", "SE.b1_25", "pval.b1_1", "pval.b1_25"):
        a, b = dev[c].to_numpy(), host[c].to_numpy()
        np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
        m = np.isfinite(a)
        np.testing.assert_allclose(a[m], b[m], rtol=1e-10, err_msg=c)


def test_beta_weights_boundary_matches_R_dbeta():
    """R's dbeta is finite at maf=0 for shape1=1 (NOT the 0*log(0) NaN of
    the log form): monomorphic SNPs carry weight b2 in the default
    schemes and rescale the unit's normalization (saige_main.cpp:536
    includes every finite weight)."""
    from saigegds_tpu.ops.acat import beta_weights

    maf = np.array([0.0, 0.1, 0.5, np.nan])
    w11 = beta_weights(maf, 1.0, 1.0)
    w125 = beta_weights(maf, 1.0, 25.0)
    np.testing.assert_allclose(w11[:3], [1.0, 1.0, 1.0])
    assert w125[0] == 25.0                     # dbeta(0, 1, 25)
    np.testing.assert_allclose(w125[1], 25.0 * 0.9 ** 24, rtol=1e-14)
    assert np.isnan(w11[3]) and np.isnan(w125[3])
    assert beta_weights(np.array([0.0]), 0.5, 2.0)[0] == np.inf
    assert beta_weights(np.array([0.0]), 2.0, 2.0)[0] == 0.0


def test_burden_collapse_reference_quirks():
    """ds_mat_burden parity: non-finite weights skip the SNP entirely
    (an all-missing SNP with NaN weight cannot poison the unit), and
    fractional DS dosages are int-truncated for the mean/flip bookkeeping
    while contributions use raw values (src/saige_main.cpp:526-610)."""
    from saigegds_tpu.assoc.aggregate import _burden_collapse

    # all-missing SNP with NaN weight: skipped, burden stays finite
    ds = np.array([[0.0, 1.0, 2.0, 0.0],
                   [np.nan] * 4,
                   [1.0, 0.0, 0.0, np.nan]])
    w = np.array([0.5, np.nan, 2.0])
    out = _burden_collapse(ds, w)
    assert np.isfinite(out).all()
    # row 2: n=3, trunc-sum=1, no flip, mean=1/3
    want = 0.5 * ds[0] + 2.0 * np.array([1.0, 0.0, 0.0, 1.0 / 3.0])
    np.testing.assert_allclose(out, want, rtol=1e-15)

    # fractional dosages: the reference's `int sum` accumulator floors
    # each addend, so mean/flip use sum(floor(ds)) while contributions
    # stay raw — replicate the C loop as the oracle
    rng = np.random.default_rng(5)
    ds = rng.uniform(0, 2, size=(6, 9))
    ds[rng.random((6, 9)) < 0.2] = np.nan
    w = rng.uniform(0.5, 2.0, 6)
    out = _burden_collapse(ds, w)
    want = np.zeros(9)
    for i in range(6):
        n, s = 0, 0
        for x in ds[i]:
            if np.isfinite(x):
                n += 1
                s = int(s + x)                  # C: int sum; sum += s[j]
        m = s / n
        if s <= n:
            want += np.where(np.isfinite(ds[i]), ds[i], m) * w[i]
        else:
            want += np.where(np.isfinite(ds[i]), 2 - ds[i], 2 - m) * w[i]
    np.testing.assert_allclose(out, want, rtol=1e-14)


def test_aggregate_incremental_spa_flush_invariance(seq, units, monkeypatch):
    """Aggregate phase-2 flushes incrementally under a tiny budget with
    identical results (bounded flagged-set memory)."""
    import saigegds_tpu.assoc.single as single_mod

    want = assoc_acat_v(seq, MODEL, units)
    monkeypatch.setattr(single_mod, "SPA_FLUSH_BYTES", 1)
    got = assoc_acat_v(seq, MODEL, units)
    for c in want.columns:
        if want[c].dtype.kind == "f":
            a, b = got[c].to_numpy(), want[c].to_numpy()
            np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
            m = np.isfinite(a)
            np.testing.assert_array_equal(a[m], b[m], err_msg=c)
