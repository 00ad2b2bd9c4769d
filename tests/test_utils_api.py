"""API-surface parity utilities: user-genotype driver, heritability,
repr, device_info."""

import numpy as np
import pandas as pd
import pytest

import saigegds_tpu as st
from saigegds_tpu.config import ScanConfig
from saigegds_tpu.io.seqarray import SeqData
from saigegds_tpu.models.nullmodel import NullModel

MODEL = "/root/reference/inst/unitTests/saige_model.rds"
GDS = "/root/reference/inst/extdata/grm1k_10k_snp.gds"


@pytest.fixture(scope="module")
def model():
    return NullModel.load(MODEL)


def test_assoc_spa_user_matches_gds(model):
    """User-callback scan == GDS scan on the same dosages."""
    seq = SeqData(GDS)
    nv = 300

    def geno_fn(s, e):
        return seq.dosage_block(s, e)

    want = st.assoc_spa(GDS, model, ScanConfig(mac=4, block_size=128))
    got = st.assoc_spa_user(geno_fn, nv, model,
                            ScanConfig(mac=4, block_size=128),
                            variant_id=seq.variant_id)
    w = want[want["id"].isin(got["id"])].reset_index(drop=True)
    g = got[got["id"].isin(w["id"])].reset_index(drop=True)
    np.testing.assert_allclose(g["pval"].to_numpy(), w["pval"].to_numpy(),
                               rtol=1e-12)
    np.testing.assert_allclose(g["beta"].to_numpy(), w["beta"].to_numpy(),
                               rtol=1e-12)


def test_assoc_spa_user_bad_shape(model):
    with pytest.raises(ValueError, match="expected"):
        st.assoc_spa_user(lambda s, e: np.zeros((e - s, 7)), 10, model)


def test_heritability(model):
    h_adj = st.glmm_heritability(model, adjust=True)
    h_raw = st.glmm_heritability(model, adjust=False)
    tau_g = float(model.tau[1])
    assert h_raw == pytest.approx(tau_g / (np.pi ** 2 / 3 + tau_g))
    p = float(np.mean(model.y == 1))
    assert h_adj == pytest.approx(h_raw * (2.970 + 0.372 * np.log10(p)))


def test_repr(model):
    r = repr(model)
    assert "trait_type='binary'" in r and "tau" in r and "var.ratio" in r


def test_device_info():
    s = st.device_info()
    assert "backend=" in s and "devices=" in s


def test_phase_timer(capsys):
    with st.phase_timer("unit"):
        pass
    out = capsys.readouterr().out
    assert "[unit] start" in out and "[unit] done" in out


def test_profile_trace(tmp_path):
    import jax.numpy as jnp
    with st.profile_trace(str(tmp_path / "trace")):
        (jnp.ones(16) * 2).block_until_ready()
    import os
    assert any(os.scandir(tmp_path / "trace"))


def test_assoc_verbose(capsys):
    from saigegds_tpu.config import ScanConfig
    st.assoc_spa("/root/reference/inst/extdata/grm1k_10k_snp.gds",
                 "/root/reference/inst/unitTests/saige_model.rds",
                 ScanConfig(mac=4), verbose=True)
    out = capsys.readouterr().out
    assert "SPA association scan" in out and "tested" in out


def test_cli_info_and_fit(tmp_path, capsys):
    from saigegds_tpu.__main__ import main
    assert main(["info"]) == 0
    out = str(tmp_path / "m.npz")
    assert main(["fit", "--formula", "y ~ x1 + x2",
                 "--pheno", "/root/reference/inst/extdata/pheno.txt.gz",
                 "--gds", "/root/reference/inst/extdata/grm1k_10k_snp.gds",
                 "--out", out, "--checkpoint", str(tmp_path / "ck")]) == 0
    assert main(["scan", "--gds",
                 "/root/reference/inst/extdata/grm1k_10k_snp.gds",
                 "--model", out, "--mac", "4",
                 "--out", str(tmp_path / "a.parquet")]) == 0
    text = capsys.readouterr().out
    assert "tested" in text


def test_cli_gxg(tmp_path, capsys):
    """`python -m saigegds_tpu gxg` reproduces the API path on an extdata
    pair (reference exports seqGLMM_GxG_spa at the same CLI level,
    R/saige_interaction.r:44)."""
    from saigegds_tpu.__main__ import main
    pairs = tmp_path / "pairs.tsv"
    pairs.write_text("100\t200\n")      # headerless: both fields numeric
    out = str(tmp_path / "gxg.csv")
    assert main(["gxg", "--formula", "y ~ x1 + x2",
                 "--pheno", "/root/reference/inst/extdata/pheno.txt.gz",
                 "--gds", "/root/reference/inst/extdata/grm1k_10k_snp.gds",
                 "--pairs", str(pairs), "--out", out,
                 "--use-approx-tau"]) == 0
    text = capsys.readouterr().out
    assert "gxg: 1 pairs" in text
    import pandas as pd
    tab = pd.read_csv(out)
    row = tab.iloc[0]
    assert 0.0 < row["pval"] <= 1.0 and np.isfinite(row["beta"])
    # header row on the pairs file parses identically
    pairs2 = tmp_path / "pairs_h.tsv"
    pairs2.write_text("snp1\tsnp2\n100\t200\n")
    from saigegds_tpu.__main__ import _read_pairs
    df = _read_pairs(str(pairs2))
    assert list(df.iloc[0]) == [100, 200] and len(df) == 1


def test_variant_selection():
    """SeqData.variant_selection — the seqSetFilter(Chrom) analog."""
    from saigegds_tpu.io.seqarray import SeqData
    import numpy as np

    seq = SeqData("/root/reference/inst/extdata/grm1k_10k_snp.gds")
    m = seq.variant_selection(chromosome="1")
    assert m.sum() == (seq.chromosome.astype(str) == "1").sum()
    lo, hi = int(seq.position[100]), int(seq.position[200])
    m2 = seq.variant_selection(position_range=(lo, hi))
    assert m2.any()
    assert np.all((seq.position[m2] >= lo) & (seq.position[m2] <= hi))
    m3 = seq.variant_selection(variant_id=seq.variant_id[:5])
    assert m3.sum() == 5
    # predicates AND together
    m4 = seq.variant_selection(chromosome="1", position_range=(lo, hi))
    np.testing.assert_array_equal(m4, m & m2)


def test_load_pval_rda_and_column_subset(tmp_path):
    """.rda result files load via the RData container; GDS column subsets
    skip inflating unrequested columns (both reference behaviors)."""
    import numpy as np
    import pandas as pd
    from saigegds_tpu.io.rds_write import write_rdata
    from saigegds_tpu.io.rds import RObject
    from saigegds_tpu.utils.stats import load_pval

    df = {"id": np.arange(5), "pval": np.linspace(0.1, 0.5, 5)}
    robj = RObject(dict(df), {"names": np.array(["id", "pval"], object),
                              "class": np.array(["data.frame"], object),
                              "row.names": np.arange(1, 6)})
    fn = str(tmp_path / "res.rda")
    write_rdata(fn, {"res": robj})
    out = load_pval(fn)
    np.testing.assert_allclose(out["pval"], df["pval"])

    from saigegds_tpu.io.gds_write import save_assoc_gds
    gfn = str(tmp_path / "res.gds")
    save_assoc_gds(pd.DataFrame(df), gfn)
    out2 = load_pval(gfn, columns=["pval"])
    assert list(out2.columns) == ["pval"]


def test_mean_var_ratio_nan_handling():
    """NaN ratios are skipped (na.rm=TRUE); an all-NaN table errors like
    the reference's is.finite check (R/assoc_single.r:21-22, 157)."""
    import numpy as np
    import pytest as _pytest
    from saigegds_tpu.models.nullmodel import NullModel

    g = NullModel.load("/root/reference/inst/unitTests/saige_model.rds")
    vr = {k: np.asarray(v) for k, v in g.var_ratio.items()}
    vr["ratio"] = np.array([1.0, np.nan, 3.0])
    m = g._replace(var_ratio=vr) if hasattr(g, "_replace") else None
    if m is None:
        import dataclasses
        m = dataclasses.replace(g, var_ratio=vr)
    assert m.mean_var_ratio == 2.0
    vr2 = dict(vr)
    vr2["ratio"] = np.array([np.nan])
    import dataclasses
    m2 = dataclasses.replace(g, var_ratio=vr2) if dataclasses.is_dataclass(g) \
        else g._replace(var_ratio=vr2)
    with _pytest.raises(ValueError):
        m2.mean_var_ratio


def test_save_assoc_rds_rda_roundtrip(tmp_path):
    """assoc results save to .rds / .rda like the reference
    (R/assoc_single.r:317-325; the .rda object is named .res) and load
    back via load_pval."""
    import numpy as np
    import saigegds_tpu as st
    from saigegds_tpu.config import ScanConfig
    from saigegds_tpu.utils.stats import load_pval

    df = st.assoc_spa("/root/reference/inst/extdata/grm1k_10k_snp.gds",
                      "/root/reference/inst/unitTests/saige_model.rds",
                      ScanConfig(mac=4),
                      variant_mask=np.arange(10000) < 300)
    for ext in ("rds", "rda"):
        fn = str(tmp_path / f"res.{ext}")
        from saigegds_tpu.assoc.single import save_assoc
        save_assoc(df, fn)
        back = load_pval(fn)
        assert list(back.columns) == list(df.columns)
        np.testing.assert_allclose(back["pval"].to_numpy(),
                                   df["pval"].to_numpy(), rtol=0)
        assert (back["id"].to_numpy() == df["id"].to_numpy()).all()


def test_save_assoc_res_compress(tmp_path):
    """res_compress plumbs the reference's choices through every container
    (R/assoc_single.r:93,105-106,313): gds column pipes, rds/rda streams."""
    import numpy as np
    import pytest as _pytest
    import saigegds_tpu as st
    from saigegds_tpu.assoc.single import save_assoc
    from saigegds_tpu.config import ScanConfig
    from saigegds_tpu.utils.stats import load_pval

    df = st.assoc_spa("/root/reference/inst/extdata/grm1k_10k_snp.gds",
                      "/root/reference/inst/unitTests/saige_model.rds",
                      ScanConfig(mac=4),
                      variant_mask=np.arange(10000) < 200)
    sizes = {}
    for cm in ("LZMA", "LZMA_RA", "ZIP", "ZIP_RA", "none"):
        for ext in ("gds", "rds", "rda"):
            fn = str(tmp_path / f"res_{cm}.{ext}")
            save_assoc(df, fn, res_compress=cm)
            back = load_pval(fn)
            np.testing.assert_allclose(back["pval"].to_numpy(),
                                       df["pval"].to_numpy(), rtol=0)
            sizes[(cm, ext)] = __import__("os").path.getsize(fn)
    # compression must actually act in the gds container ("none" really
    # stores raw there); for rds/rda the reference's switch maps "none"
    # to saveRDS's gzip DEFAULT (R/assoc_single.r:313-314 falls through
    # to TRUE), so only the xz-vs-gzip distinction is observable
    for cm in ("LZMA", "ZIP"):
        assert sizes[(cm, "gds")] < sizes[("none", "gds")], cm
    for ext in ("rds", "rda"):
        assert sizes[("LZMA", ext)] != sizes[("ZIP", ext)], ext
        assert sizes[("ZIP", ext)] == sizes[("none", ext)], ext
    with _pytest.raises(ValueError, match="res_compress"):
        save_assoc(df, str(tmp_path / "x.gds"), res_compress="GZIP")
