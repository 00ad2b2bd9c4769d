"""GDS / RDS reader tests against the reference's bundled data."""

import numpy as np
import pytest

from saigegds_tpu.io.gds import open_gds
from saigegds_tpu.io.rds import read_rds, strip

GRM_GDS = "/root/reference/inst/extdata/grm1k_10k_snp.gds"
ASSOC_GDS = "/root/reference/inst/extdata/assoc_100snp.gds"
PVAL_RDS = "/root/reference/inst/unitTests/saige_pval.rds"
MODEL_RDS = "/root/reference/inst/unitTests/saige_model.rds"


def test_gds_tree():
    g = open_gds(GRM_GDS)
    root = g.root
    assert root.attrs["FileFormat"] == "SEQ_ARRAY"
    assert set(root.ls()) >= {"sample.id", "variant.id", "position",
                              "chromosome", "allele", "genotype"}
    assert root["genotype/data"].cls == "dBit2"
    assert root["genotype/data"].dims == [10000, 1000, 2]


def test_gds_arrays():
    g = open_gds(GRM_GDS)
    sid = g.root["sample.id"].read()
    assert list(sid[:3]) == ["s1", "s2", "s3"] and sid[-1] == "s1000"
    vid = g.root["variant.id"].read()
    assert vid[0] == 1 and vid[-1] == 10000
    pos = g.root["position"].read()
    assert pos.shape == (10000,)


def test_genotype_af_matches_fixture():
    """Decoded 2-bit genotypes reproduce the fixture's AF.alt exactly."""
    g = open_gds(GRM_GDS)
    geno = g.root["genotype/data"].read()
    miss = (geno == 3).any(axis=2)
    ds = geno.sum(axis=2).astype(float)
    ds[miss] = np.nan
    af = np.nanmean(ds, axis=1) / 2.0
    ref = read_rds(PVAL_RDS)
    af_ref = strip(ref["AF.alt"])
    np.testing.assert_allclose(af, af_ref, rtol=1e-12)


def test_gds_packed_real_dosage():
    g = open_gds(ASSOC_GDS)
    node = g.root["annotation/format/DS/data"]
    assert node.cls == "dPackedReal8U"
    ds = node.read()
    assert ds.shape == (100, 1000)
    assert np.nanmin(ds) >= 0.0 and np.nanmax(ds) <= 2.0


def test_rds_model_fixture():
    m = read_rds(MODEL_RDS)
    assert m.names[:3] == ["coefficients", "tau", "linear.predictors"]
    tau = strip(m["tau"])
    assert tau.shape == (2,) and tau[0] == 1.0
    nok = m["obj.noK"]
    assert len(strip(nok["y"])) == 1000


def test_rds_quant_model_altrep():
    m = read_rds("/root/reference/inst/unitTests/saige_model_quant.rds")
    y = np.asarray(strip(m["obj.noK"]["y"]), dtype=np.float64)
    assert y.shape == (1000,)
    assert np.isfinite(y).all()


def test_gds_writer_roundtrip(tmp_path):
    """SAIGE_OUTPUT GDS write -> load_pval read."""
    import pandas as pd
    import saigegds_tpu as st
    from saigegds_tpu.io.gds_write import save_assoc_gds

    df = pd.DataFrame({
        "id": np.arange(1, 8, dtype=np.int32),
        "rs.id": [f"rs{i}" for i in range(7)],
        "pval": np.linspace(1e-12, 0.9, 7),
        "beta": np.linspace(-2, 2, 7),
    })
    fn = str(tmp_path / "out.gds")
    save_assoc_gds(df, fn)
    back = st.load_pval(fn)
    np.testing.assert_array_equal(back["id"], df["id"])
    assert list(back["rs.id"]) == list(df["rs.id"])
    np.testing.assert_allclose(back["pval"], df["pval"], rtol=0)
    np.testing.assert_allclose(back["beta"], df["beta"], rtol=0)


def test_assoc_spa_gds_output(tmp_path):
    """assoc_spa(res_savefn='*.gds') round-trips through load_pval."""
    import saigegds_tpu as st
    from saigegds_tpu.config import ScanConfig

    fn = str(tmp_path / "assoc.gds")
    df = st.assoc_spa("/root/reference/inst/extdata/grm1k_10k_snp.gds",
                      "/root/reference/inst/unitTests/saige_model.rds",
                      ScanConfig(mac=4, block_size=4096), res_savefn=fn)
    back = st.load_pval(fn)
    assert len(back) == len(df)
    np.testing.assert_allclose(back["pval"].to_numpy(),
                               df["pval"].to_numpy(), rtol=0)


def test_load_pval_rejects_non_output_gds():
    import pytest
    import saigegds_tpu as st
    with pytest.raises(ValueError, match="SAIGE_OUTPUT"):
        st.load_pval("/root/reference/inst/extdata/assoc_100snp.gds")


def test_seqarray_writer_roundtrip(tmp_path):
    """numpy codes -> SeqArray GDS -> SeqData reads back identically."""
    from saigegds_tpu.io.gds_write import write_seqarray_gds
    from saigegds_tpu.io.seqarray import SeqData

    rng = np.random.default_rng(9)
    M, N = 137, 211
    codes = rng.integers(0, 3, size=(M, N)).astype(np.int8)
    codes[rng.random((M, N)) < 0.03] = 3
    fn = str(tmp_path / "synth.gds")
    write_seqarray_gds(fn, codes,
                       chromosome=np.asarray(["1"] * 100 + ["2"] * 37, object),
                       rs_id=[f"rs{i}" for i in range(M)])
    seq = SeqData(fn)
    assert seq.n_variants == M and seq.n_samples == N
    assert seq.has_genotype()
    back = seq.code_matrix()
    np.testing.assert_array_equal(back, codes)
    assert list(seq.chromosome[:3]) == ["1", "1", "1"]
    assert seq.rs_id[5] == "rs5"
    ref, alt = seq.ref_alt
    assert ref[0] == "A" and alt[0] == "G"


def test_synthetic_end_to_end_fit_scan(tmp_path):
    """Reference-independent integration: simulate -> write gds -> fit -> scan."""
    import pandas as pd
    import saigegds_tpu as st
    from saigegds_tpu.config import NullModelConfig, ScanConfig
    from saigegds_tpu.io.gds_write import write_seqarray_gds

    rng = np.random.default_rng(3)
    M, N = 600, 400
    af = rng.uniform(0.1, 0.5, size=M)
    codes = rng.binomial(2, af[:, None], size=(M, N)).astype(np.int8)
    fn = str(tmp_path / "sim.gds")
    write_seqarray_gds(fn, codes)
    x1 = rng.normal(size=N)
    eta = -1.0 + 0.5 * x1
    y = (rng.random(N) < 1 / (1 + np.exp(-eta))).astype(int)
    pheno = pd.DataFrame({"sample.id": np.arange(1, N + 1),
                          "y": y, "x1": x1})
    model = st.fit_null_glmm("y ~ x1", pheno, fn,
                             NullModelConfig(trait_type="binary", maf=0.01))
    assert model.converged
    df = st.assoc_spa(fn, model, ScanConfig(mac=4))
    assert len(df) > 500
    # null simulation: p-values roughly uniform
    assert 0.2 < (df["pval"] < 0.5).mean() < 0.8


def test_vcf_to_gds(tmp_path):
    """Minimal VCF -> GDS conversion round-trips GT codes."""
    from saigegds_tpu.io.vcf import vcf_to_gds
    from saigegds_tpu.io.seqarray import SeqData

    vcf = tmp_path / "t.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3",
        "1\t100\trs1\tA\tG\t.\tPASS\t.\tGT\t0/0\t0/1\t1/1",
        "1\t200\trs2\tC\tT\t.\tPASS\t.\tGT:DP\t0|1:10\t./.:5\t1|1:9",
        "1\t300\trs3\tG\tA,C\t.\tPASS\t.\tGT\t0/0\t0/0\t0/0",   # multi-allelic
        "2\t400\trs4\tT\tC\t.\tPASS\t.\tGT\t1/1\t0/0\t.",
    ]) + "\n")
    n = vcf_to_gds(str(vcf), str(tmp_path / "t.gds"))
    assert n == 3   # rs3 skipped
    seq = SeqData(str(tmp_path / "t.gds"))
    codes = seq.code_matrix()
    np.testing.assert_array_equal(codes, [[0, 1, 2], [1, 3, 2], [2, 0, 3]])
    assert list(seq.sample_id) == ["S1", "S2", "S3"]
    assert seq.rs_id[1] == "rs2"
    assert list(seq.position) == [100, 200, 400]


def test_vcf_multiallelic_split(tmp_path):
    """split_multiallelic: one biallelic record per ALT, bcftools-norm style."""
    from saigegds_tpu.io.vcf import read_vcf_codes

    vcf = tmp_path / "m.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3",
        "1\t300\trs3\tG\tA,C\t.\tPASS\t.\tGT\t1/2\t0/2\t./.",
    ]) + "\n")
    codes, meta = read_vcf_codes(str(vcf), split_multiallelic=True)
    # allele 1 (A): 1/2->1, 0/2->0; allele 2 (C): 1/2->1, 0/2->1
    np.testing.assert_array_equal(codes, [[1, 0, 3], [1, 1, 3]])
    assert list(meta["allele"]) == ["G,A", "G,C"]
    assert list(meta["position"]) == [300, 300]
    assert meta["n_multiallelic_skipped"] == 0


def test_vcf_ds_to_gds_scan(tmp_path):
    """DS-field VCF -> annotation/format/DS GDS -> framework scan input."""
    from saigegds_tpu.io.vcf import vcf_to_gds
    from saigegds_tpu.io.seqarray import SeqData

    vcf = tmp_path / "d.vcf"
    vcf.write_text("\n".join([
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3",
        "1\t100\trs1\tA\tG\t.\tPASS\t.\tGT:DS\t0/0:0.1\t0/1:0.9\t1/1:1.8",
        "1\t200\trs2\tC\tT\t.\tPASS\t.\tGT:DS\t0|1:1.2\t./.:.\t1|1:2.0",
        "1\t300\trs3\tG\tA,C\t.\tPASS\t.\tGT:DS\t1/2:0.5,1.5\t0/2:0,2\t0/0:0,0",
    ]) + "\n")
    n = vcf_to_gds(str(vcf), str(tmp_path / "d.gds"), field="DS",
                   split_multiallelic=True)
    assert n == 4
    seq = SeqData(str(tmp_path / "d.gds"))
    assert not seq.has_genotype()
    assert seq.dosage_node_name() == "annotation/format/DS"
    ds = seq.dosage_block(0, 4)
    np.testing.assert_allclose(ds[0], [0.1, 0.9, 1.8])
    np.testing.assert_allclose(ds[1], [1.2, np.nan, 2.0])
    np.testing.assert_allclose(ds[2], [0.5, 0.0, 0.0])    # rs3 ALT A
    np.testing.assert_allclose(ds[3], [1.5, 2.0, 0.0])    # rs3 ALT C
    assert list(seq.rs_id) == ["rs1", "rs2", "rs3", "rs3"]


def test_load_vignette_model():
    """The vignette's independently-pickled 1000-Genomes model loads
    (v_glmm.rds, vignettes/SAIGEgds.Rmd:119-121) — RDS loader cross-compat
    beyond the unit-test fixtures."""
    from saigegds_tpu.models.nullmodel import NullModel

    m = NullModel.load("/root/reference/inst/extdata/v_glmm.rds")
    assert m.trait_type == "binary"
    assert m.n_samples == 1092
    assert np.asarray(m.sample_id)[0] == "HG00096"
    assert np.isfinite(np.asarray(m.coefficients)).all()
    assert m.var_ratio is not None and len(m.var_ratio["ratio"]) >= 30


def test_ds_block_paths_agree():
    """DS dosage access: whole-node cache, per-block frame random access,
    and one-pass streamed iteration must agree exactly."""
    from saigegds_tpu.io.seqarray import SeqData

    path = "/root/reference/inst/extdata/assoc_100snp.gds"
    full = SeqData(path).dosage_block(0, 100)
    assert full.shape == (100, 1000)

    ra_seq = SeqData(path)
    ra_seq.DS_CACHE_LIMIT = 0          # force the frame-index path
    ra = np.vstack([ra_seq.dosage_block(s, min(s + 17, 100))
                    for s in range(0, 100, 17)])
    np.testing.assert_array_equal(ra, full)
    assert not hasattr(ra_seq, "_ds_cache")

    st_seq = SeqData(path)
    got, idx = [], []
    for i, blk in st_seq.iter_dosage_blocks(13, streamed=True):
        idx.append(i)
        got.append(blk)
    np.testing.assert_array_equal(np.concatenate(idx), np.arange(100))
    np.testing.assert_array_equal(np.vstack(got), full)


def test_ds_streamed_iter_with_mask(tmp_path):
    """Streamed DS iteration honors variant masks (synthetic DS file)."""
    from saigegds_tpu.io.gds_write import write_dosage_gds
    from saigegds_tpu.io.seqarray import SeqData

    rng = np.random.default_rng(0)
    ds = rng.uniform(0, 2, size=(57, 23))
    ds[rng.random(ds.shape) < 0.1] = np.nan
    fn = str(tmp_path / "ds.gds")
    write_dosage_gds(fn, ds)
    seq = SeqData(fn)
    mask = rng.random(57) < 0.5
    got_i, got_b = [], []
    for i, blk in seq.iter_dosage_blocks(11, streamed=True,
                                         variant_mask=mask):
        got_i.append(i)
        got_b.append(blk)
    np.testing.assert_array_equal(np.concatenate(got_i), np.flatnonzero(mask))
    np.testing.assert_allclose(np.vstack(got_b), ds[mask], rtol=0, atol=1e-6)


def test_compressed_gds_table_roundtrip(tmp_path):
    """LZMA_ra-compressed SAIGE_OUTPUT (the reference's res.compress
    default) round-trips through our reader and is actually smaller."""
    import os
    import pandas as pd
    from saigegds_tpu.io.gds_write import save_assoc_gds
    from saigegds_tpu.utils.stats import load_pval

    rng = np.random.default_rng(1)
    df = pd.DataFrame({
        "id": np.arange(1, 20001, dtype=np.int32),
        "chr": np.asarray(["1"] * 20000, object),
        "pos": np.arange(20000, dtype=np.int32),
        "pval": rng.uniform(size=20000),
    })
    fz = str(tmp_path / "z.gds")
    fr = str(tmp_path / "r.gds")
    save_assoc_gds(df, fz, compress="LZMA")
    save_assoc_gds(df, fr, compress="")
    assert os.path.getsize(fz) < 0.7 * os.path.getsize(fr)
    back = load_pval(fz)
    np.testing.assert_array_equal(back["id"].to_numpy(), df["id"].to_numpy())
    np.testing.assert_allclose(back["pval"].to_numpy(),
                               df["pval"].to_numpy(), rtol=0, atol=0)


def test_compressed_multiframe_ds_stream(tmp_path, monkeypatch):
    """A multi-frame LZMA_ra DS node streams block-by-block correctly."""
    import saigegds_tpu.io.gds_write as gw
    from saigegds_tpu.io.seqarray import SeqData

    monkeypatch.setattr(gw, "LZMA_FRAME_BYTES", 1 << 14)  # force many frames
    rng = np.random.default_rng(2)
    ds = rng.uniform(0, 2, size=(300, 101))
    ds[rng.random(ds.shape) < 0.05] = np.nan
    fn = str(tmp_path / "dsz.gds")
    gw.write_dosage_gds(fn, ds, compress="LZMA")
    seq = SeqData(fn)
    # streamed one-pass iteration
    got = np.vstack([b for _, b in
                     seq.iter_dosage_blocks(37, streamed=True)])
    np.testing.assert_allclose(got, ds, rtol=0, atol=1e-6)
    # random access via the frame index
    ra = SeqData(fn)
    ra.DS_CACHE_LIMIT = 0
    np.testing.assert_allclose(ra.dosage_block(123, 170), ds[123:170],
                               rtol=0, atol=1e-6)


def test_compressed_seqarray_genotype_roundtrip(tmp_path):
    """LZMA_ra-compressed genotype GDS: code matrix + streamed blocks."""
    from saigegds_tpu.io.gds_write import write_seqarray_gds
    from saigegds_tpu.io.seqarray import SeqData

    rng = np.random.default_rng(3)
    codes = rng.integers(0, 4, size=(400, 57)).astype(np.int8)
    fn = str(tmp_path / "gz.gds")
    write_seqarray_gds(fn, codes, compress="LZMA")
    seq = SeqData(fn)
    np.testing.assert_array_equal(seq.code_matrix(), codes)
    got = np.vstack([b for _, b in seq.iter_code_blocks(64, streamed=True)])
    np.testing.assert_array_equal(got, codes)


def test_zip_ra_roundtrip(tmp_path):
    """ZIP_ra-compressed genotype + table GDS (zlib frames ~10x faster to
    write than LZMA — the bulk-writer container, io/gds_write.py)."""
    from saigegds_tpu.io.gds import open_gds
    from saigegds_tpu.io.gds_write import write_gds_table, write_seqarray_gds
    from saigegds_tpu.io.seqarray import SeqData

    rng = np.random.default_rng(11)
    for N in (96, 97):        # even N takes the direct nibble-pack path
        codes = rng.integers(0, 4, size=(300, N)).astype(np.int8)
        fn = str(tmp_path / f"z{N}.gds")
        write_seqarray_gds(fn, codes, compress="ZIP_ra")
        seq = SeqData(fn)
        np.testing.assert_array_equal(seq.code_matrix(), codes)
        got = np.vstack([b for _, b in seq.iter_code_blocks(128)])
        np.testing.assert_array_equal(got, codes)

    ft = str(tmp_path / "t.gds")
    write_gds_table(ft, {"p": np.linspace(0, 1, 500),
                         "n": np.arange(500, dtype=np.int32)},
                    compress="ZIP_ra")
    f = open_gds(ft)
    np.testing.assert_allclose(f.root["p"].read(), np.linspace(0, 1, 500))
    np.testing.assert_array_equal(f.root["n"].read(), np.arange(500))
