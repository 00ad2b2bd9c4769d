"""Sample-alignment parity: scans must realign GDS columns to the model.

The reference filters the GDS to the model's samples and gathers the model
arrays into GDS order (``seqSetFilter(sample.id=)`` +
``ii <- match(sid, modobj$sample.id)``, R/assoc_single.r:136-142).  These
tests permute / extend the GDS sample axis and require identical results.
"""

import numpy as np
import pytest

import saigegds_tpu as st
from saigegds_tpu.config import AggregateConfig, ScanConfig
from saigegds_tpu.io.gds_write import write_seqarray_gds
from saigegds_tpu.io.seqarray import SeqData

GDS = "/root/reference/inst/extdata/grm1k_10k_snp.gds"
MODEL = "/root/reference/inst/unitTests/saige_model.rds"


@pytest.fixture(scope="module")
def small_seq():
    """First 500 variants of the extdata file (keeps the test fast)."""
    seq = SeqData(GDS)
    codes = seq.code_matrix()[:500]
    return seq, codes


def _write(path, seq, codes, perm, extra=0, seed=0):
    """Permute sample columns by ``perm`` and append ``extra`` fake samples."""
    c = codes[:, perm]
    sid = np.asarray(seq.sample_id)[perm]
    if extra:
        rng = np.random.default_rng(seed)
        fake = rng.integers(0, 3, size=(c.shape[0], extra)).astype(np.int8)
        c = np.concatenate([c, fake], axis=1)
        sid = np.concatenate([sid, np.asarray(
            [f"FAKE{i}" for i in range(extra)], dtype=sid.dtype)])
    write_seqarray_gds(str(path), c, sample_id=sid,
                       variant_id=seq.variant_id[:500],
                       position=seq.position[:500],
                       chromosome=seq.chromosome[:500],
                       allele=seq.allele[:500])
    return str(path)


def test_scan_permuted_samples(tmp_path, small_seq):
    seq, codes = small_seq
    base = _write(tmp_path / "base.gds", seq, codes, np.arange(codes.shape[1]))
    rng = np.random.default_rng(7)
    perm = rng.permutation(codes.shape[1])
    permuted = _write(tmp_path / "perm.gds", seq, codes, perm)

    cfg = ScanConfig(mac=4)
    ref = st.assoc_spa(base, MODEL, cfg)
    got = st.assoc_spa(permuted, MODEL, cfg)
    assert len(got) == len(ref)
    np.testing.assert_array_equal(got["id"].to_numpy(), ref["id"].to_numpy())
    for k in ("AF.alt", "mac", "beta", "SE", "pval", "p.norm"):
        np.testing.assert_allclose(got[k].to_numpy(), ref[k].to_numpy(),
                                   rtol=1e-12, atol=0, err_msg=k)


def test_scan_superset_samples(tmp_path, small_seq):
    """A GDS with extra (non-model) samples drops them, like seqSetFilter."""
    seq, codes = small_seq
    base = _write(tmp_path / "base.gds", seq, codes, np.arange(codes.shape[1]))
    rng = np.random.default_rng(11)
    perm = rng.permutation(codes.shape[1])
    sup = _write(tmp_path / "sup.gds", seq, codes, perm, extra=17)

    cfg = ScanConfig(mac=4)
    ref = st.assoc_spa(base, MODEL, cfg)
    got = st.assoc_spa(sup, MODEL, cfg)
    assert len(got) == len(ref)
    for k in ("AF.alt", "mac", "beta", "SE", "pval"):
        np.testing.assert_allclose(got[k].to_numpy(), ref[k].to_numpy(),
                                   rtol=1e-12, atol=0, err_msg=k)


def test_burden_permuted_samples(tmp_path, small_seq):
    seq, codes = small_seq
    base = _write(tmp_path / "base.gds", seq, codes, np.arange(codes.shape[1]))
    rng = np.random.default_rng(3)
    perm = rng.permutation(codes.shape[1])
    permuted = _write(tmp_path / "perm.gds", seq, codes, perm, extra=5)

    sq_base, sq_perm = SeqData(base), SeqData(permuted)
    from saigegds_tpu.assoc.aggregate import sliding_windows
    units = sliding_windows(sq_base, win_size=50000, win_shift=25000)
    cfg = AggregateConfig(wbeta=((1.0, 25.0),))
    ref = st.assoc_burden(sq_base, MODEL, units, cfg)
    got = st.assoc_burden(sq_perm, MODEL, units, cfg)
    for k in ("summac", "beta", "SE", "pval"):
        np.testing.assert_allclose(got[k].to_numpy(), ref[k].to_numpy(),
                                   rtol=1e-12, atol=0, err_msg=k)


def test_missing_model_samples_raise(tmp_path, small_seq):
    seq, codes = small_seq
    sub = _write(tmp_path / "sub.gds", seq, codes[:, :900],
                 np.arange(900))
    with pytest.raises(ValueError, match="missing from the GDS"):
        st.assoc_spa(sub, MODEL, ScanConfig(mac=4))
