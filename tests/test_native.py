"""Native decode kernels: parity with the numpy fallbacks + real-file IO."""

import numpy as np
import pytest

from saigegds_tpu.io import native


def _leb128(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def test_native_built():
    assert native.available(), "g++ build of _fastio.so failed"


def test_unpack_bit2_parity():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size=1000, dtype=np.uint8).tobytes()
    n = 3998
    got = native.unpack_bit2(data, n)
    src = np.frombuffer(data, dtype=np.uint8)
    want = np.stack([src & 3, (src >> 2) & 3, (src >> 4) & 3,
                     (src >> 6) & 3], axis=1).reshape(-1)[:n]
    np.testing.assert_array_equal(got, want)


def test_vstr8_strings():
    strs = ["", "a", "chr22", "x" * 300, "αβγ"]
    payload = b"".join(_leb128(len(s.encode())) + s.encode() for s in strs)
    got = native.vstr8_strings(payload, len(strs))
    assert list(got) == strs


def test_bit2_dosage_codes():
    rng = np.random.default_rng(1)
    M, N, P = 7, 13, 2
    alleles = rng.integers(0, 4, size=(M, N, P), dtype=np.uint8)
    flat = alleles.reshape(-1)
    packed = bytearray((len(flat) + 3) // 4)
    for i, g in enumerate(flat):
        packed[i >> 2] |= int(g) << ((i & 3) * 2)
    got = native.bit2_dosage_codes(bytes(packed), M * N, P).reshape(M, N)
    # allele pairs summing past 2 (second-ALT codes) fold to missing: the
    # {0,1,2,3} dosage vocabulary cannot represent them (split
    # multiallelic sites for exact handling)
    miss = (alleles == 3).any(axis=2) | (alleles.sum(axis=2) > 2)
    want = np.where(miss, 3, alleles.sum(axis=2)).astype(np.int8)
    np.testing.assert_array_equal(got, want)
    f = native.bit2_dosage_f64(bytes(packed), M * N, P).reshape(M, N)
    np.testing.assert_array_equal(np.isnan(f), miss)
    np.testing.assert_array_equal(f[~miss], want[~miss].astype(np.float64))


def test_real_file_roundtrip():
    """The native-decoded genotype matrix matches the generic array read."""
    from saigegds_tpu.io.gds import open_gds, read_bit2_dosage

    gds = open_gds("/root/reference/inst/extdata/grm1k_10k_snp.gds")
    node = gds.root["genotype/data"]
    codes = read_bit2_dosage(node)
    raw = node.read()
    miss = (raw == 3).any(axis=2)
    want = np.where(miss, 3, raw.sum(axis=2, dtype=np.int16)).astype(np.int8)
    np.testing.assert_array_equal(codes, want)


def test_streamed_code_blocks_match_cached():
    """Out-of-core streamed block iteration == cached code matrix."""
    from saigegds_tpu.io.seqarray import SeqData

    seq = SeqData("/root/reference/inst/extdata/grm1k_10k_snp.gds")
    want = seq.code_matrix()
    got_rows = []
    got_idx = []
    # odd block size -> exercises non-byte-aligned block starts
    for idx, codes in seq.iter_code_blocks(677, streamed=True):
        got_rows.append(codes)
        got_idx.append(idx)
    got = np.concatenate(got_rows, axis=0)
    np.testing.assert_array_equal(np.concatenate(got_idx),
                                  np.arange(seq.n_variants))
    np.testing.assert_array_equal(got, want)


def test_streamed_with_mask():
    from saigegds_tpu.io.seqarray import SeqData

    seq = SeqData("/root/reference/inst/extdata/grm1k_10k_snp.gds")
    mask = np.zeros(seq.n_variants, bool)
    mask[123:456] = True
    mask[9000:] = True
    want = seq.code_matrix()[mask]
    got = np.concatenate([c for _, c in
                          seq.iter_code_blocks(512, variant_mask=mask,
                                               streamed=True)], axis=0)
    np.testing.assert_array_equal(got, want)


def test_random_access_code_rows():
    """Frame-index random access == full decode."""
    from saigegds_tpu.io.seqarray import SeqData

    seq = SeqData("/root/reference/inst/extdata/grm1k_10k_snp.gds")
    want = seq.code_matrix()
    idx = np.array([0, 1, 777, 5000, 9999])
    got = seq.code_rows(idx)
    np.testing.assert_array_equal(got, want[idx])


def test_pack2_raw_matches_numpy_pack():
    """sg_pack2_raw == pack_codes_2bit(_pad_block(fill=3)) bit-for-bit,
    including the tail byte's out-of-range fields on N % 4 != 0."""
    from saigegds_tpu.io import native
    from saigegds_tpu.ops.packed_grm import pack_codes_2bit

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(0)
    for M, N, B in [(7, 13, 16), (200, 1031, 256), (5, 8, 5)]:
        G = rng.integers(0, 4, size=(M, N)).astype(np.int8)
        got = native.pack2_raw(G, B)
        pad = np.full((B - M, N), 3, np.int8) if B > M else \
            np.empty((0, N), np.int8)
        want = pack_codes_2bit(np.concatenate([G, pad]))
        np.testing.assert_array_equal(got, want, err_msg=f"{(M, N, B)}")


def test_chunkfold_streamed_decode_odd_width():
    """The zero-copy chunk-fold decode handles odd N (block boundaries
    splitting a packed byte) and variant masks."""
    from saigegds_tpu.io import native
    from saigegds_tpu.io.gds_write import write_seqarray_gds
    from saigegds_tpu.io.seqarray import SeqData

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(1)
    for N in (997, 1000):
        codes = rng.integers(0, 3, size=(531, N)).astype(np.int8)
        codes[rng.random(codes.shape) < 0.02] = 3
        path = "/tmp/test_chunkfold.gds"
        write_seqarray_gds(path, codes, compress="ZIP_ra")
        seq = SeqData(path)
        got = np.concatenate(
            [b for _, b in seq._iter_code_blocks_chunkfold(97, None)])
        np.testing.assert_array_equal(got, codes)
        mask = rng.random(531) < 0.5
        got = np.concatenate(
            [b for _, b in seq._iter_code_blocks_chunkfold(97, mask)])
        np.testing.assert_array_equal(got, codes[mask])
