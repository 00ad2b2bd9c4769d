"""SeqArray-level view over a GDS file: variants, samples, dosages.

The equivalent of the reference's L4 data substrate (SeqArray `seqGetData`,
`seqApply` over `$dosage_alt` / `annotation/format/DS`,
``R/assoc_single.r:69-85``, ``R/saige_main.r:399-420``), exposing genotype
blocks as numpy arrays ready for device upload.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from .gds import GDSFile, open_gds


class SeqData:
    """Read-only SeqArray GDS facade with variant/sample filters."""

    def __init__(self, path_or_file):
        from . import native
        native.enable_heap_reuse()   # block loops must recycle warm pages
        self.gds = path_or_file if isinstance(path_or_file, GDSFile) \
            else open_gds(str(path_or_file))
        root = self.gds.root
        self.sample_id = root["sample.id"].read()
        self.variant_id = root["variant.id"].read()
        self.position = root["position"].read()
        self.chromosome = self._read_chromosome(root)
        self.allele = root["allele"].read()
        ann = root.get("annotation/id")
        self.rs_id = ann.read() if ann is not None else np.asarray(
            [""] * len(self.variant_id), dtype=object)
        self.n_samples = len(self.sample_id)
        self.n_variants = len(self.variant_id)
        self._geno_node = root.get("genotype/data")
        if self._geno_node is not None and not self._geno_node.dims:
            self._geno_node = None
        self._ds_node = root.get("annotation/format/DS/data")
        self._geno_cache = None
        self._code_cache = None

    @staticmethod
    def _read_chromosome(root):
        node = root["chromosome"]
        vals = node.read()
        rle_val = root.get("@chrom_rle_val")
        if len(vals) == 0 and rle_val is not None:
            lens = root["@chrom_rle_len"].read()
            vals = np.repeat(rle_val.read(), lens)
        return vals

    @property
    def ref_alt(self) -> Tuple[np.ndarray, np.ndarray]:
        ref = np.empty(self.n_variants, dtype=object)
        alt = np.empty(self.n_variants, dtype=object)
        for i, a in enumerate(self.allele):
            parts = a.split(",", 1)
            ref[i] = parts[0]
            alt[i] = parts[1] if len(parts) > 1 else ""
        return ref, alt

    def variant_selection(self, chromosome=None, position_range=None,
                          variant_id=None, rs_id=None) -> np.ndarray:
        """Boolean variant mask from region/id predicates (ANDed).

        The SeqArray filtering idiom (``seqSetFilterChrom`` /
        ``seqSetFilter``) the reference workflows use to restrict scans;
        pass the result as ``variant_mask=`` to the assoc drivers.
        """
        mask = np.ones(self.n_variants, bool)
        if chromosome is not None:
            chroms = [str(c) for c in np.atleast_1d(chromosome)]
            mask &= np.isin(self.chromosome.astype(str), chroms)
        if position_range is not None:
            lo, hi = position_range
            mask &= (self.position >= lo) & (self.position <= hi)
        if variant_id is not None:
            mask &= np.isin(self.variant_id, np.atleast_1d(variant_id))
        if rs_id is not None:
            mask &= np.isin(self.rs_id, np.atleast_1d(rs_id))
        return mask

    # ---- dosage access ----

    def has_genotype(self) -> bool:
        return self._geno_node is not None

    def dosage_node_name(self, dsnode: str = "") -> str:
        """Auto-detect the dosage source (cf. .dsnode, R/assoc_single.r:69-85)."""
        if dsnode:
            if dsnode != "$dosage_alt":
                try:
                    node = self.gds.node(dsnode)
                except KeyError:
                    node = None
                if node is None:
                    raise ValueError(f"dsnode {dsnode!r} not found in the "
                                     "GDS file")
            elif self._geno_node is None:
                raise ValueError("dsnode '$dosage_alt' needs a genotype "
                                 "node, which this file lacks")
            return dsnode
        if self._geno_node is not None:
            return "$dosage_alt"
        if self._ds_node is not None:
            return "annotation/format/DS"
        raise ValueError(
            "Dosages should be stored in genotype or annotation/format/DS.")

    def _genotype_matrix(self) -> np.ndarray:
        """Full [M, N] ALT-dosage matrix from the 2-bit genotype node.

        Genotype is stored variant-major as [M, N, ploidy] 2-bit codes with
        3 = missing; ALT dosage = sum over ploidy, NaN if any allele missing.
        """
        if self._geno_cache is None:
            from . import native
            node = self._geno_node
            dims = tuple(node.dims)
            if node.cls == "dBit2" and len(dims) == 3:
                M, N, ploidy = dims
                data = self.gds._raw_stream(node)
                self._geno_cache = native.bit2_dosage_f64(
                    data, M * N, ploidy).reshape(M, N)
            else:
                raw = node.read()  # [M, N, ploidy] uint8
                ds = raw.sum(axis=2, dtype=np.int16).astype(np.float64)
                # same fold rule as the dBit2 LUTs: any missing allele OR
                # a sum past 2 (unsplit multiallelic) is missing
                miss = (raw == 3).any(axis=2) | (ds > 2)
                ds[miss] = np.nan
                self._geno_cache = ds
        return self._geno_cache

    def code_matrix(self) -> np.ndarray:
        """Full [M, N] int8 ALT-dosage codes (3 = missing) via the fused
        native 2-bit decode; only for files with a genotype node."""
        if self._code_cache is None:
            from .gds import read_bit2_dosage
            self._code_cache = read_bit2_dosage(self._geno_node)
        return self._code_cache

    def iter_code_blocks(self, block_size: int,
                         variant_mask: Optional[np.ndarray] = None,
                         streamed: Optional[bool] = None
                         ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (variant_indices, int8 code block [b, N]).

        ``streamed=True`` decodes compressed frames incrementally instead
        of materializing the [M, N] matrix; auto above ~256 MB decoded —
        single-pass consumers (scans) decode into small reused warm
        buffers, while repeated-access consumers below the threshold get
        the cached matrix."""
        if streamed is None:
            streamed = (self.n_variants * self.n_samples > 256 << 20
                        and self._code_cache is None)
        if streamed:
            yield from self._iter_code_blocks_streamed(block_size,
                                                       variant_mask)
            return
        codes = self.code_matrix()
        idx_all = np.arange(self.n_variants)
        if variant_mask is not None:
            idx_all = idx_all[variant_mask]
        for s in range(0, len(idx_all), block_size):
            idx = idx_all[s : s + block_size]
            if len(idx):
                yield idx, codes[idx]

    def _iter_code_blocks_streamed(self, block_size, variant_mask):
        from . import native

        node = self._geno_node
        if node.cls != "dBit2" or len(tuple(node.dims)) != 3:
            raise ValueError(
                f"streamed genotype decode needs a 3-D dBit2 node, got "
                f"{node.cls!r} with dims {tuple(node.dims)}")
        M, N, ploidy = node.dims
        if ploidy == 2 and native.available():
            yield from self._iter_code_blocks_chunkfold(block_size,
                                                        variant_mask)
            return
        bits_per_var = N * ploidy * 2
        buf = bytearray()
        buf_start = 0                 # absolute byte offset of buf[0]
        gen = self.gds.stream_node_bytes(node)
        for v0 in range(0, M, block_size):
            v1 = min(v0 + block_size, M)
            bit0 = v0 * bits_per_var
            bit1 = v1 * bits_per_var
            b0, b1 = bit0 // 8, -(-bit1 // 8)
            while buf_start + len(buf) < b1:
                try:
                    buf += next(gen)
                except StopIteration:
                    raise ValueError("genotype stream ended early")
            # drop consumed prefix
            if b0 > buf_start:
                del buf[: b0 - buf_start]
                buf_start = b0
            span = bytes(buf[: b1 - b0])
            geno_off = (bit0 - b0 * 8) // 2
            codes = native.bit2_dosage_codes_off(
                span, geno_off, (v1 - v0) * N, ploidy).reshape(v1 - v0, N)
            idx = np.arange(v0, v1)
            if variant_mask is not None:
                keep = variant_mask[v0:v1]
                idx, codes = idx[keep], codes[keep]
            if len(idx):
                yield idx, codes

    def _iter_code_blocks_chunkfold(self, block_size, variant_mask):
        """Diploid streamed decode with ZERO intermediate copies: each
        inflated frame chunk folds DIRECTLY into the destination block
        array (native sg_bit2_dosage_off writes in place).

        With ploidy 2, one packed byte is exactly two genotypes, so a
        chunk at stream byte ``p`` covers genotype indices
        ``[2p, 2p + 2*len)`` regardless of alignment — no contiguous
        reassembly buffer is needed; a chunk straddling a block boundary
        folds its two parts into the two block arrays.  The pre-round-5
        path copied every block three times (bytearray append + span
        snapshot + prefix memmove, ~330 MB of memcpy per 1024-variant
        block at N=430K) before the fold even ran."""
        from . import native

        node = self._geno_node
        M, N, _ploidy = node.dims
        total_g = M * N               # genotypes overall
        out = None                    # current block [b, N] being filled
        v0 = 0                        # current block's first variant
        g_next = 0                    # next genotype index to decode

        def _emit(v0, v1, codes):
            idx = np.arange(v0, v1)
            if variant_mask is not None:
                keep = variant_mask[v0:v1]
                idx, codes = idx[keep], codes[keep]
            return (idx, codes) if len(idx) else None

        for chunk in self.gds.stream_node_bytes(node):
            src = np.frombuffer(chunk, dtype=np.uint8)
            # the chunk holds bytes for genotypes [byte0*2, byte0*2+2*len)
            # (g_next can sit mid-byte only when N is odd and a block
            # boundary split a byte; the byte is then decoded twice)
            chunk_g0 = g_next
            byte0 = g_next // 2
            chunk_g1 = min(byte0 * 2 + 2 * len(src), total_g)
            while chunk_g0 < chunk_g1:
                if out is None:
                    v1 = min(v0 + block_size, M)
                    out = np.empty((v1 - v0, N), np.int8)
                v1 = v0 + out.shape[0]
                block_g1 = v1 * N
                take = min(chunk_g1, block_g1) - chunk_g0
                dst = out.reshape(-1)[chunk_g0 - v0 * N:
                                      chunk_g0 - v0 * N + take]
                # allele offset of genotype chunk_g0 within THIS chunk
                off = (chunk_g0 - byte0 * 2) * 2
                native.bit2_dosage_into(src, off, take, 2, dst)
                chunk_g0 += take
                if chunk_g0 >= block_g1:
                    r = _emit(v0, v1, out)
                    out = None
                    v0 = v1
                    if r is not None:
                        yield r
            g_next = chunk_g1
        if g_next < total_g:
            raise ValueError("genotype stream ended early")

    def code_rows(self, variants: np.ndarray) -> np.ndarray:
        """Random-access int8 code rows [len(variants), N] via the LZMA
        frame index (no full-matrix inflate)."""
        from . import native

        node = self._geno_node
        M, N, ploidy = node.dims
        bpv = N * ploidy * 2
        out = np.empty((len(variants), N), np.int8)
        for i, v in enumerate(np.asarray(variants, np.int64)):
            bit0 = int(v) * bpv
            b0, b1 = bit0 // 8, -(-(bit0 + bpv) // 8)
            span = self.gds.read_node_bytes(node, b0, b1)
            off = (bit0 - b0 * 8) // 2
            out[i] = native.bit2_dosage_codes_off(span, off, N, ploidy)
        return out

    # decoded-f64 size above which DS nodes are not cached whole but
    # decoded per block via the LZMA frame index / streamed frames
    DS_CACHE_LIMIT = 1 << 30

    def _resolve_ds(self, name: str):
        node = self.gds.root.get(name)
        if node is not None and node.is_folder:
            node = node.get("data")
        return node

    def _ds_row_width(self, node) -> int:
        dims = tuple(node.dims)
        return int(np.prod(dims[1:])) if len(dims) > 1 else 1

    def dosage_block(self, start: int, stop: int, dsnode: str = "") -> np.ndarray:
        """[stop-start, N] float64 ALT dosages with NaN for missing.

        DS/annotation nodes are cached once when small; large fixed-width
        nodes decode only the covering LZMA frames per block (random
        access via the frame index) — never a full re-inflate per block.
        """
        name = self.dosage_node_name(dsnode)
        if name == "$dosage_alt":
            return self._genotype_matrix()[start:stop]
        node = self._resolve_ds(name)
        from .gds import decode_fixed, element_nbytes
        es = element_nbytes(node)
        dims = tuple(node.dims)
        total_f64 = int(np.prod(dims)) * 8
        if es is None or total_f64 <= self.DS_CACHE_LIMIT:
            if getattr(self, "_ds_cache_name", None) != name:
                self._ds_cache = node.read()
                self._ds_cache_name = name
            return np.asarray(self._ds_cache[start:stop], dtype=np.float64)
        N = self._ds_row_width(node)
        data = self.gds.read_node_bytes(node, start * N * es, stop * N * es)
        blk = decode_fixed(node, data, (stop - start) * N)
        return np.asarray(blk, dtype=np.float64).reshape(stop - start, N)

    def iter_dosage_blocks(self, block_size: int, dsnode: str = "",
                           variant_mask: Optional[np.ndarray] = None,
                           streamed: Optional[bool] = None
                           ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (variant_indices, dosage_block [b, N]).

        Large fixed-width DS nodes stream decompressed frames sequentially
        (one pass over the compressed bytes, like the genotype streaming
        path); ``streamed=None`` decides by the DS_CACHE_LIMIT threshold.
        """
        name = self.dosage_node_name(dsnode)
        if name != "$dosage_alt":
            node = self._resolve_ds(name)
            from .gds import element_nbytes
            es = element_nbytes(node)
            total_f64 = int(np.prod(tuple(node.dims))) * 8
            if streamed is None:
                streamed = total_f64 > self.DS_CACHE_LIMIT
            if streamed and es is not None:
                yield from self._iter_ds_blocks_streamed(
                    block_size, node, es, variant_mask)
                return
        idx_all = np.arange(self.n_variants)
        if variant_mask is not None:
            idx_all = idx_all[variant_mask]
        for s in range(0, len(idx_all), block_size):
            idx = idx_all[s : s + block_size]
            if len(idx) == 0:
                continue
            lo, hi = int(idx[0]), int(idx[-1]) + 1
            if hi - lo <= 4 * block_size:
                blk = self.dosage_block(lo, hi, dsnode)
                yield idx, blk[idx - lo]
                continue
            # sparse mask: one lo..hi span could decode gigabytes to
            # yield block_size rows — fetch bounded contiguous clusters
            rows = np.empty((len(idx), self.n_samples))
            c0 = 0
            for k in range(1, len(idx) + 1):
                if k == len(idx) or idx[k] - idx[c0] >= 4 * block_size:
                    a, b = int(idx[c0]), int(idx[k - 1]) + 1
                    blk = self.dosage_block(a, b, dsnode)
                    rows[c0:k] = blk[idx[c0:k] - a]
                    c0 = k
            yield idx, rows

    def _iter_ds_blocks_streamed(self, block_size, node, es, variant_mask):
        """Sequential one-pass decode of a fixed-width dosage node."""
        from .gds import decode_fixed

        M = tuple(node.dims)[0]
        N = self._ds_row_width(node)
        row_bytes = N * es
        buf = bytearray()
        buf_start = 0
        gen = self.gds.stream_node_bytes(node)
        for v0 in range(0, M, block_size):
            v1 = min(v0 + block_size, M)
            b0, b1 = v0 * row_bytes, v1 * row_bytes
            while buf_start + len(buf) < b1:
                try:
                    buf += next(gen)
                except StopIteration:
                    raise ValueError("dosage stream ended early")
            if b0 > buf_start:
                del buf[: b0 - buf_start]
                buf_start = b0
            blk = decode_fixed(node, bytes(buf[: b1 - b0]), (v1 - v0) * N)
            blk = np.asarray(blk, np.float64).reshape(v1 - v0, N)
            idx = np.arange(v0, v1)
            if variant_mask is not None:
                keep = variant_mask[v0:v1]
                idx, blk = idx[keep], blk[keep]
            if len(idx):
                yield idx, blk
