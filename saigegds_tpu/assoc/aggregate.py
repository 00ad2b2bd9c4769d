"""Aggregate (gene/region/set) association tests: burden, ACAT-V, ACAT-O.

Equivalents of ``seqAssocGLMM_spaBurden`` / ``spaACAT_V`` / ``spaACAT_O``
(reference ``R/assoc_aggregate.r``; C engines src/saige_main.cpp:465-985).
Each unit's SNP dosage matrix is reduced to a set of test vectors (weighted
burden collapses + per-SNP columns for ACAT-V), which all funnel through the
same batched score+SPA kernels as the single-variant scan — so one device
program covers every aggregate flavour.

Scale design (unlike the reference's per-process ``seqUnitApply`` loop):
test vectors STREAM through a bounded device pipeline — at no point is a
[units x samples] matrix materialized — and unit dosages come from
`_UnitSource`, which random-accesses LZMA frames for big files
(frame-LRU-cached, so overlapping sliding windows inflate each frame once).
For integer genotype sources the burden collapse itself runs ON DEVICE
(`_Kernel.run_jobs` -> ops/score_packed.burden_score_packed): unit codes
ship once (whole-batch sparse/2-bit transport) and the weighted
mean-impute + flip collapse is an exact integer-slice affine map, so the
host never uploads 8 B/sample row vectors; ACAT-V singles stream as raw
int8 (`_Kernel.run_stream`'s fast path).  SPA-flagged rows refine in
bounded-memory incremental flushes (`_SpaAccum`).  Multi-host runs shard
the unit list (`shard_units`) and concatenate the per-host tables, the
``seqUnitApply(parallel=)`` analog (R/assoc_aggregate.r:700-708).

Semantics reproduced exactly:
* per-SNP MAF/MAC from non-missing dosages (``ds_mat_mafmac``, :486-524);
* burden collapse with beta(maf; b1, b2) weights normalised to sum 1,
  mean imputation and minor-allele flip per SNP (``ds_mat_burden``,
  :526-610); weighted-sum MAC threshold ``summac`` (:652);
* ACAT-V: SNPs with MAC >= ``acatv_mac`` tested singly, the rare remainder
  collapsed into one burden; Cauchy combination with weights
  dbeta(maf)^2 maf (1-maf) (:734-833);
* ACAT-O: Cauchy combination of the burden + ACAT-V p-values across all
  weight schemes (:848-976).
ACAT-V / ACAT-O are binary-trait only, like the reference (:836-842).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import pandas as pd

from ..config import AggregateConfig
from ..io.seqarray import SeqData
from ..models.nullmodel import NullModel
from ..ops.acat import beta_weights
from ..ops.score import ScanParams, score_stats_binary, score_stats_quant, \
    spa_refine_binary
from ..utils.stats import acat_p
from .single import _match_samples, _pad_block, _spa_cap, _spa_nnz

SINGLE_FETCH = 512   # variants per random-access fetch in the singles stream


@dataclass
class VariantUnits:
    """A list of variant-index units (the SeqUnitListClass analog)."""

    desp: pd.DataFrame              # unit descriptors (chr, start, end, ...)
    index: List[np.ndarray]         # 0-based variant indices per unit

    def __len__(self):
        return len(self.index)


def sliding_windows(seq: SeqData, win_size: int = 10000, win_shift: int = 5000,
                    dup_rm: bool = True, variant_mask=None) -> VariantUnits:
    """Sliding windows over basepair positions per chromosome
    (the ``seqUnitSlidingWindows`` analog; reference test_SAIGE.R:119).

    ``variant_mask`` restricts the windows to a variant selection — the
    SeqArray filter-then-window idiom (``seqSetFilter`` before
    ``seqUnitSlidingWindows``); build one with
    :meth:`SeqData.variant_selection`."""
    chrom = np.asarray(seq.chromosome)
    pos = np.asarray(seq.position)
    keep = np.ones(len(chrom), bool) if variant_mask is None \
        else np.asarray(variant_mask, bool)
    desp_rows = []
    index = []
    for ch in pd.unique(chrom[keep]):
        m = (chrom == ch) & keep
        p = pos[m]
        idx = np.flatnonzero(m)
        if len(p) == 0:
            continue
        lo, hi = int(p.min()), int(p.max())
        start = lo
        prev = None
        while start <= hi:
            end = start + win_size - 1
            sel = idx[(p >= start) & (p <= end)]
            if len(sel) > 0:
                # full selection as the dup key (SeqArray compares the whole
                # unit; first/last/count can collide when positions are
                # unsorted within a chromosome)
                key = sel.tobytes()
                if not (dup_rm and key == prev):
                    desp_rows.append((ch, start, end))
                    index.append(sel)
                    prev = key
            start += win_shift
    desp = pd.DataFrame(desp_rows, columns=["chr", "start", "end"])
    return VariantUnits(desp=desp, index=index)


def units_from_groups(seq: SeqData, groups: dict) -> VariantUnits:
    """Units from {name: [variant ids]} (gene sets)."""
    vid_pos = {v: i for i, v in enumerate(seq.variant_id)}
    desp_rows, index = [], []
    for name, vids in groups.items():
        sel = np.asarray([vid_pos[v] for v in vids if v in vid_pos],
                         dtype=np.int64)
        desp_rows.append((name,))
        index.append(sel)
    return VariantUnits(desp=pd.DataFrame(desp_rows, columns=["set"]),
                        index=index)


def shard_units(units: VariantUnits, shard: int, n_shards: int
                ) -> VariantUnits:
    """Contiguous unit slice for host ``shard`` of ``n_shards``.

    The multi-host analog of ``seqUnitApply(parallel=)``: each host runs
    an aggregate driver on its slice and the tables are concatenated
    (``pd.concat`` / ``load_pval([files])``) — per-unit results are
    independent, so shard+merge equals a single-host run.
    """
    if not (0 <= shard < n_shards):
        raise ValueError(f"shard {shard} outside [0, {n_shards})")
    U = len(units)
    bounds = np.linspace(0, U, n_shards + 1).astype(int)
    lo, hi = bounds[shard], bounds[shard + 1]
    return VariantUnits(desp=units.desp.iloc[lo:hi].reset_index(drop=True),
                        index=units.index[lo:hi])


# ---------------------------------------------------------------------------


def _maf_mac(ds: np.ndarray):
    """Per-SNP minor AF / minor AC over non-missing samples [S, N]."""
    finite = np.isfinite(ds)
    n = finite.sum(axis=1)
    s = np.where(finite, ds, 0.0).sum(axis=1)
    with np.errstate(invalid="ignore", divide="ignore"):
        af = s / (2.0 * n)
    maf = np.where(n > 0, np.minimum(af, 1.0 - af), np.nan)
    mac = np.minimum(s, 2.0 * n - s)
    return maf, mac


def _burden_collapse(ds: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Weighted burden dosage vector (ds [S, N], weights [S]) -> [N].

    Per SNP: mean-impute missing, flip to minor allele when sum > n
    (``ds_mat_burden``, src/saige_main.cpp:526-610).  Reference quirks
    reproduced exactly: a non-finite weight skips the SNP ENTIRELY
    (``if (R_FINITE(weight[i]))``, :536 — its dosage column, NaN or not,
    never touches the output), and the mean/flip bookkeeping accumulates
    dosages into an ``int`` (:590), i.e. fractional DS dosages are
    floor-truncated for the imputation mean and the flip decision while
    the accumulated contributions use the raw values."""
    finite = np.isfinite(ds)
    n = finite.sum(axis=1)
    # the reference's `int sum`: per-add truncation of nonnegative
    # dosages onto an integer accumulator == sum of floors
    s = np.where(finite, np.floor(ds), 0.0).sum(axis=1)
    with np.errstate(invalid="ignore"):
        mean = s / n
    use = np.isfinite(weights)
    flip = s > n
    g = np.where(finite, ds, mean[:, None])
    g = np.where(flip[:, None], 2.0 - g, g)
    w = np.where(use, weights, 0.0)
    return (np.where(use[:, None], g, 0.0) * w[:, None]).sum(axis=0)


def _normalize(w: np.ndarray) -> np.ndarray:
    s = np.nansum(np.where(np.isfinite(w), w, np.nan))
    if s > 0:
        return np.where(np.isfinite(w), w / s, w)
    return w


class _CodeTallies:
    """Per-SNP reductions of an int8 code block [S, N] (3 = missing) —
    the same quantities ``_maf_mac`` / ``_burden_collapse`` derive from
    the f64 NaN matrix, computed without materializing it."""

    def __init__(self, codes: np.ndarray):
        miss = codes == 3
        self.n_miss = miss.sum(axis=1).astype(np.float64)
        N = codes.shape[1]
        self.n = N - self.n_miss
        self.s = np.where(miss, 0, codes).sum(axis=1,
                                              dtype=np.int64).astype(float)
        with np.errstate(invalid="ignore", divide="ignore"):
            af = self.s / (2.0 * self.n)
            self.mean = self.s / self.n
        self.maf = np.where(self.n > 0, np.minimum(af, 1.0 - af), np.nan)
        self.mac = np.minimum(self.s, 2.0 * self.n - self.s)
        self.flip = self.s > self.n


class _BurdenJob:
    """One unit's device-collapse job: codes ship once, the weighted
    burden rows are built on device (ops/score_packed.burden_score_packed).

    ``A``/``Bm`` [R, S] and ``C`` [R] are the affine coefficients of the
    reference's mean-impute + minor-flip + weight collapse; ``wrows``
    keeps the original (NaN-masked) weights so SPA-flagged rows can be
    rebuilt host-side for phase 2."""

    __slots__ = ("codes", "wrows", "A", "Bm", "C", "row_sums")

    def __init__(self, codes: np.ndarray, wrows: np.ndarray,
                 t: _CodeTallies):
        wrows = np.atleast_2d(np.asarray(wrows, np.float64))
        use = np.isfinite(wrows)                          # [R, S]
        wz = np.where(use, wrows, 0.0)
        sign = np.where(t.flip, -1.0, 1.0)
        A = wz * sign[None, :]
        bad = ~np.isfinite(t.mean)                        # all-missing SNPs
        mean = np.where(bad, 0.0, t.mean)
        Bm = A * mean[None, :]
        if bad.any():
            A = A.copy()
            A[:, bad] = 0.0
        C = 2.0 * (wz * t.flip[None, :]).sum(axis=1)
        if bad.any():
            # reference semantics (src/saige_main.cpp:536): a NaN weight
            # skips the SNP entirely, so an all-missing SNP only poisons
            # rows that give it a FINITE weight (its NaN imputation mean
            # then reaches every output sample)
            C[use[:, bad].any(axis=1)] = np.nan
        N = codes.shape[1]
        self.codes, self.wrows = codes, wrows
        self.A, self.Bm, self.C = A, Bm, C
        self.row_sums = A @ t.s + Bm @ t.n_miss + N * C

    def host_row(self, r: int) -> np.ndarray:
        """Rebuild row r on host (phase-2 SPA needs the dosage vector)."""
        ds = np.where(self.codes == 3, np.nan,
                      self.codes).astype(np.float64)
        return _burden_collapse(ds, self.wrows[r])

    def subset(self, rows) -> "_BurdenJob":
        """Keep only the given row indices (summac pre-filtering)."""
        job = object.__new__(_BurdenJob)
        job.codes = self.codes
        job.wrows = self.wrows[rows]
        job.A, job.Bm = self.A[rows], self.Bm[rows]
        job.C, job.row_sums = self.C[rows], self.row_sums[rows]
        return job


def _maf_mac_summary(maf, mac):
    def _mean_sd(x):
        x = x[np.isfinite(x)]
        if len(x) == 0:
            return np.nan, np.nan
        return float(np.mean(x)), float(np.std(x, ddof=1)) if len(x) > 1 else np.nan
    maf_avg, maf_sd = _mean_sd(maf)
    mac_avg, mac_sd = _mean_sd(mac)
    f = lambda x, fn: float(fn(x[np.isfinite(x)])) if np.isfinite(x).any() else np.nan
    return dict(
        maf_avg=maf_avg, maf_sd=maf_sd,
        maf_min=f(maf, np.min), maf_max=f(maf, np.max),
        mac_avg=mac_avg, mac_sd=mac_sd,
        mac_min=f(mac, np.min), mac_max=f(mac, np.max))


class _UnitSource:
    """Bounded-memory dosage rows for units, columns aligned to the model.

    Small files use the whole-matrix cache; big ones random-access the
    LZMA frames (``SeqData.code_rows`` / frame-indexed ``dosage_block``),
    whose per-frame LRU cache makes overlapping windows touch each
    compressed frame once.
    """

    CACHE_LIMIT = 4 << 30

    def __init__(self, seq: SeqData, cols=None, dsnode: str = ""):
        self.seq, self.cols, self.dsnode = seq, cols, dsnode
        self.geno = seq.has_genotype() and not dsnode
        elem = 1 if self.geno else 8
        self.small = seq.n_variants * seq.n_samples * elem <= self.CACHE_LIMIT

    @property
    def n_cols(self) -> int:
        return self.seq.n_samples if self.cols is None else len(self.cols)

    def rows(self, idx) -> np.ndarray:
        idx = np.asarray(idx)
        if len(idx) == 0:
            return np.empty((0, self.n_cols))
        if self.geno:
            if self.small:
                r = self.seq.code_matrix()[idx].astype(np.float64)
            else:
                r = self.seq.code_rows(idx).astype(np.float64)
            r[r == 3] = np.nan
        else:
            # fetch in bounded contiguous clusters: one min..max span for
            # a scattered gene set could materialize a chromosome-sized
            # [span, N] f64 block
            idx_s = np.sort(idx)
            pos_of = {v: i for i, v in enumerate(idx)}
            r = np.empty((len(idx), self.seq.n_samples))
            c0 = 0
            MAX_SPAN = 8192
            for k in range(1, len(idx_s) + 1):
                if k == len(idx_s) or idx_s[k] - idx_s[c0] >= MAX_SPAN:
                    lo, hi = int(idx_s[c0]), int(idx_s[k - 1]) + 1
                    blk = self.seq.dosage_block(lo, hi, self.dsnode)
                    for v in idx_s[c0:k]:
                        r[pos_of[v]] = blk[v - lo]
                    c0 = k
            r = r.astype(np.float64, copy=False)
        return r if self.cols is None else r[:, self.cols]

    def codes(self, idx) -> Optional[np.ndarray]:
        """Raw int8 codes [S, N] (3 = missing) for integer genotype
        sources — the device-collapse transport; None for DS dosages."""
        if not self.geno:
            return None
        idx = np.asarray(idx)
        if len(idx) == 0:
            return np.empty((0, self.n_cols), np.int8)
        r = self.seq.code_matrix()[idx] if self.small \
            else self.seq.code_rows(idx)
        r = r if self.cols is None else r[:, self.cols]
        return np.ascontiguousarray(r, dtype=np.int8)


class _SpaAccum:
    """Bounded-memory phase-2 accumulator: flagged rows refine
    incrementally once their host bytes pass the budget (the scan
    driver's SPA_FLUSH_BYTES), instead of holding every flagged [N]
    vector until the end of the unit stream."""

    def __init__(self, kernel: "_Kernel"):
        self.k = kernel
        self.rows, self.G, self.bytes = [], [], 0
        self.results = []        # (rows, pval, converged, beta, se)

    def add(self, rows: np.ndarray, G: np.ndarray):
        from .single import SPA_FLUSH_BYTES
        self.rows.append(rows)
        self.G.append(G)
        self.bytes += G.nbytes
        if self.bytes >= SPA_FLUSH_BYTES:
            self.flush()

    def flush(self):
        if not self.rows:
            return
        from .single import _shrink_f32
        rows = np.concatenate(self.rows)
        Gs = np.concatenate(self.G, axis=0)
        self.rows, self.G, self.bytes = [], [], 0
        if len(rows) > 1:
            # nnz-bucketed compaction (exact; see the scan's phase 2)
            order = np.argsort(_spa_nnz(Gs), kind="stable")
            Gs, rows = Gs[order], rows[order]
        B = self.k.batch
        pending = deque()

        def drain():
            r, stacked = pending.popleft()
            m = len(r)
            a = np.asarray(stacked)   # one stacked [4, B] readback
            self.results.append(
                (r, a[0][:m], a[1][:m] != 0, a[2][:m], a[3][:m]))

        import jax.numpy as jnp
        for s in range(0, len(rows), B):
            Gi = Gs[s : s + B]
            cap = _spa_cap(Gi)
            blk = _pad_block(_shrink_f32(Gi), B)
            res = spa_refine_binary(self.k.scan_model, blk, cap=cap)
            pending.append((rows[s : s + B],
                            jnp.stack([res[0], res[1].astype(jnp.float64),
                                       res[2], res[3]])))
            if len(pending) >= 3:
                drain()
        while pending:
            drain()


@dataclass
class _Kernel:
    """Streaming batched score+SPA runner over test-vector rows."""

    scan_model: object
    params: ScanParams
    binary: bool
    batch: int = 256
    _packed: object = None

    def _packed_kernel(self):
        """Lazy packed-model build (one transposed int8 cache per scan)."""
        if self._packed is None:
            from ..ops.pallas_score import pallas_available
            from ..ops.score_packed import (pack_scan_model,
                                            score_stats_binary_packed,
                                            score_stats_quant_packed)
            pm = pack_scan_model(self.scan_model)
            pk = score_stats_binary_packed if self.binary \
                else score_stats_quant_packed
            impl = "pallas2" if pallas_available() else "xla2"
            self._packed = (
                lambda params, codes, impl=impl: pk(pm, params, codes,
                                                    impl=impl), impl)
        return self._packed

    def run(self, G: np.ndarray):
        return self.run_stream(iter([np.asarray(G, np.float64)]))

    def run_stream(self, blocks_iter):
        """Consume an iterator of [k, N] float64 row-arrays -> dict of
        per-row stat arrays (af, mac, num, beta, se, pval, p.norm,
        converged, valid); rows failing the filters are NaN.

        Device work is pipelined in ``batch``-row dispatches and host
        memory holds one in-flight window plus the SPA-flagged rows —
        never the whole stream.  Batches whose rows are all integer
        dosages 0/1/2/NaN route through the exact integer-sliced packed
        kernel (int8 codes are the only [B, N] operand); fractional
        burden vectors use the dense f64 kernel — per-row results are
        independent either way.
        """
        B = self.batch
        parts = {k: [] for k in
                 ("valid", "af", "mac", "num", "beta", "se", "pval")}
        acc = _SpaAccum(self)
        window = deque()
        buf, buf_n, row0 = [], 0, 0

        from ..ops.score import stack_stats, unstack_stats

        def _drain():
            nonlocal parts
            start, G, res_parts = window.popleft()
            m = len(G)
            f = {k: np.empty(m) for k in parts}
            need = np.empty(m, bool)
            for rows, stacked in res_parts:
                res = unstack_stats(stacked)  # one device->host transfer
                mm = len(rows)
                need[rows] = res.need_spa[:mm]
                for k in f:
                    f[k][rows] = getattr(res, k)[:mm]
            for k in parts:
                parts[k].append(f[k])
            if self.binary and need.any():
                Gf = G[need]
                if Gf.dtype == np.int8:      # phase 2 runs on f64 dosages
                    Gf = np.where(Gf == 3, np.nan, Gf).astype(np.float64)
                acc.add(start + np.flatnonzero(need), Gf)

        def _dispatch(G, start):
            if G.dtype == np.int8:
                as_codes = True
            else:
                with np.errstate(invalid="ignore"):
                    as_codes = bool(np.all(
                        np.isnan(G) |
                        ((G == np.floor(G)) & (G >= 0) & (G <= 2)))) \
                        if G.size else False
            if as_codes:
                # aggregate units are rare variants: ship them through the
                # same sparse/2-bit transport split as the scan driver
                from .single import _packed_parts
                pk, impl = self._packed_kernel()
                codes = G if G.dtype == np.int8 \
                    else np.where(np.isnan(G), 3, G).astype(np.int8)
                res_parts = [
                    (rows, stack_stats(pk(self.params, payload, impl=im)))
                    for rows, payload, im in
                    _packed_parts(codes, B, impl, packed_2bit=True,
                                  packed_sparse=True, place=lambda x: x)]
            else:
                from .single import _shrink_f32
                kern = score_stats_binary if self.binary \
                    else score_stats_quant
                res = kern(self.scan_model, self.params,
                           _pad_block(_shrink_f32(G), B))
                res_parts = [(np.arange(len(G)), stack_stats(res))]
            window.append((start, G, res_parts))
            if len(window) >= 3:
                _drain()

        for rows in blocks_iter:
            rows = np.asarray(rows)
            if rows.dtype != np.int8:        # int8 streams skip the f64 hop
                rows = np.asarray(rows, np.float64)
            if rows.ndim == 1:
                rows = rows[None, :]
            pos = 0
            while pos < len(rows):
                take = min(B - buf_n, len(rows) - pos)
                buf.append(rows[pos:pos + take])
                buf_n += take
                pos += take
                if buf_n == B:
                    _dispatch(np.vstack(buf), row0)
                    row0 += B
                    buf, buf_n = [], 0
        if buf_n:
            _dispatch(np.vstack(buf), row0)
            row0 += buf_n
        while window:
            _drain()
        return self._finalize(parts, acc)

    def run_jobs(self, jobs_iter):
        """Consume an iterator of `_BurdenJob`s -> the same per-row stat
        dict as ``run_stream`` (rows in job order).

        The device-collapse path: unit codes batch into [S, N] blocks
        (whole-batch sparse/2-bit transport) with block-diagonal
        coefficient matrices, and `burden_score_packed` builds + scores
        the rows in ONE dispatch — the host never uploads [rows, N] f64.
        SPA-flagged rows are rebuilt host-side for phase 2.
        """
        import jax
        from ..ops.packed_grm import pack_codes_2bit
        from ..ops.score_packed import BURDEN_S_CAP, burden_score_packed
        from ..ops.sparse_codes import (bucket_rows, encode_sparse_rows,
                                        pad_entries)

        parts = {k: [] for k in
                 ("valid", "af", "mac", "num", "beta", "se", "pval")}
        acc = _SpaAccum(self)
        window = deque()
        R_CAP = 64

        def _flush(batch, R_tot, S_tot, start):
            N = batch[0].codes.shape[1]
            S_pad = bucket_rows(S_tot, max(BURDEN_S_CAP, S_tot))
            R_pad = bucket_rows(R_tot, max(R_CAP, R_tot), minimum=8)
            codes = np.zeros((S_pad, N), np.int8)
            A = np.zeros((R_pad, S_pad))
            Bm = np.zeros((R_pad, S_pad))
            C = np.zeros(R_pad)
            r0 = s0 = 0
            for job in batch:
                r1, s1 = r0 + len(job.A), s0 + job.codes.shape[0]
                codes[s0:s1] = job.codes
                A[r0:r1, s0:s1] = job.A
                Bm[r0:r1, s0:s1] = job.Bm
                C[r0:r1] = job.C
                r0, s0 = r1, s1
            # whole-batch transport decision (one dispatch by design)
            nnz = int((codes != 0).sum())
            if S_pad * N < (1 << 31) and 2 * nnz < (S_pad * (N // 4)) // 2:
                entries, row_ptr = encode_sparse_rows(codes)
                rp = np.full(S_pad + 1, row_ptr[-1], np.int32)
                rp[: len(row_ptr)] = row_ptr
                payload = jax.device_put((pad_entries(entries), rp))
            else:
                payload = jax.device_put(pack_codes_2bit(codes))
            from ..ops.score import stack_stats
            res = burden_score_packed(self.scan_model, self.params,
                                      payload, A, Bm, C,
                                      binary=self.binary)
            window.append((start, batch, R_tot, stack_stats(res)))
            if len(window) >= 3:
                _drain()

        def _drain():
            from ..ops.score import unstack_stats
            start, batch, m, stacked = window.popleft()
            res = unstack_stats(stacked)      # one device->host transfer
            for k in parts:
                parts[k].append(getattr(res, k)[:m])
            need = res.need_spa[:m]
            if self.binary and need.any():
                # rebuild flagged rows host-side (few: ~spa_pval fraction)
                offs = np.cumsum([0] + [len(j.A) for j in batch])
                rows = []
                for r in np.flatnonzero(need):
                    j = np.searchsorted(offs, r, side="right") - 1
                    rows.append(batch[j].host_row(r - offs[j]))
                acc.add(start + np.flatnonzero(need), np.asarray(rows))

        batch, R_tot, S_tot, row0 = [], 0, 0, 0
        for job in jobs_iter:
            S_u = job.codes.shape[0]
            if batch and (S_tot + S_u > BURDEN_S_CAP or
                          R_tot + len(job.A) > R_CAP):
                _flush(batch, R_tot, S_tot, row0)
                row0 += R_tot
                batch, R_tot, S_tot = [], 0, 0
            batch.append(job)
            R_tot += len(job.A)
            S_tot += S_u
        if batch:
            _flush(batch, R_tot, S_tot, row0)
        while window:
            _drain()
        return self._finalize(parts, acc)

    def _finalize(self, parts, acc: "_SpaAccum"):
        """Shared tail: assemble per-row arrays + apply phase-2 results."""
        out = {k: (np.concatenate(v) if v else np.empty(0))
               for k, v in parts.items()}
        out["valid"] = out["valid"].astype(bool)
        out["p.norm"] = out["pval"].copy()
        out["converged"] = np.isfinite(out["pval"])
        acc.flush()
        for r, p, conv, b, e in acc.results:
            out["pval"][r] = p
            out["converged"][r] = conv
            out["beta"][r] = b
            out["se"][r] = e
        # rows failing the filters -> NaN like the reference
        bad = ~out["valid"]
        for k in ("af", "mac", "beta", "se", "pval", "p.norm"):
            out[k][bad] = np.nan
        out["converged"][bad] = False
        return out


def _prepare(gdsfile, modobj, config: AggregateConfig):
    model = NullModel.load(modobj)
    seq = gdsfile if isinstance(gdsfile, SeqData) else SeqData(gdsfile)
    # sample alignment like the scan (R/assoc_single.r:136-142): cols
    # restricts/reorders dosage columns to the model's samples, ii gathers
    # the model arrays into that column order
    cols, ii = _match_samples(seq.sample_id, model.sample_id)
    scan_model = model.scan_model(sample_index=ii, var_ratio=config.var_ratio)
    params = ScanParams(maf=0.0, mac=0.0, missing=1.0,
                        spa_pval=config.spa_pval)
    binary = model.trait_type == "binary"
    kernel = _Kernel(scan_model=scan_model, params=params, binary=binary,
                     batch=config.block_size)
    wbeta = np.asarray(config.wbeta, dtype=np.float64)  # [W, 2]
    wnames = [f"{b1:g}_{b2:g}" for b1, b2 in wbeta]
    src = _UnitSource(seq, cols=cols, dsnode=config.dsnode)
    return seq, model, kernel, wbeta, wnames, binary, src


def assoc_burden(gdsfile, modobj, units: VariantUnits,
                 config: AggregateConfig = AggregateConfig(),
                 res_savefn: str = "", verbose: bool = False,
                 res_compress: str = "LZMA") -> pd.DataFrame:
    """Burden tests over variant units (seqAssocGLMM_spaBurden).

    Streams one unit at a time — host memory is bounded by the device
    batch, not by [units x samples]."""
    seq, model, kernel, wbeta, wnames, binary, src = \
        _prepare(gdsfile, modobj, config)
    U = len(units)
    W = len(wbeta)

    summaries = []
    summac = np.zeros(U * W)

    def burden_stream():
        for u, idx in enumerate(units.index):
            ds = src.rows(idx)
            maf, mac = _maf_mac(ds)
            summaries.append(_maf_mac_summary(maf, mac))
            rows = np.empty((W, src.n_cols))
            for w in range(W):
                ws = _normalize(beta_weights(maf, wbeta[w, 0], wbeta[w, 1]))
                g = _burden_collapse(ds, ws)
                rows[w] = g
                summac[u * W + w] = g.sum() * len(idx)
            yield rows

    def job_stream():
        # integer genotype source: ship codes once, collapse on device
        for u, idx in enumerate(units.index):
            codes = src.codes(idx)
            t = _CodeTallies(codes)
            summaries.append(_maf_mac_summary(t.maf, t.mac))
            wrows = np.stack([
                _normalize(beta_weights(t.maf, b1, b2))
                for b1, b2 in wbeta])
            job = _BurdenJob(codes, wrows, t)
            summac[u * W : (u + 1) * W] = job.row_sums * len(idx)
            yield job

    out = kernel.run_jobs(job_stream()) if src.geno \
        else kernel.run_stream(burden_stream())
    ok = (summac >= config.summac) & (summac > 0)
    for k in ("beta", "se", "pval", "p.norm"):
        out[k][~ok] = np.nan
    out["converged"][~ok] = False

    tab = units.desp.copy()
    tab["numvar"] = [len(i) for i in units.index]
    for key in ("maf_avg", "maf_sd", "maf_min", "maf_max",
                "mac_avg", "mac_sd", "mac_min", "mac_max"):
        tab[key.replace("_", ".")] = [s[key] for s in summaries]
    for w, nm in enumerate(wnames):
        s = f".b{nm}" if W > 1 else ""
        sel = np.arange(U) * W + w
        tab[f"summac{s}"] = summac[sel]
        tab[f"beta{s}"] = out["beta"][sel]
        tab[f"SE{s}"] = out["se"][sel]
        tab[f"pval{s}"] = out["pval"][sel]
        if binary:
            tab[f"p.norm{s}"] = out["p.norm"][sel]
            tab[f"cvg{s}"] = out["converged"][sel]
    if res_savefn:
        from .single import save_assoc
        save_assoc(tab, res_savefn, file_format="SAIGE_OUTPUT_SET",
                   res_compress=res_compress)
    return tab


@dataclass
class _AcatVPlan:
    """Per-unit ACAT-V bookkeeping collected during the burden stream."""

    idx: np.ndarray
    maf: np.ndarray
    mac: np.ndarray
    single_mask: np.ndarray
    n_burden: int
    burden_keys: dict = field(default_factory=dict)   # w -> burden row
    full_keys: dict = field(default_factory=dict)     # w -> full-burden row


class _AcatVRunner:
    """Streaming cross-unit ACAT-V (+ optional ACAT-O full burdens).

    One pass over the units streams every qualifying burden vector
    straight into the device kernel; single-variant rows are
    deduplicated globally by variant index (overlapping sliding windows
    share SNPs — the reference's per-unit loop recomputes them,
    src/saige_main.cpp:900-963, values identical) and fetched in a
    second bounded stream.  Nothing [units x samples]-sized exists.
    """

    def __init__(self, kernel: _Kernel, wbeta, config, src: _UnitSource,
                 with_full_burden: bool = False):
        self.kernel = kernel
        self.wbeta = wbeta
        self.config = config
        self.src = src
        self.with_full = with_full_burden
        self.plans: List[_AcatVPlan] = []
        self.summaries: List[dict] = []
        self.n_rows = 0

    def _unit_rows(self, idx):
        """Plan one unit; yield its qualifying burden row-vectors."""
        cfg = self.config
        ds = self.src.rows(idx)
        maf, mac = _maf_mac(ds)
        self.summaries.append(_maf_mac_summary(maf, mac))
        single_mask = mac >= cfg.acatv_mac
        n_snp = ds.shape[0]
        n_burden = int((~single_mask).sum())
        plan = _AcatVPlan(idx=np.asarray(idx), maf=maf, mac=mac,
                          single_mask=single_mask, n_burden=n_burden)
        self.plans.append(plan)
        if n_burden > 0:
            for w, (b1, b2) in enumerate(self.wbeta):
                with np.errstate(invalid="ignore", divide="ignore"):
                    wb = np.where(single_mask, np.nan,
                                  beta_weights(maf, b1, b2))
                wb = _normalize(wb)
                g = _burden_collapse(ds, wb)
                summac = g.sum() * n_snp
                if summac >= cfg.summac and summac > 0:
                    plan.burden_keys[w] = self.n_rows
                    self.n_rows += 1
                    yield g
        if self.with_full:
            for w, (b1, b2) in enumerate(self.wbeta):
                ws = _normalize(beta_weights(maf, b1, b2))
                g = _burden_collapse(ds, ws)
                summac = g.sum() * len(idx)
                if summac >= cfg.summac and summac > 0:
                    plan.full_keys[w] = self.n_rows
                    self.n_rows += 1
                    yield g

    def _unit_job(self, idx) -> Optional[_BurdenJob]:
        """Device-collapse variant of ``_unit_rows`` (same bookkeeping,
        same summac pre-filtering; codes ship instead of f64 rows)."""
        cfg = self.config
        codes = self.src.codes(idx)
        t = _CodeTallies(codes)
        self.summaries.append(_maf_mac_summary(t.maf, t.mac))
        single_mask = t.mac >= cfg.acatv_mac
        n_burden = int((~single_mask).sum())
        plan = _AcatVPlan(idx=np.asarray(idx), maf=t.maf, mac=t.mac,
                          single_mask=single_mask, n_burden=n_burden)
        self.plans.append(plan)
        wlist, keymap = [], []
        if n_burden > 0:
            for w, (b1, b2) in enumerate(self.wbeta):
                with np.errstate(invalid="ignore", divide="ignore"):
                    wb = np.where(single_mask, np.nan,
                                  beta_weights(t.maf, b1, b2))
                wlist.append(_normalize(wb))
                keymap.append((plan.burden_keys, w))
        if self.with_full:
            for w, (b1, b2) in enumerate(self.wbeta):
                wlist.append(_normalize(beta_weights(t.maf, b1, b2)))
                keymap.append((plan.full_keys, w))
        if not wlist:
            return None
        job = _BurdenJob(codes, np.stack(wlist), t)
        keep = []
        for i, (keys, w) in enumerate(keymap):
            summac = job.row_sums[i] * codes.shape[0]
            if summac >= cfg.summac and summac > 0:
                keys[w] = self.n_rows
                self.n_rows += 1
                keep.append(i)
        if not keep:
            return None
        return job if len(keep) == len(keymap) else job.subset(keep)

    def run(self, units: VariantUnits):
        """-> (results {uid: (pvals [W], p_med, p_min, p_max, n_single,
        n_burden)}, full_pvals {uid: {w: pval}})"""
        if self.src.geno:
            def job_stream():
                for idx in units.index:
                    job = self._unit_job(idx)
                    if job is not None:
                        yield job
            bres = self.kernel.run_jobs(job_stream())
        else:
            def burden_stream():
                for idx in units.index:
                    for g in self._unit_rows(idx):
                        yield g
            bres = self.kernel.run_stream(burden_stream())
        pburden = bres["pval"]

        # dedup'd single-variant tests, fetched in bounded batches
        sv_idx = sorted({int(i) for plan in self.plans
                         for i in plan.idx[plan.single_mask]})
        psingle = {}
        if sv_idx:
            sv = np.asarray(sv_idx)

            def single_stream():
                # integer sources yield raw int8 codes: no [k, N] f64
                # round-trip on the host (run_stream's int8 fast path)
                fetch = self.src.codes if self.src.geno else self.src.rows
                for s in range(0, len(sv), SINGLE_FETCH):
                    yield fetch(sv[s : s + SINGLE_FETCH])
            sres = self.kernel.run_stream(single_stream())
            psingle = dict(zip(sv_idx, sres["pval"]))

        out = {}
        full = {}
        for uid, plan in enumerate(self.plans):
            maf, single_mask = plan.maf, plan.single_mask
            n_burden = plan.n_burden
            out_p, out_med, out_min, out_max = [], [], [], []
            burden_added_w0 = False
            for w, (b1, b2) in enumerate(self.wbeta):
                pvals, wp = [], []
                for j in np.flatnonzero(single_mask):
                    p = maf[j]
                    wp.append(float(beta_weights(p, b1, b2)) ** 2
                              * p * (1 - p))
                    pvals.append(float(psingle[int(plan.idx[j])]))
                if w in plan.burden_keys:
                    pv = float(pburden[plan.burden_keys[w]])
                    if np.isfinite(pv):
                        p = float(maf[~single_mask].sum() / n_burden)
                        wp.append(float(beta_weights(p, b1, b2)) ** 2
                                  * p * (1 - p))
                        pvals.append(pv)
                        if w == 0:
                            burden_added_w0 = True
                pvals = np.asarray(pvals, float)
                wp = np.asarray(wp, float)
                if len(pvals) > 0:
                    out_p.append(acat_p(pvals, wp) if len(pvals) > 1
                                 else float(pvals[0]))
                    fin = pvals[np.isfinite(pvals)]
                    out_med.append(float(np.median(fin)) if len(fin) else np.nan)
                    out_min.append(float(np.min(fin)) if len(fin) else np.nan)
                    out_max.append(float(np.max(fin)) if len(fin) else np.nan)
                else:
                    out_p.append(np.nan)
                    out_med.append(np.nan)
                    out_min.append(np.nan)
                    out_max.append(np.nan)
            # reference reports counts for the first weight scheme only
            # (src/saige_main.cpp:815-819)
            n_single = int(single_mask.sum()) + (1 if burden_added_w0 else 0)
            out[uid] = (out_p, out_med, out_min, out_max,
                        n_single - n_burden, n_burden)
            full[uid] = {w: float(pburden[r])
                         for w, r in plan.full_keys.items()}
        return out, full


def assoc_acat_v(gdsfile, modobj, units: VariantUnits,
                 config: AggregateConfig = AggregateConfig(),
                 res_savefn: str = "", verbose: bool = False,
                 res_compress: str = "LZMA") -> pd.DataFrame:
    """ACAT-V tests over variant units (seqAssocGLMM_spaACAT_V, binary only)."""
    seq, model, kernel, wbeta, wnames, binary, src = \
        _prepare(gdsfile, modobj, config)
    if not binary:
        raise NotImplementedError(
            "ACAT-V is binary-only, like the reference "
            "(src/saige_main.cpp:836-842)")
    runner = _AcatVRunner(kernel, wbeta, config, src)
    results, _full = runner.run(units)
    rows = [(runner.summaries[uid],) + results[uid]
            for uid in range(len(units))]

    W = len(wbeta)
    tab = units.desp.copy()
    tab["numvar"] = [len(i) for i in units.index]
    for key in ("maf_avg", "maf_sd", "maf_min", "maf_max",
                "mac_avg", "mac_sd", "mac_min", "mac_max"):
        tab[key.replace("_", ".")] = [r[0][key] for r in rows]
    tab["n.single"] = [r[5] for r in rows]
    tab["n.burden"] = [r[6] for r in rows]
    for w, nm in enumerate(wnames):
        s = f".v{nm}" if W > 1 else ""
        tab[f"pval{s}"] = [r[1][w] for r in rows]
        tab[f"p.med{s}"] = [r[2][w] for r in rows]
        tab[f"p.min{s}"] = [r[3][w] for r in rows]
        tab[f"p.max{s}"] = [r[4][w] for r in rows]
    if res_savefn:
        from .single import save_assoc
        save_assoc(tab, res_savefn, file_format="SAIGE_OUTPUT_SET",
                   res_compress=res_compress)
    return tab


def assoc_acat_o(gdsfile, modobj, units: VariantUnits,
                 config: AggregateConfig = AggregateConfig(),
                 res_savefn: str = "", verbose: bool = False,
                 res_compress: str = "LZMA") -> pd.DataFrame:
    """ACAT-O tests (seqAssocGLMM_spaACAT_O, binary only): Cauchy combination
    of the burden and ACAT-V p-values across weight schemes."""
    seq, model, kernel, wbeta, wnames, binary, src = \
        _prepare(gdsfile, modobj, config)
    if not binary:
        raise NotImplementedError("ACAT-O is binary-only, like the reference")
    W = len(wbeta)
    runner = _AcatVRunner(kernel, wbeta, config, src, with_full_burden=True)
    results, full = runner.run(units)

    rows = []
    for uid in range(len(units)):
        pb = [full[uid].get(w, np.nan) for w in range(W)]
        pv = results[uid][0]
        allp = np.asarray(pb + list(pv), float)
        combined = acat_p(allp[np.isfinite(allp)]) if np.isfinite(allp).any() \
            else np.nan
        rows.append((runner.summaries[uid], combined, pb, pv))

    tab = units.desp.copy()
    tab["numvar"] = [len(i) for i in units.index]
    for key in ("maf_avg", "maf_sd", "maf_min", "maf_max",
                "mac_avg", "mac_sd", "mac_min", "mac_max"):
        tab[key.replace("_", ".")] = [r[0][key] for r in rows]
    tab["pval"] = [r[1] for r in rows]
    for w, nm in enumerate(wnames):
        tab[f"pval.b{nm}"] = [r[2][w] for r in rows]
        tab[f"pval.v{nm}"] = [r[3][w] for r in rows]
    if res_savefn:
        from .single import save_assoc
        save_assoc(tab, res_savefn, file_format="SAIGE_OUTPUT_SET",
                   res_compress=res_compress)
    return tab
