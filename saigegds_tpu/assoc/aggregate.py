"""Aggregate (gene/region/set) association tests: burden, ACAT-V, ACAT-O.

Equivalents of ``seqAssocGLMM_spaBurden`` / ``spaACAT_V`` / ``spaACAT_O``
(reference ``R/assoc_aggregate.r``; C engines src/saige_main.cpp:465-985).
Each unit's SNP dosage matrix is reduced to a set of test vectors (weighted
burden collapses + per-SNP columns for ACAT-V), which all funnel through the
same batched score+SPA kernels as the single-variant scan — so one device
program covers every aggregate flavour, and units are processed in blocks.

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

from dataclasses import dataclass
from typing import List

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

TEST_BATCH = 256


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
        sel = np.asarray([vid_pos[v] for v in vids if v in vid_pos])
        desp_rows.append((name,))
        index.append(sel)
    return VariantUnits(desp=pd.DataFrame(desp_rows, columns=["set"]),
                        index=index)


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
    (``ds_mat_burden``, src/saige_main.cpp:526-610); NaN weights skip."""
    finite = np.isfinite(ds)
    n = finite.sum(axis=1)
    s = np.where(finite, ds, 0.0).sum(axis=1)
    with np.errstate(invalid="ignore"):
        mean = s / n
    use = np.isfinite(weights)
    flip = s > n
    g = np.where(finite, ds, mean[:, None])
    g = np.where(flip[:, None], 2.0 - g, g)
    w = np.where(use, weights, 0.0)
    return (g * w[:, None]).sum(axis=0)


def _normalize(w: np.ndarray) -> np.ndarray:
    s = np.nansum(np.where(np.isfinite(w), w, np.nan))
    if s > 0:
        return np.where(np.isfinite(w), w / s, w)
    return w


@dataclass
class _Kernel:
    """Shared batched score+SPA runner over accumulated test vectors."""

    scan_model: object
    params: ScanParams
    binary: bool
    _packed: object = None

    def _packed_kernel(self):
        """Lazy packed-model build (one transposed int8 cache per scan)."""
        if self._packed is None:
            from ..ops.score_packed import (pack_scan_model,
                                            score_stats_binary_packed,
                                            score_stats_quant_packed)
            pm = pack_scan_model(self.scan_model)
            pk = score_stats_binary_packed if self.binary \
                else score_stats_quant_packed
            self._packed = lambda params, codes: pk(pm, params, codes)
        return self._packed

    def run(self, G: np.ndarray):
        """G [B, N] -> dict of arrays (af, mac, num, beta, se, pval,
        p.norm, converged); invalid rows are NaN.

        Blocks whose rows are all integer dosages 0/1/2/NaN (ACAT-V
        singles straight from the genotype code cache) route through the
        exact integer-sliced packed kernel — int8 codes are the only
        [B, N] operand (8x lighter than f64) and the bf16 MXU contraction
        is exact; fractional burden vectors use the dense f64 kernel."""
        stats = {k: [] for k in
                 ("valid", "af", "mac", "num", "beta", "se", "pval")}
        need_rows, need_G = [], []
        with np.errstate(invalid="ignore"):
            as_codes = bool(np.all(np.isnan(G) |
                                   ((G == np.floor(G)) & (G >= 0) & (G <= 2)))) \
                if G.size else False
        if as_codes:
            pk = self._packed_kernel()
            codes_all = np.where(np.isnan(G), 3, G).astype(np.int8)
            kern = lambda sm, params, blk: pk(params, blk)
        else:
            kern = score_stats_binary if self.binary else score_stats_quant
        # phase 1 pipelined: a bounded window of in-flight batches so
        # device compute overlaps host-side conversion (each np.asarray
        # forces a sync; the depth bounds [B, N] inputs held on device)
        from collections import deque
        window = deque()

        def _drain(s, m, res):
            for k in stats:
                stats[k].append(np.asarray(getattr(res, k))[:m])
            need = np.asarray(res.need_spa)[:m]
            if self.binary and need.any():
                need_rows.append(s + np.flatnonzero(need))
                need_G.append(G[s : s + m][need])

        for s in range(0, G.shape[0], TEST_BATCH):
            if as_codes:
                blk = _pad_block(codes_all[s : s + TEST_BATCH], TEST_BATCH,
                                 fill=3)
            else:
                blk = _pad_block(G[s : s + TEST_BATCH], TEST_BATCH)
            m = min(TEST_BATCH, G.shape[0] - s)
            window.append((s, m, kern(self.scan_model, self.params, blk)))
            if len(window) >= 3:
                _drain(*window.popleft())
        while window:
            _drain(*window.popleft())
        out = {k: np.concatenate(v) for k, v in stats.items()}
        out["p.norm"] = out["pval"].copy()
        out["converged"] = np.isfinite(out["pval"])
        if need_rows:
            rows = np.concatenate(need_rows)
            Gs = np.concatenate(need_G, axis=0)
            # nnz-bucketed compaction: ACAT-V singles are rare variants,
            # so the CGF runs over the top-cap nonzero lanes (exact, same
            # scheme as the single-variant scan's phase 2)
            if len(rows) > 1:
                order = np.argsort(_spa_nnz(Gs), kind="stable")
                Gs, rows = Gs[order], rows[order]
            pending = deque()

            def _drain_spa():
                r, (p, conv, b, e) = pending.popleft()
                m = len(r)
                out["pval"][r] = np.asarray(p)[:m]
                out["converged"][r] = np.asarray(conv)[:m]
                out["beta"][r] = np.asarray(b)[:m]
                out["se"][r] = np.asarray(e)[:m]

            for s in range(0, len(rows), TEST_BATCH):
                Gi = Gs[s : s + TEST_BATCH]
                cap = _spa_cap(Gi)
                blk = _pad_block(Gi, TEST_BATCH)
                res = spa_refine_binary(self.scan_model, blk, cap=cap)
                pending.append((rows[s : s + TEST_BATCH], res))
                if len(pending) >= 3:
                    _drain_spa()
            while pending:
                _drain_spa()
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
    kernel = _Kernel(scan_model=scan_model, params=params, binary=binary)
    wbeta = np.asarray(config.wbeta, dtype=np.float64)  # [W, 2]
    wnames = [f"{b1:g}_{b2:g}" for b1, b2 in wbeta]
    return seq, model, kernel, wbeta, wnames, binary, cols


def _unit_dosage(seq: SeqData, idx: np.ndarray, dsnode="",
                 cols=None) -> np.ndarray:
    """[S, N] dosage rows for the unit's variants (columns subset/reordered
    to the model's samples when ``cols`` is given).

    Genotype-node files go through the int8 code cache (1 B/genotype
    instead of the f64 dosage cache) and convert just the unit's rows."""
    if len(idx) == 0:
        n = seq.n_samples if cols is None else len(cols)
        return np.empty((0, n))
    if seq.has_genotype() and not dsnode:
        rows = seq.code_matrix()[idx].astype(np.float64)
        rows[rows == 3] = np.nan
    else:
        lo, hi = int(idx.min()), int(idx.max()) + 1
        blk = seq.dosage_block(lo, hi, dsnode)
        rows = np.asarray(blk[idx - lo], np.float64)
    return rows if cols is None else rows[:, cols]


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


def assoc_burden(gdsfile, modobj, units: VariantUnits,
                 config: AggregateConfig = AggregateConfig(),
                 res_savefn: str = "", verbose: bool = False) -> pd.DataFrame:
    """Burden tests over variant units (seqAssocGLMM_spaBurden)."""
    seq, model, kernel, wbeta, wnames, binary, cols = _prepare(gdsfile, modobj, config)
    U = len(units)
    W = len(wbeta)

    summaries = []
    burden_G = np.zeros((U * W, model.n_samples))
    summac = np.zeros(U * W)
    for u, idx in enumerate(units.index):
        ds = _unit_dosage(seq, idx, cols=cols)
        maf, mac = _maf_mac(ds)
        summaries.append(_maf_mac_summary(maf, mac))
        for w in range(W):
            ws = _normalize(beta_weights(maf, wbeta[w, 0], wbeta[w, 1]))
            g = _burden_collapse(ds, ws)
            burden_G[u * W + w] = g
            summac[u * W + w] = g.sum() * len(idx)

    ok = (summac >= config.summac) & (summac > 0)
    out = kernel.run(burden_G)
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
        save_assoc(tab, res_savefn, file_format="SAIGE_OUTPUT_SET")
    return tab


class _AcatVBatch:
    """Two-phase cross-unit ACAT-V: accumulate every test vector from every
    unit, run ONE batched device pass, then combine per unit.

    Single-variant p-values are deduplicated globally by variant index
    (overlapping sliding windows share SNPs), which the reference's
    per-unit loop recomputes (src/saige_main.cpp:900-963) — values are
    identical, the device work is O(distinct SNPs + mini-burdens) instead
    of O(units x unit size)."""

    def __init__(self, kernel: _Kernel, wbeta, config):
        self.kernel = kernel
        self.wbeta = wbeta
        self.config = config
        self.single_rows: dict = {}        # variant idx -> dosage row
        self.burdens: list = []            # (key, vector)
        self.units: list = []              # per-unit plan

    def add_unit(self, uid, idx, ds, maf, mac):
        cfg = self.config
        single_mask = mac >= cfg.acatv_mac
        n_snp = ds.shape[0]
        n_burden = int((~single_mask).sum())
        for j in np.flatnonzero(single_mask):
            self.single_rows.setdefault(int(idx[j]), ds[j])
        burden_keys = {}
        if n_burden > 0:
            for w, (b1, b2) in enumerate(self.wbeta):
                with np.errstate(invalid="ignore", divide="ignore"):
                    wb = np.where(single_mask, np.nan,
                                  beta_weights(maf, b1, b2))
                wb = _normalize(wb)
                g = _burden_collapse(ds, wb)
                summac = g.sum() * n_snp
                if summac >= cfg.summac and summac > 0:
                    burden_keys[w] = len(self.burdens)
                    self.burdens.append(g)
        self.units.append(dict(uid=uid, idx=idx, maf=maf, mac=mac,
                               single_mask=single_mask, n_burden=n_burden,
                               burden_keys=burden_keys))

    def run(self):
        """-> {uid: (pvals [W], p_med, p_min, p_max, n_single, n_burden)}"""
        sv_idx = sorted(self.single_rows)
        psingle = {}
        if sv_idx:
            G = np.stack([self.single_rows[i] for i in sv_idx])
            res = self.kernel.run(G)
            psingle = dict(zip(sv_idx, res["pval"]))
        pburden = []
        if self.burdens:
            res = self.kernel.run(np.stack(self.burdens))
            pburden = res["pval"]

        out = {}
        for u in self.units:
            maf, mac = u["maf"], u["mac"]
            single_mask, n_burden = u["single_mask"], u["n_burden"]
            out_p, out_med, out_min, out_max = [], [], [], []
            burden_added_w0 = False
            for w, (b1, b2) in enumerate(self.wbeta):
                pvals, wp = [], []
                for j in np.flatnonzero(single_mask):
                    p = maf[j]
                    wp.append(float(beta_weights(p, b1, b2)) ** 2
                              * p * (1 - p))
                    pvals.append(float(psingle[int(u["idx"][j])]))
                if w in u["burden_keys"]:
                    pv = float(pburden[u["burden_keys"][w]])
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
            out[u["uid"]] = (out_p, out_med, out_min, out_max,
                             n_single - n_burden, n_burden)
        return out


def assoc_acat_v(gdsfile, modobj, units: VariantUnits,
                 config: AggregateConfig = AggregateConfig(),
                 res_savefn: str = "", verbose: bool = False) -> pd.DataFrame:
    """ACAT-V tests over variant units (seqAssocGLMM_spaACAT_V, binary only)."""
    seq, model, kernel, wbeta, wnames, binary, cols = _prepare(gdsfile, modobj, config)
    if not binary:
        raise NotImplementedError(
            "ACAT-V is binary-only, like the reference "
            "(src/saige_main.cpp:836-842)")
    batch = _AcatVBatch(kernel, wbeta, config)
    summaries = []
    for uid, idx in enumerate(units.index):
        ds = _unit_dosage(seq, idx, cols=cols)
        maf, mac = _maf_mac(ds)
        summaries.append(_maf_mac_summary(maf, mac))
        batch.add_unit(uid, idx, ds, maf, mac)
    results = batch.run()
    rows = [(summaries[uid],) + results[uid] for uid in range(len(units))]

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
        save_assoc(tab, res_savefn, file_format="SAIGE_OUTPUT_SET")
    return tab


def assoc_acat_o(gdsfile, modobj, units: VariantUnits,
                 config: AggregateConfig = AggregateConfig(),
                 res_savefn: str = "", verbose: bool = False) -> pd.DataFrame:
    """ACAT-O tests (seqAssocGLMM_spaACAT_O, binary only): Cauchy combination
    of the burden and ACAT-V p-values across weight schemes."""
    seq, model, kernel, wbeta, wnames, binary, cols = _prepare(gdsfile, modobj, config)
    if not binary:
        raise NotImplementedError("ACAT-O is binary-only, like the reference")
    W = len(wbeta)
    batch = _AcatVBatch(kernel, wbeta, config)
    summaries = []
    full_burdens, full_keys = [], []   # whole-unit burden per weight scheme
    for uid, idx in enumerate(units.index):
        ds = _unit_dosage(seq, idx, cols=cols)
        maf, mac = _maf_mac(ds)
        summaries.append(_maf_mac_summary(maf, mac))
        batch.add_unit(uid, idx, ds, maf, mac)
        keys = {}
        for w in range(W):
            ws = _normalize(beta_weights(maf, wbeta[w, 0], wbeta[w, 1]))
            g = _burden_collapse(ds, ws)
            summac = g.sum() * len(idx)
            if summac >= config.summac and summac > 0:
                keys[w] = len(full_burdens)
                full_burdens.append(g)
        full_keys.append(keys)
    pb_all = kernel.run(np.stack(full_burdens))["pval"] if full_burdens \
        else np.empty(0)
    results = batch.run()

    rows = []
    for uid in range(len(units)):
        pb = [float(pb_all[full_keys[uid][w]]) if w in full_keys[uid]
              else np.nan for w in range(W)]
        pv = results[uid][0]
        allp = np.asarray(pb + list(pv), float)
        combined = acat_p(allp[np.isfinite(allp)]) if np.isfinite(allp).any() \
            else np.nan
        rows.append((summaries[uid], combined, pb, pv))

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
        save_assoc(tab, res_savefn, file_format="SAIGE_OUTPUT_SET")
    return tab
