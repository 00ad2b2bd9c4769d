"""Minimal VCF -> SeqArray-GDS converter.

The reference delegates VCF ingestion to the SeqArray R package
(``seqVCF2GDS``); this is the framework-native equivalent for the common
diploid-GT case: parse ``GT`` fields into 0/1/2/missing ALT-dosage codes
and emit a genotype GDS via :func:`saigegds_tpu.io.gds_write.write_seqarray_gds`.

Scope (documented): bi-allelic rows (multi-allelic rows are skipped with a
count), diploid GT (haploid treated as one allele counted twice is NOT
assumed — haploid calls count the single allele), ``.`` = missing.
Supports plain and gzip-compressed files.
"""

from __future__ import annotations

import gzip
from typing import Optional

import numpy as np


def _open(path: str):
    if path.endswith(".gz") or path.endswith(".bgz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


def read_vcf_codes(path: str, max_variants: Optional[int] = None):
    """Parse a VCF into (codes [M, N] int8, meta dict).

    meta: sample_id, variant_id (1..M), position, chromosome, allele
    ("REF,ALT"), rs_id.
    """
    samples = None
    rows = []
    chrom, pos, rsid, allele = [], [], [], []
    n_multi = 0
    with _open(path) as f:
        for line in f:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                samples = line.rstrip("\n").split("\t")[9:]
                continue
            if samples is None:
                raise ValueError("VCF missing #CHROM header line")
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 10:
                continue
            ref, alt = parts[3], parts[4]
            if "," in alt:          # multi-allelic: skip (like a strict
                n_multi += 1        # biallelic-only seqVCF2GDS import)
                continue
            fmt = parts[8].split(":")
            try:
                gt_i = fmt.index("GT")
            except ValueError:
                continue
            row = np.empty(len(samples), np.int8)
            for j, cell in enumerate(parts[9:]):
                gt = cell.split(":")[gt_i] if cell not in (".", "") else "."
                alleles = gt.replace("|", "/").split("/")
                ds = 0
                missing = False
                for a in alleles:
                    if a in (".", ""):
                        missing = True
                        break
                    ds += int(a != "0")
                row[j] = 3 if missing else min(ds, 2)
            rows.append(row)
            chrom.append(parts[0])
            pos.append(int(parts[1]))
            rsid.append(parts[2])
            allele.append(f"{ref},{alt}")
            if max_variants and len(rows) >= max_variants:
                break
    codes = np.stack(rows) if rows else np.empty((0, len(samples or [])),
                                                 np.int8)
    meta = dict(sample_id=np.asarray(samples, object),
                variant_id=np.arange(1, len(rows) + 1, dtype=np.int32),
                position=np.asarray(pos, np.int32),
                chromosome=np.asarray(chrom, object),
                allele=np.asarray(allele, object),
                rs_id=np.asarray(rsid, object),
                n_multiallelic_skipped=n_multi)
    return codes, meta


def vcf_to_gds(vcf_path: str, gds_path: str,
               max_variants: Optional[int] = None) -> int:
    """Convert a VCF to a SeqArray-style genotype GDS; returns n variants."""
    from .gds_write import write_seqarray_gds

    codes, meta = read_vcf_codes(vcf_path, max_variants=max_variants)
    write_seqarray_gds(gds_path, codes,
                       sample_id=meta["sample_id"],
                       variant_id=meta["variant_id"],
                       position=meta["position"],
                       chromosome=meta["chromosome"],
                       allele=meta["allele"],
                       rs_id=meta["rs_id"])
    return codes.shape[0]
