"""Peak-RSS bound for out-of-core streamed GRM ingestion.

Pins the bounded-memory claim of the streamed builders (models/fitnull.py
stream_geno tier): building the 2-bit planar GRM from a block stream must
peak well below building it from a materialized [M, N] int8 matrix, and
produce the bit-identical operator.  Measured in a fresh subprocess so
the high-water mark is the builder's own, not the test session's.

(The reference's counterpart is streaming `seqApply` ingestion into the
C++ store, R/saige_main.r:399-420 — bounded by block size by design.)
"""

import re
import subprocess
import sys

import pytest

M, N, B = 8192, 120_000, 512

CHILD = f"""
import os, resource, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np

M, N, B = {M}, {N}, {B}

def blocks():
    for i in range(0, M, B):
        rng = np.random.default_rng(100 + i)
        yield np.arange(i, i + B), rng.binomial(
            2, 0.2, size=(B, N)).astype(np.int8)

if sys.argv[1] == "streamed":
    from saigegds_tpu.ops.packed_grm import build_packed2_grm_streamed
    grm = build_packed2_grm_streamed(blocks(), N)
else:
    from saigegds_tpu.ops.packed_grm import build_packed2_grm
    codes = np.concatenate([b for _, b in blocks()], axis=0)
    grm = build_packed2_grm(codes)

# the operator IS (packed, af, inv, diag, missing): checksum its state
# instead of running a matvec, whose XLA-CPU compile+transients would
# dominate both children's peaks and drown the build-phase signal
cs = (int(sum(np.asarray(t).sum(dtype=np.uint64)
              for lf in grm.packed for t in lf)),
      repr(float(np.asarray(grm.af).sum())),
      repr(float(np.asarray(grm.inv).sum())),
      repr(float(np.asarray(grm.diag)[::997].sum())))
print(f"RESULT {{resource.getrusage(resource.RUSAGE_SELF).ru_maxrss}} "
      f"{{'|'.join(map(str, cs))}}")
"""


def _run_once(mode):
    r = subprocess.run([sys.executable, "-c", CHILD, mode],
                       capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    m = re.search(r"RESULT (\d+) (\S+)", r.stdout)
    assert m, r.stdout
    return int(m.group(1)), m.group(2)


def _run(mode, n=3):
    # min of n runs: ru_maxrss is a high-water mark, so allocator noise
    # (glibc arena growth under ambient machine load) only inflates it;
    # the smallest measurement is the truer build footprint.  In-suite
    # runs see substantially noisier peaks than isolation (ambient
    # memory pressure from ~230 earlier tests), hence n=3.
    runs = [_run_once(mode) for _ in range(n)]
    outs = {r[1] for r in runs}
    assert len(outs) == 1, (mode, outs)       # deterministic operator
    return min(r[0] for r in runs), runs[0][1]


@pytest.mark.parametrize("seed", [0])  # single case; parametrize for shape
def test_streamed_build_peak_rss(seed):
    rss_s, out_s = _run("streamed")
    rss_f, out_f = _run("full")
    # identical operator: packed store / af / inv match bit-for-bit; the
    # diag partials accumulate in block order vs thread order, so compare
    # that field as a float
    ps, afs, invs, dgs = out_s.split("|")
    pf, aff, invf, dgf = out_f.split("|")
    assert (ps, afs, invs) == (pf, aff, invf)
    assert abs(float(dgs) - float(dgf)) < 1e-9 * abs(float(dgf))
    # the streamed build holds one block of int8 codes; the full build
    # holds the whole [M, N] matrix (plus its concat copy).  With the
    # native one-pass moments kernel both are lean, so the remaining gap
    # IS the materialized matrix — assert a conservative fraction of the
    # measured ~0.55 isolation ratio so environment drift can't flake
    assert rss_s < 0.8 * rss_f, (rss_s, rss_f)
