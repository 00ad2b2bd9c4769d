"""Pallas TPU kernel: fused int8 decode + exact integer contraction.

The XLA formulation of the packed score kernel (``ops/score_packed.py``)
materializes three bf16 indicator matrices (``g0``/``m``/``g2``) in HBM
plus padding/transpose copies for chunked accumulation — several times the
int8 stream it actually needs.  This Pallas kernel decodes the indicators
**in VMEM** per tile, so HBM sees exactly one pass over the 1-byte codes:

    grid (i, k) over [B, N] tiles:
      c   <- codes[i-tile, k-tile]            (int8, the only HBM read)
      g0  = where(c==3, 0, c); m = (c==3); g2 = (c==2)    (VPU, in VMEM)
      acc[i-tile] += [g0|m|g2]-tile @ Vs[k-tile]  (bf16 MXU, f32 accum)

Exactness: every product is an integer <= 2*64 = 128 (codes <= 2, slice
magnitudes <= 64), so partial sums stay exact integers in f32 as long as
the contraction covers <= 2^24 / 128 = 131072 samples.  The caller splits
larger N into 128Ki-sample segments and combines the exact segment results
in f64 — full float64 fidelity end to end.

``Vs`` is the signed-7-bit slice decomposition of the model-vector matrix
(``_slice_i8``), baked once per scan model.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TB = 256        # variant-tile rows
TN = 2048       # sample-tile (contraction) width
SEG = 131072    # exact-f32 accumulation bound: 128 * SEG == 2^24


def _kernel(codes_ref, vs_ref, o0_ref, o1_ref, o2_ref):
    import jax.experimental.pallas as pl

    c = codes_ref[...].astype(jnp.int32)     # [TB, TN] (int8 load, widened:
    v = vs_ref[...]                          # Mosaic's direct int8->bf16
    #                                          convert recurses; go via i32/f32)
    cf = c.astype(jnp.float32)
    g0 = jnp.where(c == 3, 0.0, cf).astype(jnp.bfloat16)
    m = (c == 3).astype(jnp.float32).astype(jnp.bfloat16)
    g2 = (c == 2).astype(jnp.float32).astype(jnp.bfloat16)
    d0 = jnp.dot(g0, v, preferred_element_type=jnp.float32)
    d1 = jnp.dot(m, v, preferred_element_type=jnp.float32)
    d2 = jnp.dot(g2, v, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == 0)
    def _():
        o0_ref[...] = d0
        o1_ref[...] = d1
        o2_ref[...] = d2

    @pl.when(pl.program_id(1) != 0)
    def _():
        o0_ref[...] += d0
        o1_ref[...] += d1
        o2_ref[...] += d2


def _segment_dot(codes, vs, interpret: bool):
    """One exact-f32 segment (N <= SEG): [B, N] x [N, C] -> f32 [B, 3C]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = codes.shape
    C = vs.shape[1]
    padB = (-B) % TB
    padN = (-N) % TN
    if padB or padN:
        codes = jnp.pad(codes, ((0, padB), (0, padN)))
    if padN:
        vs = jnp.pad(vs, ((0, padN), (0, 0)))
    Bp, Np = codes.shape

    ospec = pl.BlockSpec((TB, C), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((Bp, C), jnp.float32)
    o0, o1, o2 = pl.pallas_call(
        _kernel,
        grid=(Bp // TB, Np // TN),
        in_specs=[
            pl.BlockSpec((TB, TN), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, C), lambda i, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(ospec, ospec, ospec),
        out_shape=(oshape, oshape, oshape),
        interpret=interpret,
    )(codes, vs)
    return jnp.stack([o0[:B], o1[:B], o2[:B]], axis=1)   # [B, 3, C]


TNW = 512       # byte-column tile (2048 genotypes/plane-tile) for 2-bit blocks
SEG4 = 32768    # byte-column segment: 4 planes * 32768 cols = 2^17 samples,
#                 so f32 accumulation stays exact (128 * 2^17 = 2^24)


def _kernel2(packed_ref, vs4_ref, o0_ref, o1_ref, o2_ref):
    """Fused 2-bit planar decode + indicator contraction (one HBM pass
    over 0.25 B/genotype packed bytes)."""
    import jax.experimental.pallas as pl

    c = packed_ref[...].astype(jnp.int32)    # [TB, TNW] (uint8 load)
    d0 = d1 = d2 = None
    for p in range(4):
        t = (c >> (2 * p)) & 3
        tf = t.astype(jnp.float32)
        g0 = jnp.where(t == 3, 0.0, tf).astype(jnp.bfloat16)
        m = (t == 3).astype(jnp.float32).astype(jnp.bfloat16)
        g2 = (t == 2).astype(jnp.float32).astype(jnp.bfloat16)
        v = vs4_ref[p]                       # [TNW, C]
        p0 = jnp.dot(g0, v, preferred_element_type=jnp.float32)
        p1 = jnp.dot(m, v, preferred_element_type=jnp.float32)
        p2 = jnp.dot(g2, v, preferred_element_type=jnp.float32)
        d0 = p0 if d0 is None else d0 + p0
        d1 = p1 if d1 is None else d1 + p1
        d2 = p2 if d2 is None else d2 + p2

    @pl.when(pl.program_id(1) == 0)
    def _():
        o0_ref[...] = d0
        o1_ref[...] = d1
        o2_ref[...] = d2

    @pl.when(pl.program_id(1) != 0)
    def _():
        o0_ref[...] += d0
        o1_ref[...] += d1
        o2_ref[...] += d2


def _segment_dot2(packed, vs4, interpret: bool):
    """One exact-f32 segment (N4 <= SEG4): [B, N4] x [4, N4, C] -> [B, 3, C]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N4 = packed.shape
    C = vs4.shape[2]
    padB = (-B) % TB
    padJ = (-N4) % TNW
    if padB or padJ:
        packed = jnp.pad(packed, ((0, padB), (0, padJ)))
    if padJ:
        vs4 = jnp.pad(vs4, ((0, 0), (0, padJ), (0, 0)))
    Bp, Jp = packed.shape

    ospec = pl.BlockSpec((TB, C), lambda i, k: (i, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((Bp, C), jnp.float32)
    o0, o1, o2 = pl.pallas_call(
        _kernel2,
        grid=(Bp // TB, Jp // TNW),
        in_specs=[
            pl.BlockSpec((TB, TNW), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TNW, C), lambda i, k: (0, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(ospec, ospec, ospec),
        out_shape=(oshape, oshape, oshape),
        interpret=interpret,
    )(packed, vs4)
    return jnp.stack([o0[:B], o1[:B], o2[:B]], axis=1)   # [B, 3, C]


@functools.partial(jax.jit, static_argnames=("interpret",))
def indicator_dot_2bit(packed, vs4, interpret: bool = False):
    """[B, N4] planar 2-bit packed codes x [4, N4, C] plane-split bf16
    slices -> f64 [B, 3, C] (g0 / missing / hom-ALT contractions).

    The 2-bit analog of :func:`indicator_dot`: HBM reads 0.25 B/genotype
    (one pass over the packed bytes), decode happens in VMEM.
    """
    B, N4 = packed.shape
    C = vs4.shape[2]
    if C % 128:
        raise ValueError(f"C={C} must be a multiple of 128 (pad the slices)")
    acc = None
    for s in range(0, N4, SEG4):
        part = _segment_dot2(packed[:, s:s + SEG4], vs4[:, s:s + SEG4],
                             interpret).astype(jnp.float64)
        acc = part if acc is None else acc + part
    return acc


_PALLAS_OK = None


def pallas_available() -> bool:
    """Whether compiled Pallas kernels are enabled AND compile here.

    EXPERIMENTAL, off by default: no backend this project has run on
    compiles these kernels (grid-mode Mosaic is rejected by the tunneled
    remote-AOT stack, and CPU has no Mosaic), so the hot paths use the
    tuned XLA formulations directly and skip the probe compile.  Set
    ``SAIGEGDS_TPU_EXPERIMENTAL_PALLAS=1`` on a standard TPU stack to
    probe-and-enable the fused kernels (decision log: ROADMAP.md round 4).
    """
    import os
    if not os.environ.get("SAIGEGDS_TPU_EXPERIMENTAL_PALLAS"):
        return False
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            # probe BOTH kernel shapes callers dispatch (a backend can
            # accept the single-output int8 kernel yet reject the
            # 3-output planar one)
            codes = jnp.zeros((TB, TN), jnp.int8)
            vs = jnp.zeros((TN, 128), jnp.bfloat16)
            jax.block_until_ready(_segment_dot(codes, vs, False))
            packed = jnp.zeros((TB, TNW), jnp.uint8)
            vs4 = jnp.zeros((4, TNW, 128), jnp.bfloat16)
            jax.block_until_ready(_segment_dot2(packed, vs4, False))
            _PALLAS_OK = True
        except Exception:
            _PALLAS_OK = False
    return _PALLAS_OK


@functools.partial(jax.jit, static_argnames=("interpret",))
def indicator_dot(codes, vs, interpret: bool = False):
    """[B, N] int8 codes x [N, C] bf16 slices -> f64 [B, 3, C].

    The three indicator contractions (g0, missing, hom-ALT) of every
    variant row against every sliced model vector, exact to f64.
    ``C`` must be a multiple of 128 (pad slices with zero columns).
    """
    B, N = codes.shape
    C = vs.shape[1]
    if C % 128:
        raise ValueError(f"C={C} must be a multiple of 128 (pad the slices)")
    acc = None
    for s in range(0, N, SEG):
        part = _segment_dot(codes[:, s:s + SEG], vs[s:s + SEG],
                            interpret).astype(jnp.float64)
        acc = part if acc is None else acc + part
    return acc
