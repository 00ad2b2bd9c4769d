"""Pallas TPU kernels: fused 2-bit decode + GRM matvec contractions.

The XLA formulation of the 2-bit resident GRM matvec
(``ops/packed_grm.packed2_grm_matvec``) decodes each (chunk, plane) into a
transient bf16 tile in HBM before the MXU dot — ~8x the byte traffic of
the packed store per pass.  These kernels decode **in VMEM**, so each of
the matvec's two passes reads the 0.25 B/genotype packed bytes exactly
once (the reference's hot loop decodes 4 genotypes/byte in registers,
/root/reference/src/saige_fitnull.cpp:480-517 — this is the TPU analog).

Exactness contract (same as ops/pallas_score): codes <= 2 and slice
magnitudes <= 64 keep every f32 partial an exact integer while the
contraction span is <= 2^24 / 128 = 131072; callers segment longer axes
and combine the exact segment results in f64.

Grid-mode Pallas does not compile on some remote stacks; callers go
through ``pallas_score.pallas_available()`` and keep the XLA path as the
fallback.  ``interpret=True`` runs the same kernels on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TM = 256        # variant-tile rows
TJ = 512        # byte-column tile (2048 genotypes across 4 planes)
SEGJ = 32768    # byte-column segment: 4 * 32768 cols = 2^17 samples
SEGM = 131072   # variant segment for the transposed pass


def _fwd_kernel(packed_ref, d4_ref, o_ref):
    """cv[m-tile] += sum_p decode_p(packed[m-tile, j-tile]) @ d4[p, j-tile]."""
    import jax.experimental.pallas as pl

    c = packed_ref[...].astype(jnp.int32)      # [TM, TJ] uint8 load
    acc = None
    for p in range(4):
        t = ((c >> (2 * p)) & 3).astype(jnp.float32).astype(jnp.bfloat16)
        part = jnp.dot(t, d4_ref[p], preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = acc

    @pl.when(pl.program_id(1) != 0)
    def _():
        o_ref[...] += acc


def _fwd_segment(packed, d4, interpret: bool):
    """One exact segment: [M, N4] x [4, N4, C] -> f32 [M, C]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, N4 = packed.shape
    C = d4.shape[2]
    padM = (-M) % TM
    padJ = (-N4) % TJ
    if padM or padJ:
        packed = jnp.pad(packed, ((0, padM), (0, padJ)))
    if padJ:
        d4 = jnp.pad(d4, ((0, 0), (0, padJ), (0, 0)))
    Mp, Jp = packed.shape
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(Mp // TM, Jp // TJ),
        in_specs=[
            pl.BlockSpec((TM, TJ), lambda i, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, TJ, C), lambda i, k: (0, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, C), lambda i, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, C), jnp.float32),
        interpret=interpret,
    )(packed, d4)
    return out[:M]


@functools.partial(jax.jit, static_argnames=("interpret",))
def plane_dot_fwd(packed, d4, interpret: bool = False):
    """f64 [M, C] = sum over planes/samples of decode(packed) @ d4.

    ``packed`` [M, N4] planar 2-bit (zeroed missing); ``d4`` [4, N4, C]
    bf16 plane-split slice matrix (C % 128 == 0).
    """
    M, N4 = packed.shape
    if d4.shape[2] % 128:
        raise ValueError("C must be a multiple of 128 (pad the slices)")
    acc = None
    for s in range(0, N4, SEGJ):
        part = _fwd_segment(packed[:, s:s + SEGJ], d4[:, s:s + SEGJ],
                            interpret).astype(jnp.float64)
        acc = part if acc is None else acc + part
    return acc


def _t_kernel(packed_ref, dm_ref, o0_ref, o1_ref, o2_ref, o3_ref):
    """out_p[j-tile] += decode_p(packed[m-tile, j-tile])' @ dm[m-tile]."""
    import jax.experimental.pallas as pl

    c = packed_ref[...].astype(jnp.int32)      # [TM, TJ]
    dm = dm_ref[...]                           # [TM, C] bf16
    outs = []
    for p in range(4):
        t = ((c >> (2 * p)) & 3).astype(jnp.float32).astype(jnp.bfloat16)
        outs.append(jax.lax.dot_general(
            t, dm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))          # [TJ, C]

    @pl.when(pl.program_id(1) == 0)
    def _():
        o0_ref[...] = outs[0]
        o1_ref[...] = outs[1]
        o2_ref[...] = outs[2]
        o3_ref[...] = outs[3]

    @pl.when(pl.program_id(1) != 0)
    def _():
        o0_ref[...] += outs[0]
        o1_ref[...] += outs[1]
        o2_ref[...] += outs[2]
        o3_ref[...] += outs[3]


def _t_segment(packed, dm, interpret: bool):
    """One exact segment: [M, N4]' x [M, C] -> f32 [4, N4, C]."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, N4 = packed.shape
    C = dm.shape[1]
    padM = (-M) % TM
    padJ = (-N4) % TJ
    if padM or padJ:
        packed = jnp.pad(packed, ((0, padM), (0, padJ)))
    if padM:
        dm = jnp.pad(dm, ((0, padM), (0, 0)))
    Mp, Jp = packed.shape

    ospec = pl.BlockSpec((TJ, C), lambda j, k: (j, 0),
                         memory_space=pltpu.VMEM)
    oshape = jax.ShapeDtypeStruct((Jp, C), jnp.float32)
    outs = pl.pallas_call(
        _t_kernel,
        grid=(Jp // TJ, Mp // TM),
        in_specs=[
            pl.BlockSpec((TM, TJ), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, C), lambda j, k: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(ospec, ospec, ospec, ospec),
        out_shape=(oshape, oshape, oshape, oshape),
        interpret=interpret,
    )(packed, dm)
    return jnp.stack(outs, axis=0)[:, :N4]     # [4, N4, C]


@functools.partial(jax.jit, static_argnames=("interpret",))
def plane_dot_t(packed, dm, interpret: bool = False):
    """f64 [4, N4, C] = per-plane decode(packed)' @ dm.

    The transposed GRM pass: contraction runs over variants (``dm``
    [M, C] bf16 slices of the weighted per-variant vectors), segmented at
    131072 variants for exact f32 partials.
    """
    M, N4 = packed.shape
    if dm.shape[1] % 128:
        raise ValueError("C must be a multiple of 128 (pad the slices)")
    acc = None
    for s in range(0, M, SEGM):
        part = _t_segment(packed[s:s + SEGM], dm[s:s + SEGM],
                          interpret).astype(jnp.float64)
        acc = part if acc is None else acc + part
    return acc
