"""Pallas TPU kernel: gap-coded sparse stream -> dense int8 codes in HBM.

The XLA formulation of the sparse decode (``ops/sparse_codes.decode_codes``)
ends in a 1D scatter, which serializes at ~80 ns/element on TPU — ~0.4 s
for a 1%-nonzero 1024 x 430k block, 10x the 2-bit kernel's whole score
contraction (BENCH_NOTES.md device-exec table).  Any pure-XLA
reformulation bottoms out in a scatter, gather or sort, so the decode is
re-built as two stages that fit this hardware:

1. an **XLA vector prepass** (``_pack_stream``) turns the gap codes into
   absolute flat positions with a segmented cumsum
   (``lax.associative_scan`` with row-reset flags — no per-entry gathers;
   the only scatters touch B row-boundary marks, not L entries), packing
   each entry into one int32 word ``(flat << 2) | code``;
2. a **gridless Pallas kernel** (``_decode_kernel``) streams those words
   through VMEM and replays them onto a VMEM tile with scalar stores
   (~a few cycles each on the scalar core, vs ~80 ns per XLA scatter
   element), DMA-ing each finished tile to the HBM output.

Gridless because grid-mode Mosaic kernels do not compile through this
backend (see ``pallas_score.pallas_available``); the "grid" is a
``fori_loop`` over entry chunks inside one kernel invocation, with the
tile cursor carried as loop state.  The decode is exact (integer stores),
so downstream kernels see bit-identical inputs to the dense transports.

Reference analog: the sparse genotype store + maf<0.05 sparse score path
(/root/reference/src/saige_fitnull.cpp:236-427, saige_main.cpp:299-350),
re-cast for a bandwidth-bound accelerator.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

ECHUNK = 1 << 16        # entries DMA'd into VMEM per refill (256 KB int32)
TILE_ROWS = 8           # output rows per VMEM tile / HBM store
FLAT_BITS_MAX = 1 << 29  # (flat << 2) must fit a non-negative int32


@functools.partial(jax.jit, static_argnames=("n_rows", "n_samples"))
def _pack_stream(entries: jnp.ndarray, row_ptr: jnp.ndarray,
                 n_rows: int, n_samples: int) -> jnp.ndarray:
    """Gap-coded uint16 entries -> monotone packed int32 ``(flat<<2)|code``.

    Vector-only: the segmented cumsum (per-row position from gap runs)
    rides ``associative_scan`` with reset flags at row starts, and the
    only scatter writes one mark per row boundary (<= B elements).
    Escape entries (code 0) keep their position — storing a 0 there is a
    no-op on a zero-initialised output.  Entries at or beyond
    ``row_ptr[-1]`` (stream padding) and any padding appended here are
    remapped to the last cell with code 0 (same no-op), preserving
    monotonicity for the kernel's tile cursor.
    """
    L = entries.shape[0]
    e = entries.astype(jnp.int32)
    step = (e >> 2) + 1
    code = e & 3

    marks = jnp.zeros((L,), jnp.int32).at[row_ptr[:-1]].add(
        1, mode="drop")                      # empty trailing rows start at L
    row_of = jnp.cumsum(marks) - 1
    flags = marks > 0

    def comb(a, b):
        af, asum = a
        bf, bsum = b
        return af | bf, bsum + jnp.where(bf, 0, asum)

    _, seg = jax.lax.associative_scan(comb, (flags, step))
    flat = row_of * n_samples + (seg - 1)
    w = (flat << 2) | code

    sentinel = jnp.int32((n_rows * n_samples - 1) << 2)
    k = jnp.arange(L, dtype=row_ptr.dtype)
    w = jnp.where(k < row_ptr[-1], w, sentinel)
    pad = (-L) % ECHUNK
    if pad:
        w = jnp.concatenate([w, jnp.full((pad,), sentinel, jnp.int32)])
    return w


def _decode_kernel(ent_hbm, out_hbm, ebuf, scratch, esem, osem):
    """Replay the packed entry stream onto HBM via a VMEM tile.

    ``ent_hbm``: [Lpad] int32 packed words, monotone in ``flat``;
    ``out_hbm``: [total] int8 flat output (total % TS == 0);
    ``ebuf``: [ECHUNK] int32 VMEM staging; ``scratch``: [TS] int8 tile.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TS = scratch.shape[0]
    total = out_hbm.shape[0]
    n_chunks = ent_hbm.shape[0] // ECHUNK

    scratch[...] = jnp.zeros((TS,), scratch.dtype)

    def flush(t):
        dma = pltpu.make_async_copy(
            scratch, out_hbm.at[pl.ds(t * TS, TS)], osem)
        dma.start()
        dma.wait()
        scratch[...] = jnp.zeros((TS,), scratch.dtype)

    def chunk_body(c, t):
        dma = pltpu.make_async_copy(
            ent_hbm.at[pl.ds(c * ECHUNK, ECHUNK)], ebuf, esem)
        dma.start()
        dma.wait()

        def ent_body(i, t):
            w = ebuf[i]
            flat = jax.lax.shift_right_logical(w, jnp.int32(2))
            # advance (and flush) tiles until flat lands in tile t; the
            # stream is monotone, so each tile flushes exactly once
            t = jax.lax.while_loop(
                lambda tt: flat >= (tt + 1) * TS,
                lambda tt: flush(tt) or tt + 1,
                t)
            scratch[flat - t * TS] = (w & 3).astype(scratch.dtype)
            return t

        return jax.lax.fori_loop(0, ECHUNK, ent_body, t)

    t = jax.lax.fori_loop(0, n_chunks, chunk_body, jnp.int32(0))
    jax.lax.while_loop(lambda tt: tt * TS < total,
                       lambda tt: flush(tt) or tt + 1,
                       t)


def _decode_pallas_call(w: jnp.ndarray, n_rows: int, n_samples: int,
                        tile_rows: int, interpret: bool) -> jnp.ndarray:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TS = tile_rows * n_samples
    total = n_rows * n_samples
    out = pl.pallas_call(
        _decode_kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((total,), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((ECHUNK,), jnp.int32),
            pltpu.VMEM((TS,), jnp.int8),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(w)
    return out.reshape(n_rows, n_samples)


def decode_codes_pallas(entries, row_ptr, n_rows: int, n_samples: int,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas decode of the gap-coded stream (exact inverse of
    ``encode_sparse_rows``); same contract as ``decode_codes``.

    Requires ``n_rows * n_samples < 2**29`` (flat index packs into an
    int32 beside the 2-bit code); callers check :func:`pallas_decode_fits`
    and fall back to the XLA scatter otherwise.
    """
    if entries.shape[0] == 0:
        return jnp.zeros((n_rows, n_samples), jnp.int8)
    tile_rows = _tile_rows(n_rows)
    w = _pack_stream(jnp.asarray(entries), jnp.asarray(row_ptr),
                     n_rows, n_samples)
    return _decode_pallas_call(w, n_rows, n_samples, tile_rows, interpret)


def _tile_rows(n_rows: int) -> int:
    for tr in (TILE_ROWS, 4, 2, 1):
        if n_rows % tr == 0:
            return tr
    return 1


def pallas_decode_fits(n_rows: int, n_samples: int) -> bool:
    return n_rows * n_samples < FLAT_BITS_MAX


_PALLAS_DECODE_OK: Optional[bool] = None


def pallas_decode_available() -> bool:
    """Probe once whether the gridless decode kernel compiles and runs
    correctly on this backend (compiled, not interpret mode).

    EXPERIMENTAL, off by default (``SAIGEGDS_TPU_EXPERIMENTAL_PALLAS=1``
    enables the probe): no backend this project has run on compiles it
    (BENCH_r03 ``sparse_decode_pallas: false``); the default decode is
    the segmented-cumsum XLA path (``sparse_codes.decode_codes``), which
    carries the measured 1.8x rare-file win on its own.  An explicit
    ``SAIGE_SPARSE_DECODE=pallas`` still forces this kernel regardless.
    """
    import os
    if not os.environ.get("SAIGEGDS_TPU_EXPERIMENTAL_PALLAS"):
        return False
    global _PALLAS_DECODE_OK
    if _PALLAS_DECODE_OK is None:
        try:
            from .sparse_codes import encode_sparse_rows
            codes = np.zeros((TILE_ROWS, 512), np.int8)
            codes[0, 5] = 1
            codes[1, 300] = 2
            codes[3, 511] = 3
            entries, rp = encode_sparse_rows(codes)
            got = np.asarray(decode_codes_pallas(
                jnp.asarray(entries), jnp.asarray(rp), *codes.shape))
            _PALLAS_DECODE_OK = bool((got == codes).all())
        except Exception:
            _PALLAS_DECODE_OK = False
    return _PALLAS_DECODE_OK
