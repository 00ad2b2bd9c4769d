"""Device-mesh sharding for the two scale axes of the problem.

The reference scales with shared-memory threads (TBB over variants inside
one GRM product) and independent per-host jobs merged at the file level
(SURVEY.md §2.3).  The TPU-native design instead shards:

* **samples** for the null fit: the standardized genotype matrix
  ``G_std [M, N]`` is sharded over its sample axis, so every PCG step's
  ``G'(G v)`` computes local partials and XLA inserts the ``psum`` over
  ICI for the M-vector inner products (the moral equivalent of the
  reference's per-thread accumulator + reduce, src/saige_fitnull.cpp:521-535);
* **variants** for the scan: dosage blocks are sharded over their batch
  axis with the null-model state replicated — embarrassingly parallel,
  partial result tables merged on the host.

Everything uses ``jax.sharding.NamedSharding`` + jit; no hand-written
collectives are needed because the contraction structure makes XLA's
choices optimal (one all-reduce per GRM product).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} available")
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def pad_dim(x, axis: int, multiple: int, value: float = 0.0):
    """Zero-pad ``x`` along ``axis`` up to the next multiple of ``multiple``.

    NamedSharding requires the sharded dimension to divide evenly across the
    mesh; real sample counts / trailing variant blocks rarely do.  Padding
    with zeros is exact for every kernel here: zero genotype columns
    contribute nothing to ``G'(Gv)`` partials, and padded variant rows are
    masked out of the result tables by the caller slicing to the original
    length.
    """
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(jnp.asarray(x), widths, constant_values=value)


def shard_grm(grm, mesh: Mesh, axis: str = "data"):
    """Shard a GRMOperator sample-wise across the mesh."""
    from ..ops.grm import GRMOperator

    if grm.n_samples % mesh.devices.size != 0:
        raise ValueError(
            f"n_samples={grm.n_samples} must divide the {mesh.devices.size}-"
            f"device mesh; pad samples (pad_dim with zero genotype columns, "
            f"W=1, rhs=0) before sharding the fit")

    samp = NamedSharding(mesh, P(None, axis))   # [M, N] split on N
    vec = NamedSharding(mesh, P(axis))          # [N]
    return GRMOperator(
        std_geno=jax.device_put(grm.std_geno, samp),
        diag=jax.device_put(grm.diag, vec),
        n_variants=grm.n_variants,
        n_samples=grm.n_samples,
    )


def shard_vectors(mesh: Mesh, x, axis: str = "data"):
    """Place [N] / [N, R] arrays with their sample axis sharded."""
    spec = P(axis) if np.ndim(x) == 1 else P(axis, None)
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


def shard_variant_batch(mesh: Mesh, G, axis: str = "data"):
    """Shard a dosage block [B, N] over variants (batch axis).

    Blocks whose length does not divide the mesh are zero-padded (a
    zero-dosage variant is filtered out by the MAC filter downstream); the
    caller slices result tables back to the original ``B``.
    """
    G = pad_dim(jnp.asarray(G), 0, mesh.devices.size)
    return jax.device_put(G, NamedSharding(mesh, P(axis, None)))


def replicate(mesh: Mesh, tree):
    """Replicate model state across the mesh."""
    full = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), full)
        if isinstance(x, (np.ndarray, jnp.ndarray)) else x, tree)
