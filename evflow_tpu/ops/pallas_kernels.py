"""Pallas TPU kernels for the hot per-slice ops.

These fuse what XLA would otherwise stage through HBM. Each kernel has the
jnp reference implementation as its oracle (tests/test_pallas.py) and a
config/argument switch so every call site can fall back to the XLA path —
the Mosaic compiler on some rigs is fragile for exotic graphs, so kernels
here stick to plain VMEM tiling + VPU math.

Kernels:
  - assign_manhattan: fused L1-distance + masked argmin of (N, 2) events
    against (C, 2) cluster means — the inner loop of the fast clustering path
    (reference analog: assign_to_centers.cl:1-34, but L1 per AEClustering).
    Measured on hardware it TIES the XLA fusion of the same math, so the
    pipeline uses the jnp form; the kernel stays as the validated pattern.
  - (removed) sae_scatter_max: see the note at the bottom — Mosaic cannot
    lower per-event scalar VMEM stores; XLA's scatter is the TPU answer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------------
# Fused Manhattan assignment
# --------------------------------------------------------------------------

def _assign_kernel(x_ref, y_ref, mu_ref, alive_ref, radius_ref,
                   label_ref, dist_ref):
    """One (TILE_N,) block of events against all C means held in VMEM."""
    x = x_ref[:].astype(jnp.float32)          # (TILE_N,)
    y = y_ref[:].astype(jnp.float32)
    mux = mu_ref[:, 0]                        # (C,)
    muy = mu_ref[:, 1]
    alive = alive_ref[:]                      # (C,) int32 0/1
    d = (jnp.abs(x[:, None] - mux[None, :])
         + jnp.abs(y[:, None] - muy[None, :]))          # (TILE_N, C)
    d = jnp.where(alive[None, :] > 0, d, jnp.inf)
    best = jnp.argmin(d, axis=1).astype(jnp.int32)
    bestd = jnp.min(d, axis=1)
    gate = bestd <= radius_ref[0]
    label_ref[:] = jnp.where(gate, best, -1)
    dist_ref[:] = bestd


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def assign_manhattan(x: jnp.ndarray, y: jnp.ndarray, mu: jnp.ndarray,
                     alive: jnp.ndarray, radius: float,
                     tile_n: int = 2048, interpret: bool = False):
    """(N,) int32 labels (-1 gated) + (N,) float32 distances.

    Events stream through VMEM in TILE_N blocks; the (C, 2) means and alive
    mask stay resident. Equivalent to the jnp path in
    fastcluster.update_slice step 1.
    """
    n = x.shape[0]
    c = mu.shape[0]
    assert n % tile_n == 0, f"N={n} must be a multiple of tile_n={tile_n}"
    grid = (n // tile_n,)
    radius_arr = jnp.full((1,), radius, jnp.float32)
    labels, dists = pl.pallas_call(
        _assign_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n,), jnp.int32),
            jax.ShapeDtypeStruct((n,), jnp.float32),
        ],
        interpret=interpret,
    )(x.astype(jnp.int32), y.astype(jnp.int32), mu.astype(jnp.float32),
      alive.astype(jnp.int32), radius_arr)
    return labels, dists


def assign_manhattan_reference(x, y, mu, alive, radius):
    """jnp oracle — identical math to fastcluster.update_slice step 1."""
    pts = jnp.stack([x, y], axis=1).astype(jnp.float32)
    d = jnp.sum(jnp.abs(pts[:, None, :] - mu[None, :, :].astype(jnp.float32)),
                axis=-1)
    d = jnp.where(alive[None, :] > 0, d, jnp.inf)
    best = jnp.argmin(d, axis=1).astype(jnp.int32)
    bestd = jnp.min(d, axis=1)
    return jnp.where(bestd <= radius, best, -1), bestd


# --------------------------------------------------------------------------
# SAE scatter-max: intentionally NOT a Pallas kernel
# --------------------------------------------------------------------------
# A band-partitioned Pallas scatter (each grid step owning H/bands rows and
# storing its band's events in a fori_loop) was implemented and measured, but
# Mosaic rejects per-event dynamic scalar stores to VMEM ("Cannot store
# scalars to VMEM") — the formulation is unlowerable on real TPUs, and only
# ran in interpret mode. XLA's native scatter-max (ops/sae.py:update_sae)
# measures 0.86 ms per 16384-event slice in-scan and is the correct TPU
# formulation for this op; likewise the fused Manhattan assignment above
# only TIES the XLA fusion (0.95 vs 0.90 ms/slice) — XLA already fuses the
# distance+argmin chain. The kernel above is kept as the validated Pallas
# pattern for ops where XLA's fusion falls short.
