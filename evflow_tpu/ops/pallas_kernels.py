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
  - sae_scatter_max: per-tile scatter-max of event timestamps into the SAE
    plane (reference analog: time_surface.at(y,x)=t per event).
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
# SAE scatter-max (row-partitioned)
# --------------------------------------------------------------------------

def _sae_kernel(rows0_ref, x_ref, y_ref, t_ref, valid_ref, sae_in_ref,
                sae_out_ref):
    """One horizontal band of the surface; every event lands via a masked
    per-event store loop over a VMEM-resident band."""
    band_h = sae_out_ref.shape[0]
    row0 = rows0_ref[0, 0]
    sae_out_ref[:, :] = sae_in_ref[:, :]
    n = x_ref.shape[0]

    def body(i, _):
        yy = y_ref[i] - row0
        xx = x_ref[i]
        ok = (valid_ref[i] > 0) & (yy >= 0) & (yy < band_h)
        yc = jnp.clip(yy, 0, band_h - 1)

        @pl.when(ok)
        def _():
            cur = sae_out_ref[yc, xx]
            sae_out_ref[yc, xx] = jnp.maximum(cur, t_ref[i])

        return 0

    jax.lax.fori_loop(0, n, body, 0)


@functools.partial(jax.jit, static_argnames=("bands", "interpret"))
def sae_scatter_max(sae: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                    t: jnp.ndarray, valid: jnp.ndarray,
                    bands: int = 8, interpret: bool = False) -> jnp.ndarray:
    """Band-partitioned scatter-max: each grid step owns H/bands rows, scans
    all events, and stores the ones in its band — deterministic, no atomics.
    Use when XLA's scatter is the bottleneck; otherwise ops/sae.py.
    """
    h, w = sae.shape
    assert h % bands == 0
    band_h = h // bands
    n = x.shape[0]
    rows0 = (jnp.arange(bands, dtype=jnp.int32) * band_h).reshape(bands, 1)
    return pl.pallas_call(
        _sae_kernel,
        grid=(bands,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((band_h, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((band_h, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, w), sae.dtype),
        interpret=interpret,
    )(rows0, x.astype(jnp.int32), y.astype(jnp.int32), t.astype(sae.dtype),
      valid.astype(jnp.int32), sae)
