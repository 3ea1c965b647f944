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
# Fused cluster-stats kernel (r5, VERDICT r4 task #5)
# --------------------------------------------------------------------------

def _cluster_stats_kernel(tri_ref, lbl_ref, x_ref, y_ref, la_ref,
                          out_ref, counts_ref, prefix_ref):
    """Two-phase grid (phase, block): phase 0 accumulates per-cluster member
    counts; phase 1 computes stream-order ranks (block-local triangular
    matmul cumsum + running prefix), EWMA weights w = a·(1-a)^(k-1-rank),
    and the (C, 5) [count, Σx, Σy, Σwx, Σwy] aggregates — everything the
    XLA stats path stages through HBM as (N, C) panels stays in VMEM."""
    p = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    bn = lbl_ref.shape[0]
    c = counts_ref.shape[1]
    sb = tri_ref.shape[0]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    lbl = lbl_ref[:]

    @pl.when((p == 0) & (b == 0))
    def _():
        counts_ref[...] = jnp.zeros_like(counts_ref)

    @pl.when((p == 1) & (b == 0))
    def _():
        prefix_ref[...] = jnp.zeros_like(prefix_ref)
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(p == 0)
    def _():
        oh = (lbl[:, None] == iota_c).astype(jnp.float32)       # (bn, C)
        counts_ref[...] = counts_ref[...] + jnp.sum(oh, axis=0,
                                                    keepdims=True)

    @pl.when(p == 1)
    def _():
        la = la_ref[0]
        alpha = la_ref[1]
        x = x_ref[:]
        y = y_ref[:]
        counts = counts_ref[...]                                # (1, C)
        off = prefix_ref[...]                                   # (1, C)
        acc = out_ref[...]                                      # (C, 5)
        for s in range(bn // sb):
            sl = slice(s * sb, (s + 1) * sb)
            ohs = (lbl[sl][:, None] == iota_c).astype(jnp.float32)
            incl = jnp.dot(tri_ref[...], ohs,
                           preferred_element_type=jnp.float32)  # (sb, C)
            excl = incl - ohs + off                             # (sb, C)
            rank = jnp.sum(ohs * excl, axis=1)                  # (sb,)
            k_i = jnp.sum(ohs * counts, axis=1)                 # (sb,)
            member = jnp.sum(ohs, axis=1) > 0.0
            expo = jnp.clip(k_i - 1.0 - rank, 0.0, 80.0)
            w = jnp.where(member, alpha * jnp.exp(expo * la), 0.0)
            feats = jnp.stack(
                [jnp.sum(ohs, axis=1), x[sl], y[sl],
                 w * x[sl], w * y[sl]], axis=1)                 # (sb, 5)
            feats = jnp.where(member[:, None], feats, 0.0)
            acc = acc + jax.lax.dot_general(
                ohs, feats, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # (C, 5)
            off = off + jnp.sum(ohs, axis=0, keepdims=True)
        prefix_ref[...] = off
        out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("alpha", "c", "tile_n",
                                             "sub_block", "interpret"))
def cluster_stats(labels: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                  alpha: float, c: int, tile_n: int = 2048,
                  sub_block: int = 512, interpret: bool = False):
    """Fused per-slice cluster statistics: (C, 5) f32
    [member count, Σx, Σy, Σ w·x, Σ w·y] with stream-order EWMA weights
    w_i = α(1-α)^(k-1-rank_i) — the per-event-heavy half of
    fastcluster._slice_aggregates_matmul as ONE Mosaic program (no (N, C)
    HBM panels). labels: (N,) int32, -1 = unassigned. Counts and ranks are
    exact (0/1 products, f32 accumulation); weighted sums differ from the
    XLA paths only in fp reduction order."""
    n = labels.shape[0]
    assert n % tile_n == 0 and tile_n % sub_block == 0, (n, tile_n, sub_block)
    import math
    grid = (2, n // tile_n)
    tri = jnp.tril(jnp.ones((sub_block, sub_block), jnp.float32))
    la = jnp.asarray([math.log1p(-alpha), alpha], jnp.float32)
    return pl.pallas_call(
        _cluster_stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((sub_block, sub_block), lambda p, b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda p, b: (b,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda p, b: (b,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n,), lambda p, b: (b,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2,), lambda p, b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, 5), lambda p, b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, 5), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32),
                        pltpu.VMEM((1, c), jnp.float32)],
        interpret=interpret,
    )(tri, labels.astype(jnp.int32), x.astype(jnp.float32),
      y.astype(jnp.float32), la)


def cluster_stats_reference(labels, x, y, alpha, c):
    """jnp oracle — mirrors _slice_aggregates_matmul's math."""
    n = labels.shape[0]
    member = labels >= 0
    ids = jnp.where(member, labels, c)
    onehot = (ids[:, None] == jnp.arange(c)[None, :]).astype(jnp.float32)
    p = jnp.cumsum(onehot, axis=0)
    k_c = p[-1]
    import math
    la = math.log1p(-alpha)
    expo = jnp.clip(k_c[None, :] - p, 0.0, 80.0)
    w = jnp.sum(onehot * (alpha * jnp.exp(expo * la)), axis=1)
    feats = jnp.stack([jnp.ones((n,)), x.astype(jnp.float32),
                       y.astype(jnp.float32), w * x, w * y], axis=1)
    feats = jnp.where(member[:, None], feats, 0.0)
    return jax.lax.dot_general(onehot, feats, (((0,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGHEST)


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
