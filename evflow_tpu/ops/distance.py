"""Pairwise-distance and assignment primitives.

TPU-native replacement for assign_to_centers.cl:1-34 (per-point nearest-center
under a distance gate) and the general OPTICS/DBSCAN neighbor computations.
Distances are computed via the MXU:  d2 = |a|^2 + |b|^2 - 2 a.b  with the cross
term a (M,D)x(D,K) matmul in float32 (preferred_element_type) — keeps the FLOPs
on the systolic array instead of scalar loops.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(M, D), (K, D) -> (M, K) squared Euclidean distances (MXU matmul).

    precision=HIGHEST is load-bearing: the TPU's default matmul precision
    feeds bf16 mantissas to the MXU, and with coordinates ~1e3 the 2ab term's
    rounding (~4e3) dwarfs typical eps² gates (~30) — measured on hardware as
    ~80x inflated neighborhood counts. HIGHEST runs the 3-pass fp32-accurate
    scheme; the panel is still MXU-bound and ~fast."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)            # (M, 1)
    b2 = jnp.sum(b * b, axis=1, keepdims=True).T          # (1, K)
    cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 + b2 - 2.0 * cross, 0.0)


def pairwise_manhattan(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(M, D), (K, D) -> (M, K) L1 distances (VPU; used by AEClustering's
    manhattanDistance, MyCluster.cpp:63-66)."""
    return jnp.sum(jnp.abs(a[:, None, :].astype(jnp.float32)
                           - b[None, :, :].astype(jnp.float32)), axis=-1)


class AssignResult(NamedTuple):
    labels: jnp.ndarray   # int32 (M,) nearest center in 0..K-1, or -1 if gated
    dists: jnp.ndarray    # float32 (M,) distance to the assigned center


def assign_to_centers(
    points: jnp.ndarray,
    centers: jnp.ndarray,
    threshold: float = 50.0,
    sequential_tie_break: bool = True,
) -> AssignResult:
    """Nearest-center assignment under an initial distance gate.

    Mirrors assign_to_centers.cl:11-29: each point starts with threshold 50.0
    and scans centers in order keeping strictly-closer ones, so ties keep the
    *first* center — jnp.argmin has the same first-min tie-break. Points with
    no center under the gate get label -1 (kernel's uchar 255).

    Uses the exact (N, K, D) difference form rather than the |a|²+|b|²-2ab MXU
    trick: K is small here and the cancellation error of the matmul form
    (~|a|²·eps) is large enough to flip labels near Voronoi boundaries.
    """
    diff = points[:, None, :].astype(jnp.float32) - centers[None, :, :].astype(jnp.float32)
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    labels = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    gated = best < threshold
    return AssignResult(jnp.where(gated, labels, -1), jnp.where(gated, best, jnp.inf))


def radius_neighbor_counts(points: jnp.ndarray, eps: float,
                           valid: jnp.ndarray | None = None,
                           block: int = 2048) -> jnp.ndarray:
    """(N,) count of points within eps (inclusive of self), tiled to bound
    memory at (block, N) per step. Used for DBSCAN core-point tests."""
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    eps2 = jnp.float32(eps * eps)

    nblocks = (n + block - 1) // block
    pad = nblocks * block - n
    pts = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))
    vmask = jnp.pad(valid, (0, pad))

    def body(i, acc):
        rows = jax.lax.dynamic_slice_in_dim(pts, i * block, block, 0)
        rvalid = jax.lax.dynamic_slice_in_dim(vmask, i * block, block, 0)
        d2 = pairwise_sqdist(rows, pts[:n])
        cnt = jnp.sum((d2 <= eps2) & valid[None, :], axis=1)
        cnt = jnp.where(rvalid, cnt, 0)
        return jax.lax.dynamic_update_slice_in_dim(acc, cnt.astype(jnp.int32), i * block, 0)

    out = jnp.zeros((nblocks * block,), jnp.int32)
    out = jax.lax.fori_loop(0, nblocks, body, out)
    return out[:n]


def kth_neighbor_dist(points: jnp.ndarray, k: int, eps: float | None = None,
                      block: int = 2048) -> jnp.ndarray:
    """(N,) distance to the k-th nearest neighbor *excluding* self... see note.

    OPTICS core-dist (optics.hpp:286-299) is the distance to the min_pts-th
    element of the eps-neighborhood *including* the point itself (the rtree
    query returns the query point). We follow that: k=min_pts over the
    inclusive neighborhood, i.e. the (k)-th smallest pairwise distance with
    self-distance 0 present. If eps is given, distances > eps are excluded
    (+inf), and points with fewer than k in-eps neighbors get +inf (undefined
    core distance).
    """
    n = points.shape[0]
    nblocks = (n + block - 1) // block
    pad = nblocks * block - n
    pts = jnp.pad(points.astype(jnp.float32), ((0, pad), (0, 0)))

    def body(i, acc):
        rows = jax.lax.dynamic_slice_in_dim(pts, i * block, block, 0)
        d2 = pairwise_sqdist(rows, pts[:n])
        d = jnp.sqrt(d2)
        if eps is not None:
            d = jnp.where(d <= eps, d, jnp.inf)
        # k-th smallest per row (1-indexed): top_k of negated values.
        neg_topk, _ = jax.lax.top_k(-d, k)
        kth = -neg_topk[:, k - 1]
        return jax.lax.dynamic_update_slice_in_dim(acc, kth, i * block, 0)

    out = jnp.zeros((nblocks * block,), jnp.float32)
    out = jax.lax.fori_loop(0, nblocks, body, out)
    return out[:n]
