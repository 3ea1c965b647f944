"""Point-cloud preprocessing — the pcl_cluster.cpp pipeline stages on TPU.

Reference (point-cloud-clustering/pcl_cluster.cpp):
  - PCD read (:38-48)                      → io (npz/csv; utils.pcd for PCD)
  - VoxelGrid leaf 0.01 downsample (:53-57) → voxel_downsample (centroid per
    occupied voxel, like PCL's VoxelGrid)
  - RANSAC plane removal, 100 iters, threshold 0.02 (:64-94)
    → ransac_plane (hypotheses batched over the MXU/VPU instead of a serial
      sample loop; deterministic counter-based sampling replaces PCL's RNG)
  - kd-tree + DBSCAN (:97-123)             → models/dbscan.py
  - per-cluster intensity j%8, CSV/PCD out (:127-148) → utils/export
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class VoxelResult(NamedTuple):
    points: jnp.ndarray   # float32 (N, D) voxel centroids (compacted)
    count: jnp.ndarray    # int32 () number of occupied voxels
    valid: jnp.ndarray    # bool (N,)


@functools.partial(jax.jit, static_argnames=("num_buckets",))
def voxel_downsample(points: jnp.ndarray, leaf: float,
                     valid: jnp.ndarray | None = None,
                     num_buckets: int = 1 << 16) -> VoxelResult:
    """Centroid-per-voxel downsampling (PCL VoxelGrid semantics).

    Voxel keys are hashed into `num_buckets` (collisions merge distant voxels
    with probability ~occupied/num_buckets — raise num_buckets for parity).
    """
    n, d = points.shape
    pts = points.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)
    mins = jnp.min(jnp.where(valid[:, None], pts, jnp.inf), axis=0)
    cell = jnp.floor((pts - mins[None, :]) / leaf).astype(jnp.int64)
    primes = jnp.array([73856093, 19349663, 83492791][:d], jnp.int64)
    key = (jnp.sum(cell * primes[None, :], axis=1) % num_buckets).astype(jnp.int32)
    key = jnp.where(valid, key, num_buckets)

    sums = jax.ops.segment_sum(jnp.where(valid[:, None], pts, 0.0), key,
                               num_segments=num_buckets + 1)[:num_buckets]
    cnts = jax.ops.segment_sum(valid.astype(jnp.int32), key,
                               num_segments=num_buckets + 1)[:num_buckets]
    occupied = cnts > 0
    centroids = sums / jnp.maximum(cnts, 1)[:, None].astype(jnp.float32)

    # compact occupied voxels into the first N lanes (stream order by bucket)
    pos = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    count = jnp.sum(occupied.astype(jnp.int32))
    spos = jnp.where(occupied & (pos < n), pos, n)
    out = jnp.zeros((n + 1, d), jnp.float32).at[spos].set(
        jnp.where(occupied[:, None], centroids, 0.0), mode="drop")[:n]
    lane = jnp.arange(n)
    return VoxelResult(points=out, count=jnp.minimum(count, n),
                       valid=lane < count)


class PlaneResult(NamedTuple):
    coeffs: jnp.ndarray    # float32 (4,) plane ax+by+cz+d=0 (unit normal)
    inliers: jnp.ndarray   # bool (N,)
    num_inliers: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("iters",))
def ransac_plane(points: jnp.ndarray,
                 valid: jnp.ndarray | None = None,
                 threshold: float = 0.02,
                 iters: int = 100,
                 seed: int = 0) -> PlaneResult:
    """SACMODEL_PLANE RANSAC (pcl_cluster.cpp:66-77): `iters` 3-point
    hypotheses evaluated in one batch; best inlier count wins."""
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)

    key = jax.random.PRNGKey(seed)
    idx = jax.random.randint(key, (iters, 3), 0, n)
    tri = pts[idx]                                   # (I, 3, D)
    v1 = tri[:, 1] - tri[:, 0]
    v2 = tri[:, 2] - tri[:, 0]
    normal = jnp.cross(v1, v2)                       # (I, 3)
    norm = jnp.linalg.norm(normal, axis=1, keepdims=True)
    ok = (norm[:, 0] > 1e-12) & jnp.all(valid[idx], axis=1)
    normal = normal / jnp.maximum(norm, 1e-12)
    dcoef = -jnp.sum(normal * tri[:, 0], axis=1)     # (I,)

    # distance of every point to every hypothesis: (I, N) via matmul
    # precision=HIGHEST: default TPU matmul precision is bf16-mantissa, whose
    # rounding (~4e-3·|pts|) is comparable to the 0.02 inlier threshold
    dist = jnp.abs(jnp.dot(normal, pts.T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
                   + dcoef[:, None])
    inl = (dist <= threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=1) * ok
    best = jnp.argmax(counts)
    coeffs = jnp.concatenate([normal[best], dcoef[best][None]])
    best_inl = inl[best]
    return PlaneResult(coeffs=coeffs, inliers=best_inl,
                       num_inliers=counts[best])


def remove_plane(points: jnp.ndarray, valid: jnp.ndarray,
                 plane: PlaneResult) -> jnp.ndarray:
    """ExtractIndices with negative filter (pcl_cluster.cpp:85-94): returns the
    validity mask with plane inliers removed."""
    return valid & ~plane.inliers
