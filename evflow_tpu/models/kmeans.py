"""OpenCL k-means → TPU-native k-means over event point clouds.

Reference (event-cam-clustering-accel/event-cam-k-means-clustering/):
  - assign_to_centers.cl:1-34   per-point nearest-center under a 50.0 gate
  - assign_to_centers.cl:36-119 atomic compaction into per-cluster strips
  - assign_to_centers.cl:121-140 tree reduction of strip sums
  - assign_to_centers2.c:105-568 host driver: three device round-trips per
    iteration, centroid = strip sums / counts, `goto KERNEL_RESTART` while
    error_max > 10.

TPU re-design: one jitted lax.while_loop; assignment is an MXU pairwise
distance + argmin, the compaction+reduction pair collapses into a masked
segment_sum, and "convergence" is the same error_max criterion — with the
reference's two host-side indexing/update bugs (SURVEY §2.5: group-offset sum
aliasing, and the accept-only-while-error-exceeds-running-max partial centroid
update) fixed rather than reproduced. Points left unassigned by the gate
(kernel label 255) take part in no centroid.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import KMeansConfig
from ..ops.distance import assign_to_centers
from ..ops.segment import segment_mean_points


class KMeansResult(NamedTuple):
    centroids: jnp.ndarray   # float32 (K, 2)
    labels: jnp.ndarray      # int32 (N,) 0..K-1 or -1 (gated out)
    counts: jnp.ndarray      # int32 (K,)
    iters: jnp.ndarray       # int32 ()
    error_max: jnp.ndarray   # float32 () final max |centroid delta| per coord


@functools.partial(jax.jit, static_argnames=("cfg",))
def kmeans(points: jnp.ndarray,
           init_centroids: jnp.ndarray,
           valid: jnp.ndarray | None = None,
           cfg: KMeansConfig = KMeansConfig()) -> KMeansResult:
    """Iterative k-means on (N, 2) points with (K, 2) initial centroids."""
    n = points.shape[0]
    k = init_centroids.shape[0]
    pts = points.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)

    def step(state):
        centroids, _, it, _ = state
        res = assign_to_centers(pts, centroids, threshold=cfg.assign_threshold)
        labels = jnp.where(valid, res.labels, -1)
        assigned = labels >= 0
        new_c, counts = segment_mean_points(pts, jnp.maximum(labels, 0), k, assigned)
        # Empty clusters keep their previous centroid (the reference divides by
        # a zero count producing inf/nan; we hold position instead).
        new_c = jnp.where((counts > 0)[:, None], new_c, centroids)
        err = jnp.max(jnp.abs(new_c - centroids))
        return new_c, labels, it + 1, err

    def cond(state):
        _, _, it, err = state
        return (err > cfg.convergence_tol) & (it < cfg.max_iters)

    init = (init_centroids.astype(jnp.float32),
            jnp.full((n,), -1, jnp.int32),
            jnp.int32(0),
            jnp.float32(jnp.inf))
    centroids, labels, iters, err = jax.lax.while_loop(cond, step, init)
    # One final assignment against the converged centroids.
    res = assign_to_centers(pts, centroids, threshold=cfg.assign_threshold)
    labels = jnp.where(valid, res.labels, -1)
    _, counts = segment_mean_points(pts, jnp.maximum(labels, 0), k, labels >= 0)
    return KMeansResult(centroids, labels, counts, iters, err)


def compat_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """Map 0..K-1/-1 labels to the kernel's byte-pair encoding 0,2,..,14/255
    (assign_to_centers.cl:12,22,26)."""
    return jnp.where(labels >= 0, labels * 2, 255).astype(jnp.int32)


def kmeans_reference_numpy(points, init_centroids, cfg: KMeansConfig = KMeansConfig()):
    """NumPy oracle with the same (fixed) semantics for property tests."""
    import numpy as np

    pts = np.asarray(points, np.float64)
    c = np.asarray(init_centroids, np.float64).copy()
    k = len(c)
    for it in range(cfg.max_iters):
        d = np.linalg.norm(pts[:, None, :] - c[None, :, :], axis=2)
        labels = np.argmin(d, axis=1)
        gated = d[np.arange(len(pts)), labels] < cfg.assign_threshold
        labels = np.where(gated, labels, -1)
        new_c = c.copy()
        for j in range(k):
            sel = labels == j
            if sel.any():
                new_c[j] = pts[sel].mean(axis=0)
        err = np.max(np.abs(new_c - c))
        c = new_c
        if err <= cfg.convergence_tol:
            break
    d = np.linalg.norm(pts[:, None, :] - c[None, :, :], axis=2)
    labels = np.argmin(d, axis=1)
    gated = d[np.arange(len(pts)), labels] < cfg.assign_threshold
    labels = np.where(gated, labels, -1)
    return c, labels
