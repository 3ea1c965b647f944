"""DBSCAN over event/point clouds — iterative label propagation on TPU.

Reference: point-cloud-clustering/DBSCAN_simple.h:27-90 (BFS seed-queue
expansion; border points join the cluster whose BFS reaches them first),
DBSCAN_kdtree.h (PCL kd-tree radiusSearch backend), DBSCAN_precomp.h
(precomputed adjacency). Driver defaults eps=20, core_min_pts=20, cluster size
in [100, 25000], clusters sorted descending by size (pcl_cluster.cpp:112-123,
DBSCAN_simple.h:89).

TPU formulation (standard parallel DBSCAN): clusters are connected components
of the ε-graph restricted to *core* points; border points (non-core within ε
of a core) attach to a neighboring core's component. The sequential BFS's
first-reach tie-break for border points between two clusters becomes
min-component-id (deterministic; affects only ε-boundary border points —
documented deviation). Components via min-label propagation + pointer jumping
inside a lax.while_loop; all distance work is tiled MXU panels.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DBSCANConfig
from ..ops.distance import pairwise_sqdist

_BIG = np.int32(2**31 - 1)  # np, not jnp: keep import free of backend init


class DBSCANResult(NamedTuple):
    labels: jnp.ndarray        # int32 (N,) cluster id 0..k-1, -1 noise/filtered
    num_clusters: jnp.ndarray  # int32 ()
    core_mask: jnp.ndarray     # bool (N,)
    iterations: jnp.ndarray    # int32 () propagation rounds used


def _neighbor_min_label(points, labels, core, eps2, block):
    """nmin[i] = min label over core points within eps of i (tiled)."""
    n = points.shape[0]
    nblocks = -(-n // block)
    pad = nblocks * block - n
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e30)
    lab_src = jnp.where(core, labels, _BIG)

    def body(i, acc):
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * block, block, 0)
        d2 = pairwise_sqdist(rows, points)
        adj = d2 <= eps2
        nmin = jnp.min(jnp.where(adj, lab_src[None, :], _BIG), axis=1)
        return jax.lax.dynamic_update_slice_in_dim(acc, nmin, i * block, 0)

    out = jnp.full((nblocks * block,), _BIG, jnp.int32)
    return jax.lax.fori_loop(0, nblocks, body, out)[:n]


@functools.partial(jax.jit, static_argnames=("cfg", "block", "max_iters"))
def dbscan(points: jnp.ndarray,
           valid: jnp.ndarray | None = None,
           cfg: DBSCANConfig = DBSCANConfig(),
           block: int = 2048,
           max_iters: int = 64) -> DBSCANResult:
    """(N, D) points → cluster labels. Masked lanes get -1."""
    n = points.shape[0]
    pts = points.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)
    pts = jnp.where(valid[:, None], pts, 1e30)  # park invalid far away
    eps2 = jnp.float32(cfg.eps * cfg.eps)

    # core test: |N_eps(i)| >= minPts (inclusive of self, as radiusSearch is)
    nblocks = -(-n // block)
    pad = nblocks * block - n
    pts_pad = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=1e30)

    def cnt_body(i, acc):
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * block, block, 0)
        d2 = pairwise_sqdist(rows, pts)
        cnt = jnp.sum((d2 <= eps2) & valid[None, :], axis=1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice_in_dim(acc, cnt, i * block, 0)

    counts = jax.lax.fori_loop(0, nblocks, cnt_body,
                               jnp.zeros((nblocks * block,), jnp.int32))[:n]
    core = valid & (counts >= cfg.core_min_pts)

    # component labels over cores: min-label propagation + pointer jumping
    labels = jnp.where(core, jnp.arange(n, dtype=jnp.int32), _BIG)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def step(state):
        labels, _, it = state
        nmin = _neighbor_min_label(pts, labels, core, eps2, block)
        new = jnp.where(core, jnp.minimum(labels, nmin), labels)
        # pointer jumping: follow the label's label
        jumped = jnp.where(new < n, new[jnp.clip(new, 0, n - 1)], new)
        new = jnp.minimum(new, jumped)
        return new, jnp.any(new != labels), it + 1

    labels, _, iters = jax.lax.while_loop(
        cond, step, (labels, jnp.array(True), jnp.int32(0)))

    # border attachment: non-core valid points adopt min neighboring core label
    nmin = _neighbor_min_label(pts, labels, core, eps2, block)
    labels = jnp.where(core, labels, jnp.where(valid, nmin, _BIG))
    member = labels < n

    # component sizes + [min, max] filter
    seg = jnp.where(member, labels, n)
    sizes = jax.ops.segment_sum(member.astype(jnp.int32), seg, num_segments=n + 1)[:n]
    size_of = jnp.where(member, sizes[jnp.clip(labels, 0, n - 1)], 0)
    keep = member & (size_of >= cfg.min_cluster_size) & (size_of <= cfg.max_cluster_size)

    # order clusters by size descending (ties: lower root id first, matching
    # std::sort stability over the BFS discovery order closely enough for
    # tests; exact reference order depends on BFS start index)
    root_sizes = jnp.where((sizes >= cfg.min_cluster_size)
                           & (sizes <= cfg.max_cluster_size), sizes, 0)
    order = jnp.argsort(-root_sizes, stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    num_clusters = jnp.sum((root_sizes > 0).astype(jnp.int32))
    final = jnp.where(keep, rank[jnp.clip(labels, 0, n - 1)], -1)
    return DBSCANResult(labels=final, num_clusters=num_clusters,
                        core_mask=core, iterations=iters)


def dbscan_grid(points: np.ndarray,
                cfg: DBSCANConfig = DBSCANConfig(),
                max_neighbors: int = 256,
                max_iters: int = 64) -> DBSCANResult:
    """DBSCAN with grid-bucketed ε-neighborhoods (the TPU analog of the
    reference's kd-tree radiusSearch backend, DBSCAN_kdtree.h).

    Precomputes the neighbor table once (O(N·3^d·B) instead of O(N²) per
    propagation round), then runs min-label propagation over the table. Falls
    back to the dense path when the grid does not apply (dim > 3, over-dense
    cells) or a neighborhood overflows the table (correctness first: an
    overflowed row could drop an ε-edge and split a cluster).
    """
    from .optics import compute_neighbors_grid
    pts_np = np.asarray(points, dtype=np.float32)
    table = compute_neighbors_grid(pts_np, cfg.eps, cfg.core_min_pts,
                                   max_neighbors=max_neighbors)
    if table is None or bool(jnp.any(table.count > table.idx.shape[1])):
        return dbscan(jnp.asarray(pts_np), cfg=cfg)
    return _dbscan_from_table(table.idx, table.count, cfg, max_iters)


@functools.partial(jax.jit, static_argnames=("cfg", "max_iters"))
def _dbscan_from_table(nbr_idx: jnp.ndarray, counts: jnp.ndarray,
                       cfg: DBSCANConfig, max_iters: int) -> DBSCANResult:
    n, k = nbr_idx.shape
    core = counts >= cfg.core_min_pts
    valid_nbr = nbr_idx >= 0
    idx_c = jnp.clip(nbr_idx, 0, n - 1)
    labels = jnp.where(core, jnp.arange(n, dtype=jnp.int32), _BIG)

    def nmin_of(labels):
        src = jnp.where(core, labels, _BIG)
        neigh = jnp.where(valid_nbr, src[idx_c], _BIG)
        return jnp.min(neigh, axis=1)

    def cond(state):
        _, changed, it = state
        return changed & (it < max_iters)

    def step(state):
        labels, _, it = state
        new = jnp.where(core, jnp.minimum(labels, nmin_of(labels)), labels)
        jumped = jnp.where(new < n, new[jnp.clip(new, 0, n - 1)], new)
        new = jnp.minimum(new, jumped)
        return new, jnp.any(new != labels), it + 1

    labels, _, iters = jax.lax.while_loop(
        cond, step, (labels, jnp.array(True), jnp.int32(0)))

    # border attachment (ε-neighborhoods are symmetric, so a border point's
    # row contains its core neighbors)
    nmin = nmin_of(labels)
    labels = jnp.where(core, labels, nmin)
    member = labels < n

    seg = jnp.where(member, labels, n)
    sizes = jax.ops.segment_sum(member.astype(jnp.int32), seg, num_segments=n + 1)[:n]
    size_of = jnp.where(member, sizes[jnp.clip(labels, 0, n - 1)], 0)
    keep = member & (size_of >= cfg.min_cluster_size) & (size_of <= cfg.max_cluster_size)
    root_sizes = jnp.where((sizes >= cfg.min_cluster_size)
                           & (sizes <= cfg.max_cluster_size), sizes, 0)
    order = jnp.argsort(-root_sizes, stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    num_clusters = jnp.sum((root_sizes > 0).astype(jnp.int32))
    final = jnp.where(keep, rank[jnp.clip(labels, 0, n - 1)], -1)
    return DBSCANResult(labels=final, num_clusters=num_clusters,
                        core_mask=core, iterations=iters)


def dbscan_reference_numpy(points, cfg: DBSCANConfig = DBSCANConfig()):
    """BFS oracle transliterating DBSCAN_simple.h:27-90."""
    pts = np.asarray(points, np.float64)
    n = len(pts)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    eps2 = cfg.eps * cfg.eps
    UN, PROCESSING, DONE = 0, 1, 2
    types = np.zeros(n, np.int32)
    is_noise = np.zeros(n, bool)
    clusters = []
    for i in range(n):
        if types[i] == DONE:
            continue
        nn = np.where(d2[i] <= eps2)[0]
        if len(nn) < cfg.core_min_pts:
            is_noise[i] = True
            continue
        seed = [i]
        types[i] = DONE
        for j in nn:
            if j != i:
                seed.append(int(j))
                types[j] = PROCESSING
        k = 1
        while k < len(seed):
            idx = seed[k]
            if is_noise[idx] or types[idx] == DONE:
                types[idx] = DONE
                k += 1
                continue
            nn2 = np.where(d2[idx] <= eps2)[0]
            if len(nn2) >= cfg.core_min_pts:
                for j in nn2:
                    if types[j] == UN:
                        seed.append(int(j))
                        types[j] = PROCESSING
            types[idx] = DONE
            k += 1
        if cfg.min_cluster_size <= len(seed) <= cfg.max_cluster_size:
            clusters.append(sorted(set(seed)))
    clusters.sort(key=len, reverse=True)
    return clusters
