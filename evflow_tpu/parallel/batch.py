"""Multi-device batch clustering — row-block sharding over the mesh.

The reference's ONE piece of intra-app parallelism is the multithreaded
OPTICS ε-neighborhood precompute (`fplus::transform_parallelly_n_threads`,
optics-clustering/include/optics/optics.hpp:456-514): neighbor queries are
independent per point, so it fans rows out over CPU threads. This module is
that idea mapped to the device mesh (VERDICT r3 next #4): the O(N²)-panel
batch paths shard their ROW BLOCKS over devices with `shard_map` — no
halos, no cross-row dependencies; the only collectives are the label/
centroid broadcasts each iteration needs anyway.

  - compute_neighbors_sharded: OPTICS ε-neighborhoods + core distances.
    Each device computes its row shard against the replicated point set —
    per-row results are bit-identical to models/optics.compute_neighbors
    (same panel math, same top_k), the table comes back row-sharded. The
    sequential seed-queue sweep stays host-side (optics.hpp:525-555
    analog), exactly like the reference's thread fan-out.
  - dbscan_sharded: core counts, min-label propagation rounds, and border
    attachment all ride row-sharded panels; each round all_gathers the
    (N,) label vector (KB-scale) and psums the convergence flag. Labels
    are bit-identical to models/dbscan.dbscan (integer min-reductions).
  - kmeans_sharded: assignment on row shards; centroid update psums
    per-shard (sum, count) partials — the three-kernel OpenCL round-trip
    (assign/compact/reduce, assign_to_centers.cl) as one mesh program.
    Centroids can differ from the single-device path in final-ulp fp
    (different reduction order over shards); labels on non-degenerate data
    are unaffected (equivalence-tested).

All entry points accept any 1-D mesh axis; `make_batch_mesh` builds the
default all-devices tile mesh. Equivalence vs the single-device paths is
tested on the 8-virtual-device CPU mesh (tests/test_parallel.py) and the
driver's dryrun_multichip exercises compute_neighbors_sharded.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import DBSCANConfig, KMeansConfig, ParallelConfig
from ..models.optics import NeighborTable, _neighbor_block
from ..models.dbscan import DBSCANResult
from ..models.kmeans import KMeansResult
from ..ops.distance import pairwise_sqdist, assign_to_centers

_BIG = np.int32(2 ** 31 - 1)


def make_batch_mesh(n_devices: Optional[int] = None,
                    cfg: ParallelConfig = ParallelConfig()) -> Mesh:
    """1-D mesh over the tile axis for batch row-block work."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    return jax.make_mesh((n_devices,), (cfg.tile_axis,),
                         devices=devs[:n_devices])


def _pad_rows(pts: jnp.ndarray, mult: int, fill: float) -> jnp.ndarray:
    n = pts.shape[0]
    pad = (-n) % mult
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=fill)
    return pts


# --------------------------------------------------------------------------
# OPTICS ε-neighborhood precompute (optics.hpp:456-514 thread fan-out analog)
# --------------------------------------------------------------------------

def compute_neighbors_sharded(points: np.ndarray, eps: float, min_pts: int,
                              max_neighbors: int = 256,
                              mesh: Optional[Mesh] = None,
                              axis: str = "tile",
                              block: int = 2048) -> NeighborTable:
    """compute_neighbors with row blocks sharded over the mesh.

    Per-row results are bit-identical to the single-device path (the same
    (block, N) panel + top_k per row, independent of how rows are grouped).
    """
    if mesh is None:
        mesh = make_batch_mesh()
    pts = jnp.asarray(points, jnp.float32)
    n = pts.shape[0]
    k = min(max_neighbors, n)
    ndev = mesh.shape[axis]
    blk = min(block, -(-n // ndev))
    rows_pad = _pad_rows(pts, ndev * blk, np.inf)
    npad = rows_pad.shape[0]

    @functools.partial(jax.jit, static_argnames=())
    def run(rows_pad, pts):
        def per_shard(rows_l, pts):
            nl = rows_l.shape[0]
            nb = nl // blk

            def body(i, acc):
                ia, da, ca = acc
                rows = jax.lax.dynamic_slice_in_dim(rows_l, i * blk, blk, 0)
                bi, bd, bc = _neighbor_block(rows, pts, jnp.float32(eps), k,
                                             False)
                return (jax.lax.dynamic_update_slice_in_dim(ia, bi, i * blk, 0),
                        jax.lax.dynamic_update_slice_in_dim(da, bd, i * blk, 0),
                        jax.lax.dynamic_update_slice_in_dim(ca, bc, i * blk, 0))

            init = (jnp.zeros((nl, k), jnp.int32),
                    jnp.full((nl, k), jnp.inf, jnp.float32),
                    jnp.zeros((nl,), jnp.int32))
            idx, dist, cnt = jax.lax.fori_loop(0, nb, body, init)
            if min_pts <= k:
                core = jnp.sort(dist, axis=1)[:, min_pts - 1]
            else:
                core = jnp.full((nl,), jnp.inf, jnp.float32)
            core = jnp.where(cnt >= min_pts, core, jnp.inf)
            return idx, dist, cnt, core

        return shard_map(per_shard, mesh=mesh,
                         in_specs=(P(axis), P()),
                         out_specs=(P(axis), P(axis), P(axis), P(axis)),
                         check_vma=False)(rows_pad, pts)

    rows_sh = jax.device_put(rows_pad, NamedSharding(mesh, P(axis)))
    pts_rep = jax.device_put(pts, NamedSharding(mesh, P()))
    idx, dist, cnt, core = run(rows_sh, pts_rep)
    # slice the row padding off on host: the table is host-consumed (the
    # sequential OPTICS sweep), and slicing a row-sharded array is an
    # ambiguous resharding gather
    idx, dist, cnt, core = jax.device_get((idx, dist, cnt, core))
    return NeighborTable(jnp.asarray(idx[:n]), jnp.asarray(dist[:n]),
                         jnp.asarray(cnt[:n]), jnp.asarray(core[:n]))


# --------------------------------------------------------------------------
# DBSCAN (models/dbscan.dbscan with sharded row panels)
# --------------------------------------------------------------------------

def dbscan_sharded(points: jnp.ndarray,
                   valid: jnp.ndarray | None = None,
                   cfg: DBSCANConfig = DBSCANConfig(),
                   mesh: Optional[Mesh] = None,
                   axis: str = "tile",
                   max_iters: int = 64) -> DBSCANResult:
    """dbscan() with the O(N²) panels (core counts, min-label propagation,
    border attachment) row-sharded. Bit-identical labels (integer mins)."""
    if mesh is None:
        mesh = make_batch_mesh()
    n = points.shape[0]
    pts = jnp.asarray(points, jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)
    ndev = mesh.shape[axis]
    pad = (-n) % ndev
    pts_f = jnp.where(valid[:, None], pts, 1e30)
    rows_pad = _pad_rows(pts_f, ndev, 1e30)
    vpad = jnp.pad(valid, (0, pad))
    npad = rows_pad.shape[0]
    nl = npad // ndev
    eps2 = jnp.float32(cfg.eps * cfg.eps)

    @jax.jit
    def run(rows, pts_r, valid_r, vrows):
        def per_shard(rows_l, pts, valid, vl):
            me = jax.lax.axis_index(axis)
            row0 = me * nl
            gid = row0 + jnp.arange(nl, dtype=jnp.int32)

            # panels are recomputed per use in row blocks (as the
            # single-device path does) so no (nl, N) boolean lives across
            # the propagation loop
            blk = min(2048, nl)
            nb = -(-nl // blk)
            rows_lp = jnp.pad(rows_l, ((0, nb * blk - nl), (0, 0)),
                              constant_values=1e30)

            def panel_reduce(src_vals, init, red):
                """red over eps-neighbors per local row: (nl,) result."""
                def body(i, acc):
                    rows = jax.lax.dynamic_slice_in_dim(rows_lp, i * blk,
                                                        blk, 0)
                    d2 = pairwise_sqdist(rows, pts)
                    vals = jnp.where(d2 <= eps2, src_vals[None, :], init)
                    r = red(vals, axis=1)
                    return jax.lax.dynamic_update_slice_in_dim(
                        acc, r, i * blk, 0)
                acc0 = jnp.full((nb * blk,), init,
                                dtype=jnp.asarray(src_vals).dtype)
                return jax.lax.fori_loop(0, nb, body, acc0)[:nl]

            cnt_l = panel_reduce(valid.astype(jnp.int32), 0, jnp.sum)
            core_l = vl & (cnt_l >= cfg.core_min_pts) & (gid < n)
            core = jax.lax.all_gather(core_l, axis).reshape(-1)[:n]

            lab_l = jnp.where(core_l, gid, _BIG)

            def nmin_of(labels):
                src = jnp.where(core, labels, _BIG)
                return panel_reduce(src, _BIG, jnp.min)

            def cond(st):
                _, changed, it = st
                return changed & (it < max_iters)

            def step(st):
                lab_l, _, it = st
                labels = jax.lax.all_gather(lab_l, axis).reshape(-1)[:n]
                nmin = nmin_of(labels)
                new = jnp.where(core_l, jnp.minimum(lab_l, nmin), lab_l)
                full_new = jax.lax.all_gather(new, axis).reshape(-1)[:n]
                jumped = jnp.where(new < n,
                                   full_new[jnp.clip(new, 0, n - 1)], new)
                new = jnp.minimum(new, jumped)
                ch = jax.lax.psum(
                    jnp.any(new != lab_l).astype(jnp.int32), axis) > 0
                return new, ch, it + 1

            lab_l, _, iters = jax.lax.while_loop(
                cond, step, (lab_l, jnp.array(True), jnp.int32(0)))
            labels = jax.lax.all_gather(lab_l, axis).reshape(-1)[:n]
            nmin = nmin_of(labels)
            lab_l = jnp.where(core_l, lab_l,
                              jnp.where(vl & (gid < n), nmin, _BIG))
            return lab_l, core_l, iters

        return shard_map(per_shard, mesh=mesh,
                         in_specs=(P(axis), P(), P(), P(axis)),
                         out_specs=(P(axis), P(axis), P()),
                         check_vma=False)(rows, pts_r, valid_r, vrows)

    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    lab, core, iters = run(jax.device_put(rows_pad, sh),
                           jax.device_put(pts_f, rep),
                           jax.device_put(valid, rep),
                           jax.device_put(vpad, sh))
    lab, core = jax.device_get((lab, core))
    labels = jnp.asarray(lab[:n])
    core = jnp.asarray(core[:n])

    # size filter + size-descending rank — the cheap (N,) tail, replicated
    # host-side exactly as models/dbscan.dbscan does it
    member = labels < n
    seg = jnp.where(member, labels, n)
    sizes = jax.ops.segment_sum(member.astype(jnp.int32), seg,
                                num_segments=n + 1)[:n]
    size_of = jnp.where(member, sizes[jnp.clip(labels, 0, n - 1)], 0)
    keep = member & (size_of >= cfg.min_cluster_size) \
        & (size_of <= cfg.max_cluster_size)
    root_sizes = jnp.where((sizes >= cfg.min_cluster_size)
                           & (sizes <= cfg.max_cluster_size), sizes, 0)
    order = jnp.argsort(-root_sizes, stable=True)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    num_clusters = jnp.sum((root_sizes > 0).astype(jnp.int32))
    final = jnp.where(keep, rank[jnp.clip(labels, 0, n - 1)], -1)
    return DBSCANResult(labels=final, num_clusters=num_clusters,
                        core_mask=core, iterations=iters)


# --------------------------------------------------------------------------
# k-means (models/kmeans.kmeans with sharded assignment + psum'd reduction)
# --------------------------------------------------------------------------

def kmeans_sharded(points: jnp.ndarray,
                   init_centroids: jnp.ndarray,
                   valid: jnp.ndarray | None = None,
                   cfg: KMeansConfig = KMeansConfig(),
                   mesh: Optional[Mesh] = None,
                   axis: str = "tile") -> KMeansResult:
    """kmeans() with assignment row-sharded and the centroid reduction as a
    psum of per-shard partials (the OpenCL compact+reduce pair as one mesh
    collective). Centroid fp can differ in final ulps from the single-device
    reduction order; the convergence test and labels are equivalence-tested
    on the CPU8 mesh."""
    if mesh is None:
        mesh = make_batch_mesh()
    n = points.shape[0]
    k = init_centroids.shape[0]
    pts = jnp.asarray(points, jnp.float32)
    if valid is None:
        valid = jnp.ones((n,), bool)
    ndev = mesh.shape[axis]
    pad = (-n) % ndev
    rows_pad = _pad_rows(pts, ndev, 1e30)
    vpad = jnp.pad(valid, (0, pad))

    @jax.jit
    def run(rows, vrows, c0):
        def per_shard(rows_l, vl, c0):
            def assign(centroids):
                res = assign_to_centers(rows_l, centroids,
                                        threshold=cfg.assign_threshold)
                return jnp.where(vl, res.labels, -1)

            def step(st):
                centroids, _, it, _ = st
                labels = assign(centroids)
                assigned = labels >= 0
                seg = jnp.where(assigned, labels, k)
                s = jax.ops.segment_sum(
                    jnp.where(assigned[:, None], rows_l, 0.0), seg,
                    num_segments=k + 1)[:k]
                c = jax.ops.segment_sum(assigned.astype(jnp.int32), seg,
                                        num_segments=k + 1)[:k]
                s = jax.lax.psum(s, axis)
                c = jax.lax.psum(c, axis)
                new_c = jnp.where((c > 0)[:, None],
                                  s / jnp.maximum(c, 1)[:, None], centroids)
                err = jnp.max(jnp.abs(new_c - centroids))
                return new_c, labels, it + 1, err

            def cond(st):
                _, _, it, err = st
                return (err > cfg.convergence_tol) & (it < cfg.max_iters)

            init = (c0.astype(jnp.float32),
                    jnp.full((rows_l.shape[0],), -1, jnp.int32),
                    jnp.int32(0), jnp.float32(jnp.inf))
            centroids, _, iters, err = jax.lax.while_loop(cond, step, init)
            labels = assign(centroids)
            assigned = labels >= 0
            seg = jnp.where(assigned, labels, k)
            counts = jax.lax.psum(
                jax.ops.segment_sum(assigned.astype(jnp.int32), seg,
                                    num_segments=k + 1)[:k], axis)
            return centroids, labels, counts, iters, err

        return shard_map(per_shard, mesh=mesh,
                         in_specs=(P(axis), P(axis), P()),
                         out_specs=(P(), P(axis), P(), P(), P()),
                         check_vma=False)(rows, vrows, c0)

    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    centroids, labels, counts, iters, err = run(
        jax.device_put(rows_pad, sh), jax.device_put(vpad, sh),
        jax.device_put(jnp.asarray(init_centroids, jnp.float32), rep))
    labels = jnp.asarray(jax.device_get(labels)[:n])
    return KMeansResult(centroids, labels, counts, iters, err)
