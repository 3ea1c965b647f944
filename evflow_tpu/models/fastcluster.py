"""Slice-vectorized incremental clustering — the TPU throughput path.

The reference AEClustering mutates its cluster set per event (SURVEY §7 "hard
parts": inherently sequential). models/aeclustering.py reproduces that
bit-for-bit with a lax.scan, but a 16k-step scan is latency-bound on TPU. This
module is the data-parallel reformulation used by the flagship pipeline: one
fixed-shape jitted step per slice.

Semantics per slice (differences from the per-event engine are slice-granular
and documented):
  1. assign every deduped event to the nearest *start-of-slice* cluster mean
     (Manhattan gate, same radius; exact mode evolves means within the slice)
  2. unassigned events seed new clusters from occupied spatial grid cells
     (cell = radius-sized; exact mode seeds one cluster per orphan event and
     immediately chains them via per-event merges — grid seeding is the
     batched equivalent)
  3. per-cluster EWMA mean advanced with the *closed form* of the reference's
     per-event recurrence mu <- (1-a)mu + a*x over the slice's members in
     stream order: mu' = (1-a)^k mu + a * sum_i (1-a)^(k-1-i) x_i
     (bit-equal to the sequential update for a fixed assignment)
  4. membership window: a ring of per-slice aggregates (count, sum) per
     cluster approximates the szBuffer event window at slice granularity;
     centroid = windowed sum/count (reference: arithmetic mean of live
     members, MyCluster.cpp:154-169)
  5. clusters whose means fall within radius merge (weighted by member count,
     lowest creation order survives — AEClustering::merge_clusters_ semantics
     at slice granularity)
  6. per-cluster centroid flow = centroid - previous centroid, keyed by
     persistent cluster id (accel …store.cpp:503-517)

Single-device and tile-parallel execution share ONE implementation
(`_update_slice_impl`), parameterized on an optional shard_map axis name: with
an axis, the per-event heavy work (assignment distances, ranking sort, segment
sums) stays tile-local and only per-cluster/per-cell partials cross the
interconnect (psum of the (G, 3) orphan-cell aggregates, all_gather of (C,)
local member counts for tile-major global EWMA ranks, psum of the (C, 5)
slice aggregates). State stays replicated bit-identically on every tile; the
result equals the single-device update on the tile-major concatenation of all
tiles' events (fp reduction order aside) — equivalence-tested in
tests/test_parallel.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ClusterConfig, SensorConfig

_BIG = np.int32(2**31 - 1)  # np, not jnp: keep import free of backend init


class FastState(NamedTuple):
    alive: jnp.ndarray          # bool (C,)
    cid: jnp.ndarray            # int32 (C,) persistent cluster id
    corder: jnp.ndarray         # int32 (C,) creation order key
    mu: jnp.ndarray             # float32 (C, 2) EWMA mean
    ring_count: jnp.ndarray     # int32 (C, R) per-slice member counts
    ring_sum: jnp.ndarray       # float32 (C, R, 2) per-slice coordinate sums
    ring_head: jnp.ndarray      # int32 () current ring slot
    centroid_prev: jnp.ndarray  # float32 (C, 2) last reported centroid
    has_prev: jnp.ndarray       # bool (C,)
    next_cid: jnp.ndarray       # int32 ()
    next_order: jnp.ndarray     # int32 ()


class SliceOutput(NamedTuple):
    alive: jnp.ndarray      # bool (C,) clusters alive after this slice
    reported: jnp.ndarray   # bool (C,) n >= min_n (the rendered subset)
    cid: jnp.ndarray        # int32 (C,)
    n: jnp.ndarray          # int32 (C,) windowed membership
    centroid: jnp.ndarray   # float32 (C, 2)
    flow: jnp.ndarray       # float32 (C, 2) centroid - prev (0 on first report)
    labels: jnp.ndarray     # int32 (N,) per-event cluster slot (-1 none)


def init_state(cfg: ClusterConfig = ClusterConfig(), window_slices: int = 4) -> FastState:
    c, r = cfg.max_clusters, window_slices
    return FastState(
        alive=jnp.zeros((c,), bool),
        cid=jnp.full((c,), -1, jnp.int32),
        corder=jnp.full((c,), _BIG, jnp.int32),
        mu=jnp.zeros((c, 2), jnp.float32),
        ring_count=jnp.zeros((c, r), jnp.int32),
        ring_sum=jnp.zeros((c, r, 2), jnp.float32),
        ring_head=jnp.int32(0),
        centroid_prev=jnp.zeros((c, 2), jnp.float32),
        has_prev=jnp.zeros((c,), bool),
        next_cid=jnp.int32(0),
        next_order=jnp.int32(0),
    )


def _slice_aggregates(mu0, pts, labels, valid, c, alpha, axis: Optional[str]):
    """EWMA means advanced in stream order + per-cluster (count, coord sum).

    mu' = (1-a)^k mu0 + a * sum_i (1-a)^(k-1-i) x_i  for the k members
    (i = 0 oldest) — the closed form of the per-event recurrence. One
    (ids, lane) sort yields the stream-order rank per event (forward max-scan
    of run starts); count, coord sums, and weighted sums then ride ONE
    5-channel segment_sum (scatters are the expensive primitive on this
    backend — fuse them).

    axis=None: the per-cluster member count k rides the same sorted panel as
    a reverse min-scan of next run starts — no gather back through labels.
    axis set (inside shard_map): the stream order is tile-major, so each
    event's global rank = local rank + member count in earlier tiles; local
    counts are all_gathered and the (C, 5) aggregate partials psummed.
    """
    n = pts.shape[0]
    ids = jnp.where(valid, labels, c).astype(jnp.int32)
    lane = jnp.arange(n, dtype=jnp.int32)
    sids, sl = jax.lax.sort((ids, lane), num_keys=2)
    iota = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.array([True]), sids[1:] != sids[:-1]])
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(first, iota, 0))
    rank_sorted = iota - run_start

    la = jnp.log1p(-alpha)  # log(1-a), a<1
    if axis is None:
        nxt = jnp.concatenate([jnp.where(first, iota, n)[1:],
                               jnp.array([n], jnp.int32)])
        run_end = jnp.flip(jax.lax.associative_scan(jnp.minimum, jnp.flip(nxt)))
        k_sorted = run_end - run_start
        # w_i = a * (1-a)^(k-1-r_i), exponent clamped at 80 (fp32 underflow —
        # contributions older than ~64 steps vanish anyway)
        expo = (k_sorted - 1 - rank_sorted).astype(jnp.float32)
    else:
        k_loc = jax.ops.segment_sum(valid.astype(jnp.int32), ids,
                                    num_segments=c + 1)[:c]
        k_all = jax.lax.all_gather(k_loc, axis)               # (T, C)
        me = jax.lax.axis_index(axis)
        earlier = (jnp.arange(k_all.shape[0]) < me)[:, None]
        offset_c = jnp.sum(jnp.where(earlier, k_all, 0), axis=0)   # (C,)
        k_glob = jnp.sum(k_all, axis=0)                             # (C,)
        sids_c = jnp.clip(sids, 0, c - 1)
        grank_sorted = rank_sorted + offset_c[sids_c]
        expo = (k_glob[sids_c] - 1 - grank_sorted).astype(jnp.float32)

    expo = jnp.clip(expo, 0.0, 80.0)
    w_sorted = jnp.where(sids < c, alpha * jnp.exp(expo * la), 0.0)
    w = jnp.zeros((n,), jnp.float32).at[sl].set(w_sorted)

    feats = jnp.concatenate(
        [jnp.ones((n, 1), jnp.float32), pts, w[:, None] * pts], axis=1)
    sums = jax.ops.segment_sum(feats, ids, num_segments=c + 1)[:c]
    if axis is not None:
        sums = jax.lax.psum(sums, axis)                       # (C, 5) global
    k_c = sums[:, 0].astype(jnp.int32)   # exact: counts << 2^24
    sum_slice = sums[:, 1:3]
    wsum = sums[:, 3:5]
    decay = jnp.exp(jnp.clip(k_c.astype(jnp.float32), 0.0, 80.0) * la)
    mu = decay[:, None] * mu0 + wsum
    mu = jnp.where((k_c > 0)[:, None], mu, mu0)
    return mu, k_c, sum_slice


def _blocked_cumsum(onehot: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """Inclusive cumsum of a 0/1 (N, C) panel along axis 0, as MXU matmuls.

    Per-block prefix sums ride a lower-triangular-ones (b, b) matmul; block
    offsets are a tiny exclusive cumsum over N/b rows. EXACT: 0/1 operands
    multiply exactly in bf16 and the MXU accumulates in f32 (values < 2^24),
    so this replaces the sort-based ranking bit-for-bit. A direct
    jnp.cumsum over the (N, C) panel lowers to a serial reduce-window chain
    on this backend; the blocked-matmul form is O(log) dispatches.
    """
    n, c = onehot.shape
    if n % block:
        block = n  # degenerate small case: one triangular matmul
    nb = n // block
    tri = jnp.tril(jnp.ones((block, block), jnp.float32))
    blocks = onehot.reshape(nb, block, c)
    incl = jnp.einsum("ij,bjc->bic", tri, blocks)
    totals = incl[:, -1, :]                                   # (nb, C)
    offs = jnp.concatenate(
        [jnp.zeros((1, c), jnp.float32), jnp.cumsum(totals, axis=0)[:-1]])
    return (incl + offs[:, None, :]).reshape(n, c)


def _slice_aggregates_matmul(mu0, pts, labels, valid, c, alpha,
                             axis: Optional[str]):
    """Sort/scatter-free twin of `_slice_aggregates` (cfg.stats_matmul).

    The stream-order rank of event i within its cluster is the inclusive
    one-hot prefix count P[i, label_i]; the EWMA exponent k-1-rank = k - P
    is formed as a panel (no per-event gathers), and the per-cluster
    (count, coord sum, weighted sum) aggregates ride ONE (C, N) @ (N, 5)
    HIGHEST-precision matmul instead of a segment_sum scatter. Ranks and
    counts are exact (integer-valued f32 through the MXU); coordinate sums
    equal the scatter path up to fp reduction order.
    """
    n = pts.shape[0]
    iota_c = jnp.arange(c, dtype=jnp.int32)
    onehot = (valid[:, None] & (labels[:, None] == iota_c[None, :])
              ).astype(jnp.float32)                            # (N, C)
    p = _blocked_cumsum(onehot)                                # (N, C)
    k_c = p[-1]                                                # (C,) f32
    la = jnp.log1p(-alpha)
    if axis is None:
        expo = k_c[None, :] - p
    else:
        k_all = jax.lax.all_gather(k_c, axis)                  # (T, C)
        me = jax.lax.axis_index(axis)
        earlier = (jnp.arange(k_all.shape[0]) < me)[:, None]
        offset_c = jnp.sum(jnp.where(earlier, k_all, 0.0), axis=0)
        k_glob = jnp.sum(k_all, axis=0)
        # global rank = local rank + earlier tiles' counts; exponent
        # k_glob - 1 - grank = (k_glob - offset_c) - P
        expo = (k_glob - offset_c)[None, :] - p
        k_c = k_glob
    expo = jnp.clip(expo, 0.0, 80.0)
    w = jnp.sum(onehot * (alpha * jnp.exp(expo * la)), axis=1)  # (N,)
    feats = jnp.concatenate(
        [jnp.ones((n, 1), jnp.float32), pts, w[:, None] * pts], axis=1)
    sums = jax.lax.dot_general(
        onehot, feats, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)                   # (C, 5)
    if axis is not None:
        sums = jax.lax.psum(sums, axis)
    k_i = sums[:, 0].astype(jnp.int32)
    sum_slice = sums[:, 1:3]
    wsum = sums[:, 3:5]
    decay = jnp.exp(jnp.clip(k_c, 0.0, 80.0) * la)
    mu = decay[:, None] * mu0 + wsum
    mu = jnp.where((k_i > 0)[:, None], mu, mu0)
    return mu, k_i, sum_slice


def _slice_aggregates_pallas(mu0, pts, labels, valid, c, alpha):
    """Fused-Mosaic twin of _slice_aggregates_matmul (cfg.stats_pallas) —
    ops/pallas_kernels.py:cluster_stats does the per-event-heavy half in
    one kernel; the tiny (C,) mu update stays here. Single-device only."""
    from ..ops.pallas_kernels import cluster_stats
    lbl = jnp.where(valid, labels, -1)
    interp = jax.default_backend() != "tpu"
    sums = cluster_stats(lbl, pts[:, 0], pts[:, 1], float(alpha), c,
                         interpret=interp)
    k_i = sums[:, 0].astype(jnp.int32)
    la = jnp.log1p(-jnp.float32(alpha))
    decay = jnp.exp(jnp.clip(sums[:, 0], 0.0, 80.0) * la)
    mu = decay[:, None] * mu0 + sums[:, 3:5]
    mu = jnp.where((k_i > 0)[:, None], mu, mu0)
    return mu, k_i, sums[:, 1:3]


def _update_slice_impl(
    state: FastState,
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: ClusterConfig,
    sensor: SensorConfig,
    grid_cells: int,
    axis: Optional[str],
) -> Tuple[FastState, SliceOutput]:
    """One slice step over (N,) deduped event coordinates (see module doc)."""
    c = cfg.max_clusters
    n = x.shape[0]
    pts = jnp.stack([x, y], axis=1).astype(jnp.float32)

    # ---- 1. assignment to start-of-slice means (Manhattan, gated; local).
    # Two (N, C) per-coordinate panels, NOT one (N, C, 2) panel — the
    # trailing dim of 2 wastes 126/128 VPU lanes (0.75 vs 0.95 ms/slice
    # measured, benchmarks/prof_fastcluster.py); fp-identical.
    d = jnp.abs(pts[:, 0][:, None] - state.mu[None, :, 0]) \
        + jnp.abs(pts[:, 1][:, None] - state.mu[None, :, 1])     # (N, C)
    d = jnp.where(state.alive[None, :], d, jnp.inf)
    best = jnp.argmin(d, axis=1).astype(jnp.int32)
    best_d = jnp.min(d, axis=1)
    assigned = valid & (best_d <= cfg.radius)
    labels = jnp.where(assigned, best, -1)

    # ---- 2. seed new clusters from orphan events via grid cells; with an
    # axis the local cell aggregates are psummed so the seeding decision is
    # replicated and identical to the single-device path
    cell_w = max(int(cfg.radius), 1)
    ncx = -(-sensor.width // cell_w)
    cell = (y // cell_w) * ncx + (x // cell_w)
    cell = jnp.where(valid & ~assigned, cell % grid_cells, grid_cells).astype(jnp.int32)
    cell_feats = jnp.concatenate([jnp.ones((n, 1), jnp.float32), pts], axis=1)
    if cfg.stats_matmul and grid_cells % 128 == 0:
        # two-level one-hot factorization of the (N,) -> (G, 3) scatter-add:
        # cell = hi*gl + lo with gl = 128 lanes; agg[hi, lo, f] =
        # sum_i oh_hi[i, hi] * (oh_lo * feats)[i, lo*3+f] — ONE
        # (G/gl, N) @ (N, gl*3) HIGHEST matmul (exact for integer-valued
        # f32) instead of a 16k-lane scatter (~0.15 ms/step measured vs
        # ~0.03 for the matmul pair, r4b floor probes). Requires
        # grid_cells % 128 == 0 (lane tiling); other grid sizes take the
        # segment_sum branch below with identical counts/sums.
        gl = 128
        gh = grid_cells // gl
        hi = jnp.clip(cell // gl, 0, gh)        # parked lanes -> gh (dropped)
        lo = cell - (cell // gl) * gl
        oh_hi = (hi[:, None] == jnp.arange(gh, dtype=jnp.int32)[None, :]
                 ).astype(jnp.float32)                      # (N, G/gl)
        oh_lo = (lo[:, None] == jnp.arange(gl, dtype=jnp.int32)[None, :]
                 ).astype(jnp.float32) * (cell < grid_cells)[:, None]
        rhs = (oh_lo[:, :, None] * cell_feats[:, None, :]).reshape(n, gl * 3)
        cell_agg = jax.lax.dot_general(
            oh_hi, rhs, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST).reshape(grid_cells, 3)
    else:
        cell_agg = jax.ops.segment_sum(cell_feats, cell,
                                       num_segments=grid_cells + 1)[:grid_cells]
    if axis is not None:
        cell_agg = jax.lax.psum(cell_agg, axis)               # (G, 3) global
    cell_cnt = cell_agg[:, 0].astype(jnp.int32)   # exact: counts << 2^24
    cell_sum = cell_agg[:, 1:3]
    occupied = cell_cnt > 0
    free = ~state.alive
    n_free = jnp.sum(free.astype(jnp.int32))
    n_occ = jnp.sum(occupied.astype(jnp.int32))
    n_new = jnp.minimum(jnp.minimum(n_occ, n_free), c)
    # Rank occupied cells in cell-index order (cumsum — no sorts: argsort-fed
    # scatters hit a pathological Mosaic lowering, SURVEY of this backend) and
    # map rank k -> k-th occupied cell via a drop-scatter. Cells beyond the
    # free capacity are dropped in cell-index order rather than by size.
    occ_rank = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    rank_pos = jnp.where(occupied & (occ_rank < c), occ_rank, c)
    cell_of_rank = jnp.full((c + 1,), 0, jnp.int32).at[rank_pos].set(
        jnp.arange(grid_cells, dtype=jnp.int32), mode="drop")[:c]
    seed_mu = cell_sum[cell_of_rank] / jnp.maximum(cell_cnt[cell_of_rank], 1)[:, None]
    # Seeding position of each slot: the k-th free slot takes seeding position
    # k (< n_new). Expressed as ONE scatter (the inverse free-rank map) and
    # per-field gathers/selects — scatter-heavy graphs send this backend's
    # compiler into a multi-minute fusion search, and the aliased
    # gather-modify-scatter form arr.at[p].set(where(take, new, arr[p])) is
    # worse still (422 s compile, 25 ms/step measured).
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    pos_of_slot = jnp.where(free & (free_rank < n_new), free_rank, c)
    seeded_slot = pos_of_slot < c                      # this slot seeds now
    pgather = jnp.clip(pos_of_slot, 0, c - 1)
    alive = state.alive | seeded_slot
    mu = jnp.where(seeded_slot[:, None], seed_mu[pgather], state.mu)
    cid = jnp.where(seeded_slot, state.next_cid + pgather, state.cid)
    corder = jnp.where(seeded_slot, state.next_order + pgather, state.corder)
    next_cid = state.next_cid + n_new
    next_order = state.next_order + n_new
    # fresh slots start with cleared windows / prev-centroids
    rc = jnp.where(seeded_slot[:, None], 0, state.ring_count)
    rs = jnp.where(seeded_slot[:, None, None], 0.0, state.ring_sum)
    has_prev = jnp.where(seeded_slot, False, state.has_prev)
    centroid_prev = jnp.where(seeded_slot[:, None], 0.0, state.centroid_prev)

    # slot for seeding position k (one scatter: invert pos_of_slot)
    slot_for_pos = jnp.full((c + 1,), c, jnp.int32).at[pos_of_slot].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop")[:c]

    # route orphan events to their seeded cluster slot (cell's seeding rank)
    ev_pos = occ_rank[jnp.clip(cell, 0, grid_cells - 1)]
    ev_seeded = valid & ~assigned & (cell < grid_cells) & (ev_pos < n_new)
    ev_slot = slot_for_pos[jnp.clip(ev_pos, 0, c - 1)]
    labels = jnp.where(ev_seeded, ev_slot, labels)
    member = labels >= 0

    # ---- 3+4. EWMA means and windowed membership aggregates (one fused pass)
    if cfg.stats_pallas and axis is None and n % 2048 == 0:
        mu, cnt_slice, sum_slice = _slice_aggregates_pallas(
            mu, pts, jnp.maximum(labels, 0), member, c, cfg.alpha)
    else:
        agg = (_slice_aggregates_matmul if cfg.stats_matmul
               else _slice_aggregates)
        mu, cnt_slice, sum_slice = agg(
            mu, pts, jnp.maximum(labels, 0), member, c, cfg.alpha, axis)
    head = state.ring_head
    rc = rc.at[:, head].set(cnt_slice)
    rs = rs.at[:, head].set(sum_slice)
    n_window = jnp.sum(rc, axis=1)

    # ---- 5. merge clusters with means within radius (weighted, min-order
    # wins; replicated when distributed — identical inputs on every tile)
    dmu = jnp.abs(mu[:, None, 0] - mu[None, :, 0]) \
        + jnp.abs(mu[:, None, 1] - mu[None, :, 1])
    adj = (dmu <= cfg.radius) & alive[:, None] & alive[None, :]
    # connected components by min-order label propagation (C small: iterate)
    comp = jnp.where(alive, corder, _BIG)

    def prop(_, comp):
        neigh = jnp.where(adj, comp[None, :], _BIG)
        return jnp.minimum(comp, jnp.min(neigh, axis=1))

    comp = jax.lax.fori_loop(0, 8, prop, comp)
    is_root = alive & (comp == corder)
    # For each cluster, find its root slot: the alive slot with corder == comp.
    eq = alive[None, :] & (corder[None, :] == comp[:, None])       # (C, C)
    root_slot = jnp.argmax(eq, axis=1).astype(jnp.int32)
    merged_into = jnp.where(alive, root_slot, jnp.arange(c, dtype=jnp.int32))

    wm = n_window.astype(jnp.float32)
    if cfg.stats_matmul:
        # eq IS the root-assignment matrix: row i (alive) has exactly one
        # true column — its root slot (corder unique among alive). Dead rows
        # are all-false and contribute nothing, matching merged_into == i
        # followed by the is_root zeroing below. Three (C, C) matmuls
        # (HIGHEST: exact for integer-valued f32) replace three segment_sum
        # scatters — scatters carry heavy per-op cost on this backend.
        eqf = eq.astype(jnp.float32)                           # (C, C)
        hp = jax.lax.Precision.HIGHEST
        r_ = state.ring_count.shape[1]
        mu_num = jax.lax.dot_general(eqf, wm[:, None] * mu,
                                     (((0,), (0,)), ((), ())), precision=hp)
        mu_den = jax.lax.dot_general(eqf, wm[:, None],
                                     (((0,), (0,)), ((), ())),
                                     precision=hp)[:, 0]
        rc = jax.lax.dot_general(eqf, rc.astype(jnp.float32),
                                 (((0,), (0,)), ((), ())),
                                 precision=hp).astype(jnp.int32)
        rs = jax.lax.dot_general(eqf, rs.reshape(c, r_ * 2),
                                 (((0,), (0,)), ((), ())),
                                 precision=hp).reshape(c, r_, 2)
    else:
        mu_num = jax.ops.segment_sum(wm[:, None] * mu, merged_into, num_segments=c)
        mu_den = jax.ops.segment_sum(wm, merged_into, num_segments=c)
        # windows merge additively onto the root
        rc = jax.ops.segment_sum(rc, merged_into, num_segments=c)
        rs = jax.ops.segment_sum(rs, merged_into, num_segments=c)
    mu = jnp.where(is_root[:, None], mu_num / jnp.maximum(mu_den, 1.0)[:, None], mu)
    rc = jnp.where(is_root[:, None], rc, 0)
    rs = jnp.where(is_root[:, None, None], rs, 0.0)
    labels = jnp.where(member, merged_into[jnp.clip(labels, 0, c - 1)], labels)
    alive = is_root
    n_window = jnp.sum(rc, axis=1)
    sum_window = jnp.sum(rs, axis=1)
    centroid = sum_window / jnp.maximum(n_window, 1)[:, None].astype(jnp.float32)

    # ---- expiry: no members anywhere in the window
    alive = alive & (n_window > 0)

    # ---- 6. flow vs previous reported centroid (per persistent cluster)
    reported = alive & (n_window >= cfg.min_n)
    flow = jnp.where((reported & has_prev)[:, None],
                     centroid - centroid_prev, 0.0)
    centroid_prev = jnp.where(reported[:, None], centroid, centroid_prev)
    has_prev = has_prev | reported

    new_state = FastState(
        alive=alive, cid=cid, corder=jnp.where(alive, corder, _BIG), mu=mu,
        ring_count=rc, ring_sum=rs,
        ring_head=(head + 1) % state.ring_count.shape[1],
        centroid_prev=centroid_prev, has_prev=has_prev & alive,
        next_cid=next_cid, next_order=next_order,
    )
    out = SliceOutput(alive=alive, reported=reported, cid=cid, n=n_window,
                      centroid=centroid, flow=flow, labels=labels)
    return new_state, out


@functools.partial(jax.jit, static_argnames=("cfg", "sensor", "grid_cells"))
def update_slice(
    state: FastState,
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: ClusterConfig = ClusterConfig(),
    sensor: SensorConfig = SensorConfig(),
    grid_cells: int = 4096,
) -> Tuple[FastState, SliceOutput]:
    """One slice step over (N,) deduped event coordinates."""
    return _update_slice_impl(state, x, y, valid, cfg, sensor, grid_cells, None)


def update_slice_distributed(
    state: FastState,
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    axis: str,
    cfg: ClusterConfig = ClusterConfig(),
    sensor: SensorConfig = SensorConfig(),
    grid_cells: int = 4096,
) -> Tuple[FastState, SliceOutput]:
    """Tile-parallel twin of update_slice, for use inside shard_map.

    x, y, valid are the LOCAL tile's events; state is replicated and stays
    bit-identical on every tile. NO event data crosses the interconnect —
    only per-cluster/per-cell partials do (see module docstring). Same
    implementation as update_slice, with the collectives switched on.
    """
    return _update_slice_impl(state, x, y, valid, cfg, sensor, grid_cells, axis)
