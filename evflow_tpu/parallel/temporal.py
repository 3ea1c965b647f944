"""Temporal (data-axis) distribution over a (data × tile) grid mesh.

The reference processes one slice at a time on a single OpenCL queue
(accel metavision_sdk_get_started5_opencl_store.cpp:277) — there is no
counterpart for this layer; SURVEY §5 mandates designing it from scratch.
BASELINE.json's north star: "the event stream is partitioned into
spatio-temporal tiles across a multi-host TPU pod slice, with
cluster-centroid updates and track-state fusion reduced via
all-reduce/all-gather collectives (Schur-style block reduction for joint
track refinement across tiles)".

Design
------
The recorded stream is split into `n_windows` contiguous time windows, one
per shard of the mesh's DATA axis (across hosts/DCN). Within each window the
per-slice engine runs exactly as on a single host: a `lax.scan` over slices,
each slice tile-parallel over the TILE axis (ICI) — per-tile dedup +
`fastcluster.update_slice_distributed` (psum'd per-cluster partials) for the
cluster path, `tiling.corner_tile_body` (ppermute SAE halos + all_gather'd
compact corner lists) for the corner path.

Sequential state across window boundaries is handled in two stages:

1. **Warm-up overlap.** Nearly every engine state has bounded temporal
   memory by construction: the cluster membership window is a ring of R
   slices, the EWMA mean forgets at (1-alpha) per member event (alpha=0.5 →
   < 1 fp32 ulp after ~24 events), and the tracker keeps a 10-deep history /
   prunes after `frames_to_skip` missed frames. Window w therefore ALSO
   consumes the last `warmup` slices of window w-1 (outputs discarded) so
   its state at the boundary has converged to the sequential state up to id
   counters. (Counter-visible differences — cluster cids, track labels,
   frame_count ages — are reconciled in stage 2 / bounded by max_frames; see
   tests/test_temporal.py.) EXCEPTION: the SAE time surface itself persists
   indefinitely in the sequential pipeline — a pixel last touched before a
   window's warm-up holds 0 in that window's slab, so eFAST detections
   near window starts can deviate where stale (pre-warm-up) timestamps
   decide a streak test. The deviation is ONE-SIDED — windowed runs can
   only MISS corners, never add them: a windowed detection needs an
   all-fresh arc (any stale arc pixel reads 0 and fails the strict
   off_max < arc_min test), and fresh arc timestamps out-rank stale
   off-arc pixels sequentially too. tests/test_temporal.py::
   test_temporal_sae_warmup_adversarial constructs the miss (a stale
   stroke forming a candidate's arcs with never-written off-arc pixels)
   and verifies both the one-sidedness and the warm-up sizing rule:
   the miss vanishes once `warmup` reaches back to the stale evidence's
   last writer (warmup >= detection_slice - last_write_slice), which
   re-paints it into the window's slab.

2. **Schur-style block reduction for joint track refinement.** Inside the
   window scan, every track slot accumulates the normal equations of a
   per-window trajectory model

       pos(u) ≈ (1-u)·b_w + u·b_{w+1} + 4u(1-u)·m_w,   u ∈ [0,1]

   over its detections: b_w, b_{w+1} are the track's positions at the window
   BOUNDARIES (shared with the neighbor windows), m_w is a window-INTERIOR
   curvature parameter. After the scan, each window eliminates its interior
   m_w locally via the Schur complement

       S_w = H_bb − H_bm H_mm⁻¹ H_mb,   g̃_w = g_b − H_bm H_mm⁻¹ g_m,

   tracklets are stitched across boundaries (extrapolated exit position vs
   entry position, mutual nearest neighbor), and the reduced block-tridiagonal
   system over the chain's boundary positions is assembled with an all_gather
   over the data axis and solved jointly (batched 2x2-block tridiagonal →
   dense (W+1)×(W+1) solve; W is small). The result is one refined trajectory
   per physical track spanning windows — the joint estimate no single window
   could produce.

Cluster state is fused the same way minus the solve: each window's final
reported centroid table is matched (all_gather + mutual nearest within the
cluster radius) against the next window's first post-warmup table, chaining
per-window cluster ids into stream-global ids.

Multi-host execution: `mesh.make_grid_mesh` over `jax.distributed`-initialized
processes puts the data axis across hosts (DCN) and tiles across each host's
local devices (ICI); the only cross-host traffic is the per-window summary
all_gather (KB-scale). Validated two-process in tests/test_temporal.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import EngineConfig, DEFAULT
from ..io.slicing import EventSlices
from ..ops import hash_dedup
from ..models import aeclustering, fastcluster, tracker as tracker_mod
from ..models import pipeline as pipeline_mod
from . import tiling

_BIG = np.float32(3.0e38)  # np: a module-level jnp scalar would init the backend at import, breaking jax.distributed.initialize


# --------------------------------------------------------------------------
# Per-window tracklet accumulators (carried through the slice scan)
# --------------------------------------------------------------------------

class TrackletBlocks(NamedTuple):
    """Per track slot: observation summary + trajectory normal equations.

    H is the Gram matrix of the basis [(1-u), u, 4u(1-u)] over the slot's
    detections this window; g the corresponding rhs for (x, y). A slot is
    reset whenever its track label changes (slot recycled by a new track).
    """
    label: jnp.ndarray      # int32 (T,) current owner's label (-1 empty)
    nobs: jnp.ndarray       # int32 (T,)
    u_first: jnp.ndarray    # float32 (T,)
    u_last: jnp.ndarray     # float32 (T,)
    pos_first: jnp.ndarray  # float32 (T, 2)
    pos_last: jnp.ndarray   # float32 (T, 2)
    vel_first: jnp.ndarray  # float32 (T, 2) velocity at first obs (px/slice)
    vel_last: jnp.ndarray   # float32 (T, 2) velocity at last obs
    H: jnp.ndarray          # float32 (T, 3, 3)
    g: jnp.ndarray          # float32 (T, 3, 2)


def init_blocks(max_tracks: int) -> TrackletBlocks:
    t = max_tracks
    z = jnp.zeros
    return TrackletBlocks(
        label=jnp.full((t,), -1, jnp.int32), nobs=z((t,), jnp.int32),
        u_first=z((t,)), u_last=z((t,)),
        pos_first=z((t, 2)), pos_last=z((t, 2)),
        vel_first=z((t, 2)), vel_last=z((t, 2)),
        H=z((t, 3, 3)), g=z((t, 3, 2)))


def _blocks_update(blocks: TrackletBlocks, tracks: tracker_mod.TrackState,
                   u: jnp.ndarray, emit: jnp.ndarray) -> TrackletBlocks:
    """Accumulate this slice's detections (frames_since==0 ⇒ the slot's pos
    is a matched/spawned detection) into the normal equations at time u."""
    obs = tracks.active & (tracks.frames_since == 0) & emit
    changed = tracks.label != blocks.label
    nobs = jnp.where(changed, 0, blocks.nobs)
    H = jnp.where(changed[:, None, None], 0.0, blocks.H)
    g = jnp.where(changed[:, None, None], 0.0, blocks.g)

    phi = jnp.stack([1.0 - u, u, 4.0 * u * (1.0 - u)])        # (3,)
    Hc = phi[:, None] * phi[None, :]                          # (3, 3)
    gc = phi[None, :, None] * tracks.pos[:, None, :]          # (T, 3, 2)
    H = jnp.where(obs[:, None, None], H + Hc[None], H)
    g = jnp.where(obs[:, None, None], g + gc, g)

    is_first = obs & (nobs == 0)
    return TrackletBlocks(
        label=jnp.where(obs, tracks.label, blocks.label),
        nobs=jnp.where(obs, nobs + 1, nobs),
        u_first=jnp.where(is_first, u, blocks.u_first),
        u_last=jnp.where(obs, u, blocks.u_last),
        pos_first=jnp.where(is_first[:, None], tracks.pos, blocks.pos_first),
        pos_last=jnp.where(obs[:, None], tracks.pos, blocks.pos_last),
        vel_first=jnp.where(is_first[:, None], tracks.velocity, blocks.vel_first),
        vel_last=jnp.where(obs[:, None], tracks.velocity, blocks.vel_last),
        H=H, g=g)


# --------------------------------------------------------------------------
# Fusion outputs
# --------------------------------------------------------------------------

class RefinedTracks(NamedTuple):
    """Joint cross-window track refinement. Chains are keyed by the flat id
    (w*T + slot) of their HEAD tracklet; K = n_windows * max_tracks slots."""
    valid: jnp.ndarray         # bool (K,)
    n_windows: jnp.ndarray     # int32 (K,) chain length in windows
    n_obs: jnp.ndarray         # int32 (K,) total detections in the chain
    window_mask: jnp.ndarray   # bool (K, W) which windows the chain covers
    boundary_pos: jnp.ndarray  # float32 (K, W+1, 2) refined positions at
    #                            window boundaries
    boundary_ok: jnp.ndarray   # bool (K, W+1) boundary is supported by
    #                            observations reaching it (extrapolations
    #                            beyond the observed span are masked out)


class TemporalOutput(NamedTuple):
    # per-slice streams, shape (W, S_emit, ...) — W sharded on the data axis
    cl_reported: jnp.ndarray   # bool (W, S, C)
    cl_cid: jnp.ndarray        # int32 (W, S, C)
    cl_n: jnp.ndarray          # int32 (W, S, C)
    cl_centroid: jnp.ndarray   # float32 (W, S, C, 2)
    cl_flow: jnp.ndarray       # float32 (W, S, C, 2)
    num_corners: jnp.ndarray   # int32 (W, S)
    track_active: jnp.ndarray  # bool (W, S, T)
    track_label: jnp.ndarray   # int32 (W, S, T)
    track_pos: jnp.ndarray     # float32 (W, S, T, 2)
    track_vel: jnp.ndarray     # float32 (W, S, T, 2)
    # replicated fusion products
    refined: RefinedTracks
    cluster_chain: jnp.ndarray  # int32 (W, C) stream-global cluster chain id
    #                             (-1 = slot not reported in that window)


# --------------------------------------------------------------------------
# Host-side prep: stream → (window, tile, slice, event) arrays with overlap
# --------------------------------------------------------------------------

def window_tile_events(slices: EventSlices, n_windows: int, n_tiles: int,
                       warmup: int, cfg: EngineConfig = DEFAULT,
                       capacity: Optional[int] = None,
                       window_range: Optional[range] = None):
    """Split sliced events into overlapping windows × spatial tiles.

    Returns (x, y, t, valid) of shape (W_local, n_tiles, warmup+n_emit, cap),
    plus emit (W_local, warmup+n_emit) bool (False on warm-up slices) and
    armed (W_local, warmup+n_emit) bool (the sequential `slice_idx > 0`
    corner arming rule, evaluated on GLOBAL slice indices so window 0's
    first slice behaves exactly like the sequential pipeline's).

    Vectorized (r3, VERDICT item 8): each global slice is tile-bucketed ONCE
    (one argsort pass over all slices), windows gather bucketed rows.
    `window_range` restricts output to a subset of windows so multi-process
    runs materialize only their local shard (memory ∝ local windows).
    """
    s_total = slices.num_slices
    n_emit = -(-s_total // n_windows)
    cap = capacity or slices.slice_capacity
    s_win = warmup + n_emit

    t0 = 0
    if s_total and slices.count[0] > 0:
        t0 = int(slices.t[0, 0])
    bx, by, bt, _bp, cnt = tiling.bucket_slices_by_tile(
        slices.x, slices.y, slices.t.astype(np.int64), slices.p,
        slices.valid_mask(), n_tiles, cfg.sensor.width, cap)
    bt = np.clip(bt - t0, 0, np.iinfo(np.int32).max).astype(np.int32)

    wr = np.arange(n_windows) if window_range is None else np.asarray(
        list(window_range))
    g = wr[:, None] * n_emit - warmup + np.arange(s_win)[None, :]
    ok = (g >= 0) & (g < s_total)                        # (W_local, s_win)
    gc = np.clip(g, 0, max(s_total - 1, 0))
    # gather (W_local, s_win, n_tiles, cap) then put tiles before slices
    tr = lambda a: np.transpose(a[gc], (0, 2, 1, 3))
    ox, oy, ot = tr(bx), tr(by), tr(bt)
    ovalid = (np.arange(cap)[None, None, :] < cnt[gc][..., None]) \
        & ok[:, :, None, None]
    ovalid = np.transpose(ovalid, (0, 2, 1, 3))
    zero = ~np.transpose(np.broadcast_to(
        ok[:, :, None, None], ok.shape + (n_tiles, cap)), (0, 2, 1, 3))
    ox = np.where(zero, 0, ox)
    oy = np.where(zero, 0, oy)
    ot = np.where(zero, 0, ot)
    emit = np.broadcast_to(np.arange(s_win)[None, :] >= warmup,
                           g.shape).copy()
    armed = g > 0
    return ox, oy, ot, ovalid, emit, armed


def window_events(slices: EventSlices, n_windows: int, warmup: int,
                  capacity: Optional[int] = None,
                  window_range: Optional[range] = None):
    """Split sliced events into overlapping time windows (no spatial tiling)
    for the EXACT-engine temporal pipeline — one vectorized gather, no
    per-window Python loop. `window_range` restricts to a subset of windows
    (multi-process local loading).

    Returns (x, y, t, valid) of shape (W, warmup+n_emit, cap) with t rebased
    to the stream origin (int32), plus emit (W, warmup+n_emit) bool."""
    s_total = slices.num_slices
    n_emit = -(-s_total // n_windows)
    s_win = warmup + n_emit
    t0 = 0
    if s_total and slices.count[0] > 0:
        t0 = int(slices.t[0, 0])
    wr = np.arange(n_windows) if window_range is None else np.asarray(
        list(window_range))
    g = (wr[:, None] * n_emit - warmup
         + np.arange(s_win)[None, :])                      # (W, s_win) global
    ok = (g >= 0) & (g < s_total)
    gc = np.clip(g, 0, max(s_total - 1, 0))
    x = slices.x[gc].astype(np.int32)
    y = slices.y[gc].astype(np.int32)
    t = np.clip(slices.t[gc].astype(np.int64) - t0, 0,
                np.iinfo(np.int32).max).astype(np.int32)
    valid = slices.valid_mask()[gc] & ok[:, :, None]
    emit = np.broadcast_to(np.arange(s_win)[None, :] >= warmup,
                           (len(wr), s_win)).copy()
    if capacity and capacity < x.shape[2]:
        x, y, t, valid = (a[:, :, :capacity] for a in (x, y, t, valid))
    return x, y, t, valid, emit


class TemporalExactOutput(NamedTuple):
    """Per-slice exact-engine snapshots, (W, S_emit, ...) data-sharded, plus
    the replicated cross-window cluster chain."""
    alive: jnp.ndarray          # bool (W, S, C)
    cid: jnp.ndarray            # int32 (W, S, C) window-local persistent ids
    n: jnp.ndarray              # int32 (W, S, C)
    mu: jnp.ndarray             # float32 (W, S, C, 2)
    centroid: jnp.ndarray       # float32 (W, S, C, 2)
    digest: jnp.ndarray         # int32 (W, S, C) member-set fingerprint
    cluster_chain: jnp.ndarray  # int32 (W, C) stream-global chain id of each
    #                             slot at its final report (-1 not reported)


def make_temporal_exact_pipeline(mesh: Mesh, n_windows: int, n_emit: int,
                                 warmup: int, cfg: EngineConfig = DEFAULT):
    """Distributed execution of the EXACT (bit-parity) AEClustering engine
    (VERDICT r2 item 1; BASELINE.json configs[4]): windows run the sequential
    per-event engine in parallel over the mesh's data axis, each preceded by
    a warm-up replay of the previous window's tail.

    Parity argument (tested bit-for-bit in tests/test_temporal.py):
      - the sliding tMin window holds the last sz_buffer update TIMES — once
        the warm-up contains >= sz_buffer deduped events, tbuf/tMin equal the
        sequential run's exactly;
      - live members all arrived within the last sz_buffer updates (mt >=
        tMin), i.e. inside the warm-up span, so memberships replay exactly
        once the cluster structure has converged;
      - cluster means are EWMA (alpha decay per member add) whose pre-warmup
        contribution halves per add at alpha=0.5 — clusters whose members
        fully turn over during warm-up reach bit-equal means (dyadic
        arithmetic), up to slot/cid RELABELING, which the cross-window chain
        reconciles. Merge means are weighted sums over the assigned set —
        invariant to slot order.
    The engine is sequential per event WITHIN a window (deque semantics,
    AEClustering.cpp:47-118) — the data axis is the only parallel axis here;
    spatial tiling would reorder events and break bit-parity.
    """
    data_ax = cfg.parallel.data_axis
    ccap = cfg.cluster.max_clusters

    def per_shard(x, y, t, valid, emit):
        xl, yl, tl, vl = x[0], y[0], t[0], valid[0]       # (S, cap)
        em = emit[0]                                      # (S,)
        # times are pre-rebased to the stream origin; pin t0 = 0 so every
        # window shares the sequential run's clock (shift-invariant anyway)
        st0 = aeclustering.init_state(cfg.cluster)._replace(
            has_t0=jnp.array(True))
        fc0 = (jnp.zeros((ccap, 2)), jnp.zeros((ccap,), bool))

        def step(carry, ev):
            state, cum, first_cent, first_ok = carry
            ex, ey, et, ev_valid, e_em = ev
            state, view, cum = pipeline_mod.cluster_flow_step_exact(
                state, ex, ey, et, ev_valid, cfg, cum)
            dig = aeclustering.membership_digest(state, cfg.cluster)

            new_first = e_em & view.alive & ~first_ok
            first_cent = jnp.where(new_first[:, None], view.centroid,
                                   first_cent)
            first_ok = first_ok | new_first
            ys = (view.alive & e_em, view.cid, view.n, view.mu,
                  view.centroid, dig)
            return (state, cum, first_cent, first_ok), ys

        carry0 = (st0, jnp.int32(0), *fc0)
        carry, ys = jax.lax.scan(step, carry0, (xl, yl, tl, vl, em))
        (_state, _cum, first_cent, first_ok) = carry
        alive_s, cid_s, n_s, mu_s, cent_s, dig_s = ys
        final_cent = cent_s[-1]
        final_ok = alive_s[-1]

        g_first_cent = jax.lax.all_gather(first_cent, data_ax)
        g_first_ok = jax.lax.all_gather(first_ok, data_ax)
        g_final_cent = jax.lax.all_gather(final_cent, data_ax)
        g_final_ok = jax.lax.all_gather(final_ok, data_ax)
        chain = fuse_clusters(g_first_cent, g_first_ok,
                              g_final_cent, g_final_ok, cfg)

        s_emit = slice(warmup, None)
        return TemporalExactOutput(
            alive=alive_s[s_emit][None], cid=cid_s[s_emit][None],
            n=n_s[s_emit][None], mu=mu_s[s_emit][None],
            centroid=cent_s[s_emit][None], digest=dig_s[s_emit][None],
            cluster_chain=chain)

    ev_spec = P(data_ax)
    out_spec = TemporalExactOutput(
        alive=ev_spec, cid=ev_spec, n=ev_spec, mu=ev_spec,
        centroid=ev_spec, digest=ev_spec, cluster_chain=P())
    smapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(ev_spec, ev_spec, ev_spec, ev_spec, ev_spec),
        out_specs=out_spec,
        check_vma=False)
    return jax.jit(smapped)


def run_temporal_exact(slices: EventSlices, mesh: Mesh, n_windows: int,
                       warmup: int = 4, cfg: EngineConfig = DEFAULT,
                       capacity: Optional[int] = None) -> TemporalExactOutput:
    """Window the sliced stream (no tiling), place on the data axis, run the
    exact engine window-parallel. Sizing: the warm-up slices must together
    contain >= cfg.cluster.sz_buffer deduped events for tMin bit-parity."""
    ev_sh = NamedSharding(mesh, P(cfg.parallel.data_axis))
    if jax.process_count() > 1:
        sel = _local_window_slice(mesh, n_windows, cfg)
        x, y, t, valid, emit = window_events(
            slices, n_windows, warmup, capacity,
            window_range=range(sel.start, sel.stop))
        put = functools.partial(jax.make_array_from_process_local_data, ev_sh)
        args = (put(x), put(y), put(t), put(valid), put(emit))
    else:
        x, y, t, valid, emit = window_events(slices, n_windows, warmup,
                                             capacity)
        args = tuple(jax.device_put(a, ev_sh) for a in (x, y, t, valid, emit))
    n_emit = x.shape[1] - warmup
    step = make_temporal_exact_pipeline(mesh, n_windows, n_emit, warmup, cfg)
    return step(*args)


# --------------------------------------------------------------------------
# Cross-window fusion (replicated; runs after the per-window scans)
# --------------------------------------------------------------------------

def _chain_forward(next_ptr: jnp.ndarray, exists: jnp.ndarray) -> jnp.ndarray:
    """Propagate head flat-ids forward along next pointers.

    next_ptr: (W, T) int32 — slot in window w+1 that continues (w, i), or -1.
    exists:   (W, T) bool  — tracklet present.
    Returns chain ids (W, T) int32 (flat id of the chain's head; -1 absent).
    """
    w, t = next_ptr.shape
    flat = (jnp.arange(w, dtype=jnp.int32)[:, None] * t
            + jnp.arange(t, dtype=jnp.int32)[None, :])
    # heads: tracklets with no incoming pointer
    incoming = jnp.zeros((w, t), bool)
    for i in range(w - 1):
        nxt = next_ptr[i]
        hit = jnp.zeros((t + 1,), bool).at[jnp.where(nxt >= 0, nxt, t)].set(
            nxt >= 0, mode="drop")[:t]
        incoming = incoming.at[i + 1].set(hit)
    chain = jnp.where(exists & ~incoming, flat, -1)
    for i in range(w - 1):
        nxt = next_ptr[i]
        src = chain[i]
        ok = (nxt >= 0) & (src >= 0)
        upd = jnp.full((t + 1,), -1, jnp.int32).at[
            jnp.where(ok, nxt, t)].set(jnp.where(ok, src, -1), mode="drop")[:t]
        chain = chain.at[i + 1].set(jnp.where(upd >= 0, upd, chain[i + 1]))
    return chain


def _stitch_ptrs(tail_pos, head_pos, tail_ok, head_ok, radius):
    """Mutual-nearest-neighbor links: (W-1 pairs folded in caller).

    tail_pos/head_pos: (T, 2); returns (T,) int32 next pointers (-1 none)."""
    d = jnp.linalg.norm(tail_pos[:, None, :] - head_pos[None, :, :], axis=2)
    d = jnp.where(tail_ok[:, None] & head_ok[None, :], d, _BIG)
    j_of_i = jnp.argmin(d, axis=1).astype(jnp.int32)
    i_of_j = jnp.argmin(d, axis=0).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    tt = tail_pos.shape[0]
    mutual = i_of_j[j_of_i] == jnp.arange(tt, dtype=jnp.int32)
    ok = tail_ok & mutual & (best <= radius)
    return jnp.where(ok, j_of_i, -1)


def fuse_tracklets(blocks: TrackletBlocks, n_emit: int,
                   cfg: EngineConfig) -> RefinedTracks:
    """Replicated cross-window fusion of all-gathered tracklet blocks.

    blocks fields have a leading window axis (W, T, ...). See module doc:
    stitch (mutual NN on boundary-extrapolated positions) → chain ids →
    per-window Schur elimination of the interior curvature parameter →
    assemble + solve the reduced boundary system per chain.
    """
    w, t = blocks.label.shape
    k = w * t
    tcfg = cfg.tracker
    stitch_radius = 2.0 * tcfg.max_distance
    gap = float(tcfg.frames_to_skip + 1) / n_emit

    exists = blocks.nobs > 0
    # extrapolated window-boundary positions (px/slice velocity × slack)
    tail_b = blocks.pos_last + blocks.vel_last * (
        (1.0 - blocks.u_last) * n_emit)[..., None]
    head_b = blocks.pos_first - blocks.vel_first * (
        blocks.u_first * n_emit)[..., None]
    tail_ok = exists & (blocks.u_last >= 1.0 - gap)
    head_ok = exists & (blocks.u_first <= gap)

    ptr_rows = []
    for i in range(w - 1):
        ptr_rows.append(_stitch_ptrs(tail_b[i], head_b[i + 1],
                                     tail_ok[i], head_ok[i + 1],
                                     stitch_radius))
    ptr_rows.append(jnp.full((t,), -1, jnp.int32))
    next_ptr = jnp.stack(ptr_rows)
    chain = _chain_forward(next_ptr, exists)                   # (W, T)

    # --- Schur elimination of the interior parameter m_w (per tracklet)
    lam_m = 1e-6
    Hbb = blocks.H[..., :2, :2]                                # (W, T, 2, 2)
    Hbm = blocks.H[..., :2, 2]                                 # (W, T, 2)
    Hmm = blocks.H[..., 2, 2] + lam_m                          # (W, T)
    gb = blocks.g[..., :2, :]                                  # (W, T, 2, 2)
    gm = blocks.g[..., 2, :]                                   # (W, T, 2)
    S = Hbb - Hbm[..., :, None] * Hbm[..., None, :] / Hmm[..., None, None]
    gt = gb - Hbm[..., :, None] * gm[..., None, :] / Hmm[..., None, None]

    # --- assemble the reduced boundary system per chain
    # placement: window w couples boundaries (w, w+1)
    place = np.zeros((w, 2, w + 1), np.float32)
    for i in range(w):
        place[i, 0, i] = 1.0
        place[i, 1, i + 1] = 1.0
    place = jnp.asarray(place)
    contrib_A = jnp.einsum("wai,wtab,wbj->wtij", place, S, place)
    contrib_b = jnp.einsum("wai,wtac->wtic", place, gt)

    seg = jnp.where(exists & (chain >= 0), chain, k).reshape(-1)
    A = jax.ops.segment_sum(contrib_A.reshape(k, w + 1, w + 1), seg,
                            num_segments=k + 1)[:k]
    b = jax.ops.segment_sum(contrib_b.reshape(k, w + 1, 2), seg,
                            num_segments=k + 1)[:k]
    win_onehot = jnp.tile(jnp.eye(w, dtype=jnp.float32)[:, None, :], (1, t, 1))
    cover = jax.ops.segment_sum(win_onehot.reshape(k, w), seg,
                                num_segments=k + 1)[:k] > 0    # (K, W)
    # boundary support: does the chain's tracklet in the adjacent window
    # actually reach the boundary? Stricter than the stitch gap (which allows
    # a frames_to_skip coast): within 1.5 slices of the boundary.
    sup = 1.5 / n_emit
    near_s = win_onehot * (exists & (blocks.u_first <= sup)
                           ).astype(jnp.float32)[..., None]
    near_e = win_onehot * (exists & (blocks.u_last >= 1.0 - sup)
                           ).astype(jnp.float32)[..., None]
    cov_s = jax.ops.segment_sum(near_s.reshape(k, w), seg,
                                num_segments=k + 1)[:k] > 0    # (K, W)
    cov_e = jax.ops.segment_sum(near_e.reshape(k, w), seg,
                                num_segments=k + 1)[:k] > 0
    pad = jnp.zeros((k, 1), bool)
    interior = jnp.concatenate([pad, cover], axis=1) \
        & jnp.concatenate([cover, pad], axis=1)    # both neighbors covered
    boundary_ok = (jnp.concatenate([pad, cov_e], axis=1)
                   | jnp.concatenate([cov_s, pad], axis=1)
                   | interior)                                 # (K, W+1)
    n_obs = jax.ops.segment_sum(blocks.nobs.reshape(-1), seg,
                                num_segments=k + 1)[:k]
    length = jnp.sum(cover.astype(jnp.int32), axis=1)

    A = A + 1e-6 * jnp.eye(w + 1, dtype=jnp.float32)[None]
    sol = jnp.linalg.solve(A, b)                               # (K, W+1, 2)

    # a chain is keyed at its head's flat id
    head_here = (chain == (jnp.arange(w, dtype=jnp.int32)[:, None] * t
                           + jnp.arange(t, dtype=jnp.int32)[None, :]))
    valid = jnp.zeros((k,), bool).at[
        jnp.where(head_here & exists, chain, k).reshape(-1)].set(
        True, mode="drop")
    return RefinedTracks(valid=valid & (length > 0), n_windows=length,
                         n_obs=n_obs, window_mask=cover, boundary_pos=sol,
                         boundary_ok=boundary_ok)


def fuse_clusters(first_cent, first_ok, final_cent, final_ok,
                  cfg: EngineConfig) -> jnp.ndarray:
    """Chain per-window cluster slots into stream-global ids.

    first_cent/final_cent: (W, C, 2) centroid at the first/last post-warmup
    report of each slot; *_ok: (W, C) slot reported at all. Returns (W, C)
    int32 global chain ids (-1 where not reported)."""
    w, c = first_ok.shape
    radius = cfg.cluster.radius
    ptr_rows = []
    for i in range(w - 1):
        ptr_rows.append(_stitch_ptrs(final_cent[i], first_cent[i + 1],
                                     final_ok[i], first_ok[i + 1], radius))
    ptr_rows.append(jnp.full((c,), -1, jnp.int32))
    return _chain_forward(jnp.stack(ptr_rows), final_ok | first_ok)


# --------------------------------------------------------------------------
# The (data × tile) temporal pipeline step
# --------------------------------------------------------------------------

def make_temporal_pipeline(mesh: Mesh, n_windows: int, n_tiles: int,
                           n_emit: int, warmup: int,
                           cfg: EngineConfig = DEFAULT):
    """Build the jitted shard_map over the (data, tile) grid mesh.

    Inputs (all leading dims (n_windows, n_tiles) sharded (data, tile)):
      x, y, t: int32 (W, n_tiles, S, cap); valid: bool likewise;
      emit, armed: bool (W, S) sharded (data,).
    Returns a TemporalOutput (per-slice streams data-sharded, fusion
    products replicated).
    """
    data_ax = cfg.parallel.data_axis
    tile_ax = cfg.parallel.tile_axis
    tile_w = -(-cfg.sensor.width // n_tiles)
    # tile-local NMS exactness bound (see tiling.corner_tile_body)
    assert tile_w > 2 * cfg.nms.box_size, (tile_w, cfg.nms.box_size)
    ccap = cfg.cluster.max_clusters
    tcap = cfg.tracker.max_tracks

    def per_shard(x, y, t, valid, emit, armed):
        xl, yl, tl, vl = x[0, 0], y[0, 0], t[0, 0], valid[0, 0]   # (S, cap)
        em, ar = emit[0], armed[0]                                # (S,)

        halo = cfg.parallel.halo
        h = cfg.sensor.height
        cl0 = fastcluster.init_state(cfg.cluster)
        slab0 = jnp.zeros((h, tile_w + 2 * halo), jnp.int32)
        tr0 = tracker_mod.init_state(cfg.tracker)
        bl0 = init_blocks(tcap)
        fc0 = (jnp.zeros((ccap, 2)), jnp.zeros((ccap,), bool))    # first table

        def step(carry, ev):
            cl, slab, tracks, blocks, n_em, first_cent, first_ok = carry
            ex, ey, et, ev_valid, e_em, e_ar = ev

            # cluster path: per-tile dedup → distributed slice update
            ded = hash_dedup.dedup_mask(ex, ey, ev_valid, cfg.dedup, cfg.sensor)
            cl, cl_out = fastcluster.update_slice_distributed(
                cl, ex, ey, ded.unique_mask, tile_ax, cfg.cluster, cfg.sensor)

            # corner path: SAE slab + halos → eFAST → NMS → tracker
            slab, tracks, co_out = tiling.corner_tile_body(
                slab, tracks, jnp.where(e_ar, 1, 0), ex, ey, et, ev_valid,
                tile_ax, tile_w, cfg)

            n_em = n_em + jnp.where(e_em, 1, 0)
            u = n_em.astype(jnp.float32) / n_emit
            blocks = _blocks_update(blocks, tracks, u, e_em)

            new_first = e_em & cl_out.reported & ~first_ok
            first_cent = jnp.where(new_first[:, None], cl_out.centroid,
                                   first_cent)
            first_ok = first_ok | new_first

            ys = (cl_out.reported & e_em, cl_out.cid, cl_out.n,
                  cl_out.centroid, cl_out.flow, co_out.num_corners,
                  co_out.track_active & e_em, co_out.track_label,
                  co_out.track_pos, co_out.track_vel,
                  cl_out.reported & e_em, cl_out.centroid)
            return (cl, slab, tracks, blocks, n_em, first_cent, first_ok), ys

        carry0 = (cl0, slab0, tr0, bl0, jnp.int32(0), *fc0)
        carry, ys = jax.lax.scan(step, carry0,
                                 (xl, yl, tl, vl, em, ar))
        (cl, _slab, _tracks, blocks, _n, first_cent, first_ok) = carry
        (rep, cid, nmem, cent, flow, ncor, tact, tlab, tpos, tvel,
         rep_last_seq, cent_seq) = ys

        # final post-warmup cluster table = values at the LAST emitted slice
        final_cent = cent_seq[-1]
        final_ok = rep_last_seq[-1]

        # ---- fusion: all_gather per-window summaries over the data axis
        g_blocks = jax.tree.map(
            lambda a: jax.lax.all_gather(a, data_ax), blocks)
        refined = fuse_tracklets(g_blocks, n_emit, cfg)
        g_first_cent = jax.lax.all_gather(first_cent, data_ax)
        g_first_ok = jax.lax.all_gather(first_ok, data_ax)
        g_final_cent = jax.lax.all_gather(final_cent, data_ax)
        g_final_ok = jax.lax.all_gather(final_ok, data_ax)
        cluster_chain = fuse_clusters(g_first_cent, g_first_ok,
                                      g_final_cent, g_final_ok, cfg)

        s_emit = slice(warmup, None)
        out = TemporalOutput(
            cl_reported=rep[s_emit][None], cl_cid=cid[s_emit][None],
            cl_n=nmem[s_emit][None], cl_centroid=cent[s_emit][None],
            cl_flow=flow[s_emit][None], num_corners=ncor[s_emit][None],
            track_active=tact[s_emit][None], track_label=tlab[s_emit][None],
            track_pos=tpos[s_emit][None], track_vel=tvel[s_emit][None],
            refined=refined, cluster_chain=cluster_chain)
        return out

    ev_spec = P(cfg.parallel.data_axis, cfg.parallel.tile_axis)
    win_spec = P(cfg.parallel.data_axis)
    out_spec = TemporalOutput(
        cl_reported=win_spec, cl_cid=win_spec, cl_n=win_spec,
        cl_centroid=win_spec, cl_flow=win_spec, num_corners=win_spec,
        track_active=win_spec, track_label=win_spec, track_pos=win_spec,
        track_vel=win_spec,
        refined=RefinedTracks(valid=P(), n_windows=P(), n_obs=P(),
                              window_mask=P(), boundary_pos=P(),
                              boundary_ok=P()),
        cluster_chain=P())
    smapped = shard_map(
        per_shard, mesh=mesh,
        in_specs=(ev_spec, ev_spec, ev_spec, ev_spec, win_spec, win_spec),
        out_specs=out_spec,
        check_vma=False)
    return jax.jit(smapped)


# --------------------------------------------------------------------------
# Host driver
# --------------------------------------------------------------------------

def _local_window_slice(mesh: Mesh, n_windows: int,
                        cfg: EngineConfig) -> slice:
    """Which window rows this process feeds (multi-process runs hold the full
    host arrays and slice out their shard). Validates the assumptions the
    slice relies on: even division and data-axis rows mapped contiguously to
    processes in sorted process-index order."""
    didx = sorted({mesh.devices.flat[i].process_index
                   for i in range(mesh.devices.size)})
    if n_windows % jax.process_count() != 0:
        raise ValueError(
            f"n_windows={n_windows} must divide evenly over "
            f"{jax.process_count()} processes")
    d_ax = mesh.axis_names.index(cfg.parallel.data_axis)
    rows = np.moveaxis(mesh.devices, d_ax, 0).reshape(
        mesh.shape[cfg.parallel.data_axis], -1)
    row_proc = [{d.process_index for d in r} for r in rows]
    if any(len(s) != 1 for s in row_proc) or \
            [next(iter(s)) for s in row_proc] != sorted(
                next(iter(s)) for s in row_proc):
        raise ValueError(
            "mesh data-axis rows must each belong to one process and be "
            f"ordered by process index; got {row_proc}")
    nw_local = n_windows // jax.process_count()
    w0 = didx.index(jax.process_index()) * nw_local
    return slice(w0, w0 + nw_local)


def run_temporal(slices: EventSlices, mesh: Mesh, n_windows: int,
                 n_tiles: int, warmup: int = 8,
                 cfg: EngineConfig = DEFAULT,
                 capacity: Optional[int] = None) -> TemporalOutput:
    """Window + tile the sliced stream, place shards on the grid mesh, run.

    Under `jax.distributed` each process buckets and materializes ONLY its
    local windows (window_range) and feeds them via
    jax.make_array_from_process_local_data; single-process, device_put with
    the grid sharding suffices.
    """
    ev_sh = NamedSharding(mesh, P(cfg.parallel.data_axis,
                                  cfg.parallel.tile_axis))
    win_sh = NamedSharding(mesh, P(cfg.parallel.data_axis))
    if jax.process_count() > 1:
        sel = _local_window_slice(mesh, n_windows, cfg)
        x, y, t, valid, emit, armed = window_tile_events(
            slices, n_windows, n_tiles, warmup, cfg, capacity,
            window_range=range(sel.start, sel.stop))
        put_ev = functools.partial(jax.make_array_from_process_local_data, ev_sh)
        put_win = functools.partial(jax.make_array_from_process_local_data, win_sh)
        args = (put_ev(x), put_ev(y), put_ev(t),
                put_ev(valid), put_win(emit), put_win(armed))
    else:
        x, y, t, valid, emit, armed = window_tile_events(
            slices, n_windows, n_tiles, warmup, cfg, capacity)
        args = (jax.device_put(x, ev_sh), jax.device_put(y, ev_sh),
                jax.device_put(t, ev_sh), jax.device_put(valid, ev_sh),
                jax.device_put(emit, win_sh), jax.device_put(armed, win_sh))
    n_emit = x.shape[2] - warmup
    step = make_temporal_pipeline(mesh, n_windows, n_tiles, n_emit, warmup, cfg)
    return step(*args)
