"""Spatial tiling of event slices across the device mesh (shard_map).

Design (SURVEY §5 "long-context" analog): each slice's events are bucketed
into vertical pixel bands (tiles), one band per device. The heavy per-event
stages — hash dedup, assignment distances, ranking sorts, SAE scatter, eFAST
ring gather — run tile-parallel on local events. The cluster update is fully
distributed (models/fastcluster.py:update_slice_distributed): NO event data
crosses the interconnect — tiles exchange only per-cluster/per-cell partial
reductions (psum of (grid_cells,3) seeding aggregates and (C,5) EWMA/window
partials, all_gather of (C,) counts for tile-major global ranks), so the
replicated tail is O(C² + grid_cells) and per-tile cost shrinks ~linearly
with the mesh. The corner path all-gathers only the compact post-detection
corner lists (≤ max_corners each) for the replicated NMS + tracker. eFAST
needs 4 px of context across band borders: the SAE slabs carry halo columns
refreshed by jax.lax.ppermute neighbor exchange each slice (the reference's
merge_clusters_ becomes the psum'd weighted-mean merge).

Per-tile dedup semantics: tiles partition pixel space, so exact-mode dedup is
identical to the single-device kernel; hash-mode gains per-tile bucket tables
(fewer collisions than the reference's single 8192 table — strictly better,
noted for parity tests).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import EngineConfig, DEFAULT
from ..io.slicing import EventSlices
from ..ops import hash_dedup, sae as sae_ops, efast, nms as nms_ops
from ..models import fastcluster, tracker as tracker_mod
from ..models.pipeline import CornerTrackState, CornerTrackOutput


# --------------------------------------------------------------------------
# Host-side tile bucketing
# --------------------------------------------------------------------------

def bucket_by_tile(x, y, t, p, valid, n_tiles: int, width: int, capacity: int):
    """Split one slice's events into per-tile arrays (host-side, numpy).

    Returns (n_tiles, capacity) arrays + per-tile counts. Events keep stream
    order within a tile. Overflow beyond capacity is dropped (count reports
    the kept number).
    """
    x = np.asarray(x); y = np.asarray(y); t = np.asarray(t); p = np.asarray(p)
    valid = np.asarray(valid)
    tile_w = -(-width // n_tiles)
    tile = np.clip(x // tile_w, 0, n_tiles - 1)
    ox = np.zeros((n_tiles, capacity), np.int32)
    oy = np.zeros((n_tiles, capacity), np.int32)
    ot = np.zeros((n_tiles, capacity), np.int32)
    op = np.zeros((n_tiles, capacity), np.int32)
    cnt = np.zeros((n_tiles,), np.int32)
    for k in range(n_tiles):
        sel = valid & (tile == k)
        c = min(int(sel.sum()), capacity)
        ox[k, :c] = x[sel][:c]
        oy[k, :c] = y[sel][:c]
        ot[k, :c] = t[sel][:c]
        op[k, :c] = p[sel][:c]
        cnt[k] = c
    return ox, oy, ot, op, cnt


def bucket_slices_by_tile(x, y, t, p, valid, n_tiles: int, width: int,
                          capacity: int):
    """Vectorized bucket_by_tile over ALL slices at once (host-side numpy).

    x, y, t, p: (S, N); valid: (S, N). Returns (S, n_tiles, capacity) arrays
    (stream order within each tile, overflow beyond capacity dropped) plus
    (S, n_tiles) kept counts — identical per slice to bucket_by_tile
    (tests/test_parallel.py), one argsort pass instead of a Python loop
    per window×slice (VERDICT r2 item 8)."""
    x = np.asarray(x); y = np.asarray(y); t = np.asarray(t); p = np.asarray(p)
    valid = np.asarray(valid)
    s, n = x.shape
    tile_w = -(-width // n_tiles)
    tile = np.clip(x // tile_w, 0, n_tiles - 1)
    tile = np.where(valid, tile, n_tiles)              # park invalid lanes
    # stable per-slice sort by tile (lane tiebreak keeps stream order)
    order = np.argsort(tile * np.int64(n) + np.arange(n)[None, :], axis=1)
    st = np.take_along_axis(tile, order, axis=1)       # (S, N) sorted tiles
    first = np.concatenate([np.ones((s, 1), bool), st[:, 1:] != st[:, :-1]],
                           axis=1)
    run_start = np.maximum.accumulate(
        np.where(first, np.arange(n)[None, :], 0), axis=1)
    rank = np.arange(n)[None, :] - run_start
    keep = (st < n_tiles) & (rank < capacity)
    srow = np.broadcast_to(np.arange(s)[:, None], (s, n))[keep]
    stile = st[keep]
    srank = rank[keep]
    slane = np.take_along_axis(
        np.broadcast_to(np.arange(n)[None, :], (s, n)), order, axis=1)[keep]
    out = []
    for a, dt in ((x, np.int32), (y, np.int32), (t, t.dtype), (p, np.int32)):
        o = np.zeros((s, n_tiles, capacity), dt)
        o[srow, stile, srank] = a[srow, slane]
        out.append(o)
    cnt = np.zeros((s, n_tiles), np.int32)
    np.add.at(cnt, (srow, stile), 1)
    return (*out, cnt)


# --------------------------------------------------------------------------
# Tiled flagship step: dedup (tile-parallel) → cluster update (replicated)
# --------------------------------------------------------------------------

def make_tiled_cluster_flow_step(mesh: Mesh, cfg: EngineConfig = DEFAULT):
    """Build the jitted shard_map step.

    Inputs: state (replicated FastState), per-tile events
    x,y (n_tiles, cap) sharded on the tile axis, valid likewise.
    """
    axis = cfg.parallel.tile_axis

    def per_tile(state, x, y, valid):
        # shapes inside: (1, cap) local block
        xl, yl, vl = x[0], y[0], valid[0]
        # per-tile dedup (tiles partition pixel space, so exact-mode dedup is
        # identical to single-device; hash mode gets a per-tile bucket table)
        ded = hash_dedup.dedup_mask(xl, yl, vl, cfg.dedup, cfg.sensor)
        # NO event data crosses the interconnect: the distributed cluster
        # update exchanges only per-cluster/per-cell partial reductions
        # (psum of (grid_cells,3) + (C,5), all_gather of (C,) counts). The
        # previous design all-gathered every deduped event and replicated the
        # whole cluster update per device — per-device work GREW with the
        # mesh (measured 3% scaling efficiency at 8 devices).
        new_state, out = fastcluster.update_slice_distributed(
            state, xl, yl, ded.unique_mask, axis, cfg.cluster, cfg.sensor)
        ucount = jax.lax.psum(ded.unique_count, axis)
        rcount = jax.lax.psum(ded.repeated_count, axis)
        return new_state, out, ucount, rcount

    state_spec = jax.tree.map(lambda _: P(), fastcluster.init_state(cfg.cluster))
    # SliceOutput is replicated except labels, which are per-LOCAL-event and
    # come back tile-sharded as a flat (n_tiles*cap,) array in tile order
    out_struct = _slice_output_struct(cfg)
    out_spec = fastcluster.SliceOutput(
        *[P() for _ in out_struct])._replace(labels=P(axis))
    smapped = shard_map(
        per_tile, mesh=mesh,
        in_specs=(state_spec, P(axis), P(axis), P(axis)),
        out_specs=(state_spec, out_spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


def _slice_output_struct(cfg: EngineConfig):
    c = cfg.cluster.max_clusters
    z = jnp.zeros
    return fastcluster.SliceOutput(
        alive=z((c,), bool), reported=z((c,), bool), cid=z((c,), jnp.int32),
        n=z((c,), jnp.int32), centroid=z((c, 2), jnp.float32),
        flow=z((c, 2), jnp.float32), labels=z((0,), jnp.int32))


# --------------------------------------------------------------------------
# Tiled corner step: SAE slabs with halo exchange → eFAST → gathered NMS/track
# --------------------------------------------------------------------------

class TiledCornerState(NamedTuple):
    slab: jnp.ndarray                 # int32 (n_tiles, H, tile_w + 2*halo) sharded
    tracks: tracker_mod.TrackState    # replicated
    slice_idx: jnp.ndarray            # int32 () replicated


def init_tiled_corner_state(mesh: Mesh, n_tiles: int,
                            cfg: EngineConfig = DEFAULT) -> TiledCornerState:
    h = cfg.sensor.height
    tile_w = -(-cfg.sensor.width // n_tiles)
    halo = cfg.parallel.halo
    slab = jnp.zeros((n_tiles, h, tile_w + 2 * halo), jnp.int32)
    slab = jax.device_put(slab, NamedSharding(mesh, P(cfg.parallel.tile_axis)))
    return TiledCornerState(slab=slab, tracks=tracker_mod.init_state(cfg.tracker),
                            slice_idx=jnp.int32(0))


def tile_local_nms(cx, cy, cvalid, axis: str, my, n, x0, tile_w: int,
                   cfg: EngineConfig):
    """TILE-LOCAL NMS (r2, generalized r3 per VERDICT item 9). Global
    candidate order is tile-major (each tile's candidates in local stream
    order), so suppression information flows strictly LEFT->RIGHT: a
    candidate's fate depends only on accepted corners in earlier tiles, and
    box overlap (|dx| <= box_size, tiles wider than 2*box_size — asserted by
    the builder) limits that to the left neighbor's accepted right strip.

    Round 1 = local greedy NMS; each further round re-runs the local greedy
    with the left neighbor's CURRENT accepted right strip as an immune
    prefix. After R rounds, tile k's result is exact unless an unbroken
    suppression chain of pairwise-overlapping candidates spans (R-1) full
    tile widths (each extra round propagates boundary information one more
    tile leftward-to-rightward). cfg.parallel.nms_exchange_rounds = 2 keeps
    the r2 two-pass cost — O((cap/n_tiles)^2) per tile vs
    O((n_tiles*cap)^2) replicated; = n_tiles is the exact fixpoint. The
    adversarial chain in tests/test_parallel.py demonstrates the round-2
    deviation and its closure at n_tiles rounds."""
    cap = cfg.nms.max_corners
    box = cfg.nms.box_size
    lane = jnp.arange(cap)
    perm = [(i, (i + 1) % n) for i in range(n)]
    filt = nms_ops.filter_corners(cx, cy, cvalid, cfg.nms)
    for _ in range(cfg.parallel.nms_exchange_rounds - 1):
        strip_v = (lane < filt.count) & (filt.x >= x0 + tile_w - box)
        imm_x = jax.lax.ppermute(filt.x, axis, perm)
        imm_y = jax.lax.ppermute(filt.y, axis, perm)
        imm_v = jax.lax.ppermute(strip_v, axis, perm)
        imm_v = imm_v & (my > 0)      # leftmost tile receives wrapped data
        filt = nms_ops.filter_corners(cx, cy, cvalid, cfg.nms,
                                      immune_x=imm_x, immune_y=imm_y,
                                      immune_valid=imm_v)
    return filt


def corner_tile_body(sl, tracks, slice_idx, xl, yl, tl, vl,
                     axis: str, tile_w: int, cfg: EngineConfig):
    """One tile's slice step of the corner pipeline, for use inside shard_map
    (directly in make_tiled_corner_step, or inside the per-window lax.scan of
    parallel/temporal.py). sl is the local (H, tile_w + 2*halo) SAE slab;
    collectives (ppermute halos, corner all_gather, psums) ride `axis`.
    Returns (sl, tracks, out)."""
    halo = cfg.parallel.halo
    h = cfg.sensor.height
    my = jax.lax.axis_index(axis)
    x0 = my * tile_w                   # global x of slab core column 0

    # scatter local events into the slab core (local coords = x - x0 + halo)
    lx = xl - x0 + halo
    sl = sl.at[yl, lx].max(jnp.where(vl, tl, jnp.iinfo(jnp.int32).min),
                           mode="drop")

    # halo exchange: my right core edge → right neighbor's left halo, etc.
    n = jax.lax.psum(1, axis)
    # core columns span [halo, halo + tile_w); edges:
    left_core = jax.lax.dynamic_slice_in_dim(sl, halo, halo, 1)
    right_core = jax.lax.dynamic_slice_in_dim(sl, tile_w, halo, 1)
    from_left = jax.lax.ppermute(right_core, axis,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(left_core, axis,
                                  [(i, (i - 1) % n) for i in range(n)])
    # install halos (edge tiles receive wrapped data but their halo region
    # is outside the eFAST border margin anyway)
    sl = jax.lax.dynamic_update_slice_in_dim(sl, from_left, 0, 1)
    sl = jax.lax.dynamic_update_slice_in_dim(sl, from_right, tile_w + halo, 1)

    # eFAST on local events against the slab (shifted sensor frame)
    slab_sensor = cfg.sensor.__class__(width=tile_w + 2 * halo, height=h)
    in_core = vl & (xl >= x0) & (xl < x0 + tile_w)
    # border margin must respect the *global* frame, not the slab frame
    gborder = (xl >= cfg.efast.border) & (xl < cfg.sensor.width - cfg.efast.border) \
        & (yl >= cfg.efast.border) & (yl < h - cfg.efast.border)
    corner_mask = efast.detect_corners(
        sl, lx, yl, in_core & gborder & (slice_idx > 0),
        cfg.efast, slab_sensor)
    n_local = jnp.sum(corner_mask.astype(jnp.int32))

    # compact local corners (global coords) and all-gather — r5: sort-based
    # stream-order compaction (key, payloads) + static slice, the r4b
    # single-device idiom (~10x cheaper than cumsum + drop-scatters on TPU)
    cap = cfg.nms.max_corners
    nlanes = xl.shape[0]
    ckey = jnp.where(corner_mask, jnp.arange(nlanes, dtype=jnp.int32),
                     jnp.int32(nlanes))
    _, sx_, sy_ = jax.lax.sort((ckey, xl, yl), num_keys=1)
    if cap > nlanes:
        sx_ = jnp.pad(sx_, (0, cap - nlanes))
        sy_ = jnp.pad(sy_, (0, cap - nlanes))
    cvalid = jnp.arange(cap) < jnp.minimum(n_local, cap)
    cx = jnp.where(cvalid, sx_[:cap], 0)
    cy = jnp.where(cvalid, sy_[:cap], 0)

    n_corners = jax.lax.psum(n_local, axis)
    filt = tile_local_nms(cx, cy, cvalid, axis, my, n, x0, tile_w, cfg)

    # gather only the SURVIVORS (compact per tile) for the replicated
    # tracker — r5: same sort-based compaction, tile-major order preserved
    sx = jax.lax.all_gather(filt.x, axis).reshape(-1)
    sy = jax.lax.all_gather(filt.y, axis).reshape(-1)
    sv = (jax.lax.all_gather(jnp.arange(cap) < filt.count, axis)).reshape(-1)
    glane = jnp.arange(sx.shape[0], dtype=jnp.int32)
    gkey = jnp.where(sv, glane, jnp.int32(sx.shape[0]))
    _, gsx, gsy = jax.lax.sort((gkey, sx, sy), num_keys=1)
    n_filtered = jax.lax.psum(filt.count, axis)
    det_valid = jnp.arange(cap) < jnp.minimum(n_filtered, cap)
    gx = jnp.where(det_valid, gsx[:cap], 0)
    gy = jnp.where(det_valid, gsy[:cap], 0)
    tracks, groups = tracker_mod.update(
        tracks, gx.astype(jnp.float32), gy.astype(jnp.float32),
        det_valid, cfg.tracker)

    out = CornerTrackOutput(
        num_corners=n_corners, num_filtered=n_filtered,
        track_active=tracks.active, track_label=tracks.label,
        track_pos=tracks.pos, track_vel=tracks.velocity,
        track_group=tracks.group_id, groups=groups)
    return sl, tracks, out


def make_tiled_corner_step(mesh: Mesh, n_tiles: int, cfg: EngineConfig = DEFAULT):
    axis = cfg.parallel.tile_axis
    tile_w = -(-cfg.sensor.width // n_tiles)
    # tile-local NMS exactness needs suppression to reach at most one tile
    # boundary (see corner_tile_body)
    assert tile_w > 2 * cfg.nms.box_size, (tile_w, cfg.nms.box_size)

    def per_tile(slab, tracks, slice_idx, x, y, t, valid):
        sl, tracks, out = corner_tile_body(
            slab[0], tracks, slice_idx, x[0], y[0], t[0], valid[0],
            axis, tile_w, cfg)
        return sl[None], tracks, slice_idx + 1, out

    tr_spec = jax.tree.map(lambda _: P(), tracker_mod.init_state(cfg.tracker))
    out_spec = jax.tree.map(lambda _: P(), _corner_output_struct(cfg))
    smapped = shard_map(
        per_tile, mesh=mesh,
        in_specs=(P(axis), tr_spec, P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), tr_spec, P(), out_spec),
        check_vma=False,
    )
    return jax.jit(smapped)


def _corner_output_struct(cfg: EngineConfig):
    t = cfg.tracker.max_tracks
    z = jnp.zeros
    groups = tracker_mod.GroupView(
        exists=z((t,), bool), centroid=z((t, 2), jnp.float32),
        avg_velocity=z((t, 2), jnp.float32), radius=z((t,), jnp.float32),
        size=z((t,), jnp.int32))
    return CornerTrackOutput(
        num_corners=jnp.int32(0), num_filtered=jnp.int32(0),
        track_active=z((t,), bool), track_label=z((t,), jnp.int32),
        track_pos=z((t, 2), jnp.float32), track_vel=z((t, 2), jnp.float32),
        track_group=z((t,), jnp.int32), groups=groups)
