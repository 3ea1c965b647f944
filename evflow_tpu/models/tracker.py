"""CornerTracker — Luenberger-style corner track estimator with grouping.

Reference (metavision_time_surface_periodic_group_track.cpp:163-537):
  - DirectionVector observer: current = current*damping + target*(1-damping)
    (:170-175) — the damped predict/correct loop the top-level Readme calls
    "Luenberger estimation"
  - predictPosition (:304-319): pos+velocity, blended toward the damped
    direction ray while coasting with confidence 1 - frames_since/max_skip
  - greedy association in track order against *predicted* positions (:446-469)
  - correct (:471-487): position history deque (<=10, push_front :224-231),
    direction = exp-decayed (0.8^i) mean of normalized steps (:233-271),
    velocity = mean step blended (1-smoothing)/smoothing with the
    direction-aligned speed (:273-302)
  - coast (:488-497): pos = prediction, frames_since++
  - spawn (:500-514): unmatched detections, label = next_label++
  - prune (:516-526): frames_since > max_skip or frame_count > max_frames
  - updateCornerGroups (:321-398): star-shaped greedy grouping from the first
    unprocessed detected track within group_radius; group centroid/avg
    velocity/radius; member velocity = 0.7*own + 0.3*group (:395)

TPU formulation: fixed (T,) track-slot arrays; the two genuinely sequential
loops become exact fixpoint iterations — association as parallel prefix-commit
rounds (serial-dictatorship equivalence proof at the call site), grouping as a
lexicographic-MIS fixpoint on the disk graph — everything else is vectorized.
The whole update jits as one step; sequences run under lax.scan over slices.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import TrackerConfig

_BIG = np.int32(2**31 - 1)  # np, not jnp: keep import free of backend init
_F32MAX = np.float32(3.0e38)


class TrackState(NamedTuple):
    active: jnp.ndarray       # bool (T,)
    label: jnp.ndarray        # int32 (T,)
    seq: jnp.ndarray          # int32 (T,) creation order (deque order key)
    pos: jnp.ndarray          # float32 (T, 2)
    frame_count: jnp.ndarray  # int32 (T,)
    frames_since: jnp.ndarray # int32 (T,) frames since last detection
    hist: jnp.ndarray         # float32 (T, H, 2) newest-first position history
    hist_len: jnp.ndarray     # int32 (T,)
    velocity: jnp.ndarray     # float32 (T, 2)
    dir_cur: jnp.ndarray      # float32 (T, 2) damped direction observer
    group_id: jnp.ndarray     # int32 (T,)
    next_label: jnp.ndarray   # int32 ()
    next_seq: jnp.ndarray     # int32 ()


class GroupView(NamedTuple):
    """Per-group outputs, indexed by group id (fixed capacity = T)."""
    exists: jnp.ndarray       # bool (T,)
    centroid: jnp.ndarray     # float32 (T, 2)
    avg_velocity: jnp.ndarray # float32 (T, 2)
    radius: jnp.ndarray       # float32 (T,)
    size: jnp.ndarray         # int32 (T,)


def init_state(cfg: TrackerConfig = TrackerConfig()) -> TrackState:
    t, h = cfg.max_tracks, cfg.history
    return TrackState(
        active=jnp.zeros((t,), bool),
        label=jnp.full((t,), -1, jnp.int32),
        seq=jnp.full((t,), _BIG, jnp.int32),
        pos=jnp.zeros((t, 2), jnp.float32),
        frame_count=jnp.zeros((t,), jnp.int32),
        frames_since=jnp.zeros((t,), jnp.int32),
        hist=jnp.zeros((t, h, 2), jnp.float32),
        hist_len=jnp.zeros((t,), jnp.int32),
        velocity=jnp.zeros((t, 2), jnp.float32),
        dir_cur=jnp.zeros((t, 2), jnp.float32),
        group_id=jnp.full((t,), -1, jnp.int32),
        next_label=jnp.int32(0),
        next_seq=jnp.int32(0),
    )


def _predict(state: TrackState, cfg: TrackerConfig) -> jnp.ndarray:
    """predictPosition for every slot (group_track.cpp:304-319)."""
    pred = state.pos + state.velocity
    speed = jnp.linalg.norm(state.velocity, axis=1, keepdims=True)
    conf = jnp.maximum(
        0.0, 1.0 - state.frames_since.astype(jnp.float32) / cfg.frames_to_skip)
    coasting = (state.frames_since > 0)[:, None]
    dir_pred = state.pos + state.dir_cur * speed
    blended = pred * (1.0 - conf[:, None]) + dir_pred * conf[:, None]
    return jnp.where(coasting, blended, pred)


def _calc_direction(hist: jnp.ndarray, hist_len: jnp.ndarray,
                    cfg: TrackerConfig) -> jnp.ndarray:
    """calculateDirection (:233-271): weighted mean of normalized steps."""
    t, h, _ = hist.shape
    steps = hist[:, :-1, :] - hist[:, 1:, :]           # (T, H-1, 2) newest first
    mag = jnp.linalg.norm(steps, axis=2)
    k = jnp.arange(h - 1, dtype=jnp.float32)
    w = cfg.weight_decay ** k                          # 0.8^(i-1), i from 1
    valid = (jnp.arange(1, h)[None, :] < hist_len[:, None]) & (mag > 0)
    wv = jnp.where(valid, w[None, :], 0.0)
    unit = jnp.where(valid[:, :, None], steps / jnp.maximum(mag, 1e-20)[:, :, None], 0.0)
    wsum = jnp.sum(wv, axis=1)
    wd = jnp.sum(unit * wv[:, :, None], axis=1)
    wd = jnp.where((wsum > 0)[:, None], wd / jnp.maximum(wsum, 1e-20)[:, None], 0.0)
    m = jnp.linalg.norm(wd, axis=1, keepdims=True)
    wd = jnp.where(m > 0, wd / jnp.maximum(m, 1e-20), wd)
    return jnp.where((hist_len >= 2)[:, None], wd, 0.0)


def _estimate_velocity(hist, hist_len, dir_cur, cfg: TrackerConfig) -> jnp.ndarray:
    """estimateVelocity (:273-302)."""
    t, h, _ = hist.shape
    steps = hist[:, :-1, :] - hist[:, 1:, :]
    valid = jnp.arange(1, h)[None, :] < hist_len[:, None]
    cnt = jnp.sum(valid, axis=1)
    avg = jnp.sum(jnp.where(valid[:, :, None], steps, 0.0), axis=1) \
        / jnp.maximum(cnt, 1)[:, None].astype(jnp.float32)
    speed = jnp.linalg.norm(avg, axis=1, keepdims=True)
    dirv = dir_cur * speed
    blended = avg * (1.0 - cfg.smoothing) + dirv * cfg.smoothing
    v = jnp.where(speed > 0, blended, avg)
    return jnp.where((hist_len >= 2)[:, None], v, 0.0)


def _push_history(hist, hist_len, pos, do):
    new_hist = jnp.concatenate([pos[:, None, :], hist[:, :-1, :]], axis=1)
    hist = jnp.where(do[:, None, None], new_hist, hist)
    hist_len = jnp.where(do, jnp.minimum(hist_len + 1, hist.shape[1]), hist_len)
    return hist, hist_len


@functools.partial(jax.jit, static_argnames=("cfg",))
def update(
    state: TrackState,
    det_x: jnp.ndarray,
    det_y: jnp.ndarray,
    det_valid: jnp.ndarray,
    cfg: TrackerConfig = TrackerConfig(),
) -> Tuple[TrackState, GroupView]:
    """One tracker step over (D,) filtered corner detections."""
    t = state.active.shape[0]
    d = det_x.shape[0]
    det = jnp.stack([det_x, det_y], axis=1).astype(jnp.float32)

    predicted = _predict(state, cfg)

    eligible = state.active & (state.frames_since <= cfg.frames_to_skip)

    # ---- greedy association in seq order, as parallel commit rounds.
    # Sequential greedy (reference :446-469) = serial dictatorship by seq
    # order. Each round every open track proposes its nearest available
    # detection; a proposal commits iff NO earlier-seq open track can even
    # reach (within max_distance) that detection. Exactness: availability only
    # shrinks, so if no earlier track can ever claim det d_t, then d_t is
    # still available when t's sequential turn comes, and everything t prefers
    # over d_t was already gone at round start — t picks d_t. Converges in the
    # reach-chain depth (~2-3 rounds); no scatters inside the loop body
    # (a Mosaic compile bomb — availability is derived by reduction).
    dist_td = jnp.linalg.norm(predicted[:, None, :] - det[None, :, :], axis=2)
    seqv = jnp.where(eligible, state.seq, _BIG)
    reach = dist_td < cfg.max_distance              # (T, D)
    det_iota = jnp.arange(d, dtype=jnp.int32)

    def assoc_round(st):
        match_idx, _ = st
        matched_t = match_idx >= 0
        det_taken = jnp.any((match_idx[:, None] == det_iota[None, :])
                            & matched_t[:, None], axis=0)
        open_t = eligible & ~matched_t
        dmask = jnp.where((det_valid & ~det_taken)[None, :], dist_td, _F32MAX)
        best = jnp.argmin(dmask, axis=1).astype(jnp.int32)
        best_dist = jnp.min(dmask, axis=1)
        propose = open_t & (best_dist < cfg.max_distance)
        pseq = jnp.where(propose, seqv, _BIG)
        onehot = propose[:, None] & (best[:, None] == det_iota[None, :])  # (T, D)
        # (gather-free body: dynamic gathers inside while_loop bodies are
        # another Mosaic slow path — everything below is masked reductions)
        # reach rule: commit j if no earlier-seq OPEN track can reach best_j
        minseq_reach = jnp.min(jnp.where(open_t[:, None] & reach,
                                         seqv[:, None], _BIG), axis=0)   # (D,)
        reach_ok = ~jnp.any(onehot & (minseq_reach[None, :] < pseq[:, None]),
                            axis=1)
        # prefix rule: commit the maximal seq-prefix of proposers whose
        # proposals are pairwise distinct (duplicate-free prefix)
        mindup = jnp.min(jnp.where(onehot, pseq[:, None], _BIG), axis=0)  # (D,)
        dup = jnp.any(onehot & (mindup[None, :] < pseq[:, None]), axis=1)
        first_dup = jnp.min(jnp.where(dup, pseq, _BIG))
        prefix_ok = pseq < first_dup
        commit = propose & (prefix_ok | reach_ok)
        match_idx = jnp.where(commit, best, match_idx)
        return match_idx, jnp.any(commit)

    def assoc_cond(st):
        return st[1]

    match_idx, _ = jax.lax.while_loop(
        assoc_cond, assoc_round,
        (jnp.full((t,), -1, jnp.int32), jnp.array(True)))

    matched = match_idx >= 0
    det_matched = jnp.any((match_idx[:, None] == det_iota[None, :])
                          & matched[:, None], axis=0)
    mpos = det[jnp.clip(match_idx, 0, d - 1)]

    # ---- correct matched / coast unmatched
    pos = jnp.where(matched[:, None], mpos,
                    jnp.where((state.active & ~matched)[:, None], predicted, state.pos))
    frames_since = jnp.where(matched, 0,
                             jnp.where(state.active, state.frames_since + 1,
                                       state.frames_since))
    frame_count = jnp.where(matched, state.frame_count + 1, state.frame_count)
    hist, hist_len = _push_history(state.hist, state.hist_len, pos, state.active)

    new_dir = _calc_direction(hist, hist_len, cfg)
    dir_cur = jnp.where(matched[:, None],
                        state.dir_cur * cfg.damping + new_dir * (1.0 - cfg.damping),
                        state.dir_cur)
    velocity = jnp.where(state.active[:, None],
                         _estimate_velocity(hist, hist_len, dir_cur, cfg),
                         state.velocity)

    # ---- spawn new tracks from unmatched detections (in detection order).
    # The k-th unmatched detection takes the k-th free slot. Expressed slot-
    # centric: one scatter builds the rank→detection inverse map, every state
    # field updates by gather/select (scatter-heavy graphs stall this
    # backend's compiler for minutes; see fastcluster.py).
    free = ~state.active
    unmatched_det = det_valid & ~det_matched
    det_rank = jnp.cumsum(unmatched_det.astype(jnp.int32)) - 1
    n_unmatched = jnp.sum(unmatched_det.astype(jnp.int32))
    n_free = jnp.sum(free.astype(jnp.int32))
    n_spawned = jnp.minimum(n_unmatched, n_free)
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    spawned_slot = free & (free_rank < n_spawned)
    det_at_rank = jnp.full((t + 1,), 0, jnp.int32).at[
        jnp.where(unmatched_det & (det_rank < t), det_rank, t)].set(
        jnp.arange(d, dtype=jnp.int32), mode="drop")[:t]
    didx = det_at_rank[jnp.clip(free_rank, 0, t - 1)]
    spawn_pos = det[jnp.clip(didx, 0, d - 1)]

    active = state.active | spawned_slot
    label = jnp.where(spawned_slot, state.next_label + free_rank, state.label)
    seq = jnp.where(spawned_slot, state.next_seq + free_rank, state.seq)
    pos = jnp.where(spawned_slot[:, None], spawn_pos, pos)
    frame_count = jnp.where(spawned_slot, 1, frame_count)
    frames_since = jnp.where(spawned_slot, 0, frames_since)
    velocity = jnp.where(spawned_slot[:, None], 0.0, velocity)
    dir_cur = jnp.where(spawned_slot[:, None], 0.0, dir_cur)
    spawn_hist = jnp.concatenate(
        [spawn_pos[:, None, :], jnp.zeros((t, hist.shape[1] - 1, 2))], axis=1)
    hist = jnp.where(spawned_slot[:, None, None], spawn_hist, hist)
    hist_len = jnp.where(spawned_slot, 1, hist_len)
    next_label = state.next_label + n_spawned
    next_seq = state.next_seq + n_spawned

    # ---- prune
    prune = active & ((frames_since > cfg.frames_to_skip)
                      | (frame_count > cfg.max_frames))
    active = active & ~prune

    # ---- grouping (star-shaped greedy from the first unprocessed detected
    # track, :321-398) as a fixpoint. Greedy seeding in seq order is a
    # lexicographic MIS on the group_radius disk graph: a detected track seeds
    # iff no earlier-seq seed lies within group_radius (absorbed tracks can't
    # seed). Membership = the min-seq seed within radius (the seed whose pass
    # reaches the track first). Group ids number seeds in seq order.
    detected = active & (frames_since == 0)
    dmat = jnp.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=2)
    within = dmat <= cfg.group_radius
    seqd = jnp.where(detected, seq, _BIG)

    def seed_round(st):
        is_seed, _ = st
        blocked = jnp.any(within & is_seed[None, :]
                          & (seqd[None, :] < seqd[:, None]), axis=1)
        new = detected & ~blocked
        return new, jnp.any(new != is_seed)

    is_seed, _ = jax.lax.while_loop(lambda st: st[1], seed_round,
                                    (detected, jnp.array(True)))
    seed_seq = jnp.where(is_seed, seq, _BIG)
    cand = detected[:, None] & is_seed[None, :] & within
    seed_slot = jnp.argmin(jnp.where(cand, seed_seq[None, :], _BIG),
                           axis=1).astype(jnp.int32)
    has_seed = jnp.any(cand, axis=1)
    seq_rank = jnp.sum((is_seed[None, :] & (seq[None, :] < seq[:, None])),
                       axis=1).astype(jnp.int32)
    group_id = jnp.where(detected & has_seed, seq_rank[seed_slot], -1)

    gid_ok = group_id >= 0
    gids = jnp.where(gid_ok, group_id, t)
    ones = gid_ok.astype(jnp.float32)
    gsize = jax.ops.segment_sum(ones, gids, num_segments=t + 1)[:t]
    gpos = jax.ops.segment_sum(jnp.where(gid_ok[:, None], pos, 0.0), gids,
                               num_segments=t + 1)[:t]
    gvel = jax.ops.segment_sum(jnp.where(gid_ok[:, None], velocity, 0.0), gids,
                               num_segments=t + 1)[:t]
    denom = jnp.maximum(gsize, 1.0)[:, None]
    centroid = gpos / denom
    avg_vel = gvel / denom
    dist_to_centroid = jnp.linalg.norm(
        pos - centroid[jnp.clip(group_id, 0, t - 1)], axis=1)
    from ..ops.segment import scatter_max
    radius = scatter_max(jnp.where(gid_ok, dist_to_centroid, 0.0), gids,
                         t + 1, jnp.float32(0.0))[:t]
    exists = gsize > 0

    # blend member velocities with the group average (:388-397)
    blend = gid_ok & detected
    gvel_of = avg_vel[jnp.clip(group_id, 0, t - 1)]
    velocity = jnp.where(blend[:, None],
                         velocity * (1.0 - cfg.group_blend) + gvel_of * cfg.group_blend,
                         velocity)

    new_state = TrackState(
        active=active, label=label, seq=jnp.where(active, seq, _BIG), pos=pos,
        frame_count=frame_count, frames_since=frames_since,
        hist=hist, hist_len=hist_len, velocity=velocity, dir_cur=dir_cur,
        group_id=group_id, next_label=next_label, next_seq=next_seq,
    )
    groups = GroupView(exists=exists, centroid=centroid, avg_velocity=avg_vel,
                       radius=radius, size=gsize.astype(jnp.int32))
    return new_state, groups
