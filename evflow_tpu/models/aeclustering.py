"""AEClustering — async incremental moving-average event clustering, exact mode.

Reference (three near-identical copies; canonical cites to
event-cam-clustering/async-incremental-clustering/AEClustering.cpp and
MyCluster.cpp; accel copy adds persistent clusterId, accel/AEClustering.cpp:96-97):

Per event `update(e)` (AEClustering.cpp:47-118):
  1. t = e.t - t0 (t0 = first event time, :48-56)
  2. sliding window of the last szBuffer update times → tMin (updateBuffer_,
     :132-140)
  3. for each cluster in deque order: forget members with datT < tMin
     (MyCluster::forget, :50-61); empty clusters marked removed; else assign if
     manhattan(pix, mu) <= radius (:75-80); else if n > minN, the sampling
     branch (:81-87) — with the apps' default kappa=0 it never matches
     (MyCluster.cpp:83 loop runs zero times), so the deployed behavior is
     mean-distance only
  4. no match → new cluster (mu = pix) appended; match → add to the first
     (lowest-index) assigned cluster with EWMA mu update
     mu = (1-alpha)*mu + alpha*pix (MyCluster.cpp:175-177)
  5. >=2 matches → merge into the first: mu = sum(n_i/n)*mu_i, members k-way
     merged by time; the removed-empties erasure is skipped on merge updates
     (early return, AEClustering.cpp:104)
  6. else erase empty clusters back-to-front

TPU formulation: fixed-capacity SoA state — a global member ring buffer
(capacity M) with per-member cluster ids, and C cluster slots with an explicit
creation-order key reproducing deque order — advanced by a jitted per-event
step under lax.scan. All dynamic cardinalities are masks. Intra-cluster member
*order* is deliberately not tracked: it only affects future orderings, never
memberships, means, or centroids (forget == time mask for time-sorted streams;
merge order is by time).

This mode exists for bit-parity validation; the throughput path is
models/fastcluster.py. Deviations (documented):
  - member ring overwrite can drop a still-live member tied exactly at tMin
    when more than M updates keep it alive (choose M > szBuffer + slice slack);
  - cluster-capacity overflow drops the new cluster instead of growing;
  - kappa>0 sampling uses a full member min instead of unseeded std::rand().
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..config import ClusterConfig

_BIG = np.int32(2**31 - 1)  # np, not jnp: keep import free of backend init
_INF = np.float32(np.inf)


class AEState(NamedTuple):
    # time origin
    t0: jnp.ndarray            # int32 () relative-time origin (µs, wraps ~35 min)
    has_t0: jnp.ndarray        # bool ()
    # sliding window of update times (deque of size szBuffer)
    tbuf: jnp.ndarray          # int32 (W,)
    thead: jnp.ndarray         # int32 () total pushes so far
    # member ring buffer
    mx: jnp.ndarray            # int32 (M,)
    my: jnp.ndarray            # int32 (M,)
    mt: jnp.ndarray            # int32 (M,) relative time
    mp: jnp.ndarray            # int32 (M,) polarity
    mcid: jnp.ndarray          # int32 (M,) cluster slot, -1 free
    # cluster slots
    alive: jnp.ndarray         # bool (C,)
    corder: jnp.ndarray        # int32 (C,) creation sequence (deque order key)
    cid: jnp.ndarray           # int32 (C,) persistent cluster id (accel :96-97)
    mu: jnp.ndarray            # float32 (C, 2)
    # counters
    next_order: jnp.ndarray    # int32 ()
    next_cid: jnp.ndarray      # int32 ()
    event_id: jnp.ndarray      # int32 ()
    last_updated: jnp.ndarray  # int32 () cluster slot of last update, -1 none
    overflow: jnp.ndarray      # int32 () dropped new-cluster count


def init_state(cfg: ClusterConfig = ClusterConfig()) -> AEState:
    w, m, c = cfg.sz_buffer, cfg.max_members, cfg.max_clusters
    return AEState(
        t0=jnp.int32(0), has_t0=jnp.array(False),
        tbuf=jnp.zeros((w,), jnp.int32), thead=jnp.int32(0),
        mx=jnp.zeros((m,), jnp.int32), my=jnp.zeros((m,), jnp.int32),
        mt=jnp.zeros((m,), jnp.int32), mp=jnp.zeros((m,), jnp.int32),
        mcid=jnp.full((m,), -1, jnp.int32),
        alive=jnp.zeros((c,), bool), corder=jnp.full((c,), _BIG, jnp.int32),
        cid=jnp.full((c,), -1, jnp.int32), mu=jnp.zeros((c, 2), jnp.float32),
        next_order=jnp.int32(0), next_cid=jnp.int32(0), event_id=jnp.int32(0),
        last_updated=jnp.int32(-1), overflow=jnp.int32(0),
    )


def _member_stats(state: AEState, px, py, c: int):
    """Per-cluster valid-member counts and min member L1 distance."""
    ids = jnp.where(state.mcid >= 0, state.mcid, c)
    ones = (state.mcid >= 0).astype(jnp.int32)
    n_c = jax.ops.segment_sum(ones, ids, num_segments=c + 1)[:c]
    d = (jnp.abs(state.mx - px) + jnp.abs(state.my - py)).astype(jnp.float32)
    d = jnp.where(state.mcid >= 0, d, _INF)
    from ..ops.segment import scatter_min
    dmin_c = scatter_min(d, ids, c + 1, _INF)[:c]
    return n_c, dmin_c


def update_event(state: AEState, x, y, t_raw, p,
                 cfg: ClusterConfig = ClusterConfig()) -> AEState:
    """One AEClustering::update step. x/y/p/t_raw int32 (t in µs)."""
    w = cfg.sz_buffer
    c = cfg.max_clusters
    m = cfg.max_members

    t0 = jnp.where(state.has_t0, state.t0, t_raw)
    t = t_raw - t0

    # --- updateBuffer_: push t, window = last W entries, tMin = oldest kept.
    tbuf = state.tbuf.at[state.thead % w].set(t)
    thead = state.thead + 1
    win = jnp.minimum(thead, w)
    tmin = tbuf[(thead - win) % w]

    # --- forget (permanent): members older than tMin are freed.
    mcid = jnp.where((state.mcid >= 0) & (state.mt >= tmin), state.mcid, -1)
    state = state._replace(mcid=mcid)

    # --- per-cluster stats after forget
    n_c, dmin_c = _member_stats(state, x, y, c)
    empty = state.alive & (n_c == 0)
    live = state.alive & (n_c > 0)

    pix = jnp.stack([x, y]).astype(jnp.float32)
    dist_mu = jnp.abs(pix[0] - state.mu[:, 0]) + jnp.abs(pix[1] - state.mu[:, 1])
    near = live & (dist_mu <= cfg.radius)
    if cfg.kappa == 0:
        samp = jnp.zeros((c,), bool)   # deployed default: branch never matches
    else:
        samp = live & ~near & (n_c > cfg.min_n) & (dmin_c <= cfg.radius)
    assigned = near | samp
    n_assigned = jnp.sum(assigned.astype(jnp.int32))
    any_assigned = n_assigned > 0

    # target = assigned cluster first in deque order (min creation order)
    order_key = jnp.where(assigned, state.corder, _BIG)
    target_assigned = jnp.argmin(order_key).astype(jnp.int32)

    # free slot for a potential new cluster
    free = ~state.alive
    free_slot = jnp.argmax(free).astype(jnp.int32)
    have_free = jnp.any(free)
    make_new = ~any_assigned & have_free
    overflow = state.overflow + jnp.where(~any_assigned & ~have_free, 1, 0)

    target = jnp.where(any_assigned, target_assigned, free_slot)
    do_add = any_assigned | make_new

    # --- add member to the ring
    slot = state.event_id % m
    mx = state.mx.at[slot].set(jnp.where(do_add, x, state.mx[slot]))
    my = state.my.at[slot].set(jnp.where(do_add, y, state.my[slot]))
    mt = state.mt.at[slot].set(jnp.where(do_add, t, state.mt[slot]))
    mp = state.mp.at[slot].set(jnp.where(do_add, p, state.mp[slot]))
    mcid = state.mcid.at[slot].set(jnp.where(do_add, target, state.mcid[slot]))
    event_id = state.event_id + jnp.where(do_add, 1, 0)

    # --- cluster bookkeeping for the target
    is_first_member = jnp.where(any_assigned, n_c[target] == 0, True)
    new_mu_t = jnp.where(is_first_member, pix,
                         (1.0 - cfg.alpha) * state.mu[target] + cfg.alpha * pix)
    mu = state.mu.at[target].set(jnp.where(do_add, new_mu_t, state.mu[target]))
    alive = state.alive.at[free_slot].set(jnp.where(make_new, True,
                                                    state.alive[free_slot]))
    corder = state.corder.at[free_slot].set(
        jnp.where(make_new, state.next_order, state.corder[free_slot]))
    cid = state.cid.at[free_slot].set(
        jnp.where(make_new, state.next_cid, state.cid[free_slot]))
    next_order = state.next_order + jnp.where(make_new, 1, 0)
    next_cid = state.next_cid + jnp.where(make_new, 1, 0)

    # --- merge (>= 2 assigned): weighted mu (weights = post-add counts),
    # members reassigned to target, other assigned slots die.
    do_merge = n_assigned >= 2
    n_post = n_c + jnp.where(jnp.arange(c) == target, 1, 0)
    wgt = jnp.where(assigned, n_post.astype(jnp.float32), 0.0)
    merged_mu = (jnp.sum(wgt[:, None] * mu, axis=0)
                 / jnp.maximum(jnp.sum(wgt), 1.0))
    mu = jnp.where(do_merge, mu.at[target].set(merged_mu), mu)
    member_in_assigned = (mcid >= 0) & assigned[jnp.clip(mcid, 0, c - 1)]
    mcid = jnp.where(do_merge & member_in_assigned, target, mcid)
    kill_merge = assigned & (jnp.arange(c) != target)
    alive = jnp.where(do_merge & kill_merge, False, alive)

    # --- remove empties (skipped on merge updates, AEClustering.cpp:104)
    alive = jnp.where(~do_merge & empty, False, alive)

    # recycle dead slots
    dead = ~alive
    corder = jnp.where(dead, _BIG, corder)
    cid = jnp.where(dead, cid, cid)  # keep ids for debugging; masked by alive
    mcid = jnp.where((mcid >= 0) & dead[jnp.clip(mcid, 0, c - 1)], -1, mcid)

    return AEState(
        t0=t0, has_t0=jnp.array(True), tbuf=tbuf, thead=thead,
        mx=mx, my=my, mt=mt, mp=mp, mcid=mcid,
        alive=alive, corder=corder, cid=cid, mu=mu,
        next_order=next_order, next_cid=next_cid, event_id=event_id,
        last_updated=jnp.where(do_add, target, jnp.int32(-1)),
        overflow=overflow,
    )


def _slice_prep(state: AEState, x, y, t, p, valid, cfg: ClusterConfig):
    """Shared pre-scan work: relative times, per-lane precomputed tMin, and
    the slice-end push-buffer update (see update_slice docstring)."""
    w = cfg.sz_buffer
    n = x.shape[0]
    x = x.astype(jnp.int32)
    y = y.astype(jnp.int32)
    t_raw = t.astype(jnp.int32)
    p = p.astype(jnp.int32)

    # --- t0 / relative times (vectorized; t0 = first valid event's raw time)
    first_valid = jnp.argmax(valid).astype(jnp.int32)
    has_any = jnp.any(valid)
    t0 = jnp.where(state.has_t0, state.t0, t_raw[first_valid])
    tr = t_raw - t0

    # --- per-lane update index and precomputed tMin
    upd = jnp.cumsum(valid.astype(jnp.int32)) - 1     # update idx within slice
    gidx = state.thead + upd                          # global update idx
    # timeline[j] = push time of global update (thead - w + j), j in [0, w+n):
    # update u was stored at tbuf[u % w], so position (thead - w + j) % w
    prev_times = state.tbuf[(state.thead - w + jnp.arange(w)) % w]
    slice_times = jnp.zeros((n + 1,), jnp.int32).at[
        jnp.where(valid, upd, n)].set(jnp.where(valid, tr, 0),
                                      mode="drop")[:n]
    timeline = jnp.concatenate([prev_times, slice_times])
    tmin_gidx = jnp.maximum(gidx - w + 1, 0)          # update holding tMin
    tmin = timeline[jnp.clip(tmin_gidx - state.thead + w, 0, w + n - 1)]

    # --- slice-end push buffer: only each slot's LAST writer lands (scatter
    # with duplicate indices has no ordering guarantee)
    n_push = jnp.sum(valid.astype(jnp.int32))
    final_writer = valid & (upd >= n_push - w)
    tbuf = state.tbuf.at[jnp.where(final_writer, gidx % w, w)].set(
        jnp.where(final_writer, tr, 0), mode="drop")
    thead = state.thead + n_push
    return x, y, tr, p, t0, has_any, tmin, tbuf, thead


def _event_body(st, ev, cfg: ClusterConfig):
    """One per-event update on the scan carry — the bit-parity core shared by
    update_slice (per-event scan) and update_slice_blocked (hazard fallback)."""
    c = cfg.max_clusters
    m = cfg.max_members
    alpha = cfg.alpha
    cids = jnp.arange(c, dtype=jnp.int32)
    (alive, corder, cid, mu, ring,
     next_order, next_cid, event_id, last_updated, overflow) = st
    xi, yi, ti, pi, vi, tmini = ev
    mt = ring[2]
    mcid = ring[4]

    # (M, C) membership panel; live = not yet expired by the window
    eq_all = mcid[:, None] == cids[None, :]
    live_m = (mcid >= 0) & (mt >= tmini)
    n_c = jnp.sum(eq_all & live_m[:, None], axis=0).astype(jnp.int32)
    empty = alive & (n_c == 0)
    live = alive & (n_c > 0)

    pix = jnp.stack([xi, yi]).astype(jnp.float32)
    dist_mu = jnp.abs(pix[0] - mu[:, 0]) + jnp.abs(pix[1] - mu[:, 1])
    near = live & (dist_mu <= cfg.radius)
    if cfg.kappa == 0:
        assigned = near   # deployed default: sampling branch never matches
    else:
        d = (jnp.abs(ring[0] - xi) + jnp.abs(ring[1] - yi)).astype(jnp.float32)
        d = jnp.where(live_m, d, _INF)
        dmin_c = jnp.min(jnp.where(eq_all & live_m[:, None],
                                   d[:, None], _INF), axis=0)
        samp = live & ~near & (n_c > cfg.min_n) & (dmin_c <= cfg.radius)
        assigned = near | samp
    n_assigned = jnp.sum(assigned.astype(jnp.int32))
    any_assigned = n_assigned > 0

    order_key = jnp.where(assigned, corder, _BIG)
    target_assigned = jnp.argmin(order_key).astype(jnp.int32)
    free = ~alive
    free_slot = jnp.argmax(free).astype(jnp.int32)
    have_free = jnp.any(free)
    make_new = vi & ~any_assigned & have_free
    overflow = overflow + jnp.where(vi & ~any_assigned & ~have_free, 1, 0)
    target = jnp.where(any_assigned, target_assigned, free_slot)
    do_add = vi & (any_assigned | make_new)

    # one masked row write for all five member fields (ring is (5, M))
    slot = event_id % m
    newcol = jnp.stack([xi, yi, ti, pi, target])
    ring = jax.lax.dynamic_update_slice(
        ring, jnp.where(do_add, newcol,
                        jax.lax.dynamic_slice(ring, (0, slot),
                                              (5, 1))[:, 0])[:, None],
        (0, slot))
    event_id = event_id + jnp.where(do_add, 1, 0)

    is_first = jnp.where(any_assigned, n_c[target] == 0, True)
    # (C,)-vector updates in where-form rather than .at[].set: scatter HLOs
    # are fusion barriers on TPU — the where chain fuses, measured 24.7 ->
    # 14.8 us/event (r3). The selected lane's arithmetic is unchanged
    # ((1-α)·mu[c] + α·pix elementwise), so results stay bit-identical
    # (oracle suite).
    tgt_w = (cids == target) & do_add
    new_mu = jnp.where(is_first, pix[None, :],
                       (1.0 - alpha) * mu + alpha * pix[None, :])
    mu = jnp.where(tgt_w[:, None], new_mu, mu)
    new_w = (cids == free_slot) & make_new
    alive = jnp.where(new_w, True, alive)
    corder = jnp.where(new_w, next_order, corder)
    cid = jnp.where(new_w, next_cid, cid)
    next_order = next_order + jnp.where(make_new, 1, 0)
    next_cid = next_cid + jnp.where(make_new, 1, 0)

    # merge (>= 2 assigned): weighted mu, members to target, others die.
    # (A lax.cond around this block runs 396 vs 464 ms/slice but blows
    # the XLA compile from ~3 s to ~13 min — not worth it; measured.)
    do_merge = vi & (n_assigned >= 2)
    mcid_post = ring[4]
    n_post = n_c + (cids == target).astype(jnp.int32)
    wgt = jnp.where(assigned, n_post.astype(jnp.float32), 0.0)
    merged_mu = (jnp.sum(wgt[:, None] * mu, axis=0)
                 / jnp.maximum(jnp.sum(wgt), 1.0))
    mu = jnp.where((do_merge & (cids == target))[:, None],
                   merged_mu[None, :], mu)
    member_in_assigned = (mcid_post >= 0) & jnp.any(
        eq_all & assigned[None, :], axis=1)
    ring = ring.at[4].set(jnp.where(do_merge & member_in_assigned,
                                    target, mcid_post))
    kill_merge = assigned & (cids != target)
    alive = jnp.where(do_merge & kill_merge, False, alive)

    # remove empties (skipped on merge updates, AEClustering.cpp:104)
    alive = jnp.where(vi & ~do_merge & empty, False, alive)
    corder = jnp.where(~alive, _BIG, corder)

    last_updated = jnp.where(vi, jnp.where(do_add, target, -1),
                             last_updated)
    return (alive, corder, cid, mu, ring,
            next_order, next_cid, event_id, last_updated, overflow)


def _carry0(state: AEState):
    ring0 = jnp.stack([state.mx, state.my, state.mt, state.mp, state.mcid])
    return (state.alive, state.corder, state.cid, state.mu, ring0,
            state.next_order, state.next_cid, state.event_id,
            state.last_updated, state.overflow)


def _finalize(state: AEState, carry, t0, has_any, tmin, tbuf, thead, valid,
              cfg: ClusterConfig) -> AEState:
    c = cfg.max_clusters
    n = valid.shape[0]
    (alive, corder, cid, mu, ring,
     next_order, next_cid, event_id, last_updated, overflow) = carry
    mx, my, mt, mp, mcid = ring
    # normalize lazily-forgotten members so the state matches update_event's
    # eager form bit-for-bit (oracle tests compare memberships via mcid)
    final_tmin = tmin[jnp.where(has_any, n - 1 - jnp.argmax(jnp.flip(valid)),
                                0)]
    final_tmin = jnp.where(has_any, final_tmin, jnp.iinfo(jnp.int32).min)
    mcid = jnp.where((mcid >= 0) & (mt >= final_tmin), mcid, -1)
    # members of dead slots are expired or reassigned by construction; clear
    # the expired ones above, then drop any residue pointing at dead slots
    mcid = jnp.where((mcid >= 0) & ~alive[jnp.clip(mcid, 0, c - 1)], -1, mcid)
    return AEState(
        t0=t0, has_t0=state.has_t0 | has_any, tbuf=tbuf, thead=thead,
        mx=mx, my=my, mt=mt, mp=mp, mcid=mcid,
        alive=alive, corder=corder, cid=cid, mu=mu,
        next_order=next_order, next_cid=next_cid, event_id=event_id,
        last_updated=last_updated, overflow=overflow)


@functools.partial(jax.jit, static_argnames=("cfg",))
def update_slice(state: AEState, x, y, t, p, valid,
                 cfg: ClusterConfig = ClusterConfig()) -> AEState:
    """scan the per-event update over one slice (masked lanes are no-ops).

    Bit-equal to scanning `update_event`, restructured for TPU scan-step
    cost (~5.4x measured, BASELINE.md):
      - the sliding-window tMin of every event depends only on push TIMES,
        never on cluster state, so it is precomputed for the whole slice
        OUTSIDE the scan (deque ops leave the loop; tbuf updates collapse to
        one slice-end scatter);
      - forget is LAZY: a member is live iff mt >= tMin. tMin is monotone,
        so expired members never resurrect; explicit per-event ring rewrites
        (and the dead-cluster member sweep) are redundant — a dead slot's
        members are always either expired or merge-reassigned to the
        surviving target;
      - per-cluster stats ride an (M, C) equality panel (VPU compare+reduce)
        instead of scatter reductions (scatters are the slow primitive on
        this backend, CLAUDE.md rule 5);
      - invalid lanes gate each write instead of a whole-state `where`.

    See update_slice_blocked for the K-events-per-step throughput variant
    (bit-equal; this per-event form is kept as its oracle).
    """
    x, y, tr, p, t0, has_any, tmin, tbuf, thead = _slice_prep(
        state, x, y, t, p, valid, cfg)

    def step(st, ev):
        return _event_body(st, ev, cfg), None

    carry, _ = jax.lax.scan(step, _carry0(state), (x, y, tr, p, valid, tmin))
    return _finalize(state, carry, t0, has_any, tmin, tbuf, thead, valid, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "block"))
def update_slice_blocked(state: AEState, x, y, t, p, valid,
                         cfg: ClusterConfig = ClusterConfig(),
                         block: int = 16) -> AEState:
    """Bit-equal to update_slice, K events per scan step (r3 throughput form).

    The per-event scan's cost is its chain of tiny (C,)-shaped ops — one XLA
    op dispatch per op per event. This variant processes `block` events per
    step through a VECTORIZED fast path and falls back to the exact per-event
    body only when the block is "hazardous". The fast path is provably equal
    to running _event_body K times whenever, against the exactly-simulated
    evolving state, every valid event in the block

      (a) matches exactly ONE cluster (no creations, no merges), and
      (b) no alive cluster's pre-block live membership can reach zero within
          the block (so no empty-removals, and live == alive throughout —
          in-block adds only grow counts and added members cannot expire
          within the slice because event times are monotone and tMin <= t).

    Proof sketch: the simulation matches each event against the means ALREADY
    updated by the block's earlier events, so by induction (no creations/
    merges/removals up to the first hazard, live == alive under (b)) the
    simulated match sets, means, and targets equal the exact execution's up
    to and including the first hazardous event — hazards are therefore
    detected on correct state, and a hazard-free block IS the exact
    execution. The EWMA update (1-α)·mu + α·pix uses the same elementwise
    float ops as the per-event body (bit-identical); ring appends land in
    the same slots; alive/corder/cid/counters are untouched. Hazardous
    blocks replay the exact per-event body from the block-start carry via
    fori_loop. The equality is regression-tested against update_slice on
    merge/creation/removal-heavy streams (tests/test_aeclustering.py).

    Requires kappa == 0 (the deployed default — the apps never enable the
    sampling branch, AEClustering.cpp:14); falls back to update_slice
    otherwise.
    """
    if cfg.kappa != 0:
        return update_slice(state, x, y, t, p, valid, cfg)
    c = cfg.max_clusters
    m = cfg.max_members
    alpha = cfg.alpha
    n = x.shape[0]
    k = block
    pad = (-n) % k
    if pad:
        zi = jnp.zeros((pad,), jnp.int32)
        x = jnp.concatenate([x.astype(jnp.int32), zi])
        y = jnp.concatenate([y.astype(jnp.int32), zi])
        t = jnp.concatenate([t.astype(jnp.int32), zi])
        p = jnp.concatenate([p.astype(jnp.int32), zi])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    x, y, tr, p, t0, has_any, tmin, tbuf, thead = _slice_prep(
        state, x, y, t, p, valid, cfg)
    nb = (n + pad) // k
    blk = lambda a: a.reshape(nb, k)

    def fallback(args):
        carry, (xb, yb, tb, pb, vb, tm) = args

        def body(i, st):
            return _event_body(st, (xb[i], yb[i], tb[i], pb[i], vb[i], tm[i]),
                               cfg)

        return jax.lax.fori_loop(0, k, body, carry)

    def step(carry, ev):
        xb, yb, tb, pb, vb, tm = ev
        (alive, corder, cid, mu0, ring,
         next_order, next_cid, event_id, last_updated, overflow) = carry

        pix = jnp.stack([xb, yb], axis=1).astype(jnp.float32)     # (K, 2)

        # --- simulate the K EWMA updates, matching each event against the
        # means already updated by the block's earlier events (bit-identical
        # elementwise formula; see docstring proof sketch)
        mu = mu0
        matches = []
        for i in range(k):
            d = jnp.abs(pix[i, 0] - mu[:, 0]) + jnp.abs(pix[i, 1] - mu[:, 1])
            near = alive & (d <= cfg.radius) & vb[i]
            matches.append(near)
            upd = (1.0 - alpha) * mu + alpha * pix[i][None, :]
            mu = jnp.where(near[:, None], upd, mu)
        near0 = jnp.stack(matches)                                 # (K, C)

        # --- hazards
        cnt = jnp.sum(near0.astype(jnp.int32), axis=1)             # (K,)
        hz_assign = jnp.any(vb & (cnt != 1))
        live_last = (ring[4] >= 0) & (ring[2] >= tm[-1])
        n_last = jnp.sum((ring[4][:, None] == jnp.arange(c)[None, :])
                         & live_last[:, None], axis=0)
        hz_empty = jnp.any(alive & (n_last == 0))
        hazard = hz_assign | hz_empty

        # --- commit the fast path (targets = the single match per event)
        target = jnp.argmax(near0, axis=1).astype(jnp.int32)       # (K,)
        prefix = jnp.cumsum(vb.astype(jnp.int32)) - 1
        n_valid = jnp.sum(vb.astype(jnp.int32))
        slots = jnp.where(vb, (event_id + prefix) % m, m)
        cols = jnp.stack([xb, yb, tb, pb, target])                 # (5, K)
        ring_f = ring.at[:, slots].set(cols, mode="drop")
        has_v = jnp.any(vb)
        idx_last = k - 1 - jnp.argmax(jnp.flip(vb)).astype(jnp.int32)
        lu_f = jnp.where(has_v, target[idx_last], last_updated)
        fast = (alive, corder, cid, mu, ring_f, next_order, next_cid,
                event_id + n_valid, lu_f, overflow)

        # lax.cond is a real branch on TPU (CLAUDE.md): the expensive exact
        # replay runs only for hazardous blocks
        out = jax.lax.cond(hazard, fallback, lambda _: fast, (carry, ev))
        return out, None

    carry, _ = jax.lax.scan(step, _carry0(state),
                            (blk(x), blk(y), blk(tr), blk(p),
                             blk(valid), blk(tmin)))
    return _finalize(state, carry, t0, has_any, tmin, tbuf, thead,
                     valid, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def membership_digest(state: AEState,
                      cfg: ClusterConfig = ClusterConfig()) -> jnp.ndarray:
    """Order-independent per-cluster member-set fingerprint: the wrapping
    int32 sum of a per-member mix of (x, y, t). Two states whose digests AND
    counts agree per cluster hold the same member multisets with overwhelming
    probability — used by the distributed-exact equivalence tests to compare
    memberships without shipping the member ring."""
    c = cfg.max_clusters
    ids = jnp.where(state.mcid >= 0, state.mcid, c)
    mix = (state.mx * np.int32(131071) + state.my * np.int32(8191)
           + state.mt * np.int32(31) + np.int32(1))
    return jax.ops.segment_sum(jnp.where(state.mcid >= 0, mix, 0), ids,
                               num_segments=c + 1)[:c]


class ClusterView(NamedTuple):
    """Snapshot of live clusters (fixed shape, masked)."""
    alive: jnp.ndarray      # bool (C,)
    cid: jnp.ndarray        # int32 (C,)
    order: jnp.ndarray      # int32 (C,) deque order key
    n: jnp.ndarray          # int32 (C,)
    mu: jnp.ndarray         # float32 (C, 2) EWMA mean
    centroid: jnp.ndarray   # float32 (C, 2) arithmetic mean of live members


@functools.partial(jax.jit, static_argnames=("cfg",))
def snapshot(state: AEState, cfg: ClusterConfig = ClusterConfig()) -> ClusterView:
    c = cfg.max_clusters
    ids = jnp.where(state.mcid >= 0, state.mcid, c)
    ones = (state.mcid >= 0).astype(jnp.int32)
    n_c = jax.ops.segment_sum(ones, ids, num_segments=c + 1)[:c]
    sx = jax.ops.segment_sum(jnp.where(state.mcid >= 0, state.mx, 0).astype(jnp.float32),
                             ids, num_segments=c + 1)[:c]
    sy = jax.ops.segment_sum(jnp.where(state.mcid >= 0, state.my, 0).astype(jnp.float32),
                             ids, num_segments=c + 1)[:c]
    denom = jnp.maximum(n_c, 1).astype(jnp.float32)
    centroid = jnp.stack([sx / denom, sy / denom], axis=1)
    return ClusterView(alive=state.alive, cid=state.cid, order=state.corder,
                       n=n_c, mu=state.mu, centroid=centroid)
