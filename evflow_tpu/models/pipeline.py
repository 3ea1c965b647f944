"""End-to-end pipelines — the engine's "model families".

One engine replaces the reference's eight app monoliths (SURVEY §2.1):

  ClusterFlowPipeline  = app E (flagship): 50 ms slices → hash-grid dedup →
    incremental clustering → per-cluster centroid flow arrows
    (event-cam-clustering-accel/event-cam-clustering-downsampling-accel/
     metavision_sdk_get_started5_opencl_store.cpp:370-568)
    Also covers app H (event-cam-tracking-with-estimator: 1/512 decimation +
    AEClustering + ×3-extrapolated arrows) via config.

  CornerTrackPipeline  = app G: SAE time surface → eFAST corners → NMS →
    CornerTracker with groups
    (event-cam-tracking/event-cam-fast-corner-tracker/
     metavision_time_surface_periodic_group_track.cpp:741-1102)

Each pipeline is a jitted fixed-shape per-slice step plus a host driver that
iterates recorded slices. `ClusterFlowPipeline(cfg, mode="fast")` uses the
slice-vectorized clustering (models/fastcluster.py); `mode="exact"` runs the
bit-parity per-event engine (models/aeclustering.py, via
cluster_flow_step_exact) with the same ClusterFlowOutput surface — flow is
the reported-centroid delta per persistent cid × cfg.flow.extrapolation,
exactly the fast path's semantics. CLI: `cluster-flow --exact
[--fabricated-ts]` (run.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, DEFAULT
from ..io.events import EventStream
from ..io.slicing import EventSlices, slice_by_count, slice_by_time
from ..ops import hash_dedup, sae as sae_ops, efast, nms as nms_ops
from . import aeclustering, fastcluster, tracker as tracker_mod


# --------------------------------------------------------------------------
# Flagship: dedup → cluster → centroid flow (app E / H)
# --------------------------------------------------------------------------

class ClusterFlowOutput(NamedTuple):
    unique_count: jnp.ndarray    # int32 ()
    repeated_count: jnp.ndarray  # int32 ()
    reported: jnp.ndarray        # bool (C,)
    cid: jnp.ndarray             # int32 (C,)
    n: jnp.ndarray               # int32 (C,)
    centroid: jnp.ndarray        # float32 (C, 2)
    flow: jnp.ndarray            # float32 (C, 2) extrapolated displacement


@functools.partial(jax.jit, static_argnames=("cfg",))
def cluster_flow_step(
    state: fastcluster.FastState,
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: EngineConfig = DEFAULT,
) -> Tuple[fastcluster.FastState, ClusterFlowOutput]:
    """One slice of the flagship pipeline (fast mode).

    Dedup is compaction-free here: fastcluster masks lanes anyway, so the
    original (x, y) arrays flow straight through with the first-occupant mask
    as validity (out.labels is therefore indexed by input event, not by
    compacted unique position)."""
    ded = hash_dedup.dedup_mask(x, y, valid, cfg.dedup, cfg.sensor)
    uvalid = ded.unique_mask
    if cfg.dedup.compat_stride2:
        # reference consumes every 2nd unique coordinate (stride 4 over the
        # interleaved array, accel …store.cpp:435-445)
        upos = jnp.cumsum(uvalid.astype(jnp.int32)) - 1
        uvalid = uvalid & (upos % 2 == 0)
    state, out = fastcluster.update_slice(
        state, x, y, uvalid, cfg.cluster, cfg.sensor)
    flow = out.flow * cfg.flow.extrapolation
    return state, ClusterFlowOutput(
        unique_count=ded.unique_count, repeated_count=ded.repeated_count,
        reported=out.reported, cid=out.cid, n=out.n,
        centroid=out.centroid, flow=flow)


@dataclasses.dataclass
class ClusterFlowPipeline:
    cfg: EngineConfig = DEFAULT
    mode: str = "fast"   # "fast" | "exact" (bit-parity per-event engine)

    def init_state(self):
        if self.mode == "exact":
            c = self.cfg.cluster.max_clusters
            # (engine, cum_unique, per-lane flow memory) — prev_cid/prev_cent
            # mirror fastcluster's has_prev/centroid_prev so flow (like
            # everything else) survives a checkpoint/resume split
            # bit-identically. Keyed by cid, not lane occupancy: the exact
            # engine churns lanes within a slice (satellites die + spawn),
            # so a reused lane must not inherit the old occupant's centroid.
            return (aeclustering.init_state(self.cfg.cluster), jnp.int32(0),
                    jnp.full((c,), -1, jnp.int32),
                    jnp.zeros((c, 2), jnp.float32))
        return fastcluster.init_state(self.cfg.cluster)

    def run(self, stream: EventStream, state=None,
            t0: Optional[int] = None) -> List[ClusterFlowOutput]:
        """Iterate recorded slices. `state` resumes from a checkpoint
        (utils/checkpoint.py); `self.final_state` afterwards is the state to
        checkpoint — a stream split across a save/restore boundary produces
        bit-identical outputs to an unbroken run (tests/test_checkpoint.py).
        In exact mode `t0` rebases the engine clock (persist it in checkpoint
        meta, as the corner pipeline does); ignored with compat_fabricated_ts.
        """
        cfg = self.cfg
        if cfg.slicing.mode == "n_us":
            slices = slice_by_time(stream, cfg.slicing.n_us, cfg.slicing.n_events)
        else:
            slices = slice_by_count(stream, cfg.slicing.n_events)
        if state is None:
            state = self.init_state()
        if self.mode == "exact":
            return self._run_exact(slices, state, stream, t0)
        outs = []
        mask = slices.valid_mask()
        for s in range(slices.num_slices):
            state, out = cluster_flow_step(
                state, jnp.asarray(slices.x[s]), jnp.asarray(slices.y[s]),
                jnp.asarray(mask[s]), cfg)
            outs.append(jax.device_get(out))
        self.final_state = state
        return outs

    def _run_exact(self, slices: EventSlices, state, stream: EventStream,
                   t0: Optional[int]) -> List[ClusterFlowOutput]:
        """Exact-mode driver: one device-resident lax.scan over all slices
        (cluster_flow_scan_exact) with the fast path's output surface;
        per-slice outputs come back in a single transfer. flow =
        reported-centroid delta per persistent cid × cfg.flow.extrapolation
        (0 on a cluster's first report) — the same semantics
        fastcluster.update_slice computes on-device (accel …store.cpp:500-545
        arrow construction). r4: previously a per-slice host loop with a
        device_get each slice — a ~28 ms/slice relay floor that dwarfed the
        Pallas engine's ~8 ms slices."""
        cfg = self.cfg
        if t0 is None:
            t0 = int(stream.t[0]) if len(stream) else 0
        self.t0 = t0
        if slices.num_slices == 0:
            self.final_state = state
            return []
        mask = slices.valid_mask()
        ts_rel = (slices.t.astype(np.int64) - t0).astype(np.int32)
        final, outs = cluster_flow_scan_exact(
            jax.tree.map(jnp.asarray, state),
            jnp.asarray(slices.x), jnp.asarray(slices.y),
            jnp.asarray(ts_rel), jnp.asarray(mask), cfg)
        self.final_state = final
        outs = jax.device_get(outs)
        return [ClusterFlowOutput(*[np.asarray(leaf[s]) for leaf in outs])
                for s in range(slices.num_slices)]


@functools.partial(jax.jit, static_argnames=("cfg",))
def cluster_flow_scan(state, xs, ys, valids, cfg: EngineConfig = DEFAULT):
    """lax.scan over all slices at once — the benchmark entry (keeps the whole
    sequence on-device; one dispatch)."""
    def step(st, ev):
        x, y, v = ev
        return cluster_flow_step(st, x, y, v, cfg)

    return jax.lax.scan(step, state, (xs, ys, valids))


# --------------------------------------------------------------------------
# Exact-mode flagship (bit-parity path, app E semantics per event)
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg",))
def cluster_flow_step_exact(
    state: aeclustering.AEState,
    x: jnp.ndarray, y: jnp.ndarray, t: jnp.ndarray, valid: jnp.ndarray,
    cfg: EngineConfig = DEFAULT,
    cum_unique: jnp.ndarray | None = None,
) -> Tuple[aeclustering.AEState, aeclustering.ClusterView, jnp.ndarray]:
    """Bit-parity per-event path. Returns (state, view, new_cum_unique).

    By default real slice times feed the engine's sliding window. With
    cfg.dedup.compat_fabricated_ts the reference's quirk is reproduced: every
    consumed coordinate gets t = cumulative_unique_count/1000.0 (the running
    total AFTER this slice's kernel, constant during consumption — accel
    …store.cpp:439), so the szBuffer window expires by unique kilo-coords.
    """
    ded = hash_dedup.dedup(x, y, valid, cfg.dedup, cfg.sensor)
    ux, uy = ded.unique_x, ded.unique_y
    # hash-mode dedup yields at most num_buckets uniques — the compacted
    # arrays beyond that are structurally dead lanes; cap the scan length
    # (r3: halves the per-event work for 16384-event slices at 8192 buckets)
    if not cfg.dedup.exact and cfg.dedup.num_buckets < x.shape[0]:
        ux = ux[:cfg.dedup.num_buckets]
        uy = uy[:cfg.dedup.num_buckets]
    lane = jnp.arange(ux.shape[0])
    uvalid = lane < ded.unique_count
    if cum_unique is None:
        cum_unique = jnp.int32(0)
    new_cum = cum_unique + ded.unique_count
    if cfg.dedup.compat_fabricated_ts:
        # engine times are int32; the reference's double uniqueCount/1000.0
        # is monotone in uniqueCount (ties included), so the raw count is an
        # EXACT equivalent clock: the szBuffer window is count-based (a deque
        # of the last szBuffer clock values, AEClustering.cpp:132-140) and
        # forget() only ever compares clock values to each other — no
        # absolute time spans exist anywhere, so the 1000x scale is inert
        tt = jnp.where(uvalid, new_cum, 0)
    else:
        tt = jnp.where(uvalid, jnp.max(jnp.where(valid, t, 0)), 0)
    if cfg.cluster.exact_block:
        state = aeclustering.update_slice_blocked(
            state, ux, uy, tt, jnp.zeros_like(ux), uvalid, cfg.cluster,
            cfg.cluster.exact_block)
    elif (cfg.cluster.exact_pallas and cfg.cluster.kappa == 0
          and (jax.default_backend() == "tpu"
               or cfg.cluster.exact_pallas_interpret)):
        # r4: single-Mosaic-program engine — 13x the per-event scan
        # (bit-equal on every state field; models/aeclustering_pallas.py).
        # r5: exact_pallas_interpret runs the same program via Mosaic
        # interpret mode off-TPU, so mesh-context tests (temporal windows on
        # the virtual CPU mesh) exercise the Pallas path itself.
        from . import aeclustering_pallas
        state = aeclustering_pallas.update_slice_pallas(
            state, ux, uy, tt, jnp.zeros_like(ux), uvalid, cfg.cluster,
            interpret=(jax.default_backend() != "tpu"))
    else:
        state = aeclustering.update_slice(
            state, ux, uy, tt, jnp.zeros_like(ux), uvalid, cfg.cluster)
    return state, aeclustering.snapshot(state, cfg.cluster), new_cum


@functools.partial(jax.jit, static_argnames=("cfg",))
def cluster_flow_scan_exact(state, xs, ys, ts, valids,
                            cfg: EngineConfig = DEFAULT):
    """Exact-mode whole-sequence scan: cluster_flow_step_exact per slice plus
    the cid-keyed per-lane flow memory carried ON DEVICE (the elementwise
    fp32 ops are the ones the old host loop ran in numpy — bit-identical,
    and the checkpoint/resume split stays bit-exact because the memory rides
    the same state tuple). Returns (final_state, stacked ClusterFlowOutput).

    Flow semantics (fastcluster.update_slice step 6 / accel …store.cpp:
    500-545): a flow is reported only when the SAME cluster (same cid on the
    lane) was reported before — the exact engine reuses lanes within a
    slice, so occupancy alone would pair a new cluster with a dead
    occupant's centroid (observed: ~600 px bogus arrows)."""
    min_n = cfg.cluster.min_n
    extrap = cfg.flow.extrapolation

    def step(carry, ev):
        ae_state, cum, prev_cid, prev_cent = carry
        x, y, t, v = ev
        ae_state, view, new_cum = cluster_flow_step_exact(
            ae_state, x, y, t, v, cfg, cum)
        uniq = new_cum - cum
        n_valid = jnp.sum(v.astype(jnp.int32))
        alive = view.alive
        reported = alive & (view.n >= min_n)
        cent = view.centroid
        cids = view.cid
        same = reported & (prev_cid == cids) & (prev_cid >= 0)
        flow = jnp.where(same[:, None], (cent - prev_cent) * extrap, 0.0)
        prev_cent = jnp.where(reported[:, None], cent, prev_cent)
        prev_cid = jnp.where(reported, cids,
                             jnp.where(alive, prev_cid, -1)).astype(jnp.int32)
        out = ClusterFlowOutput(
            unique_count=uniq, repeated_count=n_valid - uniq,
            reported=reported, cid=cids, n=view.n,
            centroid=cent, flow=flow.astype(jnp.float32))
        return (ae_state, new_cum, prev_cid, prev_cent), out

    return jax.lax.scan(step, state, (xs, ys, ts, valids))


# --------------------------------------------------------------------------
# Corner tracking: SAE → eFAST → NMS → tracker (app G)
# --------------------------------------------------------------------------

class CornerTrackState(NamedTuple):
    sae: jnp.ndarray
    tracks: tracker_mod.TrackState
    slice_idx: jnp.ndarray   # int32 () — detection starts after first slice


class CornerTrackOutput(NamedTuple):
    num_corners: jnp.ndarray     # int32 () raw eFAST detections
    num_filtered: jnp.ndarray    # int32 () after NMS
    track_active: jnp.ndarray    # bool (T,)
    track_label: jnp.ndarray     # int32 (T,)
    track_pos: jnp.ndarray       # float32 (T, 2)
    track_vel: jnp.ndarray       # float32 (T, 2)
    track_group: jnp.ndarray     # int32 (T,)
    groups: tracker_mod.GroupView
    # Overflow signal: representative pixels beyond cfg.efast.max_candidates
    # are dropped in stream order; nonzero here means the slice-sync detector
    # skipped that many touched pixels this slice (never silent truncation).
    num_dropped: jnp.ndarray = np.int32(0)  # int32 () (np: module-level jnp
    #                                         would init the backend at import)
    # Renderer-parity fields (group_track.cpp:592,615-617): corners are drawn
    # only at frame_count >= 3 and "(Gk)" is appended only on frames with a
    # fresh detection (frames_since_last_detection == 0). Scalar -1 = not
    # populated (tiled path), renderer falls back to unconditional drawing.
    track_frames_since: jnp.ndarray = np.int32(-1)  # int32 (T,) or scalar -1
    track_frame_count: jnp.ndarray = np.int32(-1)   # int32 (T,) or scalar -1


def init_corner_state(cfg: EngineConfig = DEFAULT) -> CornerTrackState:
    return CornerTrackState(
        sae=sae_ops.init_sae(cfg.sensor),
        tracks=tracker_mod.init_state(cfg.tracker),
        slice_idx=jnp.int32(0),
    )


def _corners_to_tracks(corner_mask, x, y, state: CornerTrackState, new_sae,
                       cfg: EngineConfig, n_dropped=np.int32(0)):
    """Shared tail of the corner pipeline: compact the detected corners in
    stream order to the NMS capacity, suppress, and advance the tracker."""
    n_corners = jnp.sum(corner_mask.astype(jnp.int32))
    cap = cfg.nms.max_corners
    # stream-order compaction via one (key, x, y) sort + static slice
    # (replaces cumsum + two drop-scatters; see _representative_candidates)
    nlanes = corner_mask.shape[0]
    ckey = jnp.where(corner_mask,
                     jnp.arange(nlanes, dtype=jnp.int32), jnp.int32(nlanes))
    _, sx_, sy_ = jax.lax.sort((ckey, x, y), num_keys=1)
    if cap > nlanes:               # capacity beyond the lane count: pad
        sx_ = jnp.pad(sx_, (0, cap - nlanes))
        sy_ = jnp.pad(sy_, (0, cap - nlanes))
    cvalid = jnp.arange(cap) < jnp.minimum(n_corners, cap)
    cx = jnp.where(cvalid, sx_[:cap], 0)
    cy = jnp.where(cvalid, sy_[:cap], 0)

    # r4b: accept-mask-only NMS — the tracker takes the accepted CANDIDATE
    # lanes directly (association/spawn/grouping depend on the mask and on
    # stream order, both preserved), skipping the NMS output compaction
    # (cumsum + two scatters per slice). Equivalent to the filter_corners +
    # prefix-det form (tests/test_ate.py chains are unchanged).
    accepted, n_filtered = nms_ops.accept_corners(cx, cy, cvalid, cfg.nms)

    tracks, groups = tracker_mod.update(
        state.tracks, cx.astype(jnp.float32), cy.astype(jnp.float32),
        accepted, cfg.tracker)

    out = CornerTrackOutput(
        num_corners=n_corners, num_filtered=n_filtered,
        track_active=tracks.active, track_label=tracks.label,
        track_pos=tracks.pos, track_vel=tracks.velocity,
        track_group=tracks.group_id, groups=groups,
        num_dropped=jnp.int32(n_dropped),
        track_frames_since=tracks.frames_since,
        track_frame_count=tracks.frame_count)
    return CornerTrackState(sae=new_sae, tracks=tracks,
                            slice_idx=state.slice_idx + 1), out


def _representative_candidates(new_sae, x, y, t, valid, m,
                               cfg: EngineConfig):
    """Compact one representative lane per touched pixel (the pixel's newest
    event) to m candidate lanes. Returns (cx, cy, cvalid, n_dropped).

    r4b: the representative is the pixel's LAST event in stream order,
    found by one (pixel-id, reversed-lane) sort — run starts of the sorted
    keys are the last occupants. This replaces the r2-r4 `sae[y,x] == t`
    form: a 16k-coordinate gather costs ~0.14 ms/slice on this backend
    (~9 ns/element descriptor rate) vs ~0.01 for the sort, and it needed an
    adjacent-duplicate heuristic for equal-timestamp lanes — the sort gives
    exactly ONE representative per pixel by construction. Timestamps are
    nondecreasing in stream order, so the last event carries the pixel's
    newest timestamp (= the sae value after the scatter-max). For pixels
    whose newest timestamp appears on several non-adjacent lanes the old
    form kept each (minus adjacent dups) and this form keeps one — post-NMS
    output is unchanged (same-pixel duplicates lose at distance 0); only
    the candidate stream ORDER between distinct pixels can shift in that
    equal-timestamp corner, the same documented order-deviation class as
    corner_track_step's note above."""
    n = x.shape[0]
    w1 = cfg.sensor.width + 1
    pixkey = jnp.where(valid, y * w1 + x, jnp.int32(w1 * (cfg.sensor.height + 1)))
    lane = jnp.arange(n, dtype=jnp.int32)
    # x, y ride the first sort as payloads so the second (stream-order
    # compaction) sort can run entirely in sorted space — two sorts, zero
    # scatters (sorts ~0.01 ms at 16k lanes vs ~0.1 per scatter, r4b)
    skey, srev, sx0, sy0 = jax.lax.sort(
        (pixkey, (n - 1) - lane, x, y), num_keys=2)
    first = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]]) \
        & (skey < w1 * (cfg.sensor.height + 1))
    n_rep = jnp.sum(first.astype(jnp.int32))
    ckey = jnp.where(first, (n - 1) - srev, jnp.int32(n))
    _, sx, sy = jax.lax.sort((ckey, sx0, sy0), num_keys=1)
    if m > n:                      # capacity beyond the lane count: pad
        sx = jnp.pad(sx, (0, m - n))
        sy = jnp.pad(sy, (0, m - n))
    cvalid = jnp.arange(m) < jnp.minimum(n_rep, m)
    cx = jnp.where(cvalid, sx[:m], 0)
    cy = jnp.where(cvalid, sy[:m], 0)
    return cx, cy, cvalid, jnp.maximum(n_rep - m, 0)


@functools.partial(jax.jit, static_argnames=("cfg",))
def corner_track_step(
    state: CornerTrackState,
    x: jnp.ndarray, y: jnp.ndarray, t: jnp.ndarray, valid: jnp.ndarray,
    cfg: EngineConfig = DEFAULT,
) -> Tuple[CornerTrackState, CornerTrackOutput]:
    """One 16384-event slice of the corner pipeline.

    Reference order (group_track.cpp:884-1070): per event, update SAE then run
    eFAST against the *current* surface. Slice-vectorized approximation:
    scatter the whole slice into the SAE first, then detect on all slice
    events (each event sees the full slice's surface instead of the prefix —
    strictly more context; detection still keyed to this slice's events).
    Detection is skipped for the first slice (time_surface_flag, :926).
    The approximation is quantified against the per-event-exact mode in
    tests/test_event_exact.py (corner_track_step_event_exact below).

    Candidate reduction (cfg.efast.max_candidates): the slice-sync surface
    gives every event of a pixel the same detection result, so eFAST runs
    once per touched pixel — the pixel's NEWEST event (sae[y,x] == t after
    the scatter-max) represents it, compacted to a fixed lane count. The
    post-NMS corner set is unchanged (same-pixel duplicates lose to their
    first copy at distance 0); only the candidate ORDER can shift for
    distinct corner pixels within one NMS box (newest- vs first-occurrence
    stream position), and overflow beyond the cap drops candidates in
    stream order.
    """
    m = cfg.efast.max_candidates
    q = cfg.efast.micro_slices
    if q > 1 and x.shape[0] % q == 0 and m:
        # Micro-slice mode (r3, VERDICT item 3): split the slice into q
        # sub-scatters with detection per sub-slice — each event's detection
        # sees at most one sub-slice of "future" writes instead of the whole
        # slice, shrinking the slice-sync approximation window q-fold at the
        # cost of q sequential SAE scatters + detections. Fidelity/throughput
        # curve: benchmarks/corner_fidelity.py.
        nsub = x.shape[0] // q
        m_sub = max(m // q, 64)

        if cfg.efast.micro_stack and not cfg.efast.micro_dense:
            # r5 (VERDICT r4 task #2): snapshot-STACK micro-slices. The q
            # post-sub-slice surfaces come from ONE (q, H, W) scatter-max
            # keyed by (sub, y, x) plus a cummax over the sub axis — the
            # r3-r4 path's q SERIALLY-DEPENDENT scatter dispatches (8 x
            # ~0.13 ms was the entire q=8 overhead, CLAUDE r4b) collapse
            # into one scatter and one O(q·H·W) max chain with no
            # dispatch-to-dispatch dependency. Candidate selection is the
            # same two-sort representative compaction vmapped over subs;
            # detection is the bit-identical stacked detector (one gather +
            # one streak chain for all q·m_sub candidates — r4's negative
            # result for it came from materializing snapshots through the
            # serial scan, which no longer exists). Bit-equal to the serial
            # micro path (tests/test_event_exact.py::test_micro_stack_*).
            h, w = state.sae.shape
            xr = x.reshape(q, nsub)
            yr = y.reshape(q, nsub)
            tr = t.reshape(q, nsub)
            vr = valid.reshape(q, nsub)
            sub_ids = jnp.broadcast_to(
                jnp.arange(q, dtype=jnp.int32)[:, None], (q, nsub))
            tval = jnp.where(vr, tr.astype(state.sae.dtype),
                             jnp.iinfo(state.sae.dtype).min)
            planes = jnp.zeros((q, h, w), state.sae.dtype).at[
                jnp.where(vr, sub_ids, q), yr, xr].max(tval, mode="drop")
            stack = jnp.maximum(
                jax.lax.associative_scan(jnp.maximum, planes, axis=0),
                state.sae[None])
            new_sae = stack[q - 1]
            cxs, cys, cvs, drops = jax.vmap(
                lambda sx, sy, st_, sv: _representative_candidates(
                    None, sx, sy, st_, sv, m_sub, cfg))(xr, yr, tr, vr)
            # per-plane detection, statically unrolled: the q detections are
            # INDEPENDENT (unlike the serial path's carry chain) and each
            # gathers against its own (H, W) plane — the batched stacked
            # detector's single gather against the (q·H, W) tall image
            # measured ~1.4 ms/slice slower at q=8 (r5 bench: 16.9x vs the
            # serial path's 23.4x; same lesson as r1's multi-dim patch
            # gathers — gather cost grows with target footprint)
            masks = jnp.stack([
                efast.detect_corners(stack[kq], cxs[kq], cys[kq], cvs[kq],
                                     cfg.efast, cfg.sensor)
                for kq in range(q)])
            corner_mask = masks.reshape(-1) & (state.slice_idx > 0)
            return _corners_to_tracks(corner_mask, cxs.reshape(-1),
                                      cys.reshape(-1), state, new_sae, cfg,
                                      n_dropped=jnp.sum(drops))

        if cfg.efast.micro_dense:
            # opt-in (r4, measured loss — see EFastConfig.micro_dense):
            # per-sub-slice band-predicated dense stencil
            def sub(sae, ev):
                sx, sy, st_, sv = ev
                sae = sae_ops.update_sae(sae, sx, sy, st_, sv)
                scx, scy, scv, sdrop = _representative_candidates(
                    sae, sx, sy, st_, sv, m_sub, cfg)
                mask = efast.detect_corners_dense(sae, sy, sv, scx, scy,
                                                  scv, cfg.efast, cfg.sensor,
                                                  ev_x=sx)
                return sae, (scx, scy, mask, sdrop)

            new_sae, (cxs, cys, masks, drops) = jax.lax.scan(
                sub, state.sae,
                (x.reshape(q, nsub), y.reshape(q, nsub),
                 t.reshape(q, nsub), valid.reshape(q, nsub)))
            corner_mask = masks.reshape(-1) & (state.slice_idx > 0)
            return _corners_to_tracks(corner_mask, cxs.reshape(-1),
                                      cys.reshape(-1), state, new_sae, cfg,
                                      n_dropped=jnp.sum(drops))

        # default q>1 path: per-sub ring-gather detection inside the scan.
        # Two r4 alternatives MEASURED SLOWER at q=8 on TPU (1): per-sub
        # band-predicated dense stencil 3.68 ms/slice — sub-slices touch
        # nearly the SAME bands, so q sparse passes cost ~q full passes;
        # (2) snapshot-stacked single batched detection
        # (efast.detect_corners_stacked, bit-identical, kept with its test)
        # 3.83 ms — materializing q SAE snapshots through the scan costs
        # more than the saved per-sub streak chains. This path: 3.17 ms.
        # The q-scaling cost is the SERIAL sub-scatter dependency chain —
        # irreducible without changing the fidelity semantics
        # (benchmarks/corner_fidelity.py r4 A/B).
        def sub(sae, ev):
            sx, sy, st_, sv = ev
            sae = sae_ops.update_sae(sae, sx, sy, st_, sv)
            scx, scy, scv, sdrop = _representative_candidates(
                sae, sx, sy, st_, sv, m_sub, cfg)
            mask = efast.detect_corners(sae, scx, scy, scv,
                                        cfg.efast, cfg.sensor)
            return sae, (scx, scy, mask, sdrop)

        new_sae, (cxs, cys, masks, drops) = jax.lax.scan(
            sub, state.sae,
            (x.reshape(q, nsub), y.reshape(q, nsub),
             t.reshape(q, nsub), valid.reshape(q, nsub)))
        corner_mask = masks.reshape(-1) & (state.slice_idx > 0)
        return _corners_to_tracks(corner_mask, cxs.reshape(-1),
                                  cys.reshape(-1), state, new_sae, cfg,
                                  n_dropped=jnp.sum(drops))
    new_sae = sae_ops.update_sae(state.sae, x, y, t, valid)
    if m and m < x.shape[0]:
        cx, cy, cvalid, n_dropped = _representative_candidates(
            new_sae, x, y, t, valid, m, cfg)
        if cfg.efast.dense_detect:
            # dense per-band stencil (Pallas on TPU): mask computed once for
            # the slice's touched bands, candidates look it up — replaces the
            # candidate-count-proportional ring gather (r3: 1.61 vs 2.02 ms).
            # r4b: the activity map is built from the COMPACTED candidates
            # (the representative pixels), not all events — detection only
            # consults candidate pixels, so their tiles are exactly the ones
            # that must be active, and the activity scatter-max runs over
            # m <= N/2 lanes
            corner_mask = efast.detect_corners_dense(
                new_sae, ev_y=cy, ev_valid=cvalid, x=cx, y=cy, valid=cvalid,
                cfg=cfg.efast, sensor=cfg.sensor, ev_x=cx)
        else:
            corner_mask = efast.detect_corners(new_sae, cx, cy, cvalid,
                                               cfg.efast, cfg.sensor)
        corner_mask = corner_mask & (state.slice_idx > 0)
        return _corners_to_tracks(corner_mask, cx, cy, state, new_sae, cfg,
                                  n_dropped=n_dropped)
    corner_mask = efast.detect_corners(new_sae, x, y, valid, cfg.efast, cfg.sensor)
    corner_mask = corner_mask & (state.slice_idx > 0)
    return _corners_to_tracks(corner_mask, x, y, state, new_sae, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def corner_track_step_event_exact(
    state: CornerTrackState,
    x: jnp.ndarray, y: jnp.ndarray, t: jnp.ndarray, valid: jnp.ndarray,
    cfg: EngineConfig = DEFAULT,
) -> Tuple[CornerTrackState, CornerTrackOutput]:
    """Per-event-EXACT corner path — the reference's true semantics
    (group_track.cpp:884-1070): for each event in stream order, write
    `sae.at(y, x) = t`, THEN run eFAST at (x, y) against the evolving
    surface. A lax.scan over events (same pattern as the exact AEClustering
    engine); latency-bound on TPU, intended for validation — the slice-sync
    step above is the throughput path.
    """
    new_sae, corner_mask = event_exact_corner_mask(
        state.sae, x, y, t, valid, state.slice_idx > 0, cfg)
    return _corners_to_tracks(corner_mask, x, y, state, new_sae, cfg)


def event_exact_corner_mask(sae, x, y, t, valid, armed,
                            cfg: EngineConfig = DEFAULT):
    """The event-exact detector core: scan events in stream order, write
    each into the SAE, detect at its pixel against the evolving surface.
    Returns (new_sae, (N,) corner mask)."""
    h, w = sae.shape
    cs = cfg.efast.border
    c3 = np.concatenate([efast.CIRCLE3, efast.CIRCLE4])
    dy = c3[:, 0].copy()
    dx = c3[:, 1].copy()
    if not cfg.efast.group_track_axis_order:
        dy, dx = dx, dy
    rows = jnp.asarray(dy + 4)
    cols = jnp.asarray(dx + 4)
    n3 = len(efast.CIRCLE3)

    def ev_step(sae, ev):
        xi, yi, ti, vi = ev
        # masked write: invalid events scatter out of bounds and are dropped
        sae = sae.at[jnp.where(vi, yi, h), xi].set(ti, mode="drop")
        in_b = vi & armed & (xi >= cs) & (xi < w - cs) & (yi >= cs) & (yi < h - cs)
        patch = jax.lax.dynamic_slice(sae, (yi - 4, xi - 4), (9, 9))
        ring = patch[rows, cols][None]                  # (1, 36)
        f3 = efast._streak_any(ring[:, :n3], cfg.efast.streak3_min,
                               cfg.efast.streak3_max)
        f4 = efast._streak_any(ring[:, n3:], cfg.efast.streak4_min,
                               cfg.efast.streak4_max)
        return sae, (in_b & f3[0] & f4[0])

    return jax.lax.scan(ev_step, sae, (x, y, t, valid))


@dataclasses.dataclass
class CornerTrackPipeline:
    cfg: EngineConfig = DEFAULT

    def run(self, stream: EventStream,
            state: Optional[CornerTrackState] = None,
            t0: Optional[int] = None) -> List[CornerTrackOutput]:
        """Iterate recorded slices. `state`/`t0` resume from a checkpoint (the
        SAE carries times rebased by t0, so the original stream's t0 must ride
        along — utils/checkpoint.py stores it as meta). `self.final_state` and
        `self.t0` afterwards are what to checkpoint."""
        cfg = self.cfg
        slices = slice_by_count(stream, cfg.slicing.n_events)
        # rebase times so int32 SAE never wraps
        if t0 is None:
            t0 = int(stream.t[0]) if len(stream) else 0
        if state is None:
            state = init_corner_state(cfg)
        outs = []
        mask = slices.valid_mask()
        for s in range(slices.num_slices):
            state, out = corner_track_step(
                state,
                jnp.asarray(slices.x[s]), jnp.asarray(slices.y[s]),
                jnp.asarray((slices.t[s] - t0).astype(np.int32)),
                jnp.asarray(mask[s]), cfg)
            outs.append(jax.device_get(out))
        self.final_state = state
        self.t0 = t0
        return outs


@functools.partial(jax.jit, static_argnames=("cfg",))
def corner_track_scan(state, xs, ys, ts, valids, cfg: EngineConfig = DEFAULT):
    def step(st, ev):
        x, y, t, v = ev
        return corner_track_step(st, x, y, t, v, cfg)

    return jax.lax.scan(step, state, (xs, ys, ts, valids))


@functools.partial(jax.jit, static_argnames=("cfg",))
def full_scan(cl_state, co_state, xs, ys, ts, valids,
              cfg: EngineConfig = DEFAULT):
    """Both pipelines (cluster+flow and SAE+corner+track) in ONE lax.scan —
    one dispatch for the whole sequence and one scan-step overhead per slice
    instead of two."""
    def step(st, ev):
        cl, co = st
        x, y, t, v = ev
        cl, cl_out = cluster_flow_step(cl, x, y, v, cfg)
        co, co_out = corner_track_step(co, x, y, t, v, cfg)
        return (cl, co), (cl_out, co_out)

    return jax.lax.scan(step, (cl_state, co_state), (xs, ys, ts, valids))
