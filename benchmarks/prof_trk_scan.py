import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.models import tracker as trk
from evflow_tpu.models.tracker import _predict, _calc_direction, _estimate_velocity, _push_history, _BIG, _F32MAX

cfg = DEFAULT.tracker
T = cfg.max_tracks
D = DEFAULT.nms.max_corners
S = 8
rng = np.random.default_rng(0)
# synthetic detection sequences: ~40 detections/slice drifting
det_x = np.zeros((S, D), np.float32); det_y = np.zeros((S, D), np.float32)
det_v = np.zeros((S, D), bool)
for s in range(S):
    k = 40
    det_x[s, :k] = rng.uniform(0, 1280, k); det_y[s, :k] = rng.uniform(0, 720, k)
    det_v[s, :k] = True
dx = jnp.asarray(det_x); dy = jnp.asarray(det_y); dv = jnp.asarray(det_v)

def bench(name, scan_fn):
    st = trk.init_state(cfg)
    t0 = time.perf_counter(); out = scan_fn(st, dx, dy, dv); jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); out = scan_fn(st, dx, dy, dv); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:24s} compile {comp:7.1f}s  {best/S*1e3:7.3f} ms/slice", flush=True)

def make_scan(mode):
    def step_fn(state, ev):
        x, y, v = ev
        t = T; d = D
        det = jnp.stack([x, y], axis=1)
        predicted = _predict(state, cfg)
        eligible = state.active & (state.frames_since <= cfg.frames_to_skip)
        dist_td = jnp.linalg.norm(predicted[:, None, :] - det[None, :, :], axis=2)
        seqv = jnp.where(eligible, state.seq, _BIG)
        def assoc_round(st_):
            match_idx, det_taken, _ = st_
            open_t = eligible & (match_idx < 0)
            dmask = jnp.where((v & ~det_taken)[None, :], dist_td, _F32MAX)
            best = jnp.argmin(dmask, axis=1).astype(jnp.int32)
            best_dist = jnp.min(dmask, axis=1)
            propose = open_t & (best_dist < cfg.max_distance)
            pseq = jnp.where(propose, seqv, _BIG)
            same = propose[:, None] & propose[None, :] & (best[:, None] == best[None, :])
            earlier_same = jnp.any(same & (pseq[None, :] < pseq[:, None]), axis=1)
            first_bad = jnp.min(jnp.where(earlier_same, pseq, _BIG))
            commit = propose & (pseq < first_bad)
            match_idx = jnp.where(commit, best, match_idx)
            det_taken = det_taken.at[jnp.where(commit, best, d)].set(True, mode="drop")
            return match_idx, det_taken, jnp.any(commit)
        match_idx, det_matched, _ = jax.lax.while_loop(
            lambda s_: s_[2], assoc_round,
            (jnp.full((t,), -1, jnp.int32), jnp.zeros((d,), bool), jnp.array(True)))
        matched = match_idx >= 0
        mpos = det[jnp.clip(match_idx, 0, d - 1)]
        pos = jnp.where(matched[:, None], mpos,
                        jnp.where((state.active & ~matched)[:, None], predicted, state.pos))
        frames_since = jnp.where(matched, 0, jnp.where(state.active, state.frames_since + 1, state.frames_since))
        frame_count = jnp.where(matched, state.frame_count + 1, state.frame_count)
        if mode == "assoc":
            st2 = state._replace(pos=pos, frames_since=frames_since, frame_count=frame_count)
            return st2, matched.sum()
        hist, hist_len = _push_history(state.hist, state.hist_len, pos, state.active)
        new_dir = _calc_direction(hist, hist_len, cfg)
        dir_cur = jnp.where(matched[:, None], state.dir_cur * cfg.damping + new_dir * (1 - cfg.damping), state.dir_cur)
        velocity = jnp.where(state.active[:, None], _estimate_velocity(hist, hist_len, dir_cur, cfg), state.velocity)
        # spawn (gather form)
        free = ~state.active
        unmatched_det = v & ~det_matched
        det_rank = jnp.cumsum(unmatched_det.astype(jnp.int32)) - 1
        n_spawned = jnp.minimum(jnp.sum(unmatched_det.astype(jnp.int32)), jnp.sum(free.astype(jnp.int32)))
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        spawned_slot = free & (free_rank < n_spawned)
        det_at_rank = jnp.full((t + 1,), 0, jnp.int32).at[jnp.where(unmatched_det & (det_rank < t), det_rank, t)].set(jnp.arange(d, dtype=jnp.int32), mode="drop")[:t]
        didx = det_at_rank[jnp.clip(free_rank, 0, t - 1)]
        spawn_pos = det[jnp.clip(didx, 0, d - 1)]
        active = state.active | spawned_slot
        seq = jnp.where(spawned_slot, state.next_seq + free_rank, state.seq)
        pos = jnp.where(spawned_slot[:, None], spawn_pos, pos)
        hist = jnp.where(spawned_slot[:, None, None],
                         jnp.concatenate([spawn_pos[:, None, :], jnp.zeros((t, hist.shape[1]-1, 2))], axis=1), hist)
        hist_len = jnp.where(spawned_slot, 1, hist_len)
        frame_count = jnp.where(spawned_slot, 1, frame_count)
        frames_since = jnp.where(spawned_slot, 0, frames_since)
        prune = active & ((frames_since > cfg.frames_to_skip) | (frame_count > cfg.max_frames))
        active = active & ~prune
        if mode == "nogroup":
            st2 = state._replace(active=active, seq=jnp.where(active, seq, _BIG), pos=pos,
                                 frame_count=frame_count, frames_since=frames_since,
                                 hist=hist, hist_len=hist_len, velocity=velocity, dir_cur=dir_cur,
                                 next_seq=state.next_seq + n_spawned, next_label=state.next_label + n_spawned)
            return st2, matched.sum()
        raise ValueError(mode)
    @jax.jit
    def scan_fn(st, xs, ys, vs):
        return jax.lax.scan(step_fn, st, (xs, ys, vs))
    return scan_fn

bench("assoc-only", make_scan("assoc"))
bench("assoc+correct+spawn", make_scan("nogroup"))

@jax.jit
def full_scan(st, xs, ys, vs):
    def step(state, ev):
        x, y, v = ev
        state, groups = trk.update(state, x, y, v, cfg)
        return state, groups.exists.sum()
    return jax.lax.scan(step, st, (xs, ys, vs))
bench("tracker full", full_scan)
