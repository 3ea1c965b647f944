import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.models import tracker as trk
from evflow_tpu.models.tracker import (_predict, _calc_direction, _estimate_velocity,
                                       _push_history, _BIG, _F32MAX)

cfg = DEFAULT.tracker
t_cap = cfg.max_tracks
d = 512
rng = np.random.default_rng(0)
state = trk.init_state(cfg)
# active population: 200 tracks
act = np.zeros(t_cap, bool); act[:200] = True
state = state._replace(
    active=jnp.asarray(act),
    seq=jnp.asarray(np.where(act, np.arange(t_cap), 2**31-1), jnp.int32),
    label=jnp.asarray(np.arange(t_cap), jnp.int32),
    pos=jnp.asarray(rng.random((t_cap,2)).astype(np.float32)*700),
    hist_len=jnp.asarray(np.where(act, 5, 0), jnp.int32),
    frame_count=jnp.asarray(np.where(act, 5, 0), jnp.int32),
)
dx = jnp.asarray(rng.random(d).astype(np.float32)*1280)
dy = jnp.asarray(rng.random(d).astype(np.float32)*720)
dv = jnp.ones(d, bool)

def t(name, f, *a):
    g = jax.jit(f) if not hasattr(f, "lower") else f
    t0=time.perf_counter(); out=g(*a); jax.block_until_ready(out)
    cmp=time.perf_counter()-t0
    best=1e9
    for _ in range(5):
        t0=time.perf_counter(); out=g(*a); jax.block_until_ready(out)
        best=min(best,time.perf_counter()-t0)
    print(f"{name:12s} compile {cmp:6.2f}s run {best*1e3:8.3f} ms", flush=True)

def stages(state, det_x, det_y, det_valid, upto):
    tt = state.active.shape[0]
    det = jnp.stack([det_x, det_y], axis=1).astype(jnp.float32)
    predicted = _predict(state, cfg)
    eligible = state.active & (state.frames_since <= cfg.frames_to_skip)
    dist_td = jnp.linalg.norm(predicted[:, None, :] - det[None, :, :], axis=2)
    seqv = jnp.where(eligible, state.seq, _BIG)
    def assoc_round(st):
        match_idx, det_taken, _ = st
        open_t = eligible & (match_idx < 0)
        dmask = jnp.where((det_valid & ~det_taken)[None, :], dist_td, _F32MAX)
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
        lambda st: st[2], assoc_round,
        (jnp.full((tt,), -1, jnp.int32), jnp.zeros((d,), bool), jnp.array(True)))
    if upto == 1: return match_idx
    matched = match_idx >= 0
    mpos = det[jnp.clip(match_idx, 0, d - 1)]
    pos = jnp.where(matched[:, None], mpos,
                    jnp.where((state.active & ~matched)[:, None], predicted, state.pos))
    frames_since = jnp.where(matched, 0,
                             jnp.where(state.active, state.frames_since + 1, state.frames_since))
    frame_count = jnp.where(matched, state.frame_count + 1, state.frame_count)
    hist, hist_len = _push_history(state.hist, state.hist_len, pos, state.active)
    new_dir = _calc_direction(hist, hist_len, cfg)
    dir_cur = jnp.where(matched[:, None],
                        state.dir_cur * cfg.damping + new_dir * (1.0 - cfg.damping),
                        state.dir_cur)
    velocity = jnp.where(state.active[:, None],
                         _estimate_velocity(hist, hist_len, dir_cur, cfg),
                         state.velocity)
    if upto == 2: return pos, velocity
    free = ~state.active
    unmatched_det = det_valid & ~det_matched
    det_rank = jnp.cumsum(unmatched_det.astype(jnp.int32)) - 1
    n_free = jnp.sum(free.astype(jnp.int32))
    spawn = unmatched_det & (det_rank < n_free)
    free_slots = jnp.argsort(jnp.where(free, jnp.arange(tt), _BIG))
    target_slot = jnp.where(spawn, free_slots[jnp.clip(det_rank, 0, tt - 1)], tt)
    active = state.active.at[target_slot].set(True, mode="drop")
    label = state.label.at[target_slot].set(state.next_label + det_rank, mode="drop")
    seq = state.seq.at[target_slot].set(state.next_seq + det_rank, mode="drop")
    pos = pos.at[target_slot].set(det, mode="drop")
    hist = hist.at[target_slot].set(
        jnp.concatenate([det[:, None, :], jnp.zeros((d, hist.shape[1] - 1, 2))], axis=1),
        mode="drop")
    if upto == 3: return active, pos, hist
    prune = active & ((frames_since > cfg.frames_to_skip) | (frame_count > cfg.max_frames))
    active = active & ~prune
    detected = active & (frames_since == 0)
    dmat = jnp.linalg.norm(pos[:, None, :] - pos[None, :, :], axis=2)
    within = dmat <= cfg.group_radius
    seqd = jnp.where(detected, seq, _BIG)
    def seed_round(st):
        is_seed, _ = st
        blocked = jnp.any(within & is_seed[None, :] & (seqd[None, :] < seqd[:, None]), axis=1)
        new = detected & ~blocked
        return new, jnp.any(new != is_seed)
    is_seed, _ = jax.lax.while_loop(lambda st: st[1], seed_round, (detected, jnp.array(True)))
    if upto == 4: return is_seed
    return is_seed

for k in range(1, 5):
    t(f"upto{k}", functools.partial(stages, upto=k), state, dx, dy, dv)
t("full", lambda s,a,b,vv: trk.update(s,a,b,vv,cfg), state, dx, dy, dv)
