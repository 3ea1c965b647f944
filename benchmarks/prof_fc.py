import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.models import fastcluster
from evflow_tpu.models.fastcluster import _ewma_closed_form, FastState, _BIG

cfg = DEFAULT.cluster; sensor = DEFAULT.sensor
c = cfg.max_clusters
rng = np.random.default_rng(0)
n = 16384
x = jnp.asarray(rng.integers(0,1280,n),jnp.int32)
y = jnp.asarray(rng.integers(0,720,n),jnp.int32)
valid = jnp.ones(n, bool)
state = fastcluster.init_state(cfg)
state = state._replace(alive=state.alive.at[:8].set(True),
                       mu=state.mu.at[:8].set(jnp.asarray(rng.random((8,2)),jnp.float32)*500))

def t(name, f, *a):
    g = jax.jit(f)
    t0=time.perf_counter(); out=g(*a); jax.block_until_ready(out)
    cmp=time.perf_counter()-t0
    best=1e9
    for _ in range(5):
        t0=time.perf_counter(); out=g(*a); jax.block_until_ready(out)
        best=min(best,time.perf_counter()-t0)
    print(f"{name:12s} compile {cmp:6.2f}s run {best*1e3:8.3f} ms", flush=True)

grid_cells = 4096

def stages(state, x, y, valid, upto):
    pts = jnp.stack([x, y], axis=1).astype(jnp.float32)
    d = jnp.sum(jnp.abs(pts[:, None, :] - state.mu[None, :, :]), axis=-1)
    d = jnp.where(state.alive[None, :], d, jnp.inf)
    best = jnp.argmin(d, axis=1).astype(jnp.int32)
    best_d = jnp.min(d, axis=1)
    assigned = valid & (best_d <= cfg.radius)
    labels = jnp.where(assigned, best, -1)
    if upto == 1: return labels
    cell_w = max(int(cfg.radius), 1)
    ncx = -(-sensor.width // cell_w)
    cell = (y // cell_w) * ncx + (x // cell_w)
    cell = jnp.where(valid & ~assigned, cell % grid_cells, grid_cells).astype(jnp.int32)
    cell_cnt = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), cell, num_segments=grid_cells + 1)[:grid_cells]
    cell_sum = jax.ops.segment_sum(jnp.where((cell < grid_cells)[:, None], pts, 0.0), cell, num_segments=grid_cells + 1)[:grid_cells]
    occupied = cell_cnt > 0
    free = ~state.alive
    n_free = jnp.sum(free.astype(jnp.int32))
    order_val = jnp.where(occupied, -cell_cnt, 1)
    cell_rank = jnp.argsort(order_val)
    free_slots = jnp.argsort(jnp.where(free, jnp.arange(c), _BIG))
    n_occ = jnp.sum(occupied.astype(jnp.int32))
    n_new = jnp.minimum(n_occ, n_free)
    take = jnp.arange(c) < n_new
    src_cell = cell_rank[jnp.clip(jnp.arange(c), 0, grid_cells - 1)]
    seed_mu = cell_sum[src_cell] / jnp.maximum(cell_cnt[src_cell], 1)[:, None]
    slot_for_pos = free_slots
    alive = state.alive.at[slot_for_pos].set(jnp.where(take, True, state.alive[slot_for_pos]))
    mu = state.mu.at[slot_for_pos].set(jnp.where(take[:, None], seed_mu, state.mu[slot_for_pos]))
    if upto == 2: return alive, mu
    pos_of_cell = jnp.zeros((grid_cells,), jnp.int32).at[cell_rank].set(jnp.arange(grid_cells, dtype=jnp.int32))
    ev_pos = pos_of_cell[jnp.clip(cell, 0, grid_cells - 1)]
    ev_seeded = valid & ~assigned & (cell < grid_cells) & (ev_pos < n_new)
    ev_slot = slot_for_pos[jnp.clip(ev_pos, 0, c - 1)]
    labels = jnp.where(ev_seeded, ev_slot, labels)
    member = labels >= 0
    if upto == 3: return labels
    mu2, k_c = _ewma_closed_form(mu, pts, jnp.maximum(labels, 0), member, c, cfg.alpha)
    if upto == 4: return mu2, k_c
    head = state.ring_head
    cnt_slice = jax.ops.segment_sum(member.astype(jnp.int32), jnp.where(member, labels, c), num_segments=c + 1)[:c]
    sum_slice = jax.ops.segment_sum(jnp.where(member[:, None], pts, 0.0), jnp.where(member, labels, c), num_segments=c + 1)[:c]
    rc = state.ring_count.at[:, head].set(cnt_slice)
    rs = state.ring_sum.at[:, head].set(sum_slice)
    if upto == 5: return rc, rs
    dmu = jnp.sum(jnp.abs(mu2[:, None, :] - mu2[None, :, :]), axis=-1)
    adj = (dmu <= cfg.radius) & alive[:, None] & alive[None, :]
    comp = jnp.where(alive, state.corder, _BIG)
    def prop(_, comp):
        neigh = jnp.where(adj, comp[None, :], _BIG)
        return jnp.minimum(comp, jnp.min(neigh, axis=1))
    comp = jax.lax.fori_loop(0, 8, prop, comp)
    if upto == 6: return comp
    eq = alive[None, :] & (state.corder[None, :] == comp[:, None])
    root_slot = jnp.argmax(eq, axis=1).astype(jnp.int32)
    merged_into = jnp.where(alive, root_slot, jnp.arange(c, dtype=jnp.int32))
    labels2 = jnp.where(member, merged_into[jnp.clip(labels, 0, c - 1)], labels)
    rc2 = jax.ops.segment_sum(rc, merged_into, num_segments=c)
    rs2 = jax.ops.segment_sum(rs, merged_into, num_segments=c)
    return labels2, rc2, rs2

for k in range(1, 7):
    t(f"upto{k}", functools.partial(stages, upto=k), state, x, y, valid)
t("full", lambda s,a,b,v_: fastcluster.update_slice(s,a,b,v_,cfg,sensor), state, x, y, valid)
