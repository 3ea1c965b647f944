"""fastcluster.update_slice ablation: where do its 1.57 ms/slice go?

Cumulative stages inside one scan each: assignment panel → + grid seeding →
+ EWMA/window aggregates → full step (merge/flow tail). Blob stream, default
config (C=128, 16384 events).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.models import fastcluster
from evflow_tpu.ops import hash_dedup

cfg = DEFAULT
N, S = 16384, 32
rng = np.random.default_rng(0)
cx = np.array([200, 900, 600]); cy = np.array([200, 500, 150])
k = rng.integers(0, 3, (S, N))
xs = jnp.asarray(np.clip(rng.normal(cx[k], 12), 0, 1279).astype(np.int32))
ys = jnp.asarray(np.clip(rng.normal(cy[k], 12), 0, 719).astype(np.int32))
vs = jnp.ones((S, N), bool)
C = cfg.cluster.max_clusters


def bench(name, step_fn, carry0):
    def run(xs, ys, vs):
        def step(cst, ev):
            x, y, v = ev
            return step_fn(cst, x, y, v)
        return jax.lax.scan(step, carry0, (xs, ys, vs))
    f = jax.jit(run)
    t0 = time.perf_counter(); jax.block_until_ready(f(xs, ys, vs)); cmp = time.perf_counter()-t0
    r = f(xs, ys, vs); np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(xs, ys, vs)
        np.asarray(jax.tree.leaves(r)[0]).ravel()[:1]
        best = min(best, time.perf_counter()-t0)
    print(f"{name:26s} compile {cmp:6.1f}s  per-slice {best/S*1e3:7.3f} ms", flush=True)


mu0 = jnp.asarray(rng.uniform(0, 1000, (C, 2)), jnp.float32)
alive0 = jnp.ones((C,), bool)


def assign_only(cst, x, y, v):
    pts = jnp.stack([x, y], axis=1).astype(jnp.float32)
    d = jnp.sum(jnp.abs(pts[:, None, :] - mu0[None, :, :]), axis=-1)
    best = jnp.argmin(d, axis=1).astype(jnp.int32)
    return cst, jnp.sum(best)


bench("assignment panel", assign_only, 0)


def seed_only(cst, x, y, v):
    pts = jnp.stack([x, y], axis=1).astype(jnp.float32)
    grid_cells = 4096
    cell_w = max(int(cfg.cluster.radius), 1)
    ncx = -(-cfg.sensor.width // cell_w)
    cell = (y // cell_w) * ncx + (x // cell_w)
    cell = jnp.where(v, cell % grid_cells, grid_cells).astype(jnp.int32)
    cell_feats = jnp.concatenate([jnp.ones((N, 1), jnp.float32), pts], axis=1)
    agg = jax.ops.segment_sum(cell_feats, cell, num_segments=grid_cells + 1)
    return cst, jnp.sum(agg)


bench("grid-seed segment_sum", seed_only, 0)


def aggs_only(cst, x, y, v):
    pts = jnp.stack([x, y], axis=1).astype(jnp.float32)
    labels = (x % C).astype(jnp.int32)       # synthetic stable labels
    mu, k_c, s = fastcluster._slice_aggregates(mu0, pts, labels, v, C,
                                               cfg.cluster.alpha, None)
    return cst, (jnp.sum(mu), jnp.sum(k_c))


bench("EWMA/window aggregates", aggs_only, 0)

st0 = fastcluster.init_state(cfg.cluster)


def full(cst, x, y, v):
    ded = hash_dedup.dedup_mask(x, y, v, cfg.dedup, cfg.sensor)
    cst, out = fastcluster.update_slice(cst, x, y, ded.unique_mask,
                                        cfg.cluster, cfg.sensor)
    return cst, out.n


bench("dedup+full update_slice", full, st0)


def assign_v2(cst, x, y, v):
    # per-coordinate (N, C) panels: the (N, C, 2) form's trailing dim of 2
    # wastes 126/128 VPU lanes
    xf = x.astype(jnp.float32); yf = y.astype(jnp.float32)
    d = jnp.abs(xf[:, None] - mu0[None, :, 0]) \
        + jnp.abs(yf[:, None] - mu0[None, :, 1])
    best = jnp.argmin(d, axis=1).astype(jnp.int32)
    return cst, jnp.sum(best)


bench("assignment v2 (N,C)x2", assign_v2, 0)


def assign_v3(cst, x, y, v):
    # v2 + min/argmin in one combined pass via argmin only + take
    xf = x.astype(jnp.float32); yf = y.astype(jnp.float32)
    d = jnp.abs(xf[:, None] - mu0[None, :, 0]) \
        + jnp.abs(yf[:, None] - mu0[None, :, 1])
    best = jnp.argmin(d, axis=1).astype(jnp.int32)
    best_d = jnp.min(d, axis=1)
    return cst, (jnp.sum(best), jnp.sum(best_d))


bench("assignment v3 +min", assign_v3, 0)
