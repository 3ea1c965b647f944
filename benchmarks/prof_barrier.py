import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
cfg = DEFAULT.cluster; sensor = DEFAULT.sensor
c = cfg.max_clusters
rng=np.random.default_rng(0)
n=16384
x = jnp.asarray(rng.integers(0,1280,n),jnp.int32); y = jnp.asarray(rng.integers(0,720,n),jnp.int32)
valid = jnp.ones(n, bool)
mu = jnp.asarray(rng.random((c,2)), jnp.float32)*500
alive = jnp.asarray(rng.random(c)>0.5)

def t(name, f, *a):
    t0=time.perf_counter(); out=jax.jit(f)(*a); jax.block_until_ready(out)
    cmp=time.perf_counter()-t0
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); out=jax.jit(f)(*a); jax.block_until_ready(out)
        best=min(best,time.perf_counter()-t0)
    print(name, "compile:", round(cmp,2), "run_ms:", round(best*1e3,3), flush=True)

grid_cells=4096
def seedB(x, y, valid, alive, mu, barrier):
    pts = jnp.stack([x, y], axis=1).astype(jnp.float32)
    d = jnp.sum(jnp.abs(pts[:, None, :] - mu[None, :, :]), axis=-1)
    d = jnp.where(alive[None, :], d, jnp.inf)
    best = jnp.argmin(d, axis=1).astype(jnp.int32)
    best_d = jnp.min(d, axis=1)
    assigned = valid & (best_d <= cfg.radius)
    labels = jnp.where(assigned, best, -1)
    if barrier:
        labels, assigned = jax.lax.optimization_barrier((labels, assigned))
    cell_w = max(int(cfg.radius), 1)
    ncx = -(-sensor.width // cell_w)
    cell = (y // cell_w) * ncx + (x // cell_w)
    cell = jnp.where(valid & ~assigned, cell % grid_cells, grid_cells).astype(jnp.int32)
    cell_cnt = jax.ops.segment_sum(jnp.ones((n,), jnp.int32), cell, num_segments=grid_cells + 1)[:grid_cells]
    cell_sum = jax.ops.segment_sum(jnp.where((cell < grid_cells)[:, None], pts, 0.0), cell, num_segments=grid_cells + 1)[:grid_cells]
    return jnp.argsort(jnp.where(cell_cnt>0, -cell_cnt, 1)), cell_sum, labels

t("B with barrier", lambda *a: seedB(*a, True), x, y, valid, alive, mu)
t("B no barrier", lambda *a: seedB(*a, False), x, y, valid, alive, mu)
