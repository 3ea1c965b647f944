"""Pallas kernels vs their XLA (jnp) formulations, in-scan, readback-synced.

Decides whether to wire ops/pallas_kernels.py into the pipeline hot path.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.io import synthetic, slice_by_count
from evflow_tpu.ops import sae as sae_ops, pallas_kernels as pk

cfg = DEFAULT
n_slices, n = 32, cfg.slicing.n_events
stream = synthetic.moving_blob_stream(
    num_slices=n_slices, events_per_slice=n,
    blob_centers=((200.0, 200.0), (900.0, 500.0), (600.0, 150.0)),
    velocities=((30.0, 10.0), (-20.0, 15.0), (5.0, -12.0)), sigma=12.0)
slices = slice_by_count(stream, n, drop_partial=True)
t0 = int(stream.t[0])
xs = jnp.asarray(slices.x); ys = jnp.asarray(slices.y)
ts = jnp.asarray((slices.t - t0).astype(np.int32))
vs = jnp.asarray(slices.valid_mask())
rng = np.random.default_rng(0)
C = cfg.cluster.max_clusters
mu = jnp.asarray(rng.uniform(0, 700, (C, 2)), jnp.float32)
alive = jnp.asarray(rng.integers(0, 2, (C,)), jnp.int32)


def bench(name, make_scan):
    f = jax.jit(make_scan)
    t0 = time.perf_counter(); out = f(); jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    cmp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f()
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:26s} compile {cmp:7.1f}s  per-slice {best/n_slices*1e3:7.3f} ms", flush=True)


# assignment: jnp vs pallas
def mk_assign_jnp():
    def step(c, ev):
        x, y, v = ev
        l, d = pk.assign_manhattan_reference(x, y, mu, alive, cfg.cluster.radius)
        return c, jnp.sum(l) + jnp.sum(d)
    return jax.lax.scan(step, 0, (xs, ys, vs))
bench("assign jnp", mk_assign_jnp)

def mk_assign_pallas():
    def step(c, ev):
        x, y, v = ev
        l, d = pk.assign_manhattan(x, y, mu, alive, cfg.cluster.radius)
        return c, jnp.sum(l) + jnp.sum(d)
    return jax.lax.scan(step, 0, (xs, ys, vs))
bench("assign pallas", mk_assign_pallas)

# SAE scatter: the Pallas band kernel was removed (Mosaic cannot lower
# per-event scalar VMEM stores); ops/sae.py's XLA scatter is the TPU path.
def mk_sae_jnp():
    def step(s, ev):
        x, y, t, v = ev
        s = sae_ops.update_sae(s, x, y, t, v)
        return s, jnp.sum(s[::64, ::64])
    return jax.lax.scan(step, sae_ops.init_sae(cfg.sensor), (xs, ys, ts, vs))
bench("sae jnp", mk_sae_jnp)
