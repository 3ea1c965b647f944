"""Corner-chain decomposition (r4b): where does corner_step's per-slice time
go? Rows measure, inside the same 32-slice scan harness as prof_inscan with
the chain-per-drain methodology (the old per-rep drain hid a fixed ~23.5 ms
relay round-trip): the dense stencil alone under the real activity map, the
stencil with no active tiles (pure kernel overhead), representative-candidate
selection alone, and the full corner step."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.io import synthetic, slice_by_count
from evflow_tpu.ops import sae as sae_ops, efast
from evflow_tpu.models import pipeline

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

h, w = cfg.sensor.height, cfg.sensor.width
band = efast._pick_band(h)
nb, nwt = h // band, w // 128

CHAIN = 8
_floor_ms = [0.0]


def _drain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def bench(name, make_scan, chain=CHAIN):
    f = jax.jit(make_scan)
    t0 = time.perf_counter(); _drain(f()); cmp = time.perf_counter()-t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = f()
        _drain(out)
        best = min(best, time.perf_counter()-t0)
    total_ms = best * 1e3
    net = (total_ms - _floor_ms[0]) / (chain * n_slices)
    print(f"{name:22s} compile {cmp:7.1f}s  chain{chain} {total_ms:8.2f} ms"
          f"  per-slice {net:7.3f} ms", flush=True)
    return total_ms


def mk_null():
    def step(c, x):
        return c + x[0], None
    return jax.lax.scan(step, jnp.int32(0), xs)
_floor_ms[0] = bench("null(floor)", mk_null)


# activity stats (host): how many of the nb*nwt tiles does a slice touch?
act_counts = []
for s in range(n_slices):
    a = np.zeros((nb, nwt), bool)
    a[np.clip(np.asarray(slices.y[s]) // band, 0, nb - 1),
      np.clip(np.asarray(slices.x[s]) // 128, 0, nwt - 1)] = True
    act_counts.append(a.sum())
print(f"active tiles/slice: mean {np.mean(act_counts):.1f} of {nb*nwt}",
      flush=True)


# 1. SAE scatter + stencil under the real per-slice activity map
def mk_stencil():
    def step(s, ev):
        x, y, t, v = ev
        s = sae_ops.update_sae(s, x, y, t, v)
        act2 = jnp.zeros((nb, nwt), bool).at[
            jnp.clip(y // band, 0, nb - 1),
            jnp.clip(x // 128, 0, nwt - 1)].max(v, mode="drop")
        m = efast.corner_mask_dense_pallas_sparse2(s, act2, cfg.efast,
                                                   cfg.sensor, band, 128)
        return s, jnp.sum(m.astype(jnp.int32))
    return jax.lax.scan(step, sae_ops.init_sae(cfg.sensor), (xs, ys, ts, vs))
bench("sae+stencil(real act)", mk_stencil)


# 2. stencil with NO active tiles (fixed kernel overhead)
def mk_stencil0():
    act0 = jnp.zeros((nb, nwt), bool)
    def step(s, ev):
        x, y, t, v = ev
        s = sae_ops.update_sae(s, x, y, t, v)
        m = efast.corner_mask_dense_pallas_sparse2(s, act0, cfg.efast,
                                                   cfg.sensor, band, 128)
        return s, jnp.sum(m.astype(jnp.int32))
    return jax.lax.scan(step, sae_ops.init_sae(cfg.sensor), (xs, ys, ts, vs))
bench("sae+stencil(act=0)", mk_stencil0)


# 3. stencil with ALL tiles active (the un-predicated ceiling)
def mk_stencil1():
    act1 = jnp.ones((nb, nwt), bool)
    def step(s, ev):
        x, y, t, v = ev
        s = sae_ops.update_sae(s, x, y, t, v)
        m = efast.corner_mask_dense_pallas_sparse2(s, act1, cfg.efast,
                                                   cfg.sensor, band, 128)
        return s, jnp.sum(m.astype(jnp.int32))
    return jax.lax.scan(step, sae_ops.init_sae(cfg.sensor), (xs, ys, ts, vs))
bench("sae+stencil(act=1)", mk_stencil1)


# 4. SAE + representative-candidate selection + compaction only
def mk_rep():
    m = cfg.efast.max_candidates
    def step(s, ev):
        x, y, t, v = ev
        s = sae_ops.update_sae(s, x, y, t, v)
        cx, cy, cv, nd = pipeline._representative_candidates(s, x, y, t, v, m, cfg)
        return s, (jnp.sum(cx), nd)
    return jax.lax.scan(step, sae_ops.init_sae(cfg.sensor), (xs, ys, ts, vs))
bench("sae+repcand", mk_rep)


# 5. full corner step
def mk_full_corner():
    return pipeline.corner_track_scan(pipeline.init_corner_state(cfg), xs, ys, ts, vs, cfg)
bench("corner_step", mk_full_corner)
