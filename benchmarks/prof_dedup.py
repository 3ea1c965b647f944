"""Hash-dedup formulations: scatter-min vs sort-based first-occupant (r2).

dedup is the biggest single item of the cluster step (1.27 ms/slice in-scan,
prof_inscan). Both formulations implement identical first-occupant
semantics: min-lane-per-bucket. Timing per CLAUDE.md: whole-sequence scans.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.ops import hash_dedup

cfg, sensor = DEFAULT.dedup, DEFAULT.sensor
N, S = 16384, 32
rng = np.random.default_rng(0)
cx = np.array([200, 900, 600]); cy = np.array([200, 500, 150])
k = rng.integers(0, 3, (S, N))
xs = jnp.asarray(np.clip(rng.normal(cx[k], 12), 0, 1279).astype(np.int32))
ys = jnp.asarray(np.clip(rng.normal(cy[k], 12), 0, 719).astype(np.int32))
vs = jnp.ones((S, N), bool)


def sort_dedup_mask(x, y, valid):
    n = x.shape[0]
    key, nkeys, ok = hash_dedup._keys(x, y, valid, cfg, sensor)
    idx = jnp.arange(n, dtype=jnp.int32)
    sk, sl = jax.lax.sort((key, idx), num_keys=2)
    first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]]) & (sk < nkeys)
    unique_mask = jnp.zeros((n,), bool).at[sl].set(first)
    unique_count = jnp.sum(first.astype(jnp.int32))
    run2 = first & jnp.concatenate([sk[1:] == sk[:-1], jnp.array([False])])
    repeated_count = jnp.sum(run2.astype(jnp.int32))
    return unique_mask, unique_count, repeated_count


def bench(name, fn):
    def run(xs, ys, vs):
        def step(c, ev):
            x, y, v = ev
            m = fn(x, y, v)
            return c, (m[0][::128], m[1], m[2])
        return jax.lax.scan(step, 0, (xs, ys, vs))
    f = jax.jit(run)
    t0 = time.perf_counter(); jax.block_until_ready(f(xs, ys, vs)); cmp = time.perf_counter()-t0
    np.asarray(f(xs, ys, vs)[1][1]).ravel()[:1]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(xs, ys, vs)
        np.asarray(r[1][1]).ravel()[:1]
        best = min(best, time.perf_counter()-t0)
    print(f"{name:24s} compile {cmp:6.1f}s  per-slice {best/S*1e3:7.3f} ms", flush=True)


bench("scatter-min (current)", lambda x, y, v: hash_dedup.dedup_mask(x, y, v, cfg, sensor))
bench("sort-based", sort_dedup_mask)

# parity
a = hash_dedup.dedup_mask(xs[0], ys[0], vs[0], cfg, sensor)
b = sort_dedup_mask(xs[0], ys[0], vs[0])
assert np.array_equal(np.asarray(a.unique_mask), np.asarray(b[0]))
assert int(a.unique_count) == int(b[1]) and int(a.repeated_count) == int(b[2])
print("parity ok", int(a.unique_count), int(a.repeated_count), flush=True)
