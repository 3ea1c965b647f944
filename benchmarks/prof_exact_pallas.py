"""Pallas sequential exact engine vs the XLA per-event scan (r4).

Engine-only: 16384-lane slices, both parameter regimes, 4-slice scan,
chained reps, one draining on-device 1-element readback (CLAUDE.md timing
rules). Then the exact-pipeline shape: dedup-capped 8192-lane slices.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import evflow_tpu
evflow_tpu.setup_cache()
from evflow_tpu.config import ClusterConfig
from evflow_tpu.models import aeclustering as ae
from evflow_tpu.models import aeclustering_pallas as aep

S = 4
rng = np.random.default_rng(0)
cx = np.array([200, 900, 600]); cy = np.array([200, 500, 150])


def scene(n):
    k = rng.integers(0, 3, (S, n))
    xs = jnp.asarray(np.clip(rng.normal(cx[k], 12), 0, 1279).astype(np.int32))
    ys = jnp.asarray(np.clip(rng.normal(cy[k], 12), 0, 719).astype(np.int32))
    ts = jnp.asarray((np.arange(S * n, dtype=np.int32) * 3).reshape(S, n))
    ps = jnp.zeros((S, n), jnp.int32)
    vs = jnp.ones((S, n), bool)
    return xs, ys, ts, ps, vs


@functools.partial(jax.jit, static_argnames=("cfg", "pallas"))
def run(state, xs, ys, ts, ps, vs, cfg, pallas=False):
    def step(st, ev):
        x, y, t, p, v = ev
        if pallas:
            return aep.update_slice_pallas(st, x, y, t, p, v, cfg), None
        return ae.update_slice(st, x, y, t, p, v, cfg), None
    st, _ = jax.lax.scan(step, state, (xs, ys, ts, ps, vs))
    return st


def measure(label, data, cfg, pallas, reps=10):  # r4b: amortize the fixed ~23.5 ms drain
    xs, ys, ts, ps, vs = data
    n = xs.shape[1]
    state = ae.init_state(cfg)
    t0 = time.perf_counter()
    out = run(state, xs, ys, ts, ps, vs, cfg, pallas)
    np.asarray(out.mu.ravel()[:1])
    print(f"[{label}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    st = state
    for _ in range(reps):
        st = run(st, xs, ys, ts, ps, vs, cfg, pallas)
    np.asarray(st.mu.ravel()[:1])
    dt = (time.perf_counter() - t0) / (reps * S)
    print(f"[{label}] {dt*1e3:8.2f} ms/slice  {n/dt/1e3:8.1f}k events/s  "
          f"({dt/n*1e6:.2f} us/event)", flush=True)
    return dt


def measure_pipeline(label, ccfg, reps=10):  # r4b: amortize the fixed ~23.5 ms drain
    """Full exact PIPELINE (dedup -> capped engine -> snapshot) on raw
    16384-event slices — the r3 number to beat is 135 ms/slice (121k
    raw events/s); real-time = 50 ms (327.7k)."""
    import dataclasses
    from evflow_tpu.config import DEFAULT
    from evflow_tpu.models import pipeline as pipe

    cfg = dataclasses.replace(DEFAULT, cluster=ccfg)
    n = 16384
    xs, ys, ts, ps, vs = scene(n)

    @jax.jit
    def run(state, cum):
        def step(carry, ev):
            st, cm = carry
            x, y, t, v = ev
            st, view, cm = pipe.cluster_flow_step_exact(st, x, y, t, v,
                                                        cfg, cm)
            return (st, cm), view.centroid[:1]
        return jax.lax.scan(step, (state, cum), (xs, ys, ts, vs))

    state = ae.init_state(ccfg)
    t0 = time.perf_counter()
    out = run(state, jnp.int32(0))
    np.asarray(out[1].ravel()[:1])
    print(f"[{label}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    carry = (state, jnp.int32(0))
    for _ in range(reps):
        carry, tr = run(*carry)
    np.asarray(tr.ravel()[:1])
    dt = (time.perf_counter() - t0) / (reps * S)
    print(f"[{label}] {dt*1e3:8.2f} ms/slice  {n/dt/1e3:8.1f}k RAW events/s",
          flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    if "--pipeline" in sys.argv:
        for name, ccfg in (("accel-r40", ClusterConfig.accel_app()),
                           ("async-r20", ClusterConfig())):
            measure_pipeline(f"pipeline {name}", ccfg)
        return
    for n in (16384, 8192):
        data = scene(n)
        for name, cfg in (("accel-r40", ClusterConfig.accel_app()),
                          ("async-r20", ClusterConfig())):
            for pallas in (True, False) if "--xla" in sys.argv else (True,):
                measure(f"{name} n={n} {'pallas' if pallas else 'xla'}",
                        data, cfg, pallas)


if __name__ == "__main__":
    main()
