"""Scan-unroll probe (r4; conclusion superseded r4b).

Measures bench.py's exact full_scan with lax.scan unroll in {1, 2, 4}:
unroll=k lowers k slice bodies per loop iteration (identical results — it
is the same scan). r4 measured NO win and read that as "XLA already
overlaps iterations". r4b explains it differently: the "~0.75 ms/step scan
floor" this probe was chasing never existed — it was the fixed ~23.5 ms
draining-readback round-trip divided by 32 slices (a 1-op step and a
256-step scan measure the same total). Unroll correctly changed nothing
because there was nothing per-step to amortize. See README speed-of-light
section and benchmarks/prof_inscan.py's chain-per-drain methodology.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import evflow_tpu
evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.io import synthetic, slice_by_count
from evflow_tpu.models import fastcluster, pipeline

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


@functools.partial(jax.jit, static_argnames=("unroll",))
def full_scan_u(cl_state, co_state, xs, ys, ts, valids, unroll=1):
    def step(st, ev):
        cl, co = st
        x, y, t, v = ev
        cl, cl_out = pipeline.cluster_flow_step(cl, x, y, v, cfg)
        co, co_out = pipeline.corner_track_step(co, x, y, t, v, cfg)
        return (cl, co), (cl_out, co_out)
    return jax.lax.scan(step, (cl_state, co_state), (xs, ys, ts, valids),
                        unroll=unroll)


def main():
    print("devices:", jax.devices(), flush=True)
    cl0 = fastcluster.init_state(cfg.cluster)
    co0 = pipeline.init_corner_state(cfg)
    for u in (1, 2, 4):
        t0 = time.perf_counter()
        out = full_scan_u(cl0, co0, xs, ys, ts, vs, u)
        np.asarray(out[1][0].unique_count.ravel()[:1])
        comp = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = full_scan_u(cl0, co0, xs, ys, ts, vs, u)
            np.asarray(out[1][0].unique_count.ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        evs = n_slices * n / best
        print(f"unroll={u}: compile {comp:6.1f}s  {best/n_slices*1e3:6.2f} "
              f"ms/slice  {evs/1e6:.2f}M ev/s ({evs/327680:.1f}x)", flush=True)


if __name__ == "__main__":
    main()
