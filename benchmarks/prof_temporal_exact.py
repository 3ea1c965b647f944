import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Single-window TPU cost of the temporal EXACT pipeline (r5, VERDICT r4
task #4): run_temporal_exact with a 1-device mesh routes each slice through
cluster_flow_step_exact, which on TPU takes the PALLAS exact engine — this
measures that composition on real hardware and should match the
single-device exact-pipeline cost (~6.4-6.6 ms per 16384-event slice, r4b).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import (EngineConfig, SensorConfig, SliceConfig,
                               ClusterConfig, DedupConfig)
from evflow_tpu.io.events import EventStream
from evflow_tpu.io.slicing import slice_by_count
from evflow_tpu.parallel import mesh as mesh_mod, temporal

CFG = EngineConfig(
    sensor=SensorConfig(),
    slicing=SliceConfig(n_events=16384),
    dedup=DedupConfig(exact=True),
    cluster=ClusterConfig(sz_buffer=800, radius=40.0, min_n=10,
                          max_clusters=128, max_members=8192),
)


def blob_stream(num_slices, n, seed=0):
    rng = np.random.default_rng(seed)
    centers = np.array([[200., 200.], [900., 500.], [600., 150.]])
    vel = np.array([[2., 1.], [-2., 1.5], [1., -1.5]])
    xs, ys, ts = [], [], []
    for s in range(num_slices):
        c = rng.integers(0, 3, n)
        xs.append(np.clip(rng.normal(centers[c, 0], 12.0), 0, 1279)
                  .astype(np.int32))
        ys.append(np.clip(rng.normal(centers[c, 1], 12.0), 0, 719)
                  .astype(np.int32))
        ts.append((1000 * (s + 1)
                   + np.sort(rng.integers(0, 900, n))).astype(np.int64))
        centers += vel
    return EventStream(np.concatenate(xs), np.concatenate(ys),
                       np.concatenate(ts),
                       np.zeros(num_slices * n, np.int32))


def main():
    n_slices = 8
    stream = blob_stream(n_slices, CFG.slicing.n_events)
    slices = slice_by_count(stream, CFG.slicing.n_events)
    mesh = mesh_mod.make_data_mesh(1, CFG.parallel)
    warm = 2
    t0 = time.perf_counter()
    out = temporal.run_temporal_exact(slices, mesh, 1, warmup=warm, cfg=CFG)
    np.asarray(out.alive.ravel()[:1])
    print(f"compile+first: {time.perf_counter()-t0:.1f} s", flush=True)
    laps = 3
    t0 = time.perf_counter()
    for _ in range(laps):
        out = temporal.run_temporal_exact(slices, mesh, 1, warmup=warm,
                                          cfg=CFG)
    np.asarray(out.alive.ravel()[:1])
    per_slice = (time.perf_counter() - t0) / laps / (n_slices + warm)
    print(f"temporal exact (1 window, Pallas engine): "
          f"{per_slice*1e3:.2f} ms/slice = "
          f"{CFG.slicing.n_events/per_slice/1e6:.2f}M raw ev/s", flush=True)


if __name__ == "__main__":
    main()
