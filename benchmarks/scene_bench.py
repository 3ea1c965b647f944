import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Scene-diversity throughput (r2 verdict weak item 8).

bench.py's headline events/s is measured on a moving-blob stream, which
repaints the same pixels and so flatters the per-pixel candidate compaction
in the corner path. This harness runs the IDENTICAL full_scan measurement
(methodology copied from bench.py: one fused scan, chained reps, single
draining 1-element readback) over three scenes:

  blob      — bench.py's stream (3 gaussian blobs), the friendly case
  edges     — moving L-edge geometry (strong corners, line-shaped repaint)
  textured  — 40 small objects + 50% uniform background noise: touched
              pixels/slice approach the event count, the adversarial case
              for compaction (and for the rep-pixel max_candidates budget —
              dropped-candidate counts are reported)

Run on the TPU; one job at a time (CLAUDE.md).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import evflow_tpu
evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.io import synthetic, slice_by_count
from evflow_tpu.models import fastcluster, pipeline

BASELINE_EVENTS_PER_S = 16384 / 0.05
N_SLICES = 32


def measure(stream, cfg):
    n = cfg.slicing.n_events
    slices = slice_by_count(stream, n, drop_partial=True)
    t0 = int(stream.t[0])
    xs = jnp.asarray(slices.x)
    ys = jnp.asarray(slices.y)
    ts = jnp.asarray((slices.t - t0).astype(np.int32))
    vs = jnp.asarray(slices.valid_mask())
    uniq_px = np.mean([len(np.unique(slices.x[s].astype(np.int64) * 4096
                                     + slices.y[s]))
                       for s in range(slices.num_slices)])

    cl_state = fastcluster.init_state(cfg.cluster)
    co_state = pipeline.init_corner_state(cfg)

    def run(cl_state, co_state, xs, ys, ts, vs):
        return pipeline.full_scan(cl_state, co_state, xs, ys, ts, vs, cfg)

    t_c = time.perf_counter()
    out = run(cl_state, co_state, xs, ys, ts, vs)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t_c
    np.asarray(out[1][0].unique_count[:1])

    # r4b: 20 chained reps amortize the fixed ~23.5 ms drain round-trip
    reps = 20
    start = time.perf_counter()
    for _ in range(reps):
        out = run(cl_state, co_state, xs, ys, ts, vs)
    np.asarray(out[1][0].unique_count[:1])
    mean_step = (time.perf_counter() - start) / reps
    evs = N_SLICES * n / mean_step
    dropped = int(np.asarray(out[1][1].num_dropped).sum())
    corners = int(np.asarray(out[1][1].num_corners).sum())
    return evs, compile_s, uniq_px, dropped, corners


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = DEFAULT
    n = cfg.slicing.n_events
    scenes = {
        "blob": synthetic.moving_blob_stream(
            num_slices=N_SLICES, events_per_slice=n,
            blob_centers=((200.0, 200.0), (900.0, 500.0), (600.0, 150.0)),
            velocities=((30.0, 10.0), (-20.0, 15.0), (5.0, -12.0)),
            sigma=12.0),
        "edges": synthetic.moving_edge_stream(
            num_slices=N_SLICES, events_per_slice=n),
        "textured": synthetic.textured_field_stream(
            num_slices=N_SLICES, events_per_slice=n),
    }
    for name, stream in scenes.items():
        evs, comp, uniq_px, dropped, corners = measure(stream, cfg)
        print(f"{name:12s} {evs/1e6:5.2f}M ev/s ({evs/BASELINE_EVENTS_PER_S:5.1f}x ref)  "
              f"uniq_px/slice {uniq_px:7.0f}  corners {corners:6d}  "
              f"dropped_cand {dropped:6d}  compile {comp:5.1f}s", flush=True)
    # full-coverage variant: raise the candidate budget to the slice size so
    # the textured scene drops nothing — the cost of covering every touched
    # pixel on the adversarial scene
    import dataclasses
    cfg16 = dataclasses.replace(
        cfg, efast=dataclasses.replace(cfg.efast, max_candidates=n))
    evs, comp, uniq_px, dropped, corners = measure(scenes["textured"], cfg16)
    print(f"{'textured@16k':12s} {evs/1e6:5.2f}M ev/s ({evs/BASELINE_EVENTS_PER_S:5.1f}x ref)  "
          f"uniq_px/slice {uniq_px:7.0f}  corners {corners:6d}  "
          f"dropped_cand {dropped:6d}  compile {comp:5.1f}s", flush=True)


if __name__ == "__main__":
    main()
