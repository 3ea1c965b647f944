"""Benchmark: events/s/chip on the flagship cluster+track pipeline.

Runs the full per-slice path on one chip — hash dedup → slice-vectorized
incremental clustering → centroid flow, plus SAE scatter → eFAST corners →
NMS → corner tracker — over a synthetic 16384-event/slice moving-blob stream
(the reference's slice size, …store.cpp:34).

Baseline: the reference's nominal design cadence of 16384 events / 50 ms
(~327.7k events/s, SURVEY §6 — the only throughput the OpenCL pipeline is
specified to sustain end-to-end). vs_baseline = achieved events/s / 327,680.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np
import jax
import jax.numpy as jnp


BASELINE_EVENTS_PER_S = 16384 / 0.05  # 327,680 — reference slice cadence


def main():
    import evflow_tpu
    evflow_tpu.setup_cache()
    from evflow_tpu.config import DEFAULT
    from evflow_tpu.io import synthetic, slice_by_count
    from evflow_tpu.models import fastcluster, pipeline

    cfg = DEFAULT
    n_slices = 32
    n = cfg.slicing.n_events

    stream = synthetic.moving_blob_stream(
        num_slices=n_slices, events_per_slice=n,
        blob_centers=((200.0, 200.0), (900.0, 500.0), (600.0, 150.0)),
        velocities=((30.0, 10.0), (-20.0, 15.0), (5.0, -12.0)),
        sigma=12.0)
    slices = slice_by_count(stream, n, drop_partial=True)
    t0 = int(stream.t[0])
    xs = jnp.asarray(slices.x)
    ys = jnp.asarray(slices.y)
    ts = jnp.asarray((slices.t - t0).astype(np.int32))
    vs = jnp.asarray(slices.valid_mask())

    cl_state = fastcluster.init_state(cfg.cluster)
    co_state = pipeline.init_corner_state(cfg)

    # One fused scan: both pipelines per slice, one dispatch for the sequence.
    def run(cl_state, co_state, xs, ys, ts, vs):
        return pipeline.full_scan(cl_state, co_state, xs, ys, ts, vs, cfg)

    # compile + warm up, then drain the remote queue with a real readback
    out = run(cl_state, co_state, xs, ys, ts, vs)
    jax.block_until_ready(out)
    np.asarray(out[1][0].unique_count[:1])

    # Chained dispatches with one draining readback: the streaming deployment
    # pattern (slices arrive continuously, dispatch gaps overlap compute).
    # Per-rep block_until_ready measures ~5% slower by adding a host sync
    # between reps; the readback at the end guarantees the queue is empty
    # (block_until_ready alone can under-report through the axon relay).
    reps = 5
    start = time.perf_counter()
    for _ in range(reps):
        out = run(cl_state, co_state, xs, ys, ts, vs)
    np.asarray(out[1][0].unique_count[:1])
    # mean over the chained reps (NOT best-of: round-1 changed the methodology
    # from best-of-reps to a mean over chained dispatches with one draining
    # readback; the variable name now says so)
    mean_step = (time.perf_counter() - start) / reps

    total_events = n_slices * n
    events_per_s = total_events / mean_step
    print(json.dumps({
        "metric": "cluster+track pipeline throughput",
        "value": round(events_per_s, 1),
        "unit": "events/s/chip",
        "vs_baseline": round(events_per_s / BASELINE_EVENTS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
