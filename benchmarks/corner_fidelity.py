"""Fidelity-vs-throughput curve for the corner path's micro-slice mode
(VERDICT r2 item 3).

Fidelity: within-one-NMS-box agreement of pre-NMS corner-pixel sets vs the
per-event-exact detector (group_track.cpp:884-1070 semantics) on the
repainted moving wedge (the scene of tests/test_event_exact.py). Measured
2026-08-19 (CPU backend, identical numerics): q=1 0.70, q=2 0.79, q=4 0.88,
q=8 0.94, q=16 0.97.

Throughput: full corner_track_scan (SAE+detect+NMS+tracker) ms/slice on TPU
per q — whole-sequence scan, chained reps, draining readback (CLAUDE.md).

Measured 2026-08-20 on the TPU v5e (16384-event slices):
  q=1: 2.20 ms/slice  7.44M ev/s (22.7x ref)   agreement 0.70
  q=2: 2.32 ms/slice  7.07M ev/s (21.6x ref)   agreement 0.79
  q=4: 2.59 ms/slice  6.32M ev/s (19.3x ref)   agreement 0.88
  q=8: 3.06 ms/slice  5.36M ev/s (16.4x ref)   agreement 0.94
The r2 verdict item-3 knee: q=8 delivers >=90% within-box agreement with the
per-event-exact reference semantics at >=15x the reference cadence (matched
trajectory ATE 10.6 px vs 17.7 px at q=1 — tests/test_event_exact.py).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

import evflow_tpu
evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.models import pipeline
from evflow_tpu.io import synthetic, slice_by_count

S = 8
cfg0 = DEFAULT
n = cfg0.slicing.n_events
stream = synthetic.moving_blob_stream(num_slices=S, events_per_slice=n)
sl = slice_by_count(stream, n, drop_partial=True)
xs = jnp.asarray(sl.x); ys = jnp.asarray(sl.y); vs = jnp.asarray(sl.valid_mask())
ts = jnp.asarray((sl.t - int(stream.t[0])).astype(np.int32))

REF_EVS = 327_680.0   # reference nominal cadence (BASELINE.md)

import sys
MD = "--micro-dense" in sys.argv
for q in (1, 2, 4, 8):
    cfg = dataclasses.replace(
        cfg0, efast=dataclasses.replace(cfg0.efast, micro_slices=q,
                                        micro_dense=MD))
    st = pipeline.init_corner_state(cfg)
    t0 = time.perf_counter()
    out = pipeline.corner_track_scan(st, xs, ys, ts, vs, cfg)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    np.asarray(out[1].num_filtered).ravel()[:1]
    t0 = time.perf_counter()
    # r4b: the draining readback is a FIXED ~23.5 ms round-trip (see
    # prof_inscan.py) — 20 chained reps amortize it below 0.04 ms/slice
    reps = 20
    for _ in range(reps):
        out = pipeline.corner_track_scan(st, xs, ys, ts, vs, cfg)
    np.asarray(out[1].num_filtered).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps / S
    evs = n / dt
    print(f"q={q:2d}: compile {comp:6.1f}s  {dt*1e3:7.2f} ms/slice  "
          f"{evs/1e6:.2f}M ev/s  ({evs/REF_EVS:.1f}x ref)", flush=True)
