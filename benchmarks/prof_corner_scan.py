import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.io import synthetic, slice_by_count
from evflow_tpu.models import pipeline

cfg = DEFAULT
S = 8
n = cfg.slicing.n_events
stream = synthetic.moving_blob_stream(num_slices=S, events_per_slice=n)
sl = slice_by_count(stream, n, drop_partial=True)
xs = jnp.asarray(sl.x); ys = jnp.asarray(sl.y); vs = jnp.asarray(sl.valid_mask())
ts = jnp.asarray((sl.t - int(stream.t[0])).astype(np.int32))
co = pipeline.init_corner_state(cfg)
f = functools.partial(pipeline.corner_track_scan, cfg=cfg)
t0 = time.perf_counter(); out = f(co, xs, ys, ts, vs); jax.block_until_ready(out)
print(f"corner scan (new tracker): compile {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(4):
    t0 = time.perf_counter(); out = f(co, xs, ys, ts, vs); jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
print(f"run: {best/S*1e3:.3f} ms/slice", flush=True)
