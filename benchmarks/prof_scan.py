import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.io import synthetic, slice_by_count
from evflow_tpu.models import fastcluster, pipeline

cfg = DEFAULT
S = 8
n = cfg.slicing.n_events
stream = synthetic.moving_blob_stream(num_slices=S, events_per_slice=n)
sl = slice_by_count(stream, n, drop_partial=True)
xs = jnp.asarray(sl.x); ys = jnp.asarray(sl.y); vs = jnp.asarray(sl.valid_mask())
st = fastcluster.init_state(cfg.cluster)

t0 = time.perf_counter()
out = pipeline.cluster_flow_scan(st, xs, ys, vs, cfg)
jax.block_until_ready(out)
print("cluster_flow_scan compile+run:", round(time.perf_counter()-t0, 2), "s", flush=True)
best = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    out = pipeline.cluster_flow_scan(st, xs, ys, vs, cfg)
    jax.block_until_ready(out)
    best = min(best, time.perf_counter()-t0)
per_slice = best / S
print(f"scan best: {best*1e3:.2f} ms total, {per_slice*1e3:.3f} ms/slice, "
      f"{n/per_slice/1e6:.2f} M events/s", flush=True)
