import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.io import synthetic, slice_by_count
from evflow_tpu.models import pipeline, tracker as trk
from evflow_tpu.ops import sae as sae_ops, efast, nms as nms_ops

cfg = DEFAULT
S = 8
n = cfg.slicing.n_events
stream = synthetic.moving_blob_stream(num_slices=S, events_per_slice=n)
sl = slice_by_count(stream, n, drop_partial=True)
xs = jnp.asarray(sl.x); ys = jnp.asarray(sl.y); vs = jnp.asarray(sl.valid_mask())
ts = jnp.asarray((sl.t - int(stream.t[0])).astype(np.int32))

# corner scan with the tracker's GROUPING disabled via monkeypatched radius=0
import dataclasses
cfg_ng = dataclasses.replace(cfg, tracker=dataclasses.replace(cfg.tracker, group_radius=0.0))

def bench(name, cfgv):
    co = pipeline.init_corner_state(cfgv)
    f = functools.partial(pipeline.corner_track_scan, cfg=cfgv)
    t0 = time.perf_counter(); out = f(co, xs, ys, ts, vs); jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); out = f(co, xs, ys, ts, vs); jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    # how many corners/filtered after warm data?
    nf = np.asarray(out[1].num_filtered)
    print(f"{name:18s} compile {comp:6.1f}s  {best/S*1e3:7.3f} ms/slice  filtered/slice={nf.tolist()}", flush=True)

bench("group_radius=0", cfg_ng)
