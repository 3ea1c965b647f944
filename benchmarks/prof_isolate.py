import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.io import synthetic, slice_by_count
from evflow_tpu.models import fastcluster, pipeline, tracker as trk
from evflow_tpu.ops import hash_dedup, sae as sae_ops, efast, nms as nms_ops

cfg = DEFAULT
S = 8
n = cfg.slicing.n_events
stream = synthetic.moving_blob_stream(num_slices=S, events_per_slice=n)
sl = slice_by_count(stream, n, drop_partial=True)
xs = jnp.asarray(sl.x); ys = jnp.asarray(sl.y); vs = jnp.asarray(sl.valid_mask())
ts = jnp.asarray((sl.t - int(stream.t[0])).astype(np.int32))

def bench(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} compile {comp:7.1f}s  {best/S*1e3:7.3f} ms/slice", flush=True)

# corner scan WITHOUT tracker (SAE + eFAST + compaction + NMS only)
@jax.jit
def corner_notrack_scan(sae0, xs, ys, ts, vs):
    def step(sae, ev):
        x, y, t, v = ev
        sae = sae_ops.update_sae(sae, x, y, t, v)
        cm = efast.detect_corners(sae, x, y, v, cfg.efast, cfg.sensor)
        cap = cfg.nms.max_corners
        pos = jnp.cumsum(cm.astype(jnp.int32)) - 1
        keep = cm & (pos < cap)
        spos = jnp.where(keep, pos, cap)
        cx = jnp.zeros((cap + 1,), jnp.int32).at[spos].set(jnp.where(keep, x, 0), mode="drop")[:cap]
        cy = jnp.zeros((cap + 1,), jnp.int32).at[spos].set(jnp.where(keep, y, 0), mode="drop")[:cap]
        cvalid = jnp.arange(cap) < jnp.minimum(jnp.sum(cm.astype(jnp.int32)), cap)
        filt = nms_ops.filter_corners(cx, cy, cvalid, cfg.nms)
        return sae, filt.count
    return jax.lax.scan(step, sae0, (xs, ys, ts, vs))

# cluster scan WITHOUT the EWMA closed form (mu = windowed centroid)
@jax.jit
def cluster_noewma_scan(st, xs, ys, vs):
    import dataclasses
    def step(state, ev):
        x, y, v = ev
        ded = hash_dedup.dedup(x, y, v, cfg.dedup, cfg.sensor)
        lane = jnp.arange(x.shape[0])
        uvalid = lane < ded.unique_count
        # assignment + windowed stats only (no sort-based EWMA): approximate
        # by skipping the mu update (mu := previous centroid)
        state2, out = fastcluster.update_slice(state, ded.unique_x, ded.unique_y,
                                               uvalid, cfg.cluster, cfg.sensor)
        return state2, out.unique_count if hasattr(out, "unique_count") else ded.unique_count
    return jax.lax.scan(step, st, (xs, ys, vs))

sae0 = sae_ops.init_sae(cfg.sensor)
bench("corner scan no-tracker", corner_notrack_scan, sae0, xs, ys, ts, vs)
co = pipeline.init_corner_state(cfg)
bench("corner scan full", functools.partial(pipeline.corner_track_scan, cfg=cfg), co, xs, ys, ts, vs)
st = fastcluster.init_state(cfg.cluster)
bench("cluster scan full", functools.partial(pipeline.cluster_flow_scan, cfg=cfg), st, xs, ys, vs)
