"""In-scan per-stage profile: each pipeline stage alone inside a lax.scan over
the same 32-slice moving-blob stream bench.py uses. Per-slice cost = total/32.
Single-step timing is useless on this rig (~26 ms dispatch overhead); only
whole-sequence scans measure the true per-slice cost (CLAUDE.md rule 5)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.io import synthetic, slice_by_count
from evflow_tpu.ops import hash_dedup, sae as sae_ops, efast, nms as nms_ops
from evflow_tpu.models import fastcluster, tracker as trk, pipeline

cfg = DEFAULT
n_slices, n = 32, cfg.slicing.n_events
# --textured profiles the adversarial scene (VERDICT r4 task #6: find where
# its extra ~0.7 ms/slice goes); default is bench.py's blob stream
if "--textured" in sys.argv:
    stream = synthetic.textured_field_stream(
        num_slices=n_slices, events_per_slice=n)
else:
    stream = synthetic.moving_blob_stream(
        num_slices=n_slices, events_per_slice=n,
        blob_centers=((200.0, 200.0), (900.0, 500.0), (600.0, 150.0)),
        velocities=((30.0, 10.0), (-20.0, 15.0), (5.0, -12.0)), sigma=12.0)
slices = slice_by_count(stream, n, drop_partial=True)
t0 = int(stream.t[0])
xs = jnp.asarray(slices.x); ys = jnp.asarray(slices.y)
ts = jnp.asarray((slices.t - t0).astype(np.int32))
vs = jnp.asarray(slices.valid_mask())


def _drain(out):
    # 1-element ON-DEVICE slice then readback: block_until_ready alone can
    # return before the remote queue drains (CLAUDE.md); np.asarray of a full
    # leaf would measure transfer instead
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


# r4b METHODOLOGY FIX: the old per-rep drain added a FIXED ~23.5 ms
# relay round-trip to every measurement — which, divided by 32 slices,
# produced the phantom "~0.75 ms/step scan floor" in the r3/r4 notes (a
# 1-op scan step, a 256-step scan, and 20 chained dispatches all measure
# the same ~23-26 ms total; /tmp probes, r4b). Chain CHAIN dispatches per
# drain and subtract the measured null-scan floor so rows report true
# per-slice device compute.
CHAIN = 8
_floor_ms = [0.0]


def bench(name, make_scan, chain=CHAIN):
    f = jax.jit(make_scan)
    t0 = time.perf_counter(); _drain(f()); cmp = time.perf_counter()-t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(chain):
            out = f()
        _drain(out)
        best = min(best, time.perf_counter()-t0)
    total_ms = best * 1e3
    net = (total_ms - _floor_ms[0]) / (chain * n_slices)
    print(f"{name:20s} compile {cmp:7.1f}s  chain{chain} {total_ms:8.2f} ms"
          f"  per-slice {net:7.3f} ms", flush=True)
    return total_ms


def calibrate_floor():
    def mk_null():
        def step(c, x):
            return c + x[0], None
        return jax.lax.scan(step, jnp.int32(0), xs)
    _floor_ms[0] = bench("null(floor)", mk_null)
calibrate_floor()


# 1. dedup alone
def mk_dedup():
    def step(c, ev):
        x, y, v = ev
        d = hash_dedup.dedup(x, y, v, cfg.dedup, cfg.sensor)
        return c, (d.unique_count, d.repeated_count)
    return jax.lax.scan(step, 0, (xs, ys, vs))
bench("dedup", mk_dedup)

# 2. SAE scatter alone (carry the surface)
def mk_sae():
    def step(s, ev):
        x, y, t, v = ev
        s = sae_ops.update_sae(s, x, y, t, v)
        return s, jnp.sum(s[::64, ::64])
    return jax.lax.scan(step, sae_ops.init_sae(cfg.sensor), (xs, ys, ts, vs))
bench("sae", mk_sae)

# 3. eFAST alone (carry the surface too — realistic gather source)
def mk_efast():
    def step(s, ev):
        x, y, t, v = ev
        s = sae_ops.update_sae(s, x, y, t, v)
        m = efast.detect_corners(s, x, y, v, cfg.efast, cfg.sensor)
        return s, jnp.sum(m.astype(jnp.int32))
    return jax.lax.scan(step, sae_ops.init_sae(cfg.sensor), (xs, ys, ts, vs))
bench("sae+efast", mk_efast)

# 4. NMS alone over 512 synthetic candidates per slice
rng = np.random.default_rng(0)
cxs = jnp.asarray(rng.integers(0, 1280, (n_slices, 512)), jnp.int32)
cys = jnp.asarray(rng.integers(0, 720, (n_slices, 512)), jnp.int32)
cvs = jnp.ones((n_slices, 512), bool)
def mk_nms():
    def step(c, ev):
        x, y, v = ev
        r = nms_ops.filter_corners(x, y, v, cfg.nms)
        return c, r.count
    return jax.lax.scan(step, 0, (cxs, cys, cvs))
bench("nms512", mk_nms)

# 5. tracker alone over 512 synthetic detections per slice
def mk_tracker():
    def step(s, ev):
        x, y, v = ev
        s, groups = trk.update(s, x.astype(jnp.float32), y.astype(jnp.float32), v, cfg.tracker)
        return s, jnp.sum(s.active.astype(jnp.int32))
    return jax.lax.scan(step, trk.init_state(cfg.tracker), (cxs, cys, cvs))
bench("tracker512", mk_tracker)

# 5b. tracker with few detections (64) — realistic post-NMS count
cvs64 = jnp.arange(512)[None, :] < 64
def mk_tracker64():
    def step(s, ev):
        x, y, v = ev
        s, groups = trk.update(s, x.astype(jnp.float32), y.astype(jnp.float32), v, cfg.tracker)
        return s, jnp.sum(s.active.astype(jnp.int32))
    return jax.lax.scan(step, trk.init_state(cfg.tracker), (cxs, cys, jnp.broadcast_to(cvs64, (n_slices, 512))))
bench("tracker64", mk_tracker64)

# 6. fastcluster alone
def mk_cluster():
    def step(s, ev):
        x, y, v = ev
        s, out = fastcluster.update_slice(s, x, y, v, cfg.cluster, cfg.sensor)
        return s, out.centroid
    return jax.lax.scan(step, fastcluster.init_state(cfg.cluster), (xs, ys, vs))
bench("fastcluster", mk_cluster)

# 6b. fastcluster with matmul stats (r4b: one-hot cumsum ranks + MXU
# aggregate matmuls instead of sort + segment_sum scatters)
import dataclasses
cfgMM = dataclasses.replace(
    cfg, cluster=dataclasses.replace(cfg.cluster, stats_matmul=True))
def mk_cluster_mm():
    def step(s, ev):
        x, y, v = ev
        s, out = fastcluster.update_slice(s, x, y, v, cfgMM.cluster, cfgMM.sensor)
        return s, out.centroid
    return jax.lax.scan(step, fastcluster.init_state(cfgMM.cluster), (xs, ys, vs))
bench("fastclusterMM", mk_cluster_mm)

# 6c. fastcluster with the fused Pallas stats kernel (r5 task #5)
cfgPL = dataclasses.replace(
    cfg, cluster=dataclasses.replace(cfg.cluster, stats_pallas=True))
def mk_cluster_pl():
    def step(s, ev):
        x, y, v = ev
        s, out = fastcluster.update_slice(s, x, y, v, cfgPL.cluster,
                                          cfgPL.sensor)
        return s, out.centroid
    return jax.lax.scan(step, fastcluster.init_state(cfgPL.cluster),
                        (xs, ys, vs))
bench("fastclusterPL", mk_cluster_pl)

# 7. full steps
def mk_full_cluster():
    return pipeline.cluster_flow_scan(fastcluster.init_state(cfg.cluster), xs, ys, vs, cfg)
bench("cluster_step", mk_full_cluster)

def mk_full_cluster_mm():
    return pipeline.cluster_flow_scan(fastcluster.init_state(cfgMM.cluster), xs, ys, vs, cfgMM)
bench("cluster_stepMM", mk_full_cluster_mm)

def mk_full_corner():
    return pipeline.corner_track_scan(pipeline.init_corner_state(cfg), xs, ys, ts, vs, cfg)
bench("corner_step", mk_full_corner)

# 8. the bench.py fused scan, A/B on stats_matmul
def mk_full():
    return pipeline.full_scan(fastcluster.init_state(cfg.cluster),
                              pipeline.init_corner_state(cfg), xs, ys, ts, vs, cfg)
bench("full_scan", mk_full)

def mk_full_mm():
    return pipeline.full_scan(fastcluster.init_state(cfgMM.cluster),
                              pipeline.init_corner_state(cfgMM), xs, ys, ts, vs, cfgMM)
bench("full_scanMM", mk_full_mm)

# 9. r5 micro-slice q=8: snapshot-stack backend vs the r3-r4 serial chain,
# corner step alone and the full fused scan (the parity-grade headline)
cfgQ8 = dataclasses.replace(
    cfg, efast=dataclasses.replace(cfg.efast, micro_slices=8))
cfgQ8s = dataclasses.replace(
    cfg, efast=dataclasses.replace(cfg.efast, micro_slices=8,
                                   micro_stack=False))
def mk_corner_q8():
    return pipeline.corner_track_scan(pipeline.init_corner_state(cfgQ8),
                                      xs, ys, ts, vs, cfgQ8)
bench("corner_step_q8stack", mk_corner_q8)

def mk_corner_q8_serial():
    return pipeline.corner_track_scan(pipeline.init_corner_state(cfgQ8s),
                                      xs, ys, ts, vs, cfgQ8s)
bench("corner_step_q8serial", mk_corner_q8_serial)

def mk_full_q8():
    return pipeline.full_scan(fastcluster.init_state(cfgQ8.cluster),
                              pipeline.init_corner_state(cfgQ8),
                              xs, ys, ts, vs, cfgQ8)
bench("full_scan_q8stack", mk_full_q8)
