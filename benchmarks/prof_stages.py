import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.ops import hash_dedup, sae as sae_ops, efast, nms as nms_ops
from evflow_tpu.models import fastcluster, tracker as trk, pipeline

cfg = DEFAULT
rng=np.random.default_rng(0)
n=16384
x = jnp.asarray(rng.integers(0,1280,n),jnp.int32); y = jnp.asarray(rng.integers(0,720,n),jnp.int32)
tt = jnp.asarray(np.sort(rng.integers(0,50000,n)),jnp.int32)
v = jnp.ones(n, bool)

def t(name, f, *a):
    t0=time.perf_counter(); out=f(*a); jax.block_until_ready(out)
    cmp=time.perf_counter()-t0
    best=1e9
    for _ in range(5):
        t0=time.perf_counter(); out=f(*a); jax.block_until_ready(out)
        best=min(best,time.perf_counter()-t0)
    print(f"{name:22s} compile: {cmp:7.2f}s  run: {best*1e3:8.3f} ms", flush=True)

t("dedup", jax.jit(lambda a,b,c_: hash_dedup.dedup(a,b,c_,cfg.dedup,cfg.sensor)), x, y, v)
S = sae_ops.init_sae(cfg.sensor)
t("sae_update", jax.jit(sae_ops.update_sae), S, x, y, tt, v)
t("efast", jax.jit(lambda s,a,b,vv: efast.detect_corners(s,a,b,vv,cfg.efast,cfg.sensor)), S, x, y, v)
cx = jnp.asarray(rng.integers(0,1280,512),jnp.int32); cy = jnp.asarray(rng.integers(0,720,512),jnp.int32)
cv = jnp.ones(512,bool)
t("nms512", jax.jit(lambda a,b,vv: nms_ops.filter_corners(a,b,vv,cfg.nms)), cx, cy, cv)
ts0 = trk.init_state(cfg.tracker)
t("tracker", lambda s,a,b,vv: trk.update(s,a,b,vv,cfg.tracker), ts0, cx.astype(jnp.float32), cy.astype(jnp.float32), cv)
st = fastcluster.init_state(cfg.cluster)
t("fastcluster", lambda s,a,b,vv: fastcluster.update_slice(s,a,b,vv,cfg.cluster,cfg.sensor), st, x, y, v)
co = pipeline.init_corner_state(cfg)
t("corner_step", lambda s,a,b,c_,vv: pipeline.corner_track_step(s,a,b,c_,vv,cfg), co, x, y, tt, v)
t("cluster_step", lambda s,a,b,vv: pipeline.cluster_flow_step(s,a,b,vv,cfg), st, x, y, v)
