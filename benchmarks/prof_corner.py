import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.ops import sae as sae_ops, efast, nms as nms_ops
from evflow_tpu.models import tracker as trk

cfg = DEFAULT
n = 16384
rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0,1280,n),jnp.int32); y = jnp.asarray(rng.integers(0,720,n),jnp.int32)
t_ = jnp.asarray(np.sort(rng.integers(0,50000,n)),jnp.int32)
v = jnp.ones(n, bool)
S = sae_ops.init_sae(cfg.sensor)

def t(name, f, *a):
    t0=time.perf_counter(); out=f(*a); jax.block_until_ready(out)
    c=time.perf_counter()-t0
    best=1e9
    for _ in range(3):
        t0=time.perf_counter(); out=f(*a); jax.block_until_ready(out)
        best=min(best,time.perf_counter()-t0)
    print(name, "compile:", round(c,2), "run:", round(best*1e3,2), "ms")

t("sae_update", jax.jit(sae_ops.update_sae), S, x, y, t_, v)
t("efast", jax.jit(lambda s,a,b,vv: efast.detect_corners(s,a,b,vv,cfg.efast,cfg.sensor)), S, x, y, v)
cx = jnp.asarray(rng.integers(0,1280,512),jnp.int32); cy = jnp.asarray(rng.integers(0,720,512),jnp.int32)
cv = jnp.ones(512,bool)
t("nms512", jax.jit(lambda a,b,vv: nms_ops.filter_corners(a,b,vv,cfg.nms)), cx, cy, cv)
st = trk.init_state(cfg.tracker)
dx = cx.astype(jnp.float32); dy = cy.astype(jnp.float32)
t("tracker", lambda s,a,b,vv: trk.update(s,a,b,vv,cfg.tracker), st, dx, dy, cv)
