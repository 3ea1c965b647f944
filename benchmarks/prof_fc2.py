import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.config import DEFAULT
from evflow_tpu.models import fastcluster, pipeline

cfg = DEFAULT
rng = np.random.default_rng(0)
n = 16384
x = jnp.asarray(rng.integers(0,1280,n),jnp.int32)
y = jnp.asarray(rng.integers(0,720,n),jnp.int32)
v = jnp.ones(n, bool)
st = fastcluster.init_state(cfg.cluster)

def t(name, f, *a):
    t0=time.perf_counter(); out=f(*a); jax.block_until_ready(out)
    cmp=time.perf_counter()-t0
    best=1e9
    for _ in range(5):
        t0=time.perf_counter(); out=f(*a); jax.block_until_ready(out)
        best=min(best,time.perf_counter()-t0)
    print(f"{name:14s} compile {cmp:6.2f}s run {best*1e3:8.3f} ms", flush=True)

t("update_slice", lambda s,a,b,vv: fastcluster.update_slice(s,a,b,vv,cfg.cluster,cfg.sensor), st, x, y, v)
t("cluster_step", lambda s,a,b,vv: pipeline.cluster_flow_step(s,a,b,vv,cfg), st, x, y, v)
