"""Sharding tests — run in a subprocess on an 8-virtual-device CPU mesh
(the in-process backend is already initialized on the default platform)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cpu8(code: str, timeout=500):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    prelude = "import jax; jax.config.update('jax_platforms','cpu')\n"
    return subprocess.run([sys.executable, "-c", prelude + code], cwd=REPO,
                          env=env, capture_output=True, text=True,
                          timeout=timeout)


@pytest.mark.slow
def test_dryrun_multichip_8():
    r = _run_cpu8("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert r.returncode == 0, r.stderr[-3000:]
    assert "ok" in r.stdout


@pytest.mark.slow
def test_tiled_cluster_matches_single_device():
    code = """
import numpy as np, jax, jax.numpy as jnp
from evflow_tpu.config import EngineConfig, SensorConfig, ClusterConfig, SliceConfig
from evflow_tpu.parallel import mesh as mesh_mod, tiling
from evflow_tpu.models import fastcluster

n_dev = 4
tile_w = 64
cfg = EngineConfig(sensor=SensorConfig(width=tile_w*n_dev, height=128),
                   cluster=ClusterConfig(max_clusters=16, radius=15.0, min_n=3))
m = mesh_mod.make_tile_mesh(n_dev, cfg.parallel)
step = tiling.make_tiled_cluster_flow_step(m, cfg)

rng = np.random.default_rng(0)
cap = 128
x = np.zeros((n_dev, cap), np.int32); y = np.zeros((n_dev, cap), np.int32)
v = np.ones((n_dev, cap), bool)
# one blob per tile
for k in range(n_dev):
    x[k] = np.clip(rng.normal(k*tile_w + tile_w//2, 4, cap), k*tile_w, (k+1)*tile_w-1)
    y[k] = np.clip(rng.normal(64, 4, cap), 0, 127)

ts = mesh_mod.tile_sharding(m, cfg.parallel)
state = fastcluster.init_state(cfg.cluster)
st, out, uc, rc = step(state, jax.device_put(jnp.asarray(x), ts),
                       jax.device_put(jnp.asarray(y), ts),
                       jax.device_put(jnp.asarray(v), ts))
rep = np.asarray(out.reported)
assert rep.sum() == n_dev, rep.sum()

# single-device equivalent: global dedup over the concatenated events
from evflow_tpu.ops import hash_dedup
xx = jnp.asarray(x.reshape(-1)); yy = jnp.asarray(y.reshape(-1))
ded = hash_dedup.dedup(xx, yy, jnp.ones(n_dev*cap, bool), cfg.dedup, cfg.sensor)
# tiled unique >= global unique (per-tile tables split hash collisions)
assert int(uc) >= int(ded.unique_count)
print('parity ok', int(uc), int(ded.unique_count), int(rep.sum()))
"""
    r = _run_cpu8(code)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "parity ok" in r.stdout


@pytest.mark.slow
def test_distributed_cluster_equivalence():
    """update_slice_distributed on a 4-tile mesh must match update_slice on
    the tile-major concatenation of the same events (exact dedup so per-tile
    masks equal the global mask), across multiple slices of moving blobs."""
    code = """
import dataclasses
import numpy as np, jax, jax.numpy as jnp
from evflow_tpu.config import EngineConfig, SensorConfig, ClusterConfig, DedupConfig
from evflow_tpu.parallel import mesh as mesh_mod, tiling
from evflow_tpu.models import fastcluster
from evflow_tpu.ops import hash_dedup

n_dev, tile_w, cap = 4, 64, 256
cfg = EngineConfig(sensor=SensorConfig(width=tile_w*n_dev, height=128),
                   cluster=ClusterConfig(max_clusters=16, radius=15.0, min_n=3),
                   dedup=DedupConfig(exact=True))
m = mesh_mod.make_tile_mesh(n_dev, cfg.parallel)
step = tiling.make_tiled_cluster_flow_step(m, cfg)
ts = mesh_mod.tile_sharding(m, cfg.parallel)

rng = np.random.default_rng(1)
st_tiled = fastcluster.init_state(cfg.cluster)
st_single = fastcluster.init_state(cfg.cluster)
for s in range(4):
    x = np.zeros((n_dev, cap), np.int32); y = np.zeros((n_dev, cap), np.int32)
    for k in range(n_dev):
        cx = k*tile_w + tile_w//2 + 3*s
        x[k] = np.clip(rng.normal(cx, 4, cap), k*tile_w, (k+1)*tile_w-1)
        y[k] = np.clip(rng.normal(64 + 2*s, 4, cap), 0, 127)
    v = np.ones((n_dev, cap), bool)
    st_tiled, out_t, uc, rc = step(st_tiled,
        jax.device_put(jnp.asarray(x), ts), jax.device_put(jnp.asarray(y), ts),
        jax.device_put(jnp.asarray(v), ts))
    # single device on the tile-major concatenation, same dedup semantics
    xx = jnp.asarray(x.reshape(-1)); yy = jnp.asarray(y.reshape(-1))
    ded = hash_dedup.dedup_mask(xx, yy, jnp.ones(n_dev*cap, bool),
                                cfg.dedup, cfg.sensor)
    st_single, out_s = fastcluster.update_slice(
        st_single, xx, yy, ded.unique_mask, cfg.cluster, cfg.sensor)
    assert int(uc) == int(ded.unique_count), (s, int(uc), int(ded.unique_count))
    np.testing.assert_array_equal(np.asarray(st_tiled.alive), np.asarray(st_single.alive))
    np.testing.assert_array_equal(np.asarray(st_tiled.cid), np.asarray(st_single.cid))
    np.testing.assert_array_equal(np.asarray(out_t.n), np.asarray(out_s.n))
    np.testing.assert_allclose(np.asarray(st_tiled.mu), np.asarray(st_single.mu),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_t.centroid), np.asarray(out_s.centroid),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_t.flow), np.asarray(out_s.flow),
                               atol=1e-3)
print('distributed equivalence ok')
"""
    r = _run_cpu8(code)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "distributed equivalence ok" in r.stdout
