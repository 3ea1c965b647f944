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


@pytest.mark.slow
def test_adversarial_nms_chain():
    """VERDICT r2 item 9: an unbroken suppression chain of pairwise-
    overlapping candidates (14 px apart at box 15) spanning several tiles.
    A trigger corner in tile 0's right strip flips the whole chain's greedy
    alternation. The r2 two-pass tile-local NMS (nms_exchange_rounds=2) must
    DEVIATE from the replicated greedy on this chain (the acknowledged
    window, now exercised), and n_tiles rounds must close it exactly."""
    code = """
import dataclasses
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map
from evflow_tpu.config import EngineConfig, SensorConfig, NMSConfig, ParallelConfig
from evflow_tpu.parallel import mesh as mesh_mod, tiling
from evflow_tpu.ops import nms as nms_ops

n_dev, tile_w, cap = 4, 64, 32
base = EngineConfig(sensor=SensorConfig(width=tile_w * n_dev, height=128),
                    nms=NMSConfig(box_size=15, max_corners=cap))
m = mesh_mod.make_tile_mesh(n_dev, base.parallel)

# candidates: trigger at x=50 (tile 0 right strip), then a 14-px chain
# spanning tiles 1..3; all y=60
chain = [50] + list(range(64, tile_w * n_dev - 8, 14))
ys_ = [60] * len(chain)

# per-tile arrays in tile-major order
px = np.zeros((n_dev, cap), np.int32)
py = np.zeros((n_dev, cap), np.int32)
pv = np.zeros((n_dev, cap), bool)
fill = [0] * n_dev
for cx_, cy_ in zip(chain, ys_):
    k = min(cx_ // tile_w, n_dev - 1)
    px[k, fill[k]] = cx_; py[k, fill[k]] = cy_; pv[k, fill[k]] = True
    fill[k] += 1

def run(rounds):
    cfg = dataclasses.replace(
        base, parallel=dataclasses.replace(base.parallel,
                                           nms_exchange_rounds=rounds))
    axis = cfg.parallel.tile_axis
    def per_tile(x, y, v):
        my = jax.lax.axis_index(axis)
        filt = tiling.tile_local_nms(x[0], y[0], v[0], axis, my,
                                     n_dev, my * tile_w, tile_w, cfg)
        return filt.x[None], (jnp.arange(cap) < filt.count)[None]
    sm = shard_map(per_tile, mesh=m,
                   in_specs=(P(axis), P(axis), P(axis)),
                   out_specs=(P(axis), P(axis)), check_vma=False)
    fx, fv = jax.jit(sm)(jnp.asarray(px), jnp.asarray(py), jnp.asarray(pv))
    fx, fv = np.asarray(fx), np.asarray(fv)
    return sorted(int(v) for k in range(n_dev) for v in fx[k][fv[k]])

# replicated greedy over the tile-major concatenation (ground truth)
gx = np.concatenate([px[k, :fill[k]] for k in range(n_dev)])
gy = np.concatenate([py[k, :fill[k]] for k in range(n_dev)])
rx = np.zeros(cap * 2, np.int32); rx[:len(gx)] = gx
ry = np.zeros(cap * 2, np.int32); ry[:len(gy)] = gy
rv = np.arange(cap * 2) < len(gx)
ref = nms_ops.filter_corners(jnp.asarray(rx), jnp.asarray(ry),
                             jnp.asarray(rv), base.nms)
truth = sorted(int(v) for v in np.asarray(ref.x)[:int(ref.count)])

two_pass = run(2)
fixpoint = run(n_dev)
print("truth:   ", truth)
print("2-pass:  ", two_pass)
print("fixpoint:", fixpoint)
assert fixpoint == truth, (fixpoint, truth)
assert two_pass != truth, "adversarial chain failed to expose the 2-pass window"
print("NMS-CHAIN-OK")
"""
    r = _run_cpu8(code)
    assert r.returncode == 0, r.stderr[-3000:]
    assert "NMS-CHAIN-OK" in r.stdout


@pytest.mark.slow
def test_batch_clustering_sharded_equivalence():
    """VERDICT r3 #4 — the batch O(N²/grid) paths distributed over the mesh:
    compute_neighbors (OPTICS precompute), DBSCAN, and k-means row-sharded
    over 8 virtual devices must reproduce the single-device results
    (neighbors/DBSCAN bit-identical; k-means centroids to fp-reduction-order
    tolerance with identical labels)."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from evflow_tpu.parallel import batch
from evflow_tpu.models import optics, dbscan as dbscan_mod, kmeans as kmeans_mod
from evflow_tpu.config import DBSCANConfig, KMeansConfig
from evflow_tpu.io import synthetic

rng = np.random.default_rng(0)
# clustered + noise cloud, deliberately NOT a multiple of 8
n = 3001
cents = rng.uniform(0, 900, (12, 2))
pts = np.concatenate([
    cents[rng.integers(0, 12, n - 500)] + rng.normal(0, 8, (n - 500, 2)),
    rng.uniform(0, 1000, (500, 2))]).astype(np.float32)[:n]

mesh = batch.make_batch_mesh(8)

# --- OPTICS neighbor precompute: bit-identical rows
ref = optics.compute_neighbors(pts, eps=25.0, min_pts=10, max_neighbors=64)
sh = batch.compute_neighbors_sharded(pts, eps=25.0, min_pts=10,
                                     max_neighbors=64, mesh=mesh)
np.testing.assert_array_equal(np.asarray(ref.idx), np.asarray(sh.idx))
np.testing.assert_array_equal(np.asarray(ref.count), np.asarray(sh.count))
np.testing.assert_array_equal(np.asarray(ref.dist), np.asarray(sh.dist))
np.testing.assert_array_equal(np.asarray(ref.core_dist),
                              np.asarray(sh.core_dist))

# --- DBSCAN: bit-identical labels (integer min-propagation)
dcfg = DBSCANConfig(eps=20.0, core_min_pts=10, min_cluster_size=30,
                    max_cluster_size=100000)
rd = dbscan_mod.dbscan(jnp.asarray(pts), None, dcfg)
sd = batch.dbscan_sharded(jnp.asarray(pts), None, dcfg, mesh=mesh)
np.testing.assert_array_equal(np.asarray(rd.labels), np.asarray(sd.labels))
np.testing.assert_array_equal(np.asarray(rd.core_mask),
                              np.asarray(sd.core_mask))
assert int(rd.num_clusters) == int(sd.num_clusters) > 0

# --- k-means on the reference's synthetic ramp (assign_to_centers2.c:121-131)
kpts = synthetic.kmeans_ramp_data(2048)
c0 = synthetic.kmeans_initial_centroids()
kcfg = KMeansConfig()
rk = kmeans_mod.kmeans(jnp.asarray(kpts), jnp.asarray(c0), None, kcfg)
sk = batch.kmeans_sharded(jnp.asarray(kpts), jnp.asarray(c0), None, kcfg,
                          mesh=mesh)
np.testing.assert_allclose(np.asarray(rk.centroids), np.asarray(sk.centroids),
                           rtol=1e-5, atol=1e-3)
np.testing.assert_array_equal(np.asarray(rk.labels), np.asarray(sk.labels))
np.testing.assert_array_equal(np.asarray(rk.counts), np.asarray(sk.counts))
print('batch sharded equivalence ok', int(rd.num_clusters), int(rk.iters),
      int(sk.iters))
"""
    r = _run_cpu8(code)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "batch sharded equivalence ok" in r.stdout
