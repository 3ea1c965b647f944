import numpy as np
import jax.numpy as jnp
import pytest

from evflow_tpu.config import DBSCANConfig
from evflow_tpu.models.dbscan import dbscan, dbscan_grid, dbscan_reference_numpy
from evflow_tpu.models.pointcloud import voxel_downsample, ransac_plane, remove_plane


def _blobs(seed=0):
    rng = np.random.default_rng(seed)
    return np.concatenate([
        rng.normal((0, 0), 2.0, (120, 2)),
        rng.normal((100, 0), 2.0, (150, 2)),
        rng.normal((0, 100), 2.0, (80, 2)),
        rng.uniform(-50, 150, (30, 2)),      # sparse noise
    ]).astype(np.float32)


CFG = DBSCANConfig(eps=8.0, core_min_pts=10, min_cluster_size=40,
                   max_cluster_size=10_000)


def _as_sets(labels):
    out = {}
    for i, l in enumerate(labels):
        if l >= 0:
            out.setdefault(int(l), set()).add(i)
    return out


def test_dbscan_matches_bfs_oracle_membership():
    pts = _blobs()
    res = dbscan(jnp.asarray(pts), cfg=CFG)
    got = _as_sets(np.asarray(res.labels))
    exp = dbscan_reference_numpy(pts, CFG)
    assert int(res.num_clusters) == len(exp)
    exp_sets = [set(c) for c in exp]
    # same clusters as sets, same size-descending order
    for k in range(len(exp_sets)):
        assert got[k] == exp_sets[k], (len(got[k]), len(exp_sets[k]))


def test_dbscan_noise_is_unlabeled():
    pts = _blobs(1)
    res = dbscan(jnp.asarray(pts), cfg=CFG)
    labels = np.asarray(res.labels)
    # the sparse uniform noise points should mostly be -1
    noise_labels = labels[-30:]
    assert (noise_labels == -1).mean() > 0.6


def test_dbscan_size_filter():
    pts = _blobs(2)
    cfg = DBSCANConfig(eps=8.0, core_min_pts=10, min_cluster_size=100,
                       max_cluster_size=10_000)
    res = dbscan(jnp.asarray(pts), cfg=cfg)
    exp = dbscan_reference_numpy(pts, cfg)
    assert int(res.num_clusters) == len(exp)  # only clusters >= 100


def test_dbscan_valid_mask():
    pts = _blobs(3)
    valid = np.ones(len(pts), bool)
    valid[:60] = False   # mask away half of blob 0
    res = dbscan(jnp.asarray(pts), jnp.asarray(valid), cfg=CFG)
    labels = np.asarray(res.labels)
    assert np.all(labels[:60] == -1)


# ---------------------------------------------------------------- pointcloud

def test_voxel_downsample():
    pts = np.array([[0.0, 0, 0], [0.004, 0.004, 0], [0.5, 0.5, 0.5],
                    [0.504, 0.5, 0.5]], np.float32)
    res = voxel_downsample(jnp.asarray(pts), leaf=0.01)
    assert int(res.count) == 2
    got = np.asarray(res.points)[:2]
    got = got[np.argsort(got[:, 0])]
    np.testing.assert_allclose(got[0], [0.002, 0.002, 0.0], atol=1e-6)
    np.testing.assert_allclose(got[1], [0.502, 0.5, 0.5], atol=1e-6)


def test_ransac_plane_and_removal():
    rng = np.random.default_rng(5)
    plane_pts = np.stack([rng.uniform(0, 1, 500), rng.uniform(0, 1, 500),
                          np.full(500, 0.3) + rng.normal(0, 0.005, 500)], 1)
    blob = rng.normal((0.5, 0.5, 0.8), 0.05, (100, 3))
    pts = np.concatenate([plane_pts, blob]).astype(np.float32)
    res = ransac_plane(jnp.asarray(pts), threshold=0.02, iters=100)
    inl = np.asarray(res.inliers)
    assert inl[:500].mean() > 0.95      # plane found
    assert inl[500:].mean() < 0.2       # blob kept
    keep = remove_plane(jnp.asarray(pts), jnp.ones(len(pts), bool), res)
    keep = np.asarray(keep)
    assert keep[500:].mean() > 0.8
    # plane normal ~ (0,0,±1)
    n = np.asarray(res.coeffs)[:3]
    assert abs(abs(n[2]) - 1.0) < 0.05


def test_dbscan_grid_matches_dense():
    rng = np.random.default_rng(4)
    pts = np.concatenate([
        rng.normal((0, 0), 2.0, (300, 2)),
        rng.normal((100, 0), 2.0, (250, 2)),
        rng.normal((0, 100), 2.0, (200, 2)),
        rng.uniform(0, 100, (30, 2)),         # sparse noise
    ]).astype(np.float32)
    cfg = DBSCANConfig(eps=6.0, core_min_pts=8, min_cluster_size=50,
                       max_cluster_size=10000)
    dense = dbscan(jnp.asarray(pts), cfg=cfg)
    grid = dbscan_grid(pts, cfg=cfg)
    assert int(dense.num_clusters) == int(grid.num_clusters) == 3
    # identical membership partition (label ids may permute)
    ld, lg = np.asarray(dense.labels), np.asarray(grid.labels)
    assert ({frozenset(s) for s in _as_sets(ld).values()}
            == {frozenset(s) for s in _as_sets(lg).values()})
