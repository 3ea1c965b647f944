import numpy as np
import jax.numpy as jnp
import pytest

from evflow_tpu.config import ClusterConfig, SensorConfig, EngineConfig, SliceConfig
from evflow_tpu.models import fastcluster as fc
from evflow_tpu.models import pipeline
from evflow_tpu.io import synthetic, slice_by_count

CFG = ClusterConfig(sz_buffer=800, radius=40.0, min_n=10, max_clusters=64)
SENSOR = SensorConfig()


def _slice_events(cx_list, n_per, sigma, seed):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([
        np.stack([rng.normal(cx, sigma, n_per), rng.normal(cy, sigma, n_per)], 1)
        for cx, cy in cx_list])
    pts = np.clip(np.round(pts), 0, 1000).astype(np.int32)
    rng.shuffle(pts)
    return pts[:, 0], pts[:, 1]


def test_blobs_form_clusters_and_flow():
    # window_slices=1: centroid = current-slice mean (the default multi-slice
    # window lags a moving blob by ~(R-1)/2 slices of velocity, as does the
    # reference's 800-event window)
    state = fc.init_state(CFG, window_slices=1)
    centers = [(200.0, 200.0), (700.0, 400.0)]
    vel = np.array([[15.0, 5.0], [-10.0, 8.0]])
    outs = []
    for s in range(6):
        cs = [(c[0] + vel[i][0] * s, c[1] + vel[i][1] * s)
              for i, c in enumerate(centers)]
        x, y = _slice_events(cs, 400, 8.0, seed=s)
        n = len(x)
        state, out = fc.update_slice(state, jnp.asarray(x), jnp.asarray(y),
                                     jnp.ones(n, bool), CFG, SENSOR)
        outs.append(out)
    rep = np.asarray(outs[-1].reported)
    assert rep.sum() == 2
    cents = np.asarray(outs[-1].centroid)[rep]
    expected = np.array([(c[0] + vel[i][0] * 5, c[1] + vel[i][1] * 5)
                         for i, c in enumerate(centers)])
    # each expected blob center recovered within a few px
    for e in expected:
        assert np.min(np.linalg.norm(cents - e, axis=1)) < 6.0
    # flow approximates ground-truth per-slice velocity
    flows = np.asarray(outs[-1].flow)[rep]
    cids = np.asarray(outs[-1].cid)[rep]
    for f in flows:
        d = np.linalg.norm(vel - f, axis=1)
        assert d.min() < 4.0


def test_persistent_ids_stable_across_slices():
    state = fc.init_state(CFG)
    ids_seen = []
    for s in range(4):
        x, y = _slice_events([(300.0 + 10 * s, 300.0)], 300, 6.0, seed=10 + s)
        state, out = fc.update_slice(state, jnp.asarray(x), jnp.asarray(y),
                                     jnp.ones(len(x), bool), CFG, SENSOR)
        rep = np.asarray(out.reported)
        ids_seen.append(np.asarray(out.cid)[rep].tolist())
    assert all(ids == ids_seen[1] for ids in ids_seen[1:])


def test_cluster_expiry():
    state = fc.init_state(CFG, window_slices=2)
    x, y = _slice_events([(300.0, 300.0)], 300, 6.0, seed=3)
    state, out = fc.update_slice(state, jnp.asarray(x), jnp.asarray(y),
                                 jnp.ones(len(x), bool), CFG, SENSOR)
    assert np.asarray(out.alive).sum() >= 1
    # empty slices: cluster must die once the window drains
    empty = jnp.zeros((len(x),), jnp.int32)
    for _ in range(3):
        state, out = fc.update_slice(state, empty, empty,
                                     jnp.zeros(len(x), bool), CFG, SENSOR)
    assert np.asarray(out.alive).sum() == 0


def test_nearby_clusters_merge():
    cfg = ClusterConfig(sz_buffer=800, radius=50.0, min_n=5, max_clusters=64)
    state = fc.init_state(cfg)
    # two blobs drifting into each other
    for s in range(5):
        gap = 200 - 45 * s
        x, y = _slice_events([(400.0 - gap / 2, 300.0), (400.0 + gap / 2, 300.0)],
                             200, 5.0, seed=20 + s)
        state, out = fc.update_slice(state, jnp.asarray(x), jnp.asarray(y),
                                     jnp.ones(len(x), bool), cfg, SENSOR)
    assert np.asarray(out.alive).sum() == 1   # merged


def test_flagship_pipeline_runs_end_to_end():
    stream = synthetic.moving_blob_stream(
        num_slices=5, events_per_slice=4096,
        blob_centers=((300.0, 300.0), (800.0, 400.0)),
        velocities=((20.0, 0.0), (0.0, 15.0)), sigma=10.0)
    cfg = EngineConfig(slicing=SliceConfig(n_events=4096, mode="n_events"),
                       cluster=ClusterConfig(radius=40.0, min_n=10, max_clusters=64))
    pipe = pipeline.ClusterFlowPipeline(cfg)
    outs = pipe.run(stream)
    assert len(outs) == 5
    last = outs[-1]
    rep = np.asarray(last.reported)
    assert rep.sum() == 2
    assert int(last.unique_count) > 0
    flows = np.asarray(last.flow)[rep]
    # ground-truth velocities are (20,0) and (0,15) px/slice
    gts = np.array([[20.0, 0.0], [0.0, 15.0]])
    for g in gts:
        assert np.min(np.linalg.norm(flows - g, axis=1)) < 5.0


def test_corner_pipeline_runs_end_to_end():
    stream = synthetic.moving_edge_stream(num_slices=4, events_per_slice=4096)
    cfg = EngineConfig(slicing=SliceConfig(n_events=4096, mode="n_events"))
    pipe = pipeline.CornerTrackPipeline(cfg)
    outs = pipe.run(stream)
    assert len(outs) == 4
    # corners appear after the first slice
    assert int(outs[0].num_corners) == 0
    assert any(int(o.num_corners) > 0 for o in outs[1:])
    assert any(int(o.num_filtered) > 0 for o in outs[1:])
    # NMS reduces corner count
    for o in outs[1:]:
        assert int(o.num_filtered) <= int(o.num_corners)


def test_stats_matmul_equals_sort_scatter_path():
    """r4b: the one-hot-matmul stats path (blocked-triangular cumsum ranks +
    MXU aggregate/merge/seeding matmuls) must reproduce the sort+segment_sum
    path — counts/labels/liveness EXACTLY (integer-valued f32 operands
    accumulate exactly through the MXU's f32 accumulator), coordinate sums
    up to fp reduction order."""
    import dataclasses
    import jax
    cfgA = dataclasses.replace(CFG, stats_matmul=False)
    cfgB = dataclasses.replace(CFG, stats_matmul=True)
    stA = fc.init_state(cfgA)
    stB = fc.init_state(cfgB)
    rng = np.random.default_rng(7)
    n = 4096
    for s in range(6):
        cx = rng.uniform(50, 950, 5)
        cy = rng.uniform(50, 650, 5)
        k = rng.integers(0, 5, n)
        x = np.clip((cx[k] + rng.normal(0, 9, n)), 0, 1000).astype(np.int32)
        y = np.clip((cy[k] + rng.normal(0, 9, n)), 0, 700).astype(np.int32)
        v = rng.random(n) < 0.9
        stA, outA = fc.update_slice(stA, jnp.asarray(x), jnp.asarray(y),
                                    jnp.asarray(v), cfgA, SENSOR)
        stB, outB = fc.update_slice(stB, jnp.asarray(x), jnp.asarray(y),
                                    jnp.asarray(v), cfgB, SENSOR)
        np.testing.assert_array_equal(np.asarray(outA.n), np.asarray(outB.n))
        np.testing.assert_array_equal(np.asarray(outA.alive),
                                      np.asarray(outB.alive))
        np.testing.assert_array_equal(np.asarray(outA.cid),
                                      np.asarray(outB.cid))
        np.testing.assert_array_equal(np.asarray(outA.labels),
                                      np.asarray(outB.labels))
        np.testing.assert_allclose(np.asarray(outA.centroid),
                                   np.asarray(outB.centroid), atol=1e-3)
        np.testing.assert_allclose(np.asarray(stA.mu), np.asarray(stB.mu),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(outA.flow),
                                   np.asarray(outB.flow), atol=1e-3)


def test_stats_pallas_equals_matmul_path():
    """r5 (VERDICT r4 task #5): the fused-Mosaic stats kernel
    (ops/pallas_kernels.py:cluster_stats, interpret mode off-TPU) must
    reproduce the stats_matmul path — counts/labels/liveness exactly,
    coordinate sums up to fp reduction order. n is a multiple of 2048 so
    the Pallas branch actually engages."""
    import dataclasses
    cfgA = dataclasses.replace(CFG, stats_matmul=True)
    cfgB = dataclasses.replace(CFG, stats_pallas=True)
    stA = fc.init_state(cfgA)
    stB = fc.init_state(cfgB)
    rng = np.random.default_rng(7)
    n = 4096
    for s in range(5):
        cx = rng.uniform(50, 950, 5)
        cy = rng.uniform(50, 650, 5)
        k = rng.integers(0, 5, n)
        x = np.clip((cx[k] + rng.normal(0, 9, n)), 0, 1000).astype(np.int32)
        y = np.clip((cy[k] + rng.normal(0, 9, n)), 0, 700).astype(np.int32)
        v = rng.random(n) < 0.9
        stA, outA = fc.update_slice(stA, jnp.asarray(x), jnp.asarray(y),
                                    jnp.asarray(v), cfgA, SENSOR)
        stB, outB = fc.update_slice(stB, jnp.asarray(x), jnp.asarray(y),
                                    jnp.asarray(v), cfgB, SENSOR)
        np.testing.assert_array_equal(np.asarray(outA.n), np.asarray(outB.n))
        np.testing.assert_array_equal(np.asarray(outA.alive),
                                      np.asarray(outB.alive))
        np.testing.assert_array_equal(np.asarray(outA.cid),
                                      np.asarray(outB.cid))
        np.testing.assert_array_equal(np.asarray(outA.labels),
                                      np.asarray(outB.labels))
        np.testing.assert_allclose(np.asarray(outA.centroid),
                                   np.asarray(outB.centroid), atol=1e-3)
        np.testing.assert_allclose(np.asarray(stA.mu), np.asarray(stB.mu),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(outA.flow),
                                   np.asarray(outB.flow), atol=1e-3)


def test_representative_candidates_sort_oracle():
    """r4b: the two-sort representative selection must pick exactly the LAST
    event lane of each touched pixel, compacted in stream order of that
    lane, with overflow beyond the budget dropped from the tail and
    reported."""
    from evflow_tpu.config import DEFAULT
    rng = np.random.default_rng(3)
    n, m = 512, 64
    # few pixels -> heavy duplication incl. equal timestamps
    px = rng.integers(0, 40, n)
    py = rng.integers(0, 30, n)
    t = np.sort(rng.integers(0, 200, n)).astype(np.int32)
    valid = rng.random(n) < 0.85
    # numpy oracle: last valid lane per pixel, in stream order of that lane
    last = {}
    for i in range(n):
        if valid[i]:
            last[(int(px[i]), int(py[i]))] = i
    lanes = sorted(last.values())
    exp = [(int(px[i]), int(py[i])) for i in lanes][:m]
    cx, cy, cv, nd = pipeline._representative_candidates(
        None, jnp.asarray(px.astype(np.int32)),
        jnp.asarray(py.astype(np.int32)), jnp.asarray(t),
        jnp.asarray(valid), m, DEFAULT)
    got = [(int(a), int(b)) for a, b, ok in
           zip(np.asarray(cx), np.asarray(cy), np.asarray(cv)) if ok]
    assert got == exp
    assert int(nd) == max(len(lanes) - m, 0)
