"""Exact-mode flagship pipeline: dedup → per-event AEClustering engine.

Validates the bit-parity path end-to-end: the jitted slice step must agree
with the chained host oracles (sequential bucket-table dedup feeding the
deque-faithful AEClustering transliteration).
"""

import numpy as np
import jax
import jax.numpy as jnp

from evflow_tpu.config import DEFAULT, ClusterConfig, DedupConfig, EngineConfig
from evflow_tpu.models import aeclustering as ae, pipeline
from evflow_tpu.models.aeclustering_oracle import AEClusteringOracle
from evflow_tpu.ops.hash_dedup import dedup_reference_numpy
import dataclasses


def test_exact_pipeline_matches_chained_oracles():
    cfg = dataclasses.replace(
        DEFAULT,
        cluster=ClusterConfig(sz_buffer=100, radius=30.0, min_n=3,
                              max_clusters=64, max_members=1024),
        dedup=DedupConfig())
    rng = np.random.default_rng(0)
    n = 512
    state = ae.init_state(cfg.cluster)
    oracle = AEClusteringOracle(cfg.cluster)

    for s in range(3):
        cx, cy = 150 + 30 * s, 200
        x = rng.integers(cx - 15, cx + 15, n).astype(np.int32)
        y = rng.integers(cy - 15, cy + 15, n).astype(np.int32)
        t = np.full(n, 1000 * (s + 1), np.int32)
        state, view, _ = pipeline.cluster_flow_step_exact(
            state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(t),
            jnp.ones(n, bool), cfg)

        uniq, _ = dedup_reference_numpy(x, y, cfg.dedup, cfg.sensor)
        for ux, uy in uniq:
            oracle.update(ux, uy, 1000 * (s + 1), 0)

    alive = np.asarray(view.alive)
    got_n = sorted(np.asarray(view.n)[alive].tolist())
    exp = oracle.live_stats()
    exp_n = sorted(e[1] for e in exp if e[1] > 0)
    assert got_n == exp_n
    # centroids agree as sets
    got_c = sorted(map(tuple, np.round(np.asarray(view.centroid)[alive], 2).tolist()))
    exp_c = sorted((round(e[3][0], 2), round(e[3][1], 2)) for e in exp if e[1] > 0)
    np.testing.assert_allclose(got_c, exp_c, atol=0.05)


def test_exact_pipeline_fabricated_timestamps_quirk():
    """compat_fabricated_ts reproduces accel …store.cpp:439: every consumed
    coordinate is stamped with the cumulative unique count (the reference's
    uniqueCount/1000.0 clock is monotone in that count, ties included), so
    the engine's event window expires by unique-coordinate age, not time."""
    cfg = dataclasses.replace(
        DEFAULT,
        cluster=ClusterConfig(sz_buffer=50, radius=30.0, min_n=3,
                              max_clusters=64, max_members=1024),
        dedup=DedupConfig(compat_fabricated_ts=True))
    rng = np.random.default_rng(1)
    n = 256
    state = ae.init_state(cfg.cluster)
    oracle = AEClusteringOracle(cfg.cluster)
    cum = jnp.int32(0)
    total = 0
    for s in range(3):
        cx = 200 + 40 * s
        x = rng.integers(cx - 12, cx + 12, n).astype(np.int32)
        y = rng.integers(188, 212, n).astype(np.int32)
        # real times deliberately garbage: the quirk must ignore them
        t = np.zeros(n, np.int32)
        state, view, cum = pipeline.cluster_flow_step_exact(
            state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(t),
            jnp.ones(n, bool), cfg, cum)
        uniq, _ = dedup_reference_numpy(x, y, cfg.dedup, cfg.sensor)
        total += len(uniq)
        assert int(cum) == total
        for ux, uy in uniq:
            oracle.update(ux, uy, float(total), 0)
    alive = np.asarray(view.alive)
    exp = oracle.live_stats()
    got_n = sorted(np.asarray(view.n)[alive].tolist())
    exp_n = sorted(e[1] for e in exp if e[1] > 0)
    assert got_n == exp_n
    got_c = sorted(map(tuple, np.round(np.asarray(view.centroid)[alive], 2).tolist()))
    exp_c = sorted((round(e[3][0], 2), round(e[3][1], 2)) for e in exp if e[1] > 0)
    np.testing.assert_allclose(got_c, exp_c, atol=0.05)


def test_cluster_flow_pipeline_exact_mode_driver():
    """ClusterFlowPipeline(mode="exact") wires cluster_flow_step_exact into
    the slice driver with the fast path's ClusterFlowOutput surface: flow is
    the reported-centroid delta per persistent cid × extrapolation (0 on
    first report), unique/repeated counts come from the chained cum counter."""
    from evflow_tpu.config import SliceConfig, FlowConfig
    from evflow_tpu.io import synthetic

    n = 1024
    cfg = dataclasses.replace(
        DEFAULT,
        slicing=SliceConfig(n_events=n),
        flow=FlowConfig(extrapolation=3.0),
        cluster=ClusterConfig(sz_buffer=400, radius=40.0, min_n=5,
                              max_clusters=64, max_members=2048),
        dedup=DedupConfig())
    stream = synthetic.moving_blob_stream(
        num_slices=3, events_per_slice=n,
        blob_centers=((300.0, 300.0),), velocities=((30.0, 10.0),),
        sigma=8.0)
    pipe = pipeline.ClusterFlowPipeline(cfg, mode="exact")
    outs = pipe.run(stream)
    assert len(outs) == 3

    # manual replay of the jitted step chain = the driver's device outputs
    from evflow_tpu.io.slicing import slice_by_count
    sl = slice_by_count(stream, n)
    mask = sl.valid_mask()
    t0 = int(stream.t[0])
    state = ae.init_state(cfg.cluster)
    cum = jnp.int32(0)
    prev_cent = {}
    prev_cum = 0
    for s in range(3):
        t_rel = (sl.t[s].astype(np.int64) - t0).astype(np.int32)
        state, view, cum = pipeline.cluster_flow_step_exact(
            state, jnp.asarray(sl.x[s]), jnp.asarray(sl.y[s]),
            jnp.asarray(t_rel), jnp.asarray(mask[s]), cfg, cum)
        alive = np.asarray(view.alive)
        n_c = np.asarray(view.n)
        reported = alive & (n_c >= cfg.cluster.min_n)
        np.testing.assert_array_equal(np.asarray(outs[s].reported), reported)
        np.testing.assert_array_equal(np.asarray(outs[s].n), n_c)
        np.testing.assert_allclose(np.asarray(outs[s].centroid),
                                   np.asarray(view.centroid))
        assert int(outs[s].unique_count) == int(cum) - prev_cum
        assert int(outs[s].repeated_count) == int(mask[s].sum()) - (int(cum) - prev_cum)
        prev_cum = int(cum)
        cent = np.asarray(view.centroid)
        for c in np.where(reported)[0]:
            cid = int(np.asarray(view.cid)[c])
            if cid in prev_cent:
                np.testing.assert_allclose(
                    np.asarray(outs[s].flow)[c],
                    (cent[c] - prev_cent[cid]) * 3.0, rtol=1e-6)
            else:
                np.testing.assert_array_equal(np.asarray(outs[s].flow)[c], 0.0)
            prev_cent[cid] = cent[c]
    # the moving blob persists: at least one later slice carries nonzero flow
    assert any(np.abs(np.asarray(o.flow)).max() > 1.0 for o in outs[1:])


def test_cluster_flow_pipeline_exact_checkpoint_resume():
    """Exact-mode split-stream resume is bit-identical to an unbroken run
    (state = (AEState, cum) round-trips through npz; t0 via meta)."""
    from evflow_tpu.config import SliceConfig
    from evflow_tpu.io import synthetic
    from evflow_tpu.utils import checkpoint as ckpt
    import tempfile

    n = 1024
    cfg = dataclasses.replace(
        DEFAULT,
        slicing=SliceConfig(n_events=n),
        cluster=ClusterConfig(sz_buffer=400, radius=40.0, min_n=5,
                              max_clusters=64, max_members=2048),
        dedup=DedupConfig(compat_fabricated_ts=True))
    stream = synthetic.moving_blob_stream(
        num_slices=4, events_per_slice=n,
        blob_centers=((300.0, 300.0), (700.0, 500.0)),
        velocities=((25.0, 0.0), (0.0, 20.0)), sigma=8.0)

    pipe_full = pipeline.ClusterFlowPipeline(cfg, mode="exact")
    full = pipe_full.run(stream)

    cut = 2 * n
    pipe1 = pipeline.ClusterFlowPipeline(cfg, mode="exact")
    first = pipe1.run(stream[:cut])
    with tempfile.TemporaryDirectory() as td:
        path = td + "/exact.npz"
        ckpt.save_npz(path, pipe1.final_state, meta={"t0": pipe1.t0})
        pipe2 = pipeline.ClusterFlowPipeline(cfg, mode="exact")
        restored = ckpt.restore_npz(path, pipe2.init_state())
        t0 = int(ckpt.load_meta(path)["t0"])
        second = pipe2.run(stream[cut:], state=restored, t0=t0)

    got = first + second
    assert len(got) == len(full)
    for a, b in zip(got, full):
        np.testing.assert_array_equal(np.asarray(a.reported), np.asarray(b.reported))
        np.testing.assert_array_equal(np.asarray(a.n), np.asarray(b.n))
        np.testing.assert_array_equal(np.asarray(a.cid), np.asarray(b.cid))
        np.testing.assert_array_equal(np.asarray(a.centroid), np.asarray(b.centroid))
        # flow memory is state-carried, so it also survives the split
        np.testing.assert_array_equal(np.asarray(a.flow), np.asarray(b.flow))
        assert int(a.unique_count) == int(b.unique_count)
