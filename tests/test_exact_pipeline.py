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
