"""Full-system trajectory parity: jitted corner pipeline vs chained host
oracles (sequential SAE → eFAST scalar loops → NMS mask → tracker
transliteration) — the executable form of BASELINE.json's "corner trajectories
within ATE bound"."""

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evflow_tpu.config import (EngineConfig, SensorConfig, SliceConfig,
                               TrackerConfig, NMSConfig, EFastConfig)
from evflow_tpu.models import pipeline
from evflow_tpu.models.tracker_oracle import CornerTrackerOracle
from evflow_tpu.ops.efast import detect_corners_reference_numpy
from evflow_tpu.ops.nms import filter_corners_reference_numpy
from evflow_tpu.utils import metrics

W = H = 128
CFG = EngineConfig(
    sensor=SensorConfig(width=W, height=H),
    slicing=SliceConfig(n_events=1024),
    tracker=TrackerConfig(max_tracks=32, history=6, frames_to_skip=3,
                          max_frames=30, group_radius=60.0),
    nms=NMSConfig(max_corners=64),
)


def _wedge_slice(cx, cy, t0, n=1024, seed=0):
    """Events painting a fresh 90° wedge apexed at (cx, cy) — a guaranteed
    eFAST corner (see test_ops._corner_scene)."""
    rng = np.random.default_rng(seed)
    x = rng.integers(max(0, cx - 40), cx + 1, n).astype(np.int32)
    y = rng.integers(max(0, cy - 40), cy + 1, n).astype(np.int32)
    t = (t0 + np.sort(rng.integers(0, 900, n))).astype(np.int32)
    return x, y, t


def test_corner_pipeline_trajectories_match_oracles():
    state = pipeline.init_corner_state(CFG)

    sae_ref = np.zeros((H, W), np.int64)
    oracle_tracker = CornerTrackerOracle(CFG.tracker)
    traj_engine = {}
    traj_oracle = {}

    cx, cy = 50, 50
    for s in range(6):
        x, y, t = _wedge_slice(cx, cy, 1000 * (s + 1), seed=s)
        valid = np.ones(len(x), bool)

        # --- engine step
        state, out = pipeline.corner_track_step(
            state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(t),
            jnp.asarray(valid), CFG)

        # --- oracle chain
        for xi, yi, ti in zip(x, y, t):
            sae_ref[yi, xi] = ti
        if s > 0:
            cmask = detect_corners_reference_numpy(sae_ref, x, y, CFG.efast,
                                                   CFG.sensor)
            cand = [(int(a), int(b)) for a, b, m in zip(x, y, cmask) if m]
            filt = filter_corners_reference_numpy(
                [c[0] for c in cand], [c[1] for c in cand], W, H, CFG.nms)
        else:
            filt = []
        oracle_tracker.update([(float(a), float(b)) for a, b in filt])

        # --- collect trajectories
        act = np.asarray(out.track_active)
        for slot in np.where(act)[0]:
            lab = int(np.asarray(out.track_label)[slot])
            traj_engine.setdefault(lab, []).append(
                tuple(np.asarray(out.track_pos)[slot]))
        for tr in oracle_tracker.tracks:
            traj_oracle.setdefault(tr.label, []).append((tr.x, tr.y))

        cx += 6  # wedge apex drifts right

    assert traj_oracle, "oracle produced no tracks — scene invalid"
    cov = metrics.trajectory_coverage(traj_engine, traj_oracle)
    assert cov == 1.0, (traj_engine.keys(), traj_oracle.keys())
    err = metrics.ate(traj_engine, traj_oracle)
    assert err < 1e-3, err   # same detections → identical trajectories
