"""The fast-corner-tracker evolution chain (SURVEY §2.4) as config knobs:
each intermediate stage #4-#7 of the reference's 8-file lineage maps to a
TrackerConfig setting; the final stage (#8, the built target) is the default.
"""

import numpy as np
import jax.numpy as jnp

from evflow_tpu.config import TrackerConfig
from evflow_tpu.models import tracker as trk


def _run(cfg, frames):
    state = trk.init_state(cfg)
    D = 8
    for dets in frames:
        xs = np.zeros(D, np.float32); ys = np.zeros(D, np.float32)
        valid = np.zeros(D, bool)
        for i, (x, y) in enumerate(dets):
            xs[i], ys[i], valid[i] = x, y, True
        state, groups = trk.update(state, jnp.asarray(xs), jnp.asarray(ys),
                                   jnp.asarray(valid), cfg)
    return state, groups


FRAMES = [[(100 + 5 * k, 100), (120 + 5 * k, 108)] for k in range(6)]


def test_stage4_label_persistence_only():
    """#4 periodic_corner: nearest-neighbor label persistence, no history/
    velocity/damping/groups."""
    cfg = TrackerConfig(max_tracks=16, history=1, frames_to_skip=0,
                        damping=0.0, smoothing=0.0, group_radius=0.0,
                        max_distance=30.0, max_frames=100)
    state, _ = _run(cfg, FRAMES)
    act = np.asarray(state.active)
    labels = np.asarray(state.label)[act]
    assert sorted(labels.tolist()) == [0, 1]      # identities persist
    # history length 1 → no velocity estimate
    np.testing.assert_allclose(np.asarray(state.velocity)[act], 0.0)


def test_stage6_velocity_and_coasting():
    """#6 periodic_corner_lost: velocity from history + prediction coasting."""
    cfg = TrackerConfig(max_tracks=16, history=6, frames_to_skip=3,
                        damping=0.0, smoothing=0.0, group_radius=0.0,
                        max_distance=30.0, max_frames=100)
    state, _ = _run(cfg, FRAMES)
    act = np.asarray(state.active)
    vel = np.asarray(state.velocity)[act]
    assert np.all(np.abs(vel[:, 0] - 5.0) < 1.5)  # ~5 px/frame in x
    # coast one empty frame: positions advance by ~velocity
    pos_before = np.asarray(state.pos)[act].copy()
    state2, _ = _run_extra_empty(cfg, state)
    act2 = np.asarray(state2.active)
    pos_after = np.asarray(state2.pos)[act2]
    assert np.all(pos_after[:, 0] > pos_before[:, 0] + 2.0)


def _run_extra_empty(cfg, state):
    D = 8
    return trk.update(state, jnp.zeros(D), jnp.zeros(D),
                      jnp.zeros(D, bool), cfg)[0], None


def test_stage7_damping_smooths_direction():
    """#7 damping: the direction observer low-passes the step direction."""
    zigzag = [[(100 + 5 * k, 100 + (6 if k % 2 else -6))] for k in range(8)]
    cfg_damped = TrackerConfig(max_tracks=8, history=6, frames_to_skip=3,
                               damping=0.9, smoothing=0.5, group_radius=0.0)
    cfg_raw = TrackerConfig(max_tracks=8, history=6, frames_to_skip=3,
                            damping=0.0, smoothing=0.0, group_radius=0.0)
    sd, _ = _run(cfg_damped, zigzag)
    sr, _ = _run(cfg_raw, zigzag)
    vd = np.asarray(sd.velocity)[np.asarray(sd.active)][0]
    vr = np.asarray(sr.velocity)[np.asarray(sr.active)][0]
    # damped velocity has smaller |y| oscillation than raw
    assert abs(vd[1]) <= abs(vr[1]) + 1e-5


def test_stage8_groups_enabled_default():
    """#8 group_track: the built target — groups form with a real radius."""
    cfg = TrackerConfig(max_tracks=16, history=6, frames_to_skip=3,
                        group_radius=60.0)
    state, groups = _run(cfg, FRAMES)
    act = np.asarray(state.active)
    gid = np.asarray(state.group_id)[act]
    assert np.all(gid == gid[0]) and gid[0] >= 0   # one shared group
    assert int(np.asarray(groups.size)[gid[0]]) == 2
