import numpy as np
import jax.numpy as jnp
import pytest

from evflow_tpu.config import TrackerConfig
from evflow_tpu.models import tracker as trk
from evflow_tpu.models.tracker_oracle import CornerTrackerOracle

CFG = TrackerConfig(max_tracks=32, history=6, frames_to_skip=3, max_frames=20,
                    max_distance=30.0, group_radius=60.0)
D = 16  # detection capacity


def _step(state, dets, cfg=CFG):
    xs = np.zeros(D, np.float32)
    ys = np.zeros(D, np.float32)
    valid = np.zeros(D, bool)
    for i, (x, y) in enumerate(dets):
        xs[i], ys[i], valid[i] = x, y, True
    return trk.update(state, jnp.asarray(xs), jnp.asarray(ys),
                      jnp.asarray(valid), cfg)


def _live(state):
    a = np.asarray(state.active)
    seq = np.asarray(state.seq)[a]
    perm = np.argsort(seq)
    lab = np.asarray(state.label)[a][perm]
    pos = np.asarray(state.pos)[a][perm]
    fs = np.asarray(state.frames_since)[a][perm]
    fc = np.asarray(state.frame_count)[a][perm]
    vel = np.asarray(state.velocity)[a][perm]
    return list(zip(lab.tolist(), pos[:, 0].tolist(), pos[:, 1].tolist(),
                    fs.tolist(), fc.tolist(),
                    [tuple(v) for v in vel.tolist()]))


def _compare(state, oracle, atol=1e-3):
    got = _live(state)
    exp = oracle.live()
    assert len(got) == len(exp), (got, exp)
    for g, e in zip(got, exp):
        assert g[0] == e[0], (g, e)                     # label
        np.testing.assert_allclose(g[1:3], e[1:3], atol=atol)  # pos
        assert g[3] == e[3] and g[4] == e[4], (g, e)    # frames_since/count
        np.testing.assert_allclose(g[5], e[5], atol=atol)      # velocity


def _run_both(seq_of_dets, cfg=CFG):
    state = trk.init_state(cfg)
    oracle = CornerTrackerOracle(cfg)
    for dets in seq_of_dets:
        state, groups = _step(state, dets, cfg)
        oracle.update(dets)
        _compare(state, oracle)
    return state, oracle


def test_single_track_straight_line():
    frames = [[(100 + 5 * k, 200 + 2 * k)] for k in range(8)]
    state, oracle = _run_both(frames)
    live = _live(state)
    assert len(live) == 1
    vx, vy = live[0][5]
    assert 3.0 < vx < 7.0 and 0.5 < vy < 3.5  # ~ (5, 2) px/frame


def test_two_tracks_identity_preserved():
    frames = [[(100 + 4 * k, 100), (400, 300 + 3 * k)] for k in range(6)]
    state, oracle = _run_both(frames)
    live = _live(state)
    assert [t[0] for t in live] == [0, 1]


def test_lost_track_coasts_then_pruned():
    frames = [[(100 + 5 * k, 100)] for k in range(5)]
    frames += [[]] * (CFG.frames_to_skip + 1)
    state, oracle = _run_both(frames)
    assert len(_live(state)) == 0        # pruned after max skips


def test_coasting_prediction_follows_velocity():
    frames = [[(100 + 10 * k, 100)] for k in range(5)]
    state, oracle = _run_both(frames)
    # one empty frame: track coasts forward
    state, _ = _step(state, [])
    oracle.update([])
    _compare(state, oracle)
    live = _live(state)
    assert live[0][3] == 1               # frames_since
    assert live[0][1] > 140              # moved beyond the last detection


def test_reacquire_after_coast():
    frames = [[(100 + 10 * k, 100)] for k in range(5)]
    state, oracle = _run_both(frames)
    state, _ = _step(state, []); oracle.update([])
    _compare(state, oracle)
    # detection near the predicted position reattaches to the same label
    state, _ = _step(state, [(160, 100)]); oracle.update([(160.0, 100.0)])
    _compare(state, oracle)
    live = _live(state)
    assert len(live) == 1 and live[0][0] == 0 and live[0][3] == 0


def test_grouping_and_velocity_blend():
    # two nearby corners moving together + one distant corner
    frames = [[(100 + 5 * k, 100), (120 + 5 * k, 110), (500, 400)]
              for k in range(6)]
    state, oracle = _run_both(frames)
    gids = np.asarray(state.group_id)[np.asarray(state.active)]
    # two groups: the pair and the singleton
    assert len(set(gids.tolist())) == 2
    st_groups = _step(state, frames[-1])[1]
    exists = np.asarray(st_groups.exists)
    assert exists.sum() == 2


def test_max_frames_prunes_old_tracks():
    cfg = TrackerConfig(max_tracks=32, history=6, frames_to_skip=3,
                        max_frames=4, max_distance=30.0, group_radius=60.0)
    frames = [[(100 + 2 * k, 100)] for k in range(7)]
    state, oracle = _run_both(frames, cfg)
    # after frame_count exceeds max_frames the track dies (then respawns fresh)
    live = _live(state)
    for t in live:
        assert t[4] <= cfg.max_frames


def test_spawn_capacity_overflow_drops():
    cfg = TrackerConfig(max_tracks=4, history=4, frames_to_skip=2,
                        max_frames=20, max_distance=10.0, group_radius=50.0)
    dets = [(50.0 * i, 50.0 * i) for i in range(8)]
    state = trk.init_state(cfg)
    state, _ = _step(state, dets, cfg)
    assert int(np.asarray(state.active).sum()) == 4  # capacity respected
