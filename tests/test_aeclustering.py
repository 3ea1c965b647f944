import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evflow_tpu.config import ClusterConfig
from evflow_tpu.models import aeclustering as ae
from evflow_tpu.models.aeclustering_oracle import AEClusteringOracle
from evflow_tpu.io import load_csv, synthetic
from tests.conftest import DATA_DIR


def _run_engine(xs, ys, ts, ps, cfg):
    st = ae.init_state(cfg)
    n = len(xs)
    st = ae.update_slice(st, jnp.asarray(xs, jnp.int32), jnp.asarray(ys, jnp.int32),
                         jnp.asarray(ts, jnp.int32), jnp.asarray(ps, jnp.int32),
                         jnp.ones(n, bool), cfg)
    return st, ae.snapshot(st, cfg)


def _run_oracle(xs, ys, ts, ps, cfg):
    o = AEClusteringOracle(cfg)
    for x, y, t, p in zip(xs, ys, ts, ps):
        o.update(int(x), int(y), int(t), int(p))
    return o


def _compare(view, oracle, cfg, atol=1e-2):
    """Clusters match as unordered sets keyed by deque order."""
    alive = np.asarray(view.alive)
    order = np.asarray(view.order)[alive]
    n = np.asarray(view.n)[alive]
    mu = np.asarray(view.mu)[alive]
    cen = np.asarray(view.centroid)[alive]
    cid = np.asarray(view.cid)[alive]
    perm = np.argsort(order)   # deque order
    got = [(int(cid[i]), int(n[i]), tuple(mu[i]), tuple(cen[i])) for i in perm]
    exp = oracle.live_stats()
    # drop oracle's lingering empties (engine removes them identically; both
    # keep them on merge updates) — compare only non-empty clusters
    exp_live = [e for e in exp if e[1] > 0]
    got_live = [g for g in got if g[1] > 0]
    assert len(got_live) == len(exp_live), (got_live, exp_live)
    for g, e in zip(got_live, exp_live):
        assert g[0] == e[0], (g, e)              # persistent cluster id
        assert g[1] == e[1], (g, e)              # membership count
        np.testing.assert_allclose(g[2], e[2], atol=atol)  # EWMA mean
        np.testing.assert_allclose(g[3], e[3], atol=atol)  # centroid


CFG = ClusterConfig(sz_buffer=100, radius=20.0, min_n=3,
                    max_clusters=64, max_members=256)


def test_single_blob_single_cluster():
    rng = np.random.default_rng(0)
    n = 200
    xs = rng.integers(95, 106, n); ys = rng.integers(95, 106, n)
    ts = np.arange(n) * 10
    ps = np.zeros(n, np.int32)
    _, view = _run_engine(xs, ys, ts, ps, CFG)
    o = _run_oracle(xs, ys, ts, ps, CFG)
    _compare(view, o, CFG)
    alive = np.asarray(view.alive)
    assert alive.sum() == 1


def test_two_blobs_two_clusters():
    rng = np.random.default_rng(1)
    n = 300
    which = rng.integers(0, 2, n)
    cx = np.where(which, 100, 400); cy = np.where(which, 100, 300)
    xs = cx + rng.integers(-5, 6, n); ys = cy + rng.integers(-5, 6, n)
    ts = np.arange(n) * 10
    ps = np.zeros(n, np.int32)
    _, view = _run_engine(xs, ys, ts, ps, CFG)
    o = _run_oracle(xs, ys, ts, ps, CFG)
    _compare(view, o, CFG)


def test_forgetting_expires_members():
    # 50 events at one spot, a long silence (> window), then 50 elsewhere
    xs = np.concatenate([np.full(50, 100), np.full(50, 500)])
    ys = np.concatenate([np.full(50, 100), np.full(50, 400)])
    ts = np.concatenate([np.arange(50) * 10, 100_000 + np.arange(50) * 10])
    ps = np.zeros(100, np.int32)
    cfg = ClusterConfig(sz_buffer=60, radius=20.0, min_n=3,
                        max_clusters=32, max_members=128)
    _, view = _run_engine(xs, ys, ts, ps, cfg)
    o = _run_oracle(xs, ys, ts, ps, cfg)
    _compare(view, o, cfg)


def test_merge_path():
    # Two clusters form then an event lands between them within radius of both.
    xs = [100]*10 + [130]*10 + [115]
    ys = [100]*10 + [100]*10 + [100]
    n = len(xs)
    ts = np.arange(n) * 10
    ps = np.zeros(n, np.int32)
    cfg = ClusterConfig(sz_buffer=100, radius=16.0, min_n=3,
                        max_clusters=32, max_members=128)
    _, view = _run_engine(np.array(xs), np.array(ys), ts, ps, cfg)
    o = _run_oracle(xs, ys, ts, ps, cfg)
    assert len(o.clusters) == 1   # oracle merged
    _compare(view, o, cfg)


def test_random_stress_matches_oracle():
    rng = np.random.default_rng(7)
    n = 400
    xs = rng.integers(0, 300, n); ys = rng.integers(0, 200, n)
    ts = np.cumsum(rng.integers(1, 20, n)).astype(np.int64)
    ps = rng.integers(0, 2, n)
    cfg = ClusterConfig(sz_buffer=80, radius=30.0, min_n=3,
                        max_clusters=128, max_members=256)
    _, view = _run_engine(xs, ys, ts, ps, cfg)
    o = _run_oracle(xs, ys, ts, ps, cfg)
    _compare(view, o, cfg)


def test_fixture_csv_matches_oracle():
    s = load_csv(os.path.join(DATA_DIR, "event_raw_data8.csv"))
    cfg = ClusterConfig(sz_buffer=100, radius=20.0, min_n=5,
                        max_clusters=128, max_members=256)
    _, view = _run_engine(s.x, s.y, s.t, s.p, cfg)
    o = _run_oracle(s.x, s.y, s.t, s.p, cfg)
    _compare(view, o, cfg)


def test_update_slice_matches_eager_update_event():
    """The optimized update_slice (precomputed tMin, lazy forget, panel
    stats) must equal scanning the eager update_event bit-for-bit, across
    window wrap, merges, expiries, and interleaved invalid lanes."""
    import jax
    cfg = ClusterConfig(sz_buffer=48, radius=12.0, min_n=2,
                        max_clusters=12, max_members=64)
    rng = np.random.default_rng(5)
    st_fast = ae.init_state(cfg)
    st_eager = ae.init_state(cfg)
    t_base = 1000
    for s in range(6):
        n = 40
        xs = rng.integers(0, 100, n).astype(np.int32)
        ys = rng.integers(0, 100, n).astype(np.int32)
        ts = (t_base + np.sort(rng.integers(0, 500, n))).astype(np.int32)
        ps = rng.integers(0, 2, n).astype(np.int32)
        vs = rng.random(n) < 0.8
        t_base += 600

        st_fast = ae.update_slice(st_fast, jnp.asarray(xs), jnp.asarray(ys),
                                  jnp.asarray(ts), jnp.asarray(ps),
                                  jnp.asarray(vs), cfg)
        for xi, yi, ti, pi, vi in zip(xs, ys, ts, ps, vs):
            if vi:
                st_eager = ae.update_event(st_eager, jnp.int32(xi),
                                           jnp.int32(yi), jnp.int32(ti),
                                           jnp.int32(pi), cfg)
        for f in ("alive", "corder", "cid", "mu", "mcid", "mx", "my", "mt",
                  "thead", "next_order", "next_cid", "event_id", "overflow",
                  "t0"):
            a = np.asarray(getattr(st_fast, f))
            b = np.asarray(getattr(st_eager, f))
            np.testing.assert_array_equal(a, b, err_msg=f"slice {s} field {f}")


def test_blocked_bit_equals_per_event_scan():
    """update_slice_blocked (K events/step, r3) == update_slice bit-for-bit
    on a merge/creation/removal-heavy stream with invalid lanes, across
    block sizes that do and don't divide the slice length."""
    rng = np.random.default_rng(7)
    n_slices, n = 5, 200     # 200 % 16 != 0 -> exercises padding
    centers = np.array([[50., 50.], [120., 80.], [220., 40.]])
    vel = np.array([[9., 4.], [-7., 5.], [2., -3.]])
    streams = []
    t_base = 0
    for s in range(n_slices):
        c = rng.integers(0, 3, n)
        xs = (centers[c, 0] + rng.normal(0, 6, n)).astype(np.int32)
        ys = (centers[c, 1] + rng.normal(0, 6, n)).astype(np.int32)
        nz = rng.random(n) < 0.1    # isolated noise: creations + removals
        xs[nz] = rng.integers(0, 600, nz.sum())
        ys[nz] = rng.integers(0, 400, nz.sum())
        ts = t_base + np.sort(rng.integers(0, 1000, n)).astype(np.int32)
        ps = rng.integers(0, 2, n).astype(np.int32)
        valid = rng.random(n) < 0.95
        streams.append((xs, ys, ts, ps, valid))
        t_base += 1000
        centers += vel              # blobs drift together -> merges

    for block in (8, 16):
        sta = ae.init_state(CFG)
        stb = ae.init_state(CFG)
        for xs, ys, ts, ps, valid in streams:
            a = jnp.asarray
            sta = ae.update_slice(sta, a(xs), a(ys), a(ts), a(ps),
                                  a(valid), CFG)
            stb = ae.update_slice_blocked(stb, a(xs), a(ys), a(ts), a(ps),
                                          a(valid), CFG, block)
            for f in sta._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(sta, f)), np.asarray(getattr(stb, f)),
                    err_msg=f"block={block} field={f}")


def test_blocked_all_hazard_blocks():
    """A stream where EVERY block is hazardous (isolated points: every event
    creates a cluster that is removed as the next arrives) must still match —
    the fallback path alone carries the slice."""
    rng = np.random.default_rng(3)
    n = 96
    xs = (np.arange(n, dtype=np.int32) * 97) % 1200   # far apart
    ys = (np.arange(n, dtype=np.int32) * 53) % 700
    ts = np.sort(rng.integers(0, 5000, n)).astype(np.int32)
    ps = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    a = jnp.asarray
    sta = ae.update_slice(ae.init_state(CFG), a(xs), a(ys), a(ts), a(ps),
                          a(valid), CFG)
    stb = ae.update_slice_blocked(ae.init_state(CFG), a(xs), a(ys), a(ts),
                                  a(ps), a(valid), CFG, 16)
    for f in sta._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(sta, f)), np.asarray(getattr(stb, f)),
            err_msg=f"field={f}")


# --------------------------------------------------------------------------
# Pallas sequential engine (models/aeclustering_pallas.py, r4)
# --------------------------------------------------------------------------

def _pallas_interp():
    """interpret=True off-TPU (tests default to the CPU backend)."""
    return jax.default_backend() != "tpu"


def _assert_states_equal(sta, stb, msg=""):
    for f in sta._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(sta, f)), np.asarray(getattr(stb, f)),
            err_msg=f"{msg} field={f}")


def test_pallas_bit_equals_per_event_scan():
    """update_slice_pallas == update_slice bit-for-bit on the blocked-engine
    adversarial stream (merges from drifting blobs, creations/removals from
    isolated noise, 5% invalid lanes, carry-in state across 5 slices)."""
    from evflow_tpu.models import aeclustering_pallas as aep
    rng = np.random.default_rng(7)
    n_slices, n = 5, 200
    centers = np.array([[50., 50.], [120., 80.], [220., 40.]])
    vel = np.array([[9., 4.], [-7., 5.], [2., -3.]])
    t_base = 0
    sta = ae.init_state(CFG)
    stb = ae.init_state(CFG)
    interp = _pallas_interp()
    for s in range(n_slices):
        c = rng.integers(0, 3, n)
        xs = (centers[c, 0] + rng.normal(0, 6, n)).astype(np.int32)
        ys = (centers[c, 1] + rng.normal(0, 6, n)).astype(np.int32)
        nz = rng.random(n) < 0.1
        xs[nz] = rng.integers(0, 600, nz.sum())
        ys[nz] = rng.integers(0, 400, nz.sum())
        ts = t_base + np.sort(rng.integers(0, 1000, n)).astype(np.int32)
        ps = rng.integers(0, 2, n).astype(np.int32)
        valid = rng.random(n) < 0.95
        t_base += 1000
        centers += vel
        a = jnp.asarray
        sta = ae.update_slice(sta, a(xs), a(ys), a(ts), a(ps), a(valid), CFG)
        stb = aep.update_slice_pallas(stb, a(xs), a(ys), a(ts), a(ps),
                                      a(valid), CFG, interpret=interp)
        _assert_states_equal(sta, stb, f"slice {s}")


def test_pallas_ring_wrap_and_overflow():
    """Tiny capacities: the member ring wraps (live-tail overwrite drops),
    window expiry crosses the wrap, and cluster capacity overflows (new
    clusters dropped + counted) — the kernel's tail/full bookkeeping paths."""
    from evflow_tpu.models import aeclustering_pallas as aep
    cfg = ClusterConfig(sz_buffer=24, radius=10.0, min_n=2,
                        max_clusters=6, max_members=32)
    rng = np.random.default_rng(11)
    sta = ae.init_state(cfg)
    stb = ae.init_state(cfg)
    interp = _pallas_interp()
    t_base = 100
    for s in range(6):
        n = 48   # > max_members per slice -> guaranteed wrap
        # many isolated points -> creations, removals, capacity overflow
        xs = ((np.arange(n) * 83 + s * 17) % 500).astype(np.int32)
        ys = ((np.arange(n) * 41 + s * 29) % 300).astype(np.int32)
        # plus a dense blob that persists (lives across ring wrap)
        xs[::4] = 250 + rng.integers(-4, 5, len(xs[::4]))
        ys[::4] = 150 + rng.integers(-4, 5, len(ys[::4]))
        ts = (t_base + np.sort(rng.integers(0, 400, n))).astype(np.int32)
        ps = rng.integers(0, 2, n).astype(np.int32)
        valid = rng.random(n) < 0.9
        t_base += 450
        a = jnp.asarray
        sta = ae.update_slice(sta, a(xs), a(ys), a(ts), a(ps), a(valid), cfg)
        stb = aep.update_slice_pallas(stb, a(xs), a(ys), a(ts), a(ps),
                                      a(valid), cfg, interpret=interp)
        _assert_states_equal(sta, stb, f"slice {s}")
    assert int(np.asarray(sta.overflow)) > 0   # the scene must overflow


def test_pallas_all_isolated_churn():
    """Every event creates a cluster that the next removes (the blocked
    engine's worst case) — creations/empty-removals dominate."""
    from evflow_tpu.models import aeclustering_pallas as aep
    rng = np.random.default_rng(3)
    n = 96
    xs = (np.arange(n, dtype=np.int32) * 97) % 1200
    ys = (np.arange(n, dtype=np.int32) * 53) % 700
    ts = np.sort(rng.integers(0, 5000, n)).astype(np.int32)
    ps = np.zeros(n, np.int32)
    valid = np.ones(n, bool)
    a = jnp.asarray
    sta = ae.update_slice(ae.init_state(CFG), a(xs), a(ys), a(ts), a(ps),
                          a(valid), CFG)
    stb = aep.update_slice_pallas(ae.init_state(CFG), a(xs), a(ys), a(ts),
                                  a(ps), a(valid), CFG,
                                  interpret=_pallas_interp())
    _assert_states_equal(sta, stb)


def test_pallas_empty_and_allinvalid_slices():
    from evflow_tpu.models import aeclustering_pallas as aep
    a = jnp.asarray
    n = 16
    z = np.zeros(n, np.int32)
    sta = ae.update_slice(ae.init_state(CFG), a(z), a(z), a(z), a(z),
                          a(np.zeros(n, bool)), CFG)
    stb = aep.update_slice_pallas(ae.init_state(CFG), a(z), a(z), a(z),
                                  a(z), a(np.zeros(n, bool)), CFG,
                                  interpret=_pallas_interp())
    _assert_states_equal(sta, stb)
