import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evflow_tpu.config import DedupConfig, SensorConfig, NMSConfig, EFastConfig
from evflow_tpu.ops import (dedup, dedup_sorted, dedup_batched, hash_coordinate,
                            init_sae, update_sae, last_time, render_time_surface,
                            detect_corners, filter_corners,
                            assign_to_centers, pairwise_sqdist, pairwise_manhattan,
                            segment_mean_points, compact_by_segment,
                            compact_by_segment_sorted, radius_neighbor_counts,
                            kth_neighbor_dist)
from evflow_tpu.ops.hash_dedup import dedup_reference_numpy
from evflow_tpu.ops.efast import detect_corners_reference_numpy
from evflow_tpu.ops.nms import filter_corners_reference_numpy
from evflow_tpu.io import synthetic


# ---------------------------------------------------------------- hash dedup

def _rand_events(n, seed=0, w=1280, h=720):
    rng = np.random.default_rng(seed)
    # concentrated so that real pixel repeats occur
    x = rng.integers(0, 200, n).astype(np.int32)
    y = rng.integers(0, 150, n).astype(np.int32)
    return x, y


@pytest.mark.parametrize("fn", [dedup, dedup_sorted])
@pytest.mark.parametrize("exact", [False, True])
def test_dedup_matches_sequential_oracle(fn, exact):
    x, y = _rand_events(2048, seed=3)
    cfg = DedupConfig(exact=exact)
    valid = np.ones(2048, bool)
    res = jax.jit(lambda a, b, v: fn(a, b, v, cfg))(x, y, valid)
    uniq, repeated = dedup_reference_numpy(x, y, cfg)
    assert int(res.unique_count) == len(uniq)
    assert int(res.repeated_count) == repeated
    got = list(zip(np.asarray(res.unique_x)[:len(uniq)].tolist(),
                   np.asarray(res.unique_y)[:len(uniq)].tolist()))
    assert got == uniq  # stream-order compaction


def test_dedup_exact_equals_numpy_unique():
    x, y = _rand_events(4096, seed=5)
    res = dedup(jnp.asarray(x), jnp.asarray(y), jnp.ones(4096, bool),
                DedupConfig(exact=True))
    n_unique = len(set(zip(x.tolist(), y.tolist())))
    assert int(res.unique_count) == n_unique


def test_dedup_respects_valid_mask_and_range():
    x = np.array([10, 10, 2000, -5, 30], np.int32)
    y = np.array([20, 20, 10, 10, 40], np.int32)
    valid = np.array([True, True, True, True, False])
    res = dedup(jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid))
    # (10,20) once; (2000,10) out of range; (-5,..) out of range; (30,40) invalid
    assert int(res.unique_count) == 1
    assert int(res.repeated_count) == 1


def test_dedup_hash_collisions_are_approximate():
    # Two distinct pixels with the same hash must alias (reference behavior).
    cfg = DedupConfig()
    # find a collision pair
    h0 = (3 * cfg.hash_mul_x + 7 * cfg.hash_mul_y) % cfg.num_buckets
    found = None
    for x2 in range(100):
        for y2 in range(100):
            if (x2, y2) != (3, 7) and (x2 * cfg.hash_mul_x + y2 * cfg.hash_mul_y) % cfg.num_buckets == h0:
                found = (x2, y2)
                break
        if found:
            break
    assert found is not None
    x = np.array([3, found[0]], np.int32)
    y = np.array([7, found[1]], np.int32)
    res = dedup(jnp.asarray(x), jnp.asarray(y), jnp.ones(2, bool), cfg)
    assert int(res.unique_count) == 1  # aliased
    res_exact = dedup(jnp.asarray(x), jnp.asarray(y), jnp.ones(2, bool),
                      DedupConfig(exact=True))
    assert int(res_exact.unique_count) == 2


def test_dedup_batched_shapes():
    x, y = _rand_events(1024, seed=9)
    xs = np.stack([x, x]); ys = np.stack([y, y])
    valid = np.ones((2, 1024), bool)
    res = dedup_batched(jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(valid))
    assert res.unique_x.shape == (2, 1024)
    assert res.unique_count.shape == (2,)
    assert int(res.unique_count[0]) == int(res.unique_count[1])


# ---------------------------------------------------------------- SAE

def test_sae_scatter_max_matches_sequential():
    rng = np.random.default_rng(1)
    n = 512
    x = rng.integers(0, 64, n).astype(np.int32)
    y = rng.integers(0, 48, n).astype(np.int32)
    t = np.sort(rng.integers(1, 10_000, n)).astype(np.int32)
    sensor = SensorConfig(width=64, height=48)
    sae = init_sae(sensor)
    sae = update_sae(sae, jnp.asarray(x), jnp.asarray(y), jnp.asarray(t),
                     jnp.ones(n, bool))
    ref = np.zeros((48, 64), np.int32)
    for xi, yi, ti in zip(x, y, t):
        ref[yi, xi] = ti  # sequential last-write
    np.testing.assert_array_equal(np.asarray(sae), ref)
    assert int(last_time(jnp.asarray(t), jnp.ones(n, bool))) == int(t[-1])


def test_sae_render():
    sensor = SensorConfig(width=32, height=16)
    sae = init_sae(sensor)
    sae = sae.at[5, 5].set(10_000).at[6, 6].set(5_000)
    img = render_time_surface(sae, jnp.int32(10_000), delta_ts=10_000)
    assert img.dtype == jnp.uint8
    assert int(img[5, 5]) == 255
    assert int(img[6, 6]) == 127  # half the window old
    assert int(img[0, 0]) == 0


# ---------------------------------------------------------------- eFAST

def _corner_scene(w=64, h=64, cx=32, cy=32):
    """SAE with a fresh 90° wedge (xx<=cx, yy<=cy newer than the rest).

    At (cx,cy) the wedge covers a contiguous arc of 5 px on circle3 (within the
    3..6 streak range) and 6 px on circle4 (within 4..8) — a canonical eFAST
    corner. On a straight wedge boundary far from the apex the fresh arc is 9
    resp. 11 px — too long, so no corner."""
    sae = np.full((h, w), 100, np.int32)
    sae[:cy + 1, :cx + 1] = 1000
    return sae


def test_efast_matches_scalar_oracle_random():
    rng = np.random.default_rng(2)
    h, w = 48, 64
    sensor = SensorConfig(width=w, height=h)
    sae = rng.integers(0, 1000, (h, w)).astype(np.int32)
    n = 256
    x = rng.integers(0, w, n).astype(np.int32)
    y = rng.integers(0, h, n).astype(np.int32)
    got = detect_corners(jnp.asarray(sae), jnp.asarray(x), jnp.asarray(y),
                         jnp.ones(n, bool), sensor=sensor)
    ref = detect_corners_reference_numpy(sae, x, y, sensor=sensor)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_efast_detects_l_corner():
    sae = _corner_scene()
    sensor = SensorConfig(width=64, height=64)
    x = np.array([32, 32, 50], np.int32)   # corner apex, mid-edge, background
    y = np.array([32, 15, 50], np.int32)
    got = detect_corners(jnp.asarray(sae), jnp.asarray(x), jnp.asarray(y),
                         jnp.ones(3, bool), sensor=sensor)
    ref = detect_corners_reference_numpy(sae, x, y, sensor=sensor)
    np.testing.assert_array_equal(np.asarray(got), ref)
    assert bool(got[0])       # the apex is a corner
    assert not bool(got[1])   # mid-edge is not
    assert not bool(got[2])   # flat background is not


def test_efast_border_masked():
    sae = np.ones((32, 32), np.int32)
    sensor = SensorConfig(width=32, height=32)
    x = np.array([1, 30], np.int32)
    y = np.array([1, 30], np.int32)
    got = detect_corners(jnp.asarray(sae), jnp.asarray(x), jnp.asarray(y),
                         jnp.ones(2, bool), sensor=sensor)
    assert not bool(got.any())


# ---------------------------------------------------------------- NMS

def test_nms_matches_mask_oracle():
    rng = np.random.default_rng(4)
    w, h = 320, 240
    n = 300
    x = rng.integers(8, w - 8, n).astype(np.int32)
    y = rng.integers(8, h - 8, n).astype(np.int32)
    res = jax.jit(lambda a, b, v: filter_corners(a, b, v))(
        jnp.asarray(x), jnp.asarray(y), jnp.ones(n, bool))
    ref = filter_corners_reference_numpy(x, y, w, h)
    got = list(zip(np.asarray(res.x)[:int(res.count)].tolist(),
                   np.asarray(res.y)[:int(res.count)].tolist()))
    assert got == ref


def test_nms_valid_mask():
    x = np.array([10, 10, 100], np.int32)
    y = np.array([10, 10, 100], np.int32)
    valid = np.array([False, True, True])
    res = filter_corners(jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid))
    assert int(res.count) == 2
    got = list(zip(np.asarray(res.x)[:2].tolist(), np.asarray(res.y)[:2].tolist()))
    assert got == [(10, 10), (100, 100)]


# ---------------------------------------------------------------- distance/segment

def test_pairwise_dists():
    a = np.array([[0.0, 0.0], [3.0, 4.0]])
    b = np.array([[0.0, 0.0], [6.0, 8.0]])
    d2 = pairwise_sqdist(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(d2), [[0, 100], [25, 25]], atol=1e-4)
    l1 = pairwise_manhattan(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(l1), [[0, 14], [7, 7]], atol=1e-5)


def test_assign_to_centers_gate_and_ties():
    pts = np.array([[0.0, 0.0], [100.0, 100.0], [10.0, 0.0]], np.float32)
    centers = np.array([[0.0, 0.0], [20.0, 0.0]], np.float32)
    res = assign_to_centers(jnp.asarray(pts), jnp.asarray(centers), threshold=50.0)
    np.testing.assert_array_equal(np.asarray(res.labels), [0, -1, 0])  # tie → first


def test_segment_mean_and_compaction():
    pts = np.array([[1.0, 1], [2, 2], [3, 3], [10, 10]], np.float32)
    ids = np.array([0, 0, 1, 1], np.int32)
    valid = np.array([True, True, True, False])
    mean, counts = segment_mean_points(jnp.asarray(pts), jnp.asarray(ids), 3,
                                       jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(mean), [[1.5, 1.5], [3, 3], [0, 0]])
    np.testing.assert_array_equal(np.asarray(counts), [2, 1, 0])

    for fn in (compact_by_segment, compact_by_segment_sorted):
        dense, cnt = fn(jnp.asarray(pts), jnp.asarray(ids), 3,
                        jnp.asarray(valid), capacity=4)
        assert dense.shape == (3, 4, 2)
        np.testing.assert_allclose(np.asarray(dense[0, :2]), [[1, 1], [2, 2]])
        np.testing.assert_allclose(np.asarray(dense[1, 0]), [3, 3])
        np.testing.assert_array_equal(np.asarray(cnt), [2, 1, 0])


def test_radius_counts_and_kth():
    pts = np.array([[0.0, 0], [1, 0], [2, 0], [50, 50]], np.float32)
    cnt = radius_neighbor_counts(jnp.asarray(pts), eps=1.5)
    np.testing.assert_array_equal(np.asarray(cnt), [2, 3, 2, 1])
    kth = kth_neighbor_dist(jnp.asarray(pts), k=2)
    np.testing.assert_allclose(np.asarray(kth), [1.0, 1.0, 1.0,
                                                 np.hypot(48, 50)], rtol=1e-5)


def test_pairwise_sqdist_large_coordinate_precision():
    """Regression: the MXU panel must run at HIGHEST precision. At default
    TPU matmul precision the 2ab term is computed from bf16 mantissas; with
    coordinates ~1e3 its rounding (~4e3) dwarfs eps^2 gates (~30) and inflated
    neighborhood counts ~80x on hardware. CPU passes trivially; on TPU
    (EVFLOW_TEST_TPU=1) this guards the precision flag."""
    from evflow_tpu.ops.distance import pairwise_sqdist
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 1000, (2048, 2)).astype(np.float32)
    d2 = np.asarray(pairwise_sqdist(jnp.asarray(pts), jnp.asarray(pts)))
    oracle = ((pts[:, None, :].astype(np.float64)
               - pts[None, :, :].astype(np.float64)) ** 2).sum(-1)
    eps = 5.64
    np.testing.assert_array_equal(d2 <= eps**2, oracle <= eps**2)


def test_efast_non_multiple_of_8_width():
    """DAVIS346-style geometry (346x260): the row-segment gather must pad the
    surface internally; results match the scalar oracle (regression: reshape
    crash for width % 8 != 0)."""
    from evflow_tpu.ops import efast, sae as sae_ops
    from evflow_tpu.config import EFastConfig, SensorConfig
    sensor = SensorConfig(width=346, height=260)
    cfg = EFastConfig()
    rng = np.random.default_rng(17)
    sae = jnp.asarray(rng.integers(0, 1 << 20, (sensor.height, sensor.width)),
                      jnp.int32)
    n = 256
    x = jnp.asarray(rng.integers(0, sensor.width, n), jnp.int32)
    y = jnp.asarray(rng.integers(0, sensor.height, n), jnp.int32)
    got = np.asarray(efast.detect_corners(sae, x, y, jnp.ones(n, bool),
                                          cfg, sensor))
    exp = efast.detect_corners_reference_numpy(sae, x, y, cfg, sensor)
    np.testing.assert_array_equal(got, exp)


def test_nms_tile_local_two_pass_equals_global_greedy():
    """The tile-parallel NMS scheme (per-tile greedy, then re-run with the
    left neighbor's accepted right strip immune) must equal one greedy pass
    over the tile-major concatenation — including suppression chains across
    the boundary — when tile width > 2*box_size and no suppression chain
    spans a tile's whole interior (the documented deviation bound,
    parallel/tiling.py)."""
    import numpy as np
    import jax.numpy as jnp
    from evflow_tpu.config import NMSConfig
    from evflow_tpu.ops import nms

    cfg = NMSConfig(box_size=15, max_corners=64)
    tile_w, n_tiles = 64, 3
    rng = np.random.default_rng(3)
    for trial in range(5):
        # clusters of candidates straddling each boundary + scattered ones
        xs, ys = [], []
        for b in range(1, n_tiles):
            for _ in range(6):
                xs.append(b * tile_w + int(rng.integers(-14, 15)))
                ys.append(int(rng.integers(20, 40)))
        for _ in range(20):
            xs.append(int(rng.integers(0, tile_w * n_tiles)))
            ys.append(int(rng.integers(0, 128)))
        xs = np.array(xs); ys = np.array(ys)
        order = rng.permutation(len(xs))
        xs, ys = xs[order], ys[order]
        tile = np.clip(xs // tile_w, 0, n_tiles - 1)

        # global greedy over the tile-major concatenation
        gx = np.concatenate([xs[tile == k] for k in range(n_tiles)])
        gy = np.concatenate([ys[tile == k] for k in range(n_tiles)])
        cap = cfg.max_corners
        pad = cap - len(gx)
        gxa = jnp.asarray(np.pad(gx, (0, pad)))
        gya = jnp.asarray(np.pad(gy, (0, pad)))
        gva = jnp.asarray(np.arange(cap) < len(gx))
        ref = nms.filter_corners(gxa, gya, gva, cfg)
        ref_set = {(int(a), int(b)) for a, b in
                   zip(np.asarray(ref.x)[:int(ref.count)],
                       np.asarray(ref.y)[:int(ref.count)])}

        # tile-local two-pass
        got = set()
        prev_strip = (jnp.zeros((cap,), jnp.int32),
                      jnp.zeros((cap,), jnp.int32),
                      jnp.zeros((cap,), bool))
        for k in range(n_tiles):
            lx = xs[tile == k]; ly = ys[tile == k]
            pad = cap - len(lx)
            lxa = jnp.asarray(np.pad(lx, (0, pad)))
            lya = jnp.asarray(np.pad(ly, (0, pad)))
            lva = jnp.asarray(np.arange(cap) < len(lx))
            f1 = nms.filter_corners(lxa, lya, lva, cfg)
            lane = np.arange(cap)
            strip_v = (lane < int(f1.count)) & \
                (np.asarray(f1.x) >= (k + 1) * tile_w - cfg.box_size)
            f2 = nms.filter_corners(lxa, lya, lva, cfg,
                                    immune_x=prev_strip[0],
                                    immune_y=prev_strip[1],
                                    immune_valid=prev_strip[2])
            got |= {(int(a), int(b)) for a, b in
                    zip(np.asarray(f2.x)[:int(f2.count)],
                        np.asarray(f2.y)[:int(f2.count)])}
            # pass-1 right-strip decisions are final (no left-strip overlap):
            # they are what the neighbor must see
            prev_strip = (f1.x, f1.y, jnp.asarray(strip_v))
        assert got == ref_set, (trial, sorted(got - ref_set),
                                sorted(ref_set - got))


def test_dense_detect_matches_gather():
    """r3 dense detection backends (whole-image stencil: banded XLA + the
    sparse-band Pallas kernel via detect_corners_dense) must equal the ring
    gather bit-for-bit on structured + random surfaces."""
    import numpy as np
    import jax.numpy as jnp
    from evflow_tpu.config import EFastConfig, SensorConfig
    from evflow_tpu.ops import efast

    rng = np.random.default_rng(2)
    H, W = 120, 256
    sensor = SensorConfig(width=W, height=H)
    cfg = EFastConfig()
    sae = np.zeros((H, W), np.int32)
    for ax, ay, t0 in ((40, 40, 100), (100, 80, 200), (200, 30, 300)):
        sae[ay - 10:ay + 1, ax - 10:ax + 1] = rng.integers(t0, t0 + 50,
                                                           (11, 11))
    nz = rng.random((H, W)) < 0.08
    sae[nz] = rng.integers(1, 90, nz.sum())
    saej = jnp.asarray(sae)
    n = 2048
    x = rng.integers(0, W, n).astype(np.int32)
    y = rng.integers(0, H, n).astype(np.int32)
    v = rng.random(n) < 0.9
    ref = np.asarray(efast.detect_corners(
        saej, jnp.asarray(x), jnp.asarray(y), jnp.asarray(v), cfg, sensor))
    dense = np.asarray(efast.detect_corners_dense(
        saej, jnp.asarray(y), jnp.asarray(v), jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(v), cfg, sensor))
    assert ref.sum() > 0
    np.testing.assert_array_equal(ref, dense)
    # full dense mask agrees with per-pixel gather on every pixel
    full = np.asarray(efast.corner_mask_dense(saej, cfg, sensor))
    banded = np.asarray(efast.corner_mask_dense_banded(saej, cfg, sensor))
    np.testing.assert_array_equal(full, banded)
    sp = np.asarray(efast.corner_mask_dense_pallas_sparse(
        saej, jnp.ones((H // efast._pick_band(H),), bool), cfg, sensor,
        band=efast._pick_band(H), interpret=True))
    np.testing.assert_array_equal(full, sp)
    # r4 2-D-tile-predicated kernel: all-active == full mask; and with the
    # true touched-tile mask, equal at every touched pixel
    band = efast._pick_band(H)
    sp2 = np.asarray(efast.corner_mask_dense_pallas_sparse2(
        saej, jnp.ones((H // band, W // 128), bool), cfg, sensor,
        band=band, wtile=128, interpret=True))
    np.testing.assert_array_equal(full, sp2)
    act2 = np.zeros((H // band, W // 128), bool)
    act2[np.clip(y[v] // band, 0, H // band - 1),
         np.clip(x[v] // 128, 0, W // 128 - 1)] = True
    sp2p = np.asarray(efast.corner_mask_dense_pallas_sparse2(
        saej, jnp.asarray(act2), cfg, sensor, band=band, wtile=128,
        interpret=True))
    np.testing.assert_array_equal(full[y[v], x[v]], sp2p[y[v], x[v]])


def test_detect_corners_stacked_equals_per_sub():
    """r4: detect_corners_stacked over Q snapshots == Q detect_corners calls
    bit-for-bit (the micro-slice batched-detection path's contract)."""
    import jax.numpy as jnp
    from evflow_tpu.config import EFastConfig, SensorConfig
    from evflow_tpu.ops import efast, sae as sae_ops

    rng = np.random.default_rng(9)
    sensor = SensorConfig(width=160, height=96)
    cfg = EFastConfig()
    q, m = 4, 64
    sae = jnp.zeros((sensor.height, sensor.width), jnp.int32)
    saes, xs, ys, vs = [], [], [], []
    t0 = 100
    for k in range(q):
        n = 500
        # moving filled wedge (apex = persistent corner) + noise
        cx = 40 + 6 * k
        x = rng.integers(max(0, cx - 30), cx + 1, n).astype(np.int32)
        y = rng.integers(10, 41, n).astype(np.int32)
        nz = rng.random(n) < 0.2
        x[nz] = rng.integers(0, sensor.width, nz.sum())
        y[nz] = rng.integers(0, sensor.height, nz.sum())
        t = (t0 + np.sort(rng.integers(0, 90, n))).astype(np.int32)
        sae = sae_ops.update_sae(sae, jnp.asarray(x), jnp.asarray(y),
                                 jnp.asarray(t), jnp.ones(n, bool))
        saes.append(sae)
        ccx = rng.integers(0, sensor.width, m).astype(np.int32)
        ccy = rng.integers(0, sensor.height, m).astype(np.int32)
        # half the candidates probe the wedge apex/edges (real corners)
        ccx[: m // 2] = np.clip(cx + rng.integers(-2, 3, m // 2), 0,
                                sensor.width - 1)
        ccy[: m // 2] = np.clip(40 + rng.integers(-2, 3, m // 2), 0,
                                sensor.height - 1)
        cv = rng.random(m) < 0.9
        xs.append(ccx); ys.append(ccy); vs.append(cv)
        t0 += 100
    ref = np.stack([np.asarray(efast.detect_corners(
        saes[k], jnp.asarray(xs[k]), jnp.asarray(ys[k]), jnp.asarray(vs[k]),
        cfg, sensor)) for k in range(q)])
    got = np.asarray(efast.detect_corners_stacked(
        jnp.stack(saes), jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)),
        jnp.asarray(np.stack(vs)), cfg, sensor))
    np.testing.assert_array_equal(ref, got)
    assert ref.any()   # the scene must actually produce corners
