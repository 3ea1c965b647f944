"""OPTICS tests — the reference's own unit vectors ported as golden oracles
(optics-clustering/test/test_main.cpp; SURVEY §4 directs adopting them
verbatim: chi tests, ε bounds, clustering membership tests)."""

import os
import numpy as np
import pytest

from evflow_tpu.models import optics
from evflow_tpu.models.optics import (ReachabilityDist, compute_reachability_dists,
                                      epsilon_estimation, get_cluster_indices,
                                      get_chi_clusters_flat, flat_clusters_to_tree,
                                      get_chi_clusters, ClusterNode)
from tests.conftest import DATA_DIR


# ---------------------------------------------------------------- clustering

def test_clustering_test_1():  # test_main.cpp:12-31
    points = np.array([[100, 100], [102, 100], [101, 101],
                       [-1, 0], [1, 0], [0, 1],
                       [-100, -100], [-102, -100], [-101, -101]], np.float64)
    rd = compute_reachability_dists(points, 2, 10)
    clusters = get_cluster_indices(rd, 10)
    assert len(clusters) == 3
    assert sorted(clusters[0]) == [0, 1, 2]
    assert sorted(clusters[1]) == [3, 4, 5]
    assert sorted(clusters[2]) == [6, 7, 8]


def test_clustering_test_2_auto_epsilon():  # test_main.cpp:34-57
    points = np.array([[100, 100], [102, 100], [101, 101],
                       [-1, 0], [1, 0], [0, 1],
                       [-100, -100], [-102, -100], [-101, -101]], np.float64)
    rd = compute_reachability_dists(points, 2)   # auto ε
    clusters = get_cluster_indices(rd, 2)
    assert len(clusters) == 3
    assert sorted(clusters[0]) == [0, 1, 2]
    assert sorted(clusters[1]) == [3, 4, 5]
    assert sorted(clusters[2]) == [6, 7, 8]


# ---------------------------------------------------------------- epsilon

def test_epsilon_estimation_1():  # test_main.cpp:91-102
    points = np.array([[0, 0], [1, 0], [0, 1], [10, 0], [0, 10],
                       [6, 6], [4, 4], [10, 10], [9, 10], [10, 9]], np.float64)
    eps = epsilon_estimation(points, 3)
    assert 3.09019 < eps < 3.090196


def test_epsilon_estimation_2():  # test_main.cpp:103-114
    points = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 1], [0, 1, 0],
                       [5, 0, 0], [0, 5, 0], [0, 0, 5], [5, 5, 5]], np.float64)
    eps = epsilon_estimation(points, 3)
    assert 2.236750 < eps < 2.236751


# ---------------------------------------------------------------- chi tests

def _rd(pairs):
    return [ReachabilityDist(i, d) for i, d in pairs]


CHI1 = [(1, 10.0), (2, 9.0), (3, 9.0), (4, 5.0), (5, 5.49), (6, 5.0),
        (7, 6.5), (8, 3.0), (9, 2.9), (10, 2.8), (11, 10.0), (12, 12.0)]


def test_chi_1():  # test_main.cpp:117-133
    assert get_chi_clusters_flat(_rd(CHI1), 0.1, 4) == [(2, 5), (0, 11), (6, 10)]


def test_chi_2():
    rd = _rd(CHI1 + [(13, 4.0), (14, 4.1), (15, 4.0), (16, 3.9), (17, 5.0)])
    assert get_chi_clusters_flat(rd, 0.1, 4) == [(2, 5), (0, 10), (6, 10), (11, 16)]


def test_chi_3():
    rd = _rd([(1, 11.0), (2, 9.0), (3, 9.0), (4, 5.0), (5, 5.49), (6, 5.0),
              (7, 6.5), (8, 3.0), (9, 2.9), (10, 2.8), (11, 10.0), (12, 10.0),
              (13, 4.0), (14, 4.1), (15, 4.0), (16, 3.9), (17, 12.0)])
    assert get_chi_clusters_flat(rd, 0.1, 4) == \
        [(2, 5), (0, 9), (6, 10), (0, 16), (11, 16)]


def test_chi_4_5():
    for last in (11.0, 12.0):
        rd = _rd([(1, 12.0), (2, 9.0), (3, 9.0), (4, 5.0), (5, 5.49), (6, 5.0),
                  (7, 6.5), (8, 3.0), (9, 2.9), (10, 2.8), (11, 10.0), (12, 10.0),
                  (13, 4.0), (14, 4.1), (15, 4.0), (16, 3.9), (17, last)])
        assert get_chi_clusters_flat(rd, 0.1, 4) == \
            [(2, 5), (0, 9), (6, 10), (0, 16), (11, 16)]


def test_chi_6():
    rd = _rd([(1, 12.0), (2, 9.0), (3, 9.0), (4, 5.0), (5, 5.49), (6, 5.0),
              (7, 6.5), (8, 3.0), (9, 2.9), (10, 2.8), (11, 10.0), (12, 10.0),
              (13, 4.0), (14, 4.1), (15, 4.0), (16, 3.9)])
    assert get_chi_clusters_flat(rd, 0.1, 4) == \
        [(2, 5), (0, 9), (6, 10), (2, 15), (11, 15)]


def test_chi_7():
    rd = _rd([(1, 12.0), (2, 9.0), (3, 9.0), (4, 5.0), (5, 5.49), (6, 5.0),
              (7, 11.0), (8, 3.0), (9, 2.9), (10, 2.8), (11, 9.89), (12, 9.89),
              (13, 4.0), (14, 4.1), (15, 4.0), (16, 3.9)])
    assert get_chi_clusters_flat(rd, 0.1, 4) == \
        [(0, 5), (6, 9), (6, 15), (11, 15)]


def test_chi_8():
    rd = _rd([(1, 12.0), (2, 9.0), (3, 9.0), (4, 5.0), (5, 5.49), (6, 5.0),
              (7, 11.0), (8, 3.0), (9, 2.9), (10, 2.8), (11, 9.89), (12, 9.91),
              (13, 4.0), (14, 4.1), (15, 4.0), (16, 3.9)])
    assert get_chi_clusters_flat(rd, 0.1, 4) == [(0, 5), (6, 9), (11, 15)]


def test_chi_9():
    rd = _rd([(0, 5.0), (1, 5.49), (2, 5.0), (3, 11.0), (4, 3.0), (5, 2.9),
              (6, 2.8), (7, 9.89), (8, 9.9), (9, 4.0), (10, 4.1), (11, 4.0),
              (12, 3.9)])
    assert get_chi_clusters_flat(rd, 0.1, 4) == \
        [(0, 2), (3, 6), (3, 12), (8, 12)]


def test_chi_10():
    rd = _rd([(0, 5.0), (1, 5.49), (2, 5.0), (3, 11.0), (4, 3.0), (5, 2.9),
              (6, 2.8), (7, 9.89), (8, 9.91), (9, 4.0), (10, 4.1), (11, 4.0),
              (12, 3.9)])
    assert get_chi_clusters_flat(rd, 0.1, 4) == [(0, 2), (3, 6), (8, 12)]


def _load_chi11():
    data = np.loadtxt(os.path.join(DATA_DIR, "chi_test_11_reachability.csv"),
                      delimiter=",", skiprows=1)
    return [ReachabilityDist(int(i), float(d)) for i, d in data]


def test_chi_11_regression_vector_a():  # 700+-point committed regression
    rd = _load_chi11()
    clusters = get_chi_clusters_flat(rd, 0.02, 5, 0.15)
    assert clusters == [(155, 162), (203, 225), (295, 299), (300, 304),
                        (271, 358), (270, 372), (150, 407), (422, 493),
                        (590, 607), (626, 642), (412, 684), (700, 711)]


def test_chi_11_regression_vector_b():
    rd = _load_chi11()
    clusters = get_chi_clusters_flat(rd, 0.1, 8, 0.02)
    assert clusters == [(155, 160), (208, 217), (276, 321), (271, 355),
                        (150, 407), (425, 470), (425, 487), (598, 606),
                        (626, 642), (623, 650), (412, 684), (700, 711)]


# ---------------------------------------------------------------- tree tests

def test_cluster_tree():  # chi_cluster_tree_tests, test_main.cpp:504-566
    flat = [(2, 5), (0, 11), (6, 10)]
    trees = flat_clusters_to_tree(flat)
    assert len(trees) == 1
    root = trees[0]
    assert root.data == (0, 11)
    assert [c.data for c in root.children] == [(2, 5), (6, 10)]
    assert root.depth() == 2
    assert root.size() == 3


def test_cluster_tree_nested():
    flat = [(1, 2), (0, 5), (3, 4), (0, 20), (7, 9)]
    trees = flat_clusters_to_tree(flat)
    assert len(trees) == 1
    root = trees[0]
    assert root.data == (0, 20)
    kids = sorted(c.data for c in root.children)
    assert kids == [(0, 5), (7, 9)]


# ---------------------------------------------------------------- integration

def test_integration_three_gaussian_clusters():
    rng = np.random.default_rng(3)
    pts = np.concatenate([
        rng.normal((0, 0), 1.0, (50, 2)),
        rng.normal((30, 0), 1.0, (50, 2)),
        rng.normal((0, 30), 1.0, (50, 2)),
    ])
    rd = compute_reachability_dists(pts, min_pts=5, epsilon=5.0)
    clusters = [c for c in get_cluster_indices(rd, 5.0) if len(c) >= 10]
    assert len(clusters) == 3
    sizes = sorted(len(c) for c in clusters)
    assert sizes == [50, 50, 50]


def test_export_reachability(tmp_path):
    rd = _rd(CHI1[:4])
    p = str(tmp_path / "r.csv")
    optics.export_reachability_dists(rd, p)
    lines = open(p).read().strip().splitlines()
    assert lines[0] == "PointIndex;ReachabilityDistance"
    assert len(lines) == 5


# ------------------------------------------------------- grid neighbor search

def test_grid_neighbors_match_dense_integer_coords():
    """Integer coordinates: every distance term is exact in fp32, so the grid
    and dense paths must agree bit-for-bit (counts, neighbor sets, core dists,
    and the full sweep order)."""
    rng = np.random.default_rng(7)
    pts = rng.integers(0, 200, (1500, 2)).astype(np.float64)
    eps, min_pts = 7.0, 6
    g = optics.compute_neighbors_grid(pts, eps, min_pts)
    t = optics.compute_neighbors(pts, eps, min_pts)
    assert g is not None
    np.testing.assert_array_equal(np.asarray(g.count), np.asarray(t.count))
    np.testing.assert_array_equal(np.asarray(g.core_dist), np.asarray(t.core_dist))
    gi, ti = np.asarray(g.idx), np.asarray(t.idx)
    for i in range(len(pts)):
        assert set(gi[i][gi[i] >= 0]) == set(ti[i][ti[i] >= 0])
    rg = compute_reachability_dists(pts, min_pts, eps, method="grid")
    rd = compute_reachability_dists(pts, min_pts, eps, method="dense")
    assert [r.point_index for r in rg] == [r.point_index for r in rd]
    np.testing.assert_allclose([r.reach_dist for r in rg],
                               [r.reach_dist for r in rd], atol=1e-5)


def test_grid_neighbors_match_float64_oracle():
    """Float coordinates: grid counts/core dists match a float64 brute-force
    oracle (up to fp32 rounding at the eps boundary, which we exclude)."""
    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 100, (1200, 2))
    min_pts = 8
    eps = optics.epsilon_estimation(pts, min_pts)
    g = optics.compute_neighbors_grid(pts, eps, min_pts)
    assert g is not None
    D = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    clear = np.abs(D - eps).min(axis=1) > 1e-3 * eps  # no knife-edge pair
    cnt = (D <= eps).sum(1)
    core = np.where(cnt >= min_pts, np.sort(D, axis=1)[:, min_pts - 1], np.inf)
    np.testing.assert_array_equal(np.asarray(g.count)[clear], cnt[clear])
    np.testing.assert_allclose(np.asarray(g.core_dist)[clear], core[clear],
                               atol=1e-4)


def test_grid_neighbors_3d_and_fallbacks():
    rng = np.random.default_rng(13)
    pts = rng.uniform(0, 50, (600, 3))
    min_pts = 4
    eps = optics.epsilon_estimation(pts, min_pts)
    g = optics.compute_neighbors_grid(pts, eps, min_pts)
    assert g is not None
    t = optics.compute_neighbors(pts, eps, min_pts)
    np.testing.assert_array_equal(np.asarray(g.count), np.asarray(t.count))
    # dim > 3: the projected grid is opt-in (dense wins there, measured);
    # when enabled it must match the dense path's counts exactly
    pts6 = rng.uniform(0, 10, (100, 6))
    assert optics.compute_neighbors_grid(pts6, 2.0, 3) is None
    g6 = optics.compute_neighbors_grid(pts6, 2.0, 3, allow_projected=True)
    assert g6 is not None
    t6 = optics.compute_neighbors(pts6, 2.0, 3)
    np.testing.assert_array_equal(np.asarray(g6.count), np.asarray(t6.count))
    rd = compute_reachability_dists(pts6, 3, 2.0, method="auto")
    assert len(rd) == 100
    # a single over-dense cell still declines (bucket > max_bucket)
    dense_pts = np.concatenate([np.zeros((300, 2)), rng.uniform(0, 9, (9, 2))])
    assert optics.compute_neighbors_grid(dense_pts, 3.0, 3,
                                         max_bucket=128) is None
    # a degenerate grid (tiny eps over a wide spread -> table >> N) declines
    # and method="grid" surfaces it
    import pytest
    wide = rng.uniform(0, 1, (50, 2))
    assert optics.compute_neighbors_grid(wide, 1e-5, 3) is None
    with pytest.raises(ValueError):
        compute_reachability_dists(wide, 3, 1e-5, method="grid")


def test_cellpair_matches_grid_exactly():
    """Zero-gather cell-pair formulation == grid path (same exact-difference
    distance semantics): counts, core distances, and neighbor sets."""
    from evflow_tpu.io.synthetic import uniform_cloud
    for dim in (1, 2, 3):
        pts = uniform_cloud(2500, dim, 1000.0, seed=2)
        eps = optics.epsilon_estimation(pts, 10)
        g = optics.compute_neighbors_grid(pts, eps, 10, max_neighbors=256)
        cp = optics.compute_neighbors_cellpair(pts, eps, 10, max_neighbors=256)
        assert g is not None and cp is not None, dim
        np.testing.assert_array_equal(np.asarray(g.count), np.asarray(cp.count))
        np.testing.assert_allclose(np.asarray(g.core_dist),
                                   np.asarray(cp.core_dist), rtol=1e-6)
        gi, gd = np.asarray(g.idx), np.asarray(g.dist)
        ci, cd = np.asarray(cp.idx), np.asarray(cp.dist)
        for i in range(0, len(pts), 83):
            a = {int(v) for v, t in zip(gi[i], gd[i]) if np.isfinite(t)}
            b = {int(v) for v, t in zip(ci[i], cd[i]) if np.isfinite(t)}
            assert a == b, (dim, i)


def test_projected_grid_matches_dense_high_dim():
    """d > 4 grids (opt-in) bucket on the first 3 coordinates only; neighbor
    sets must still equal the dense path's (every eps-neighbor lies in the
    ±1 projected window). d=4 uses the exact 4-D grid instead (r3) — covered
    by test_grid_full_window_and_4d_grid_match_dense."""
    from evflow_tpu.io.synthetic import uniform_cloud
    for dim in (5, 6):
        pts = uniform_cloud(2500, dim, 1000.0, seed=3)
        eps = optics.epsilon_estimation(pts, 10)
        g = optics.compute_neighbors_grid(pts, eps, 10, max_neighbors=512,
                                          allow_projected=True)
        assert g is not None, dim
        dense = optics.compute_neighbors(pts, eps, 10, max_neighbors=512)
        gi, gd = np.asarray(g.idx), np.asarray(g.dist)
        di, dd = np.asarray(dense.idx), np.asarray(dense.dist)
        for i in range(0, len(pts), 83):
            a = {int(v) for v, t in zip(di[i], dd[i]) if np.isfinite(t)}
            b = {int(v) for v, t in zip(gi[i], gd[i]) if np.isfinite(t)}
            assert a == b, (dim, i)


def test_projected_grid_g4_exact_sets():
    """r4b: the projected grid's dimensionality is tunable (proj_dims); at
    g=4 every full-D eps-neighbor still lies in the ±1 window of the 4-D
    projection. Verify g=3 and g=4 against a fp32 difference-form numpy
    oracle (the dense |a|²+|b|²-2ab panel can MISS true neighbors within an
    ulp of eps — the grid's diff-form distances are the more accurate
    contract, so the oracle uses the same form)."""
    from evflow_tpu.io.synthetic import uniform_cloud
    for dim in (5, 6):
        pts = uniform_cloud(3000, dim, 1000.0, seed=5)
        eps = optics.epsilon_estimation(pts, 10)
        for g in (3, 4):
            t = optics.compute_neighbors_grid(pts, eps, 10, max_neighbors=512,
                                              allow_projected=True,
                                              proj_dims=g)
            assert t is not None, (dim, g)
            ti = np.asarray(t.idx)
            for i in range(0, len(pts), 107):
                d32 = np.sqrt(np.sum((pts - pts[i]).astype(np.float32) ** 2,
                                     axis=1))
                oracle = set(np.where(d32 <= np.float32(eps))[0].tolist())
                got = {int(v) for v in ti[i] if v >= 0}
                assert got == oracle, (dim, g, i, got ^ oracle)


def test_neighbor_cap_truncation():
    """VERDICT r2 item 10: quantify the max_neighbors cap on a dense scene
    whose true neighborhoods far exceed the cap.

    (a) The driver auto-raises K to cover the true max neighborhood (one
        recompute, RuntimeWarning) — reachability then matches the
        uncapped-K run exactly.
    (b) With auto-raise unavailable (cap pinned by forcing K above the
        raise cap via a tiny budget scene), the truncated profile's error
        vs the full-K oracle is bounded: dropped FAR neighbors are relaxed
        through closer intermediates in dense scenes.
    """
    import warnings as _w
    rng = np.random.default_rng(11)
    n = 1200
    # one tight gaussian: with eps ~ cloud radius every neighborhood ≈ n
    pts = rng.normal(0.0, 5.0, (n, 2))
    eps = 12.0
    min_pts = 10

    # truncated table (no driver, raw K=128) vs full table (K=n)
    t_small = optics.compute_neighbors(pts, eps, min_pts, max_neighbors=128)
    t_full = optics.compute_neighbors(pts, eps, min_pts, max_neighbors=n)
    max_cnt = int(np.asarray(t_full.count).max())
    assert max_cnt > 512, max_cnt   # scene really is over-dense

    def reach_by_index(reach_dists):
        r = np.full(n, -1.0)
        for rd in reach_dists:
            r[rd.point_index] = rd.reach_dist
        return r

    # (a) driver auto-raises and matches the explicit full-K run
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        got = optics.compute_reachability_dists(
            pts, min_pts, eps, max_neighbors=128, method="dense",
            use_native=False)
        assert any("recomputing with max_neighbors" in str(x.message)
                   for x in rec), [str(x.message) for x in rec]
    full = optics.compute_reachability_dists(
        pts, min_pts, eps, max_neighbors=n, method="dense", use_native=False)
    np.testing.assert_allclose(reach_by_index(got), reach_by_index(full),
                               rtol=0, atol=1e-12)

    # (b) the truncated-at-128 profile itself: bounded error vs full
    def sweep(table):
        import heapq
        nbr_idx = np.asarray(table.idx)
        nbr_dist = np.asarray(table.dist, dtype=np.float64)
        core = np.asarray(table.core_dist, dtype=np.float64)
        processed = np.zeros(n, bool); reach = np.full(n, -1.0); order = []
        for s0 in range(n):
            if processed[s0]:
                continue
            processed[s0] = True; order.append(s0)
            if not np.isfinite(core[s0]):
                continue
            seeds = []
            def upd(p):
                for j, dj in zip(nbr_idx[p], nbr_dist[p]):
                    if j < 0 or not np.isfinite(dj) or processed[j]:
                        continue
                    r = max(core[p], dj)
                    if reach[j] < 0 or r < reach[j]:
                        reach[j] = r; heapq.heappush(seeds, (r, j))
            upd(s0)
            while seeds:
                r, s = heapq.heappop(seeds)
                if processed[s] or r != reach[s]:
                    continue
                processed[s] = True; order.append(s); upd(s)
        return reach

    r_small = sweep(t_small)
    r_full = sweep(t_full)
    both = (r_small >= 0) & (r_full >= 0)
    # every point reached by the full sweep is still reached truncated
    assert (both == (r_full >= 0)).all()
    err = np.abs(r_small[both] - r_full[both])
    rel = err / np.maximum(r_full[both], 1e-9)
    # dense-scene bound: truncation inflates reachability only marginally
    assert float(np.mean(rel)) < 0.02, float(np.mean(rel))
    assert float(np.max(err)) <= eps, float(np.max(err))
    print(f"truncation k=128 vs k={n}: mean rel err {np.mean(rel):.4f}, "
          f"max abs err {np.max(err):.3f} (eps={eps})")


def test_grid_full_window_and_4d_grid_match_dense():
    """r3: full_window=True skips nearest-k selection and returns the masked
    3^g·B window (K=m, unsorted, -1/inf pads) — counts, core dists, and
    neighbor sets must equal the dense path's. d=4 exercises the new exact
    4-D grid (g=4, 81 windows)."""
    from evflow_tpu.io.synthetic import uniform_cloud
    for dim in (2, 3, 4):
        pts = uniform_cloud(2000, dim, 1000.0, seed=5)
        eps = optics.epsilon_estimation(pts, 10)
        # max_neighbors tiny on purpose: full_window must ignore it
        fw = optics.compute_neighbors_grid(pts, eps, 10, max_neighbors=16,
                                           full_window=True)
        assert fw is not None, dim
        dense = optics.compute_neighbors(pts, eps, 10, max_neighbors=1024)
        # exclude knife-edge pairs: grid uses exact differences, dense the
        # |a|²+|b|²-2ab panel — they may round a dist==eps pair differently
        D = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
        clear = np.abs(D - eps).min(axis=1) > 1e-3 * eps
        np.testing.assert_array_equal(np.asarray(fw.count)[clear],
                                      np.asarray(dense.count)[clear])
        # grid distances are exact differences; dense uses the panel form
        # (fp32 rounding differs at ~3e-4 relative; the grid is the more
        # accurate of the two)
        np.testing.assert_allclose(np.asarray(fw.core_dist)[clear],
                                   np.asarray(dense.core_dist)[clear],
                                   rtol=1e-3)
        fi, fd = np.asarray(fw.idx), np.asarray(fw.dist)
        di, dd = np.asarray(dense.idx), np.asarray(dense.dist)
        for i in range(0, len(pts), 71):
            if not clear[i]:
                continue
            a = {int(v) for v, t in zip(fi[i], fd[i]) if np.isfinite(t)}
            b = {int(v) for v, t in zip(di[i], dd[i]) if np.isfinite(t)}
            assert a == b, (dim, i)
    # the sweep consumes the masked rows as-is (order-agnostic)
    pts = uniform_cloud(1500, 3, 1000.0, seed=6)
    eps = optics.epsilon_estimation(pts, 10)
    rg = compute_reachability_dists(pts, 10, eps, method="grid",
                                    full_window=True)
    rd = compute_reachability_dists(pts, 10, eps, method="dense",
                                    max_neighbors=1024)
    # visit ORDER is heap-sensitive to the fp32 rounding difference between
    # the two distance forms; per-point reachability values must agree
    by_pt_g = {r.point_index: r.reach_dist for r in rg}
    by_pt_d = {r.point_index: r.reach_dist for r in rd}
    assert by_pt_g.keys() == by_pt_d.keys()
    ga = np.array([by_pt_g[i] for i in sorted(by_pt_g)])
    da = np.array([by_pt_d[i] for i in sorted(by_pt_d)])
    np.testing.assert_allclose(ga, da, rtol=1e-3, atol=1e-5)


def test_4d_grid_select_mode_and_entry_cap():
    """d=4 grids support sort-based selection (capped K tables) and the
    full-window entry cap falls back to selection when exceeded."""
    from evflow_tpu.io.synthetic import uniform_cloud
    pts4 = uniform_cloud(2000, 4, 1000.0, seed=7)
    eps = optics.epsilon_estimation(pts4, 10)
    # sort-select keeps a K-wide table whose sets match dense (clear pts)
    g = optics.compute_neighbors_grid(pts4, eps, 10, max_neighbors=64)
    assert g is not None and np.asarray(g.idx).shape[1] <= 81 * 64
    dense = optics.compute_neighbors(pts4, eps, 10, max_neighbors=1024)
    D = np.sqrt(((pts4[:, None, :] - pts4[None, :, :]) ** 2).sum(-1))
    clear = np.abs(D - eps).min(axis=1) > 1e-3 * eps
    np.testing.assert_array_equal(np.asarray(g.count)[clear],
                                  np.asarray(dense.count)[clear])
    # with an entry cap too small for the window, full_window falls back to
    # the (sorted) select path
    g = optics.compute_neighbors_grid(pts4, eps, 10, max_neighbors=16,
                                      full_window=True,
                                      full_window_entry_cap=1000)
    assert g is not None and np.asarray(g.idx).shape[1] == 16
    # d=3 under the same tiny cap falls back to the select path (K=16)
    pts3 = uniform_cloud(2000, 3, 1000.0, seed=7)
    eps3 = optics.epsilon_estimation(pts3, 10)
    g3 = optics.compute_neighbors_grid(pts3, eps3, 10, max_neighbors=16,
                                       full_window=True,
                                       full_window_entry_cap=1000)
    assert g3 is not None and np.asarray(g3.idx).shape[1] == 16


def test_two_stage_dense_equals_dense_neighbor_sets():
    """r4 (VERDICT item 3): the bf16-prefilter two-stage dense panel must
    reproduce the HIGHEST dense path's neighbor SETS exactly — including at
    the ~1e3 coordinate scale where raw bf16 distances once inflated
    neighborhoods 80x (the gate's error bound is what makes bf16 safe here).
    count is documented as a superset upper bound (>= true, drives
    auto-raise); core distances use the more-accurate diff form."""
    from evflow_tpu.io.synthetic import uniform_cloud
    for d, n in ((4, 4000), (6, 4000), (2, 3000)):
        pts = uniform_cloud(n, d, seed=3)        # coords ~1e3
        eps = optics.epsilon_estimation(pts, 10)
        a = optics.compute_neighbors(pts, eps, 10, 128)
        b = optics.compute_neighbors_2stage(pts, eps, 10, 128)
        ia, ib = np.asarray(a.idx), np.asarray(b.idx)
        ca, cb = np.asarray(a.count), np.asarray(b.count)
        for i in range(n):
            assert set(ia[i][ia[i] >= 0]) == set(ib[i][ib[i] >= 0]), (d, i)
        assert (cb >= ca).all(), (d, "superset count must bound true count")
        # core: min_pts-th distance, diff-form vs panel-form — allclose
        ka, kb = np.asarray(a.core_dist), np.asarray(b.core_dist)
        fin = np.isfinite(ka)
        assert (fin == np.isfinite(kb)).all()
        # tolerance note: the HIGHEST panel's |a|²+|b|²-2ab cancellation at
        # |coords|² ~ 4e6 carries ~0.25 absolute d² error (2^-24 rounding),
        # i.e. ~5e-3 on distances; the diff form is the accurate side
        np.testing.assert_allclose(ka[fin], kb[fin], rtol=1e-3, atol=0.02)


def test_two_stage_dense_reachability_end_to_end():
    """dense2 through the public sweep: reachability output must match the
    dense method's on a clustered cloud (same neighbor sets -> same sweep)."""
    rng = np.random.default_rng(5)
    cents = rng.uniform(0, 800, (6, 4))
    pts = (cents[rng.integers(0, 6, 1500)]
           + rng.normal(0, 10, (1500, 4))).astype(np.float64)
    rd_a = optics.compute_reachability_dists(pts, 8, 40.0, method="dense")
    rd_b = optics.compute_reachability_dists(pts, 8, 40.0, method="dense2")
    # visit ORDER can permute where reach values tie within the panel-form's
    # fp cancellation noise (same property the grid path has vs dense);
    # compare the per-POINT reachability values instead
    da = np.full(len(pts), -2.0); db = np.full(len(pts), -2.0)
    for r in rd_a:
        da[r.point_index] = r.reach_dist
    for r in rd_b:
        db[r.point_index] = r.reach_dist
    unreached = da < 0
    assert (unreached == (db < 0)).all()
    # reach_dist is visit-order dependent (a permuted pop order can hand a
    # point a different predecessor), so a FEW points may genuinely differ;
    # assert near-total agreement plus identical cluster extraction
    close = np.isclose(da[~unreached], db[~unreached], rtol=1e-3, atol=0.05)
    assert close.mean() >= 0.995, close.mean()
    ca = optics.get_cluster_indices(rd_a, 20.0)
    cb = optics.get_cluster_indices(rd_b, 20.0)
    assert sorted(map(sorted, ca)) == sorted(map(sorted, cb))


def test_certified_equals_dense_neighbor_sets():
    """r5 (VERDICT #1): the count-certified path must reproduce the
    HIGHEST dense path's neighbor SETS exactly at every dimension — via
    the certificate (cnt_gate <= k and all gate-passers captured) on the
    fast path and the exact full-width sort on rejected rows. All four
    configurations must agree: direct, segment-reduced, forced-fallback,
    and the oracle."""
    from evflow_tpu.io.synthetic import uniform_cloud
    for d, n in ((4, 3000), (6, 3000), (2, 2000)):
        pts = uniform_cloud(n, d, seed=3)        # coords ~1e3
        eps = optics.epsilon_estimation(pts, 10)
        a = optics.compute_neighbors(pts, eps, 10, 128)
        stats = {}
        variants = {
            "direct": optics.compute_neighbors_certified(
                pts, eps, 10, 128, _stats=stats),
            "straggler": optics.compute_neighbors_certified(
                pts, eps, 10, 128, _force_retry=True, straggler_block=512),
            "fallback": optics.compute_neighbors_certified(
                pts, eps, 10, 128, _force_fallback=True, sort_block=128),
        }
        ia = np.asarray(a.idx)
        ca = np.asarray(a.count)
        for name, b in variants.items():
            ib = np.asarray(b.idx)
            for i in range(n):
                assert set(ia[i][ia[i] >= 0]) == set(ib[i][ib[i] >= 0]), \
                    (name, d, i)
            cb = np.asarray(b.count)
            if name == "fallback":
                assert (cb == ca).all(), (name, d)   # exact counts
            else:
                assert (cb >= ca).all(), (name, d)   # gate superset
            ka, kb = np.asarray(a.core_dist), np.asarray(b.core_dist)
            fin = np.isfinite(ka)
            assert (fin == np.isfinite(kb)).all(), (name, d)
            np.testing.assert_allclose(ka[fin], kb[fin], rtol=1e-3, atol=0.02)
        assert "uncertified" in stats


def test_certified_reachability_end_to_end():
    """certified through the public sweep (method='certified'): cluster
    extraction must match the dense method's, and 'auto' at d>4 must now
    route through the certified (exact) path rather than approx dense."""
    rng = np.random.default_rng(5)
    cents = rng.uniform(0, 800, (6, 5))
    pts = (cents[rng.integers(0, 6, 1500)]
           + rng.normal(0, 10, (1500, 5))).astype(np.float64)
    rd_a = optics.compute_reachability_dists(pts, 8, 40.0, method="dense")
    rd_b = optics.compute_reachability_dists(pts, 8, 40.0, method="certified")
    rd_c = optics.compute_reachability_dists(pts, 8, 40.0, method="auto")
    for rd_x in (rd_b, rd_c):
        da = np.full(len(pts), -2.0); db = np.full(len(pts), -2.0)
        for r in rd_a:
            da[r.point_index] = r.reach_dist
        for r in rd_x:
            db[r.point_index] = r.reach_dist
        unreached = da < 0
        assert (unreached == (db < 0)).all()
        close = np.isclose(da[~unreached], db[~unreached],
                           rtol=1e-3, atol=0.05)
        assert close.mean() >= 0.995, close.mean()
        ca = optics.get_cluster_indices(rd_a, 20.0)
        cb = optics.get_cluster_indices(rd_x, 20.0)
        assert sorted(map(sorted, ca)) == sorted(map(sorted, cb))


def test_certified_fallback_overflow_rows():
    """Rows whose gate superset exceeds k are uncertified; after the exact
    fallback they must hold the exact nearest-k and the EXACT true count
    (so auto-raise sizes from truth). Construct a dense clump bigger than k
    next to sparse points."""
    rng = np.random.default_rng(7)
    clump = rng.normal(500.0, 1.0, (60, 2))
    sparse = rng.uniform(0, 1000, (60, 2))
    pts = np.concatenate([clump, sparse]).astype(np.float64)
    eps = 25.0
    k = 16
    b = optics.compute_neighbors_certified(pts, eps, 5, max_neighbors=k)
    ib = np.asarray(b.idx)
    db = np.asarray(b.dist)
    cb = np.asarray(b.count)
    # float64 oracle (the dense panel form carries ~0.03 absolute distance
    # noise at these coordinate scales — not a valid selection oracle at
    # the k-boundary of a near-tied clump)
    d64 = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    within = d64 <= eps
    c64 = within.sum(1)
    for i in range(len(pts)):
        if c64[i] > k:      # overflow row: exact nearest-k, exact count
            assert cb[i] == c64[i], i
            kth = np.sort(d64[i][within[i]])[:k]
            np.testing.assert_allclose(np.sort(db[i]), kth,
                                       rtol=1e-5, atol=1e-3)
        else:
            truth = set(np.nonzero(within[i])[0])
            assert set(ib[i][ib[i] >= 0]) == truth, i
    assert (c64 > k).any()  # the scenario actually exercised overflow


def test_epsilon_estimation_high_dim_no_overflow():
    """r4b: the direct ε formula overflows float64 at high d (extent^d,
    Γ(d/2+1), and their ratio); the log-space fallback must agree with the
    direct form in the overlap region and stay finite at the reference
    benchmark's d=128/512 configs (Benchmark.ods rows D=128, D=512)."""
    import math
    from evflow_tpu.io.synthetic import uniform_cloud
    for d in (100, 128, 512):
        pts = uniform_cloud(1000, d, 1000.0, seed=1)
        e = optics.epsilon_estimation(pts, 10)
        assert math.isfinite(e) and e > 0.0, (d, e)
    # overlap region: log-space form equals the validated direct form
    pts = uniform_cloud(1000, 6, 1000.0, seed=1)
    e = optics.epsilon_estimation(pts, 10)
    ext = np.abs(pts.max(0) - pts.min(0)).astype(np.float64)
    lsp = float(np.sum(np.log(ext))) - math.log(len(pts)) + math.log(10)
    lub = 0.5 * 6 * math.log(math.pi) - math.lgamma(6 / 2.0 + 1.0)
    np.testing.assert_allclose(e, math.exp((lsp - lub) / 6), rtol=1e-7)
