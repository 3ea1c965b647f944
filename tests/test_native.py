import os
import numpy as np
import pytest

from evflow_tpu import native
from evflow_tpu.io import load_csv
from evflow_tpu.models import optics
from tests.conftest import DATA_DIR

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="g++ toolchain unavailable")


@needs_native
def test_native_csv_matches_numpy():
    path = os.path.join(DATA_DIR, "event_raw_data8.csv")
    xs, ys, ts, ps = native.load_csv(path)
    ref = load_csv(path)
    np.testing.assert_array_equal(xs, ref.x)
    np.testing.assert_array_equal(ys, ref.y)
    np.testing.assert_array_equal(ts, ref.t)
    np.testing.assert_array_equal(ps, ref.p)


@needs_native
def test_native_analyze_coordinates():
    rng = np.random.default_rng(0)
    xs = rng.integers(0, 50, 1000).astype(np.int32)
    ys = rng.integers(0, 50, 1000).astype(np.int32)
    ux, uy = native.analyze_coordinates(xs, ys)
    seen = set()
    exp = []
    for x, y in zip(xs.tolist(), ys.tolist()):
        if (x, y) not in seen:
            seen.add((x, y))
            exp.append((x, y))
    assert list(zip(ux.tolist(), uy.tolist())) == exp


@needs_native
def test_native_sweep_matches_python_sweep():
    rng = np.random.default_rng(1)
    pts = np.concatenate([
        rng.normal((0, 0), 1.0, (80, 2)),
        rng.normal((20, 0), 1.0, (70, 2)),
    ])
    rd_native = optics.compute_reachability_dists(pts, 5, 4.0, use_native=True)
    rd_python = optics.compute_reachability_dists(pts, 5, 4.0, use_native=False)
    assert [r.point_index for r in rd_native] == [r.point_index for r in rd_python]
    np.testing.assert_allclose([r.reach_dist for r in rd_native],
                               [r.reach_dist for r in rd_python], atol=1e-12)
