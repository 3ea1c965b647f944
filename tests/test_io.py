import io
import numpy as np
import pytest

from evflow_tpu.io import (EventStream, slice_by_count, slice_by_time, decimate,
                           load_csv, save_csv, save_npz, load_npz,
                           save_raw_i32, load_raw_i32, synthetic)
from tests.conftest import DATA_DIR
import os


def test_load_fixture_csv():
    s = load_csv(os.path.join(DATA_DIR, "event_raw_data8.csv"))
    assert len(s) == 320
    # First row of the committed fixture: 526,262,2458,0
    assert (s.x[0], s.y[0], s.t[0], s.p[0]) == (526, 262, 2458, 0)
    assert s.t.dtype == np.int64
    assert np.all(np.diff(s.sorted_by_time().t) >= 0)


def test_roundtrip_formats(tmp_path):
    s = synthetic.moving_blob_stream(num_slices=2, events_per_slice=100)
    for i, (save, load) in enumerate([(save_csv, load_csv), (save_npz, load_npz),
                                      (save_raw_i32, load_raw_i32)]):
        p = str(tmp_path / f"ev{i}.npz")  # .npz suffix keeps numpy from renaming
        save(s, p)
        r = load(p)
        np.testing.assert_array_equal(r.x, s.x)
        np.testing.assert_array_equal(r.y, s.y)
        np.testing.assert_array_equal(r.t, s.t)
        np.testing.assert_array_equal(r.p, s.p)


def test_slice_by_count():
    s = synthetic.moving_blob_stream(num_slices=1, events_per_slice=1000)
    sl = slice_by_count(s, 256)
    assert sl.num_slices == 4  # 3 full + 1 partial (232)
    assert sl.slice_capacity == 256
    np.testing.assert_array_equal(sl.count, [256, 256, 256, 232])
    # events preserved in order
    np.testing.assert_array_equal(sl.x[0], s.x[:256])
    np.testing.assert_array_equal(sl.x[3][:232], s.x[768:])
    assert np.all(sl.x[3][232:] == 0)  # padding
    m = sl.valid_mask()
    assert m.shape == (4, 256)
    assert m.sum() == 1000


def test_slice_by_time():
    t = np.arange(1000, dtype=np.int64) * 100  # 100 µs apart → 10 ms total
    s = EventStream(np.arange(1000) % 1280, np.arange(1000) % 720, t,
                    np.zeros(1000, np.int32))
    sl = slice_by_time(s, n_us=1000, capacity=16)  # 1 ms windows → 10 per window
    assert sl.num_slices == 100
    assert np.all(sl.count == 10)
    # capacity overflow keeps the most recent events
    sl2 = slice_by_time(s, n_us=2000, capacity=16)
    assert np.all(sl2.count == 16)
    assert sl2.x[0][-1] == s.x[19]


def test_decimate():
    s = synthetic.moving_blob_stream(num_slices=1, events_per_slice=1024)
    d = decimate(s, 256)
    assert len(d) == 4
    np.testing.assert_array_equal(d.x, s.x[::256])


def test_synthetic_kmeans_ramp():
    d = synthetic.kmeans_ramp_data(2048)
    assert d.shape == (2048, 2)
    assert d[150, 0] == 50.0  # 150 % 100
    c = synthetic.kmeans_initial_centroids()
    assert c.shape == (8, 2)
    assert c[0, 0] == 1.0 and c[7, 1] == 70.0
