import numpy as np
import jax.numpy as jnp
import pytest

from evflow_tpu.utils.ppm import BGRImage
from evflow_tpu.utils import plots, checkpoint, profiling
from evflow_tpu.models.optics import ReachabilityDist
from evflow_tpu.models import fastcluster, tracker
from evflow_tpu.config import ClusterConfig, TrackerConfig


def test_ppm_roundtrip(tmp_path):
    img = BGRImage(16, 8, fill=(10, 20, 30))
    img.set_pixel(3, 4, (255, 0, 0))
    img.line(0, 0, 15, 7, (0, 255, 0))
    img.circle(8, 4, 3, (0, 0, 255))
    p = img.save(str(tmp_path / "test"))
    assert p.endswith(".ppm")
    back = BGRImage.load(p)
    np.testing.assert_array_equal(back.px, img.px)


def test_line_endpoints():
    img = BGRImage(10, 10, fill=(0, 0, 0))
    img.line(1, 1, 8, 5, (255, 255, 255))
    assert img.get_pixel(1, 1) == (255, 255, 255)
    assert img.get_pixel(8, 5) == (255, 255, 255)


def test_reachability_plot_renders():
    rd = [ReachabilityDist(0, -1.0)] + \
         [ReachabilityDist(i, 5.0 + (i % 7)) for i in range(1, 60)]
    img = plots.draw_reachability_plot(rd)
    assert img.width >= 100 and img.height == 256
    img2 = plots.draw_reachability_plot_with_chi_clusters(rd, 0.1, 4)
    assert img2.height > 256


def test_2d_cluster_plot():
    cl = [np.array([[0, 0], [5, 5], [3, 2]]), np.array([[50, 50], [55, 52]])]
    img = plots.draw_2d_clusters(cl)
    assert img.width >= 55 and img.height >= 52


def test_checkpoint_roundtrip_fastcluster(tmp_path):
    cfg = ClusterConfig(max_clusters=8)
    st = fastcluster.init_state(cfg)
    st = st._replace(next_cid=jnp.int32(5), alive=st.alive.at[2].set(True))
    p = str(tmp_path / "ck.npz")
    checkpoint.save_npz(p, st)
    back = checkpoint.restore_npz(p, fastcluster.init_state(cfg))
    assert int(back.next_cid) == 5
    assert bool(np.asarray(back.alive)[2])


def test_checkpoint_shape_mismatch_rejected(tmp_path):
    st = fastcluster.init_state(ClusterConfig(max_clusters=8))
    p = str(tmp_path / "ck.npz")
    checkpoint.save_npz(p, st)
    with pytest.raises(AssertionError):
        checkpoint.restore_npz(p, fastcluster.init_state(ClusterConfig(max_clusters=16)))


def test_stopwatch_and_meter():
    sw = profiling.Stopwatch()
    sw.lap()
    assert sw.elapsed() >= 0
    assert len(sw.elapsed_laps()) == 1
    m = profiling.ThroughputMeter()
    m.add_slice(100)
    m.add_slice(200)
    assert m.events == 300 and m.slices == 2
    assert "events_per_s" in m.report()


def test_pcd_roundtrip(tmp_path):
    from evflow_tpu.utils import pcd
    rng = np.random.default_rng(0)
    pts = rng.random((50, 3)).astype(np.float32)
    inten = (np.arange(50) % 8).astype(np.float32)
    for binary in (False, True):
        p = str(tmp_path / f"c{binary}.pcd")
        pcd.save_pcd(p, pts, inten, binary=binary)
        back, bint = pcd.load_pcd(p)
        np.testing.assert_allclose(back, pts, atol=1e-5)
        np.testing.assert_allclose(bint, inten, atol=1e-5)
    # without intensity
    p = str(tmp_path / "n.pcd")
    pcd.save_pcd(p, pts)
    back, bint = pcd.load_pcd(p)
    assert bint is None
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_line_antialiased():
    """Coverage-blended line: endpoints land hard, interior pixels carry the
    fractional coverage of the ideal line, nothing painted out of bounds."""
    from evflow_tpu.utils.ppm import BGRImage
    img = BGRImage(32, 32, fill=(255, 255, 255))
    img.line_antialiased(2, 2, 28, 9, (0, 0, 0))
    px = np.asarray(img.px, np.int32)
    # the line darkened pixels along its path
    darkened = np.where(px[:, :, 0] < 255)
    assert len(darkened[0]) >= 27
    # at every x along the span, the two straddling pixels' coverages sum to
    # ~1 (the blend conserves intensity against a white background)
    for x in range(3, 28):
        colsum = (255 - px[:, x, 0]).sum()
        assert 250 <= colsum <= 260, (x, colsum)
    # diagonal + steep + degenerate lines stay in bounds
    img.line_antialiased(-5, -5, 40, 40, (255, 0, 0))
    img.line_antialiased(5, 30, 5, -3, (0, 255, 0))
    img.line_antialiased(7, 7, 7, 7, (0, 0, 255))


def test_bitmap_text_glyphs():
    """Built-in 5x7 font (r3): glyph pixels land in the 5x7 box above the
    putText-style baseline, advance is 6 px, unknown chars skip silently."""
    from evflow_tpu.utils.ppm import BGRImage, _FONT5x7
    img = BGRImage(64, 16, fill=(0, 0, 0))
    img.text(2, 10, "1", (0, 0, 255))
    on = np.argwhere((img.px == (0, 0, 255)).all(axis=2))
    assert len(on) > 0
    # every painted pixel inside the glyph box x in [2,7), y in [3,10)
    assert on[:, 1].min() >= 2 and on[:, 1].max() < 7
    assert on[:, 0].min() >= 3 and on[:, 0].max() < 10
    # exact pattern of "1"
    exp = np.zeros((7, 5), bool)
    for r, bits in enumerate(_FONT5x7["1"]):
        for c in range(5):
            exp[r, c] = bool(bits & (0b10000 >> c))
    got = (img.px[3:10, 2:7] == (0, 0, 255)).all(axis=2)
    np.testing.assert_array_equal(got, exp)
    # advance: two chars paint disjoint columns 6 px apart
    img2 = BGRImage(64, 16, fill=(0, 0, 0))
    img2.text(0, 10, "00", (255, 255, 255))
    cols = np.unique(np.argwhere(img2.px.any(axis=2))[:, 1])
    assert cols.max() >= 6 and 5 not in cols  # 1-px gap between glyph boxes
    # the reference label strings render without error and stay in-bounds
    img3 = BGRImage(200, 20, fill=(0, 0, 0))
    img3.text(2, 15, "12.3 px/f", (1, 2, 3))
    img3.text(2, 8, "7(G12)", (1, 2, 3))
    assert img3.px.any()
