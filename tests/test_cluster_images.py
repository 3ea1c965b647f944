"""Image-based clustering test — port of optics-clustering/test/
ClusterImage_Test/test_ClusterImages.cpp:14-89 (extract points from an image,
cluster with OPTICS, snapshot the cluster render). The PNG fixture is replaced
by a generated PPM with the same structure (dark blobs on white)."""

import numpy as np
import pytest

from evflow_tpu.utils.ppm import BGRImage
from evflow_tpu.utils.plots import draw_2d_clusters
from evflow_tpu.models import optics


def _make_cluster_image(tmp_path):
    img = BGRImage(200, 150)
    rng = np.random.default_rng(0)
    blobs = [(40, 40), (150, 50), (90, 110)]
    for cx, cy in blobs:
        for _ in range(60):
            x = int(np.clip(rng.normal(cx, 4), 0, 199))
            y = int(np.clip(rng.normal(cy, 4), 0, 149))
            img.set_pixel(x, y, (0, 0, 0))
    return img.save(str(tmp_path / "ClusterImage_1")), blobs


def _extract_points(path):
    """Dark-pixel extraction (test_ClusterImages.cpp reads non-white pixels)."""
    img = BGRImage.load(path)
    ys, xs = np.where(img.px.sum(axis=2) < 300)
    return np.stack([xs, ys], axis=1).astype(np.float64)


def test_cluster_image_roundtrip(tmp_path):
    path, blobs = _make_cluster_image(tmp_path)
    pts = _extract_points(path)
    assert len(pts) > 100

    rd = optics.compute_reachability_dists(pts, min_pts=4, epsilon=10.0)
    clusters = [c for c in optics.get_cluster_indices(rd, 10.0) if len(c) >= 20]
    assert len(clusters) == 3
    # each recovered cluster centroid is near one synthetic blob center
    for c in clusters:
        cen = pts[np.asarray(c, int)].mean(axis=0)
        d = min(np.hypot(cen[0] - bx, cen[1] - by) for bx, by in blobs)
        assert d < 5.0

    out = draw_2d_clusters([pts[np.asarray(c, int)] for c in clusters])
    saved = out.save(str(tmp_path / "Clusters2d"))
    back = BGRImage.load(saved)
    assert back.width == out.width and back.height == out.height
