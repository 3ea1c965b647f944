import numpy as np
import jax.numpy as jnp

from evflow_tpu.config import KMeansConfig
from evflow_tpu.models.kmeans import kmeans, kmeans_reference_numpy, compat_labels
from evflow_tpu.io import synthetic


def test_kmeans_ramp_converges_and_matches_oracle():
    pts = synthetic.kmeans_ramp_data(2048)
    init = synthetic.kmeans_initial_centroids()
    cfg = KMeansConfig()
    res = kmeans(jnp.asarray(pts), jnp.asarray(init), cfg=cfg)
    ref_c, ref_labels = kmeans_reference_numpy(pts, init, cfg)
    np.testing.assert_allclose(np.asarray(res.centroids), ref_c, atol=1e-3)
    labels = np.asarray(res.labels)
    mismatch = labels != ref_labels
    if mismatch.any():
        # disagreements are only allowed at near-ties (f32 vs f64 rounding)
        d = np.linalg.norm(pts[:, None, :] - ref_c[None, :, :], axis=2)
        d_sorted = np.sort(d, axis=1)
        near_tie = (d_sorted[:, 1] - d_sorted[:, 0]) < 1e-2
        assert np.all(near_tie[mismatch])
    assert int(res.iters) >= 1
    # the i%100 ramp lies on the diagonal; all centroids must be on it
    c = np.asarray(res.centroids)
    np.testing.assert_allclose(c[:, 0], c[:, 1], atol=1e-3)


def test_kmeans_gate_leaves_far_points_unassigned():
    pts = np.array([[0.0, 0], [1, 1], [500, 500]], np.float32)
    init = np.array([[0.0, 0]], np.float32)
    res = kmeans(jnp.asarray(pts), jnp.asarray(init),
                 cfg=KMeansConfig(k=1))
    labels = np.asarray(res.labels)
    assert labels[2] == -1              # beyond threshold 50 stays unassigned
    assert labels[0] == 0 and labels[1] == 0
    np.testing.assert_array_equal(np.asarray(compat_labels(res.labels)),
                                  [0, 0, 255])


def test_kmeans_blobs_recover_centers():
    rng = np.random.default_rng(0)
    centers = np.array([[100.0, 100], [400, 120], [250, 300]], np.float32)
    pts = np.concatenate([
        c + rng.normal(0, 5, size=(300, 2)) for c in centers
    ]).astype(np.float32)
    init = centers + rng.normal(0, 10, size=centers.shape).astype(np.float32)
    res = kmeans(jnp.asarray(pts), jnp.asarray(init),
                 cfg=KMeansConfig(convergence_tol=0.1, max_iters=50))
    got = np.asarray(res.centroids)
    for c in centers:
        assert np.min(np.linalg.norm(got - c, axis=1)) < 3.0


def test_kmeans_valid_mask():
    pts = np.array([[0.0, 0], [1, 1], [30, 30], [31, 31]], np.float32)
    init = np.array([[0.0, 0], [30.0, 30.0]], np.float32)
    valid = np.array([True, True, False, False])
    res = kmeans(jnp.asarray(pts), jnp.asarray(init), jnp.asarray(valid),
                 cfg=KMeansConfig(convergence_tol=0.01))
    np.testing.assert_allclose(np.asarray(res.centroids)[0], [0.5, 0.5], atol=1e-3)
    # masked points contribute to no centroid and get label -1
    np.testing.assert_array_equal(np.asarray(res.labels)[2:], [-1, -1])
    # cluster 1 saw no valid points: held its initial position
    np.testing.assert_allclose(np.asarray(res.centroids)[1], [30, 30], atol=1e-3)
