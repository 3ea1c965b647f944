"""Golden-file regression — the engine's analog of the reference's committed
centroid.logs / event_cam_clustering_test.log oracles (SURVEY §4): the
flagship pipeline's per-slice cluster reports on the committed event fixture,
frozen as JSON. Regenerate with
  python -m tests.test_golden   (writes tests/data/golden_cluster_flow.json)
"""

import json
import os

import numpy as np
import jax.numpy as jnp

from evflow_tpu.config import DEFAULT, ClusterConfig, SliceConfig
from evflow_tpu.io import load_csv
from evflow_tpu.models import fastcluster
from evflow_tpu.models.pipeline import cluster_flow_step
import dataclasses

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
GOLDEN = os.path.join(DATA_DIR, "golden_cluster_flow.json")

CFG = dataclasses.replace(
    DEFAULT,
    slicing=SliceConfig(n_events=64, mode="n_events"),
    cluster=ClusterConfig(radius=40.0, min_n=5, max_clusters=32))


def _run():
    s = load_csv(os.path.join(DATA_DIR, "event_raw_data8.csv"))
    state = fastcluster.init_state(CFG.cluster)
    out_rows = []
    n = CFG.slicing.n_events
    for start in range(0, len(s), n):
        sl = s[start:start + n]
        pad = n - len(sl)
        x = np.pad(sl.x, (0, pad)).astype(np.int32)
        y = np.pad(sl.y, (0, pad)).astype(np.int32)
        valid = np.arange(n) < len(sl)
        state, out = cluster_flow_step(state, jnp.asarray(x), jnp.asarray(y),
                                       jnp.asarray(valid), CFG)
        rep = np.asarray(out.reported)
        rows = []
        for c in np.where(rep)[0]:
            rows.append({
                "cid": int(np.asarray(out.cid)[c]),
                "n": int(np.asarray(out.n)[c]),
                "centroid": [round(float(v), 3)
                             for v in np.asarray(out.centroid)[c]],
                "flow": [round(float(v), 3)
                         for v in np.asarray(out.flow)[c]],
            })
        rows.sort(key=lambda r: r["cid"])
        out_rows.append({"unique": int(out.unique_count), "clusters": rows})
    return out_rows


def test_flagship_pipeline_matches_golden():
    got = _run()
    with open(GOLDEN) as f:
        exp = json.load(f)
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g["unique"] == e["unique"]
        assert len(g["clusters"]) == len(e["clusters"])
        for gc, ec in zip(g["clusters"], e["clusters"]):
            assert gc["cid"] == ec["cid"]
            assert gc["n"] == ec["n"]
            np.testing.assert_allclose(gc["centroid"], ec["centroid"], atol=0.05)
            np.testing.assert_allclose(gc["flow"], ec["flow"], atol=0.05)


if __name__ == "__main__":
    rows = _run()
    with open(GOLDEN, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {GOLDEN}: {len(rows)} slices")


def test_full_scan_matches_separate_scans():
    """pipeline.full_scan (the bench entry) must equal the two separate scans
    it fuses, state and outputs both."""
    import jax
    from evflow_tpu.models import pipeline, fastcluster
    from evflow_tpu.io import synthetic, slice_by_count
    cfg = dataclasses.replace(DEFAULT, slicing=SliceConfig(n_events=512))
    stream = synthetic.moving_blob_stream(
        num_slices=4, events_per_slice=512,
        blob_centers=((100.0, 100.0), (300.0, 200.0)),
        velocities=((10.0, 5.0), (-8.0, 4.0)), sigma=8.0)
    sl = slice_by_count(stream, 512, drop_partial=True)
    t0 = int(stream.t[0])
    xs = jnp.asarray(sl.x); ys = jnp.asarray(sl.y)
    ts = jnp.asarray((sl.t - t0).astype(np.int32))
    vs = jnp.asarray(sl.valid_mask())
    cl0 = fastcluster.init_state(cfg.cluster)
    co0 = pipeline.init_corner_state(cfg)
    (cl_f, co_f), (out_cl_f, out_co_f) = pipeline.full_scan(
        cl0, co0, xs, ys, ts, vs, cfg)
    cl_s, out_cl_s = pipeline.cluster_flow_scan(cl0, xs, ys, vs, cfg)
    co_s, out_co_s = pipeline.corner_track_scan(co0, xs, ys, ts, vs, cfg)
    for a, b in zip(jax.tree_util.tree_leaves((cl_f, out_cl_f)),
                    jax.tree_util.tree_leaves((cl_s, out_cl_s))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves((co_f, out_co_f)),
                    jax.tree_util.tree_leaves((co_s, out_co_s))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
