"""End-to-end OPTICS golden on the committed event fixture (VERDICT r1 #8).

The reference's integration driver (cluster_event_data.cpp:429-541) runs the
full OPTICS pipeline over recorded event CSVs and prints one line per cluster
in the format `j,size,cx,cy,varx,vary` (matching test/centroid.logs), then
saves the reachability plot and the colored 2-D cluster render as binary PPM.
The committed windows 10+ need data files the reference never committed; this
golden locks the same end-to-end path over the one committed fixture,
test/event_raw_data8.csv (320 events), with the driver's parameters
(min_pts=2, eps=10, reachability threshold 10).

Regenerate (after an intentional semantics change) with
  python -m tests.test_golden_optics
which rewrites tests/data/golden_optics_data8.txt and the artifact PPMs
tests/data/golden_optics_data8_{reachability,clusters2d}.ppm.
"""

import io
import os

import numpy as np

from evflow_tpu.io import load_csv
from evflow_tpu.models import optics
from evflow_tpu.utils import plots

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
FIXTURE = os.path.join(DATA_DIR, "event_raw_data8.csv")
GOLDEN = os.path.join(DATA_DIR, "golden_optics_data8.txt")
GOLDEN_REACH = os.path.join(DATA_DIR, "golden_optics_data8_reachability.ppm")
GOLDEN_2D = os.path.join(DATA_DIR, "golden_optics_data8_clusters2d.ppm")

MIN_PTS = 2
EPS = 10.0
THRESHOLD = 10.0


def _run():
    s = load_csv(FIXTURE)
    pts = np.stack([s.x, s.y], axis=1).astype(np.float64)
    rd = optics.compute_reachability_dists(pts, MIN_PTS, EPS)
    clusters = optics.get_cluster_indices(rd, THRESHOLD)
    lines = [f"Cluster size : {len(clusters)}"]
    for j, c in enumerate(clusters):
        p = pts[np.asarray(c, int)]
        lines.append(f"{j},{len(c)},{p[:, 0].mean():g},{p[:, 1].mean():g},"
                     f"{p[:, 0].var():g},{p[:, 1].var():g}")
    reach_img = plots.draw_reachability_plot(rd)
    pts_per_cluster = [pts[np.asarray(c, int)] for c in clusters]
    img2d = plots.draw_2d_clusters(pts_per_cluster)
    return "\n".join(lines) + "\n", reach_img, img2d


def _ppm_bytes(img):
    path = io.BytesIO()
    try:
        img.save_to(path)          # if the writer exposes a buffer API
        return path.getvalue()
    except AttributeError:
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            p = os.path.join(d, "img")
            img.save(p)
            with open(p + ".ppm", "rb") as f:
                return f.read()


def test_optics_end_to_end_matches_golden():
    report, reach_img, img2d = _run()
    with open(GOLDEN) as f:
        assert report == f.read()
    with open(GOLDEN_REACH, "rb") as f:
        assert _ppm_bytes(reach_img) == f.read()
    with open(GOLDEN_2D, "rb") as f:
        assert _ppm_bytes(img2d) == f.read()


def test_cli_optics_report_matches_golden(capsys):
    from evflow_tpu.run import main
    main(["optics", "--input", FIXTURE, "--eps", str(EPS),
          "--min-pts", str(MIN_PTS), "--threshold", str(THRESHOLD)])
    out = capsys.readouterr().out
    with open(GOLDEN) as f:
        assert out == f.read()


if __name__ == "__main__":
    report, reach_img, img2d = _run()
    with open(GOLDEN, "w") as f:
        f.write(report)
    with open(GOLDEN_REACH, "wb") as f:
        f.write(_ppm_bytes(reach_img))
    with open(GOLDEN_2D, "wb") as f:
        f.write(_ppm_bytes(img2d))
    print(f"wrote {GOLDEN} + artifacts "
          f"({os.path.getsize(GOLDEN_REACH)} / {os.path.getsize(GOLDEN_2D)} bytes)")
