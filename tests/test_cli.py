"""CLI smoke tests — each app subcommand runs end-to-end on tiny inputs."""

import os
import numpy as np
import pytest

from evflow_tpu.io import synthetic, save_csv
from evflow_tpu.run import main
from tests.conftest import DATA_DIR

FIXTURE = os.path.join(DATA_DIR, "event_raw_data8.csv")


@pytest.fixture(scope="module")
def small_stream(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ev") / "small.csv")
    s = synthetic.moving_blob_stream(num_slices=2, events_per_slice=2048,
                                     blob_centers=((300.0, 300.0),),
                                     velocities=((10.0, 5.0),))
    save_csv(s, p)
    return p


def test_cli_kmeans(capsys):
    main(["kmeans", "--n", "512"])
    out = capsys.readouterr().out
    assert "iters=" in out


def test_cli_optics(capsys):
    main(["optics", "--input", FIXTURE, "--eps", "10", "--threshold", "10"])
    out = capsys.readouterr().out
    assert "Cluster size" in out


def test_cli_sampling(small_stream, capsys):
    main(["sampling", "--input", small_stream])
    out = capsys.readouterr().out
    assert "unique=" in out and "Total time" in out


def test_cli_async_cluster(capsys):
    main(["async-cluster", "--input", FIXTURE, "--decimate", "1"])
    out = capsys.readouterr().out
    assert "clusters=" in out


def test_cli_cluster_flow(small_stream, capsys, tmp_path):
    main(["cluster-flow", "--input", small_stream, "--out", str(tmp_path)])
    out = capsys.readouterr().out
    assert "unique=" in out
    assert any(f.endswith(".ppm") for f in os.listdir(tmp_path))


def test_cli_track_estimate(small_stream, capsys):
    main(["track-estimate", "--input", small_stream, "--decimate", "2"])
    out = capsys.readouterr().out
    assert "velocity arrows" in out


def test_cli_corner_track(small_stream, capsys):
    main(["corner-track", "--input", small_stream])
    out = capsys.readouterr().out
    assert "corners=" in out


def test_cli_optics_chi_and_plots(tmp_path, capsys):
    out = str(tmp_path / "frames")
    main(["optics", "--input", FIXTURE, "--eps", "10", "--chi", "0.1",
          "--out", out])
    text = capsys.readouterr().out
    assert "Cluster size" in text
    import os
    files = sorted(os.listdir(out))
    assert files == ["clusters_2d.ppm", "reachability_plot.ppm"]
    with open(os.path.join(out, "reachability_plot.ppm"), "rb") as f:
        assert f.read(2) == b"P6"


def test_cli_cluster_flow_exact(small_stream, capsys):
    """--exact runs the bit-parity engine from the user surface; with
    --fabricated-ts the reference's uniqueCount clock quirk is on."""
    main(["cluster-flow", "--input", small_stream, "--exact",
          "--fabricated-ts"])
    out = capsys.readouterr().out
    assert "unique=" in out and "clusters=" in out
