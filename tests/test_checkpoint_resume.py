"""Checkpoint/resume wired into the pipeline drivers (SURVEY §5 mandate).

A stream split across a save/restore boundary must produce bit-identical
outputs to an unbroken run — proven for both pipelines at the Python API and
for the CLI flags (--checkpoint/--resume on cluster-flow and corner-track).
"""

import numpy as np
import pytest

from evflow_tpu.config import EngineConfig, SliceConfig, ClusterConfig
from evflow_tpu.io import synthetic
from evflow_tpu.io.events import save_csv
from evflow_tpu.models import pipeline
from evflow_tpu.utils import checkpoint as ckpt

N = 2048
CFG = EngineConfig(slicing=SliceConfig(n_events=N, mode="n_events"),
                   cluster=ClusterConfig(radius=40.0, min_n=10, max_clusters=64))


def _stream(num_slices=6):
    return synthetic.moving_blob_stream(
        num_slices=num_slices, events_per_slice=N,
        blob_centers=((300.0, 300.0), (800.0, 400.0)),
        velocities=((20.0, 0.0), (0.0, 15.0)), sigma=10.0)


def _assert_outputs_equal(a, b):
    for oa, ob in zip(a, b):
        for fa, fb in zip(oa, ob):
            if isinstance(fa, tuple):   # nested NamedTuple (GroupView)
                for ga, gb in zip(fa, fb):
                    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))
            else:
                np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))


def test_cluster_flow_split_resume_bit_identical(tmp_path):
    stream = _stream(6)
    pipe = pipeline.ClusterFlowPipeline(CFG)
    full = pipe.run(stream)

    cut = 3 * N
    pipe1 = pipeline.ClusterFlowPipeline(CFG)
    first = pipe1.run(stream[:cut])
    path = str(tmp_path / "cluster.npz")
    ckpt.save_npz(path, pipe1.final_state)

    pipe2 = pipeline.ClusterFlowPipeline(CFG)
    restored = ckpt.restore_npz(path, pipe2.init_state())
    second = pipe2.run(stream[cut:], state=restored)

    assert len(first) + len(second) == len(full)
    _assert_outputs_equal(first + second, full)


def test_corner_track_split_resume_bit_identical(tmp_path):
    stream = synthetic.moving_edge_stream(num_slices=6, events_per_slice=N)
    pipe = pipeline.CornerTrackPipeline(CFG)
    full = pipe.run(stream)
    assert any(int(o.num_corners) > 0 for o in full[1:])

    cut = 3 * N
    pipe1 = pipeline.CornerTrackPipeline(CFG)
    first = pipe1.run(stream[:cut])
    path = str(tmp_path / "corner.npz")
    ckpt.save_npz(path, pipe1.final_state, meta={"t0": pipe1.t0})

    pipe2 = pipeline.CornerTrackPipeline(CFG)
    restored = ckpt.restore_npz(path, pipeline.init_corner_state(CFG))
    t0 = int(ckpt.load_meta(path)["t0"])
    second = pipe2.run(stream[cut:], state=restored, t0=t0)

    _assert_outputs_equal(first + second, full)


def _slice_blocks(out):
    """Per-slice report blocks, slice index stripped (resume renumbers)."""
    blocks, cur = [], None
    for line in out.splitlines():
        if line.startswith("slice "):
            if cur is not None:
                blocks.append(cur)
            cur = [line.split(":", 1)[1]]
        elif line.startswith("  ") and cur is not None:
            cur.append(line)
    if cur is not None:
        blocks.append(cur)
    return blocks


@pytest.mark.slow
def test_cli_checkpoint_resume_bit_identical(tmp_path, capsys):
    # CLI runs the DEFAULT config (16384-event slices); split on a slice
    # boundary so full vs a+b report identical per-slice cluster tables.
    from evflow_tpu.run import main
    n = 16384
    stream = synthetic.moving_blob_stream(
        num_slices=4, events_per_slice=n,
        blob_centers=((300.0, 300.0), (800.0, 400.0)),
        velocities=((20.0, 0.0), (0.0, 15.0)), sigma=10.0)
    cut = 2 * n
    full_csv = str(tmp_path / "full.csv")
    a_csv = str(tmp_path / "a.csv")
    b_csv = str(tmp_path / "b.csv")
    save_csv(stream, full_csv)
    save_csv(stream[:cut], a_csv)
    save_csv(stream[cut:], b_csv)
    ck = str(tmp_path / "state.npz")

    main(["cluster-flow", "--input", full_csv])
    full_blocks = _slice_blocks(capsys.readouterr().out)

    main(["cluster-flow", "--input", a_csv, "--checkpoint", ck])
    a_out = capsys.readouterr().out
    assert "checkpoint saved" in a_out
    a_blocks = _slice_blocks(a_out)
    main(["cluster-flow", "--input", b_csv, "--resume", ck])
    b_blocks = _slice_blocks(capsys.readouterr().out)

    assert a_blocks + b_blocks == full_blocks
