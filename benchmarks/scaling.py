"""Scaling-efficiency harness: events/s across mesh sizes.

BASELINE.md target: events/s at 1 chip / 1 host / N>=2 hosts with >=80 %
scaling efficiency. STRONG scaling: the total events per slice stay fixed
and are split across tiles, so per-device work shrinks with the mesh.

On real chips the efficiency column is true parallel speedup. On the virtual
CPU platform (this rig: one attached chip, so multi-device runs on
xla_force_host_platform_device_count) all "devices" timeshare one host —
wall time CANNOT drop with mesh size there; what the harness shows instead
is the distributed step's overhead at constant total work (wall_n / wall_1):
near 1.0 means the collectives and replicated tail cost ~nothing, which is
the property that transfers to real hardware.
"""

import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import time

import numpy as np


def _temporal_wall(n_windows, n_tiles, warmup, slices_total, total, reps=3):
    """Time the (data × tile) temporal pipeline on the current global mesh
    (single- OR multi-process; under jax.distributed the data axis crosses
    processes). Returns best wall seconds over `reps` runs, compile excluded."""
    import time
    import jax
    import numpy as np
    from evflow_tpu.config import EngineConfig, SensorConfig, ClusterConfig
    from evflow_tpu.io.events import EventStream
    from evflow_tpu.io.slicing import slice_by_count
    from evflow_tpu.parallel import mesh as mesh_mod, temporal

    tile_w = 1280 // n_tiles
    cfg = EngineConfig(sensor=SensorConfig(width=tile_w * n_tiles, height=720),
                       cluster=ClusterConfig(radius=40.0, min_n=10,
                                             max_clusters=64))
    rng = np.random.default_rng(0)
    n_ev = slices_total * total
    x = rng.integers(0, cfg.sensor.width, n_ev).astype(np.int32)
    y = rng.integers(0, 720, n_ev).astype(np.int32)
    t = np.sort(rng.integers(1, 50_000 * slices_total, n_ev)).astype(np.int64)
    slices = slice_by_count(EventStream(x, y, t, np.zeros(n_ev, np.int32)),
                            total)
    grid = mesh_mod.make_grid_mesh(n_windows, n_tiles, cfg.parallel)
    out = temporal.run_temporal(slices, grid, n_windows, n_tiles, warmup, cfg)
    np.asarray(out.refined.n_obs).ravel()[:1]       # compile + drain
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = temporal.run_temporal(slices, grid, n_windows, n_tiles,
                                    warmup, cfg)
        np.asarray(out.refined.n_obs).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    return best, n_ev


def _multiproc_worker(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from evflow_tpu.parallel import mesh as mesh_mod
    mesh_mod.initialize_distributed(coordinator=f"localhost:{args.port}",
                                    num_processes=args.nprocs,
                                    process_id=args.worker)
    best, n_ev = _temporal_wall(args.nprocs * 1, len(jax.devices())
                                // args.nprocs, 2, 8, args.total)
    if args.worker == 0:
        print(f"processes={args.nprocs}  windows={args.nprocs}  "
              f"{n_ev / best / 1e6:7.2f} M events/s  wall {best:6.3f}s "
              f"(temporal pipeline, Gloo data axis)", flush=True)


def run_multiprocess(args):
    """Spawn 2 jax.distributed processes (4 local CPU devices each) and a
    1-process run of the SAME global (2 windows × 4 tiles) mesh; report the
    cross-process overhead at constant total work."""
    import socket
    import subprocess
    import sys as _sys
    import time

    # 1-process baseline on the same (2, 4) grid
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [_sys.executable, os.path.abspath(__file__), "--one-proc-grid",
         "--total", str(args.total)], env=env, capture_output=True, text=True)
    print(r.stdout, end="")
    if r.returncode:
        print(r.stderr[-2000:])

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # NOTE: redirect to files, not PIPE — worker stdout through a pipe is
    # lost after jax.distributed teardown on this jax version
    import tempfile
    tdir = tempfile.mkdtemp(prefix="evflow_scaling_")
    paths = [os.path.join(tdir, f"w{i}.log") for i in range(2)]
    files = [open(p, "w") for p in paths]
    procs = [subprocess.Popen(
        [_sys.executable, os.path.abspath(__file__), "--worker", str(i),
         "--port", str(port), "--nprocs", "2", "--total", str(args.total)],
        env=env, stdout=files[i], stderr=subprocess.STDOUT)
        for i in range(2)]
    for p in procs:
        p.wait(timeout=900)
    time.sleep(1.0)  # the distributed service thread can flush late
    for i, p in enumerate(procs):
        files[i].close()
        with open(paths[i]) as f:
            for line in f:
                if "connected" not in line:
                    print(line, end="")
        if p.returncode:
            print(f"proc {i} failed (rc {p.returncode})")


def _summary_bytes(cfg) -> int:
    """Bytes all_gathered per window per pipeline run (computed from the
    TrackletBlocks + cluster-table shapes in temporal.make_temporal_pipeline):
    the ONLY cross-process traffic of the temporal design."""
    t = cfg.tracker.max_tracks
    c = cfg.cluster.max_clusters
    blocks = t * (4 + 4            # label, nobs (int32)
                  + 4 + 4          # u_first, u_last (f32)
                  + 4 * 2 * 4      # pos/vel first/last (T, 2)
                  + 9 * 4 + 6 * 4) # H (T,3,3), g (T,3,2)
    tables = 2 * (c * 2 * 4 + c)   # first/final centroid (C,2) + ok mask
    return blocks + tables


def run_pinned(args):
    """VERDICT r3 #5: the 2-host efficiency as a MEASUREMENT, not an argument.

    The r2 number (11.9 s two-process vs 7.7 s one-process) was confounded:
    both Gloo processes timeshared the same cores. Here every process is
    pinned to a DISJOINT core set (taskset) and per-process resources are
    held constant: baseline = 1 process on 1 core running ONE window
    (4 tiles, n_emit slices); scaled = 2 processes on 1 core each running
    one window EACH (2 windows total). Window-parallel efficiency
    = T_base / T_scaled (ideal 1.0 — twice the work, twice the cores).
    Also prints the computed per-window all_gather summary size — the only
    cross-process traffic.
    """
    import shutil
    import socket
    import subprocess
    import tempfile
    import time
    import sys as _sys

    if shutil.which("taskset") is None:
        print("taskset not available; cannot pin cores")
        return
    ncores = os.cpu_count()
    if ncores < 2:
        print(f"only {ncores} core(s); cannot pin 2 disjoint sets")
        return

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"

    # baseline: 1 process, 1 core, 1 window x 4 tiles, n_emit=4
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    r = subprocess.run(
        ["taskset", "-c", "0", _sys.executable, os.path.abspath(__file__),
         "--one-proc-grid", "--grid-windows", "1", "--total",
         str(args.total)], env=env, capture_output=True, text=True)
    print(r.stdout, end="")
    if r.returncode:
        print(r.stderr[-2000:])
        return
    base_wall = float(r.stdout.split("wall")[1].split("s")[0])

    # scaled: 2 processes, 1 disjoint core each, 1 window each
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    tdir = tempfile.mkdtemp(prefix="evflow_pinned_")
    paths = [os.path.join(tdir, f"w{i}.log") for i in range(2)]
    files = [open(p, "w") for p in paths]
    procs = [subprocess.Popen(
        ["taskset", "-c", str(i), _sys.executable, os.path.abspath(__file__),
         "--worker", str(i), "--port", str(port), "--nprocs", "2",
         "--total", str(args.total)],
        env=env, stdout=files[i], stderr=subprocess.STDOUT)
        for i in range(2)]
    for p in procs:
        p.wait(timeout=900)
    time.sleep(1.0)
    wall2 = None
    for i, p in enumerate(procs):
        files[i].close()
        with open(paths[i]) as f:
            for line in f:
                if "wall" in line:
                    print(line, end="")
                    wall2 = float(line.split("wall")[1].split("s")[0])
        if p.returncode:
            print(f"proc {i} failed (rc {p.returncode})")
            return
    if wall2:
        from evflow_tpu.config import EngineConfig, ClusterConfig
        cfg = EngineConfig(cluster=ClusterConfig(radius=40.0, min_n=10,
                                                 max_clusters=64))
        print(f"pinned window-parallel efficiency: {base_wall / wall2:.2f} "
              f"(1 window/1 core {base_wall:.3f}s -> 2 windows/2 cores "
              f"{wall2:.3f}s; all_gather summary "
              f"{_summary_bytes(cfg)} B/window)")


def run_corner_scaling(args):
    """Tiled corner step (SAE slabs + halos + eFAST + TILE-LOCAL NMS) at
    constant total work: events AND the NMS candidate budget split across
    tiles (r2 — the replicated tail previously needed a global cap that
    grows with the mesh, making NMS O((n_tiles*cap)^2); tile-local NMS keeps
    it O((cap/n_tiles)^2) per tile). On the timeshared CPU mesh the wall at
    constant total work is the overhead diagnostic (see module doc)."""
    import time
    import dataclasses
    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.max_devices}").strip()
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import evflow_tpu
    evflow_tpu.setup_cache()
    from evflow_tpu.config import EngineConfig, SensorConfig, NMSConfig
    from evflow_tpu.parallel import mesh as mesh_mod, tiling

    navail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= min(navail, args.max_devices)]
    rng = np.random.default_rng(0)
    results = {}
    for n_dev in sizes:
        tile_w = 1280 // n_dev
        cap_local = max(64, args.cap // n_dev)
        cfg = EngineConfig(sensor=SensorConfig(width=tile_w * n_dev, height=720),
                           nms=NMSConfig(max_corners=cap_local))
        m = mesh_mod.make_tile_mesh(n_dev, cfg.parallel)
        step = tiling.make_tiled_corner_step(m, n_dev, cfg)
        st = tiling.init_tiled_corner_state(m, n_dev, cfg)
        ts = mesh_mod.tile_sharding(m, cfg.parallel)
        cap_ev = args.total // n_dev
        evs = []
        for s in range(args.slices):
            x = np.zeros((n_dev, cap_ev), np.int32)
            y = np.zeros((n_dev, cap_ev), np.int32)
            t = np.zeros((n_dev, cap_ev), np.int32)
            for k in range(n_dev):
                x[k] = rng.integers(k * tile_w, (k + 1) * tile_w, cap_ev)
                y[k] = rng.integers(0, 720, cap_ev)
                t[k] = np.sort(rng.integers(s * 50_000 + 1,
                                            (s + 1) * 50_000, cap_ev))
            evs.append((jax.device_put(jnp.asarray(x), ts),
                        jax.device_put(jnp.asarray(y), ts),
                        jax.device_put(jnp.asarray(t), ts),
                        jax.device_put(jnp.ones((n_dev, cap_ev), bool), ts)))
        slab, tracks, sidx = st.slab, st.tracks, st.slice_idx
        slab, tracks, sidx, out = step(slab, tracks, sidx, *evs[0])
        np.asarray(out.num_corners).ravel()[:1]
        best = float("inf")
        for _ in range(3):
            sl, tr, si = st.slab, st.tracks, st.slice_idx
            t0 = time.perf_counter()
            for s in range(args.slices):
                sl, tr, si, out = step(sl, tr, si, *evs[s])
            np.asarray(out.num_corners).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        results[n_dev] = best
        rel = best / results[sizes[0]]
        print(f"devices={n_dev:2d}  cap/tile={cap_local:5d}  "
              f"{n_dev * cap_ev * args.slices / best / 1e6:7.2f} M events/s  "
              f"wall vs 1-dev at constant total work: {rel:5.2f}x", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--max-devices", type=int, default=8)
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--total", type=int, default=16384,
                    help="total events per slice (split across tiles)")
    ap.add_argument("--multiprocess", action="store_true",
                    help="also run the 2-process jax.distributed temporal row")
    ap.add_argument("--corner", action="store_true",
                    help="tiled corner step (tile-local NMS) scaling rows")
    ap.add_argument("--cap", type=int, default=2048,
                    help="TOTAL NMS candidate budget (split across tiles)")
    ap.add_argument("--one-proc-grid", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--grid-windows", type=int, default=2, help=argparse.SUPPRESS)
    ap.add_argument("--pinned", action="store_true",
                    help="taskset-pinned 2-process efficiency measurement "
                         "(disjoint cores, constant per-window work)")
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--port", type=int, default=0, help=argparse.SUPPRESS)
    ap.add_argument("--nprocs", type=int, default=2, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        _multiproc_worker(args)
        return
    if args.one_proc_grid:
        import jax
        jax.config.update("jax_platforms", "cpu")
        w = args.grid_windows
        nt = len(jax.devices()) // w
        best, n_ev = _temporal_wall(w, nt, 2, 4 * w, args.total)
        print(f"processes=1  windows={w}  {n_ev / best / 1e6:7.2f} M events/s  "
              f"wall {best:6.3f}s (temporal pipeline, single-process grid)")
        return
    if args.pinned:
        run_pinned(args)
        return
    if args.multiprocess:
        run_multiprocess(args)
        return
    if args.corner:
        run_corner_scaling(args)
        return

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={args.max_devices}").strip()
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import evflow_tpu
    evflow_tpu.setup_cache()
    from evflow_tpu.config import EngineConfig, SensorConfig, ClusterConfig
    from evflow_tpu.parallel import mesh as mesh_mod, tiling
    from evflow_tpu.models import fastcluster

    navail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= min(navail, args.max_devices)]
    results = {}
    rng = np.random.default_rng(0)

    for n_dev in sizes:
        tile_w = 1280 // n_dev
        cfg = EngineConfig(sensor=SensorConfig(width=tile_w * n_dev, height=720),
                           cluster=ClusterConfig(radius=40.0, min_n=10,
                                                 max_clusters=64))
        m = mesh_mod.make_tile_mesh(n_dev, cfg.parallel)
        step = tiling.make_tiled_cluster_flow_step(m, cfg)
        ts = mesh_mod.tile_sharding(m, cfg.parallel)
        cap = args.total // n_dev
        state = fastcluster.init_state(cfg.cluster)
        xs, ys, vs = [], [], []
        for s in range(args.slices):
            x = np.zeros((n_dev, cap), np.int32)
            y = np.zeros((n_dev, cap), np.int32)
            for k in range(n_dev):
                x[k] = rng.integers(k * tile_w, (k + 1) * tile_w, cap)
                y[k] = rng.integers(0, 720, cap)
            xs.append(x); ys.append(y); vs.append(np.ones((n_dev, cap), bool))
        xs = [jax.device_put(jnp.asarray(a), ts) for a in xs]
        ys = [jax.device_put(jnp.asarray(a), ts) for a in ys]
        vs = [jax.device_put(jnp.asarray(a), ts) for a in vs]

        # warm-up/compile + queue drain
        st, out, uc, rc = step(state, xs[0], ys[0], vs[0])
        jax.block_until_ready(st)
        np.asarray(uc).ravel()[:1]
        best = float("inf")
        for _ in range(3):
            st = state
            t0 = time.perf_counter()
            for s in range(args.slices):
                st, out, uc, rc = step(st, xs[s], ys[s], vs[s])
            np.asarray(uc).ravel()[:1]       # drain (block alone can lie)
            best = min(best, time.perf_counter() - t0)
        ev_per_s = n_dev * cap * args.slices / best
        results[n_dev] = best
        rel = best / results[sizes[0]]
        print(f"devices={n_dev:2d}  {ev_per_s/1e6:7.2f} M events/s  "
              f"wall vs 1-dev at constant total work: {rel:5.2f}x")


if __name__ == "__main__":
    main()
