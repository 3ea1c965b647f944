"""CLI — one engine, eight reference apps as subcommands.

Usage:
  python -m evflow_tpu.run cluster-flow   --input ev.csv [--out frames/]   # app E
  python -m evflow_tpu.run async-cluster  --input ev.csv --decimate 256    # app A
  python -m evflow_tpu.run track-estimate --input ev.csv --decimate 512    # app H
  python -m evflow_tpu.run corner-track   --input ev.csv [--out frames/]   # app G
  python -m evflow_tpu.run kmeans         [--n 2048]                       # app D
  python -m evflow_tpu.run sampling       --input ev.csv                   # app F
  python -m evflow_tpu.run optics         --input ev.csv [--eps 10]        # app B
  python -m evflow_tpu.run dbscan         --input ev.csv [--eps 20]        # app C

Each subcommand mirrors one reference executable (SURVEY §2.1 A-H), replacing
OpenCV windows with PPM frame dumps / stdout stats.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load(args):
    from .io import load, decimate
    s = load(args.input)
    if getattr(args, "decimate", 0) and args.decimate > 1:
        s = decimate(s, args.decimate)
    return s


def cmd_cluster_flow(args):
    """App E: hash dedup → clustering → centroid flow (accel …store.cpp)."""
    import dataclasses
    from .config import DEFAULT, DedupConfig
    from .models.pipeline import ClusterFlowPipeline
    from .utils import checkpoint as ckpt
    from .utils.plots import render_cluster_frame
    cfg = DEFAULT
    mode = "fast"
    if getattr(args, "exact", False):
        mode = "exact"
        if getattr(args, "fabricated_ts", False):
            cfg = dataclasses.replace(cfg, dedup=dataclasses.replace(
                cfg.dedup, compat_fabricated_ts=True))
    pipe = ClusterFlowPipeline(cfg, mode=mode)
    state = t0 = None
    if args.resume:
        state = ckpt.restore_npz(args.resume, pipe.init_state())
        if mode == "exact":
            meta = ckpt.load_meta(args.resume)
            if "t0" not in meta:
                sys.exit("error: checkpoint was not saved in exact mode "
                         "(missing t0 meta) — resume it without --exact, or "
                         "re-save the checkpoint from an exact-mode run")
            t0 = int(meta["t0"])
    outs = pipe.run(_load(args), state=state, t0=t0)
    if args.checkpoint:
        meta = {"t0": pipe.t0} if mode == "exact" else None
        ckpt.save_npz(args.checkpoint, pipe.final_state, meta=meta)
        print(f"checkpoint saved: {args.checkpoint}")
    for i, out in enumerate(outs):
        rep = np.asarray(out.reported)
        print(f"slice {i}: unique={int(out.unique_count)} "
              f"clusters={int(rep.sum())}")
        for c in np.where(rep)[0]:
            cen = np.asarray(out.centroid)[c]
            fl = np.asarray(out.flow)[c]
            print(f"  cid={int(np.asarray(out.cid)[c])} n={int(np.asarray(out.n)[c])} "
                  f"centroid=({cen[0]:.2f},{cen[1]:.2f}) flow=({fl[0]:.2f},{fl[1]:.2f})")
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            img = render_cluster_frame(cfg.sensor.width, cfg.sensor.height, out)
            img.save(os.path.join(args.out, f"cluster_frame_combined{i}"))


def cmd_async_cluster(args):
    """App A: decimated stream → AEClustering (exact engine)."""
    from .config import DEFAULT, ClusterConfig
    from .models import aeclustering as ae
    import jax.numpy as jnp
    s = _load(args)
    cfg = ClusterConfig.async_app()
    st = ae.init_state(cfg)
    n = len(s)
    st = ae.update_slice(st, jnp.asarray(s.x), jnp.asarray(s.y),
                         jnp.asarray(s.t - s.t[0], jnp.int32), jnp.asarray(s.p),
                         jnp.ones(n, bool), cfg)
    view = ae.snapshot(st, cfg)
    alive = np.asarray(view.alive)
    print(f"events={n} clusters={int(alive.sum())}")
    for i in np.where(alive)[0]:
        if int(np.asarray(view.n)[i]) >= cfg.min_n:
            c = np.asarray(view.centroid)[i]
            print(f"  cid={int(np.asarray(view.cid)[i])} n={int(np.asarray(view.n)[i])} "
                  f"centroid=({c[0]:.2f},{c[1]:.2f})")


def cmd_track_estimate(args):
    """App H: 1/512 decimation → clustering → ×3 extrapolated flow arrows."""
    import dataclasses
    from .config import DEFAULT, ClusterConfig, FlowConfig
    from .models.pipeline import ClusterFlowPipeline
    cfg = dataclasses.replace(DEFAULT, cluster=ClusterConfig.tracking_app(),
                              flow=FlowConfig(extrapolation=3.0))
    pipe = ClusterFlowPipeline(cfg)
    outs = pipe.run(_load(args))
    for i, out in enumerate(outs):
        rep = np.asarray(out.reported)
        arrows = [(np.asarray(out.centroid)[c].tolist(),
                   np.asarray(out.flow)[c].tolist()) for c in np.where(rep)[0]]
        print(f"slice {i}: {len(arrows)} velocity arrows "
              + " ".join(f"({a[0][0]:.0f},{a[0][1]:.0f})→+({a[1][0]:.1f},{a[1][1]:.1f})"
                         for a in arrows))


def cmd_corner_track(args):
    """App G: SAE → eFAST → NMS → tracker with groups."""
    from .config import DEFAULT
    from .models.pipeline import CornerTrackPipeline, init_corner_state
    from .utils import checkpoint as ckpt
    cfg = DEFAULT
    pipe = CornerTrackPipeline(cfg)
    state = t0 = None
    if args.resume:
        state = ckpt.restore_npz(args.resume, init_corner_state(cfg))
        t0 = int(ckpt.load_meta(args.resume)["t0"])
    outs = pipe.run(_load(args), state=state, t0=t0)
    if args.checkpoint:
        ckpt.save_npz(args.checkpoint, pipe.final_state, meta={"t0": pipe.t0})
        print(f"checkpoint saved: {args.checkpoint}")
    for i, out in enumerate(outs):
        act = np.asarray(out.track_active)
        ng = int(np.asarray(out.groups.exists).sum())
        print(f"slice {i}: corners={int(out.num_corners)} "
              f"filtered={int(out.num_filtered)} tracks={int(act.sum())} groups={ng}")
        if args.out:
            from .utils.plots import render_track_frame
            os.makedirs(args.out, exist_ok=True)
            img = render_track_frame(cfg.sensor.width, cfg.sensor.height, out)
            img.save(os.path.join(args.out, f"tracked_corners{i}"))


def cmd_kmeans(args):
    """App D: OpenCL k-means on the i%100 synthetic ramp."""
    import jax.numpy as jnp
    from .config import KMeansConfig
    from .io import synthetic
    from .models.kmeans import kmeans
    pts = synthetic.kmeans_ramp_data(args.n)
    init = synthetic.kmeans_initial_centroids()
    if getattr(args, "sharded", False):
        from .parallel.batch import kmeans_sharded
        res = kmeans_sharded(jnp.asarray(pts), jnp.asarray(init),
                             cfg=KMeansConfig())
    else:
        res = kmeans(jnp.asarray(pts), jnp.asarray(init), cfg=KMeansConfig())
    print(f"iters={int(res.iters)} error_max={float(res.error_max):.3f}")
    for j, (c, n) in enumerate(zip(np.asarray(res.centroids),
                                   np.asarray(res.counts))):
        print(f"  ({c[0]:.4f}, {c[1]:.4f}, {int(n)})")


def cmd_sampling(args):
    """App F: standalone downsampling benchmark (per-slice dedup stats)."""
    import time
    import jax
    import jax.numpy as jnp
    from .config import DEFAULT
    from .io import slice_by_count
    from .ops.hash_dedup import dedup_batched
    cfg = DEFAULT
    s = _load(args)
    sl = slice_by_count(s, cfg.slicing.n_events)
    x = jnp.asarray(sl.x); y = jnp.asarray(sl.y)
    v = jnp.asarray(sl.valid_mask())
    res = dedup_batched(x, y, v, cfg.dedup, cfg.sensor)
    jax.block_until_ready(res)
    t0 = time.perf_counter()
    res = dedup_batched(x, y, v, cfg.dedup, cfg.sensor)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0
    for i in range(sl.num_slices):
        print(f"slice {i}: events={int(sl.count[i])} "
              f"unique={int(res.unique_count[i])} repeated={int(res.repeated_count[i])}")
    total = int(sl.count.sum())
    print(f"Total time = {dt*1e9:.0f} ns  ({total/dt:.0f} events/s)")


def cmd_optics(args):
    """App B: OPTICS reachability clustering + centroid report."""
    from .models import optics
    s = _load(args)
    pts = np.stack([s.x, s.y], axis=1).astype(np.float64)
    rd = optics.compute_reachability_dists(
        pts, args.min_pts, args.eps, method=args.method,
        max_neighbors=args.max_neighbors, full_window=args.full_window,
        proj_dims=args.proj_dims)
    if args.chi > 0:
        flat = optics.get_chi_clusters_flat(rd, args.chi, args.min_pts)
        clusters = optics.get_cluster_indices_chi(rd, flat)
    else:
        clusters = optics.get_cluster_indices(rd, args.threshold)
    print(f"Cluster size : {len(clusters)}")
    for j, c in enumerate(clusters):
        p = pts[np.asarray(c, int)]
        print(f"{j},{len(c)},{p[:,0].mean():g},{p[:,1].mean():g},"
              f"{p[:,0].var():g},{p[:,1].var():g}")
    if args.export:
        optics.export_reachability_dists(rd, args.export)
    if args.out:
        # reference app B artifacts: reachability plot (with chi extents when
        # chi extraction ran) + colored 2-D cluster render, as binary PPM
        from .utils import plots
        os.makedirs(args.out, exist_ok=True)
        if args.chi > 0:
            img = plots.draw_reachability_plot_with_chi_clusters(
                rd, args.chi, args.min_pts)
        else:
            img = plots.draw_reachability_plot(rd)
        img.save(os.path.join(args.out, "reachability_plot"))
        pts_per_cluster = [pts[np.asarray(c, int)] for c in clusters]
        plots.draw_2d_clusters(pts_per_cluster).save(
            os.path.join(args.out, "clusters_2d"))


def cmd_dbscan(args):
    """App C: [PCD read → voxel grid → RANSAC plane removal →] DBSCAN →
    CSV/PCD export with per-cluster intensity (pcl_cluster.cpp pipeline)."""
    import jax.numpy as jnp
    from .config import DBSCANConfig
    from .models.dbscan import dbscan, dbscan_grid
    from .models.pointcloud import voxel_downsample, ransac_plane, remove_plane
    from .utils import pcd as pcdio

    if args.input.endswith(".pcd"):
        pts3, _ = pcdio.load_pcd(args.input)
        valid = np.ones(len(pts3), bool)
        if args.voxel > 0:
            vres = voxel_downsample(jnp.asarray(pts3), leaf=args.voxel)
            pts3 = np.asarray(vres.points)[np.asarray(vres.valid)]
            print(f"voxel grid: {len(pts3)} points")
        if args.remove_plane:
            pl = ransac_plane(jnp.asarray(pts3), threshold=args.plane_threshold)
            keep = np.asarray(remove_plane(jnp.asarray(pts3),
                                           jnp.ones(len(pts3), bool), pl))
            pts3 = pts3[keep]
            print(f"plane removed ({int(pl.num_inliers)} inliers): "
                  f"{len(pts3)} points remain")
        pts = pts3
    else:
        s = _load(args)
        pts = np.stack([s.x, s.y], axis=1).astype(np.float32)
    cfg = DBSCANConfig(eps=args.eps, core_min_pts=args.min_pts,
                       min_cluster_size=args.min_cluster_size)
    if getattr(args, "sharded", False):
        # row-sharded panels over all local devices (parallel/batch.py)
        from .parallel.batch import dbscan_sharded
        res = dbscan_sharded(jnp.asarray(pts), cfg=cfg)
    else:
        # grid-bucketed neighbors when they apply (d<=3), dense otherwise
        res = dbscan_grid(pts, cfg=cfg)
    labels = np.asarray(res.labels)
    print(f"clusters={int(res.num_clusters)}")
    if args.export:
        if args.export.endswith(".pcd"):
            keep = labels >= 0
            p3 = pts[keep] if pts.shape[1] == 3 else np.concatenate(
                [pts[keep], np.zeros((keep.sum(), 1), np.float32)], axis=1)
            pcdio.save_pcd(args.export, p3,
                           (labels[keep] % 8).astype(np.float32))
        else:
            with open(args.export, "w") as f:
                for row, l in zip(pts, labels):
                    f.write(",".join(f"{v}" for v in row) + f",{l}\n")


def cmd_temporal(args):
    """Spatio-temporal distributed run: time windows over the mesh data axis,
    spatial tiles over the tile axis; per-slice cluster+corner outputs plus
    the Schur-refined cross-window track chains (parallel/temporal.py).
    Single-process it uses however many local devices form the grid; under
    jax.distributed the data axis crosses hosts."""
    import jax
    from .config import DEFAULT
    from .io.slicing import slice_by_count
    from .parallel import mesh as mesh_mod, temporal
    cfg = DEFAULT
    n_windows, n_tiles = args.windows, args.tiles
    ndev = len(jax.devices())
    exact = getattr(args, "exact", False)
    if exact and n_tiles > 1:
        print(f"warning: --exact distributes over windows only; "
              f"--tiles {n_tiles} ignored (the exact engine is sequential "
              f"per window)", file=sys.stderr)
    need = n_windows if exact else n_windows * n_tiles
    if need > ndev:
        sys.exit(f"error: {'windows' if exact else f'grid ({n_windows}x{n_tiles})'}"
                 f" needs {need} devices, have {ndev} (hint: set "
                 f"XLA_FLAGS=--xla_force_host_platform_device_count=N with "
                 f"--backend cpu)")
    stream = _load(args)
    slices = slice_by_count(stream, cfg.slicing.n_events)
    if exact:
        # distributed EXACT engine: windows over the data axis only (no
        # tiling — the engine is sequential per window), bit-for-bit
        # post-warmup parity with the single-device exact run
        m = mesh_mod.make_data_mesh(n_windows, cfg.parallel)
        out = jax.device_get(temporal.run_temporal_exact(
            slices, m, n_windows, args.warmup, cfg))
        n_emit = out.alive.shape[1]
        for w in range(n_windows):
            for s in range(n_emit):
                alive = np.asarray(out.alive[w, s])
                big = alive & (np.asarray(out.n[w, s]) >= cfg.cluster.min_n)
                print(f"window {w} slice {s}: clusters={int(big.sum())}")
        chained = int((np.asarray(out.cluster_chain) >= 0).sum())
        print(f"cross-window cluster chains: {chained} reported slots")
        return
    grid = mesh_mod.make_grid_mesh(n_windows, n_tiles, cfg.parallel)
    out = jax.device_get(temporal.run_temporal(
        slices, grid, n_windows, n_tiles, args.warmup, cfg))
    n_emit = out.num_corners.shape[1]
    for w in range(n_windows):
        for s in range(n_emit):
            rep = np.asarray(out.cl_reported[w, s])
            print(f"window {w} slice {s}: clusters={int(rep.sum())} "
                  f"corners={int(out.num_corners[w, s])} "
                  f"tracks={int(np.asarray(out.track_active[w, s]).sum())}")
    r = out.refined
    valid = np.where(np.asarray(r.valid))[0]
    print(f"refined track chains: {len(valid)}")
    for k in valid:
        bp = np.asarray(r.boundary_pos[k])
        ok = np.asarray(r.boundary_ok[k])
        pts = " -> ".join(f"({bp[j][0]:.1f},{bp[j][1]:.1f})"
                          for j in range(len(ok)) if ok[j])
        print(f"  chain {int(k)}: windows={int(r.n_windows[k])} "
              f"obs={int(r.n_obs[k])} boundary {pts}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="evflow_tpu.run")
    ap.add_argument("--backend", choices=("auto", "cpu", "tpu"), default="auto",
                    help="force the JAX backend. 'cpu' is numerically "
                         "identical for these kernels and compiles ~100x "
                         "faster than a tunneled remote TPU")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add(name, fn, **extra):
        p = sub.add_parser(name, help=fn.__doc__)
        p.set_defaults(fn=fn)
        if extra.get("input", True):
            p.add_argument("--input", required=extra.get("input_required", True))
        p.add_argument("--out", default="")
        p.add_argument("--decimate", type=int, default=extra.get("decimate", 0))
        return p

    def add_ckpt(p):
        p.add_argument("--checkpoint", default="",
                       help="save engine state (npz) after the run")
        p.add_argument("--resume", default="",
                       help="restore engine state (npz) before the run; a "
                            "stream split at the boundary is bit-identical "
                            "to an unbroken run")
        return p

    p = add_ckpt(add("cluster-flow", cmd_cluster_flow))
    p.add_argument("--exact", action="store_true",
                   help="bit-parity per-event engine (AEClustering.cpp:47-118 "
                        "semantics) instead of the slice-vectorized fast path")
    p.add_argument("--fabricated-ts", action="store_true",
                   help="with --exact: reproduce the reference's fabricated "
                        "uniqueCount/1000 clock (accel …store.cpp:439)")
    add("async-cluster", cmd_async_cluster, decimate=256)
    add("track-estimate", cmd_track_estimate, decimate=512)
    add_ckpt(add("corner-track", cmd_corner_track))
    p = sub.add_parser("kmeans", help=cmd_kmeans.__doc__)
    p.add_argument("--sharded", action="store_true",
                   help="assignment row-sharded over all local devices")
    p.set_defaults(fn=cmd_kmeans)
    p.add_argument("--n", type=int, default=2048)
    add("sampling", cmd_sampling)
    p = add("optics", cmd_optics)
    p.add_argument("--method", default="auto",
                   choices=("auto", "cellpair", "grid", "dense", "certified",
                            "sharded"),
                   help="neighbor backend (auto: cellpair at d<=2, else "
                        "grid up to d=4, else count-certified exact "
                        "selection; dense = O(N^2) panels; sharded = dense "
                        "panels row-sharded over all local devices, "
                        "parallel/batch.py)")
    p.add_argument("--max-neighbors", type=int, default=256)
    def _proj_dims(v):
        iv = int(v)
        if not 3 <= iv <= 4:
            raise argparse.ArgumentTypeError(
                "--proj-dims must be 3 or 4 (supported projected-grid "
                "dimensionalities; see models/optics.py)")
        return iv
    p.add_argument("--proj-dims", type=_proj_dims, default=3,
                   help="projected-grid dimensionality for d>4 with "
                        "--method grid (r4b: 4 is the fastest exact "
                        "high-dim path; supported: 3 or 4)")
    p.add_argument("--full-window", action="store_true",
                   help="grid skips nearest-k selection and returns masked "
                        "3^g*B windows (fastest on-device; wider table)")
    p.add_argument("--eps", type=float, default=10.0)
    p.add_argument("--min-pts", type=int, default=2)
    p.add_argument("--threshold", type=float, default=10.0)
    p.add_argument("--chi", type=float, default=0.0,
                   help="use xi steep-area extraction with this chi instead "
                        "of the reachability threshold")
    p.add_argument("--export", default="")
    p = add("dbscan", cmd_dbscan)
    p.add_argument("--sharded", action="store_true",
                   help="O(N^2) panels row-sharded over all local devices")
    p.add_argument("--eps", type=float, default=20.0)
    p.add_argument("--min-pts", type=int, default=20)
    p.add_argument("--min-cluster-size", type=int, default=100)
    p.add_argument("--export", default="")
    p.add_argument("--voxel", type=float, default=0.0,
                   help="voxel-grid leaf size for .pcd inputs (reference: 0.01)")
    p.add_argument("--remove-plane", action="store_true")
    p.add_argument("--plane-threshold", type=float, default=0.02)
    p = add("temporal", cmd_temporal)
    p.add_argument("--windows", type=int, default=2,
                   help="time windows (data-axis shards)")
    p.add_argument("--tiles", type=int, default=4,
                   help="spatial tiles (tile-axis shards)")
    p.add_argument("--warmup", type=int, default=8,
                   help="overlap slices consumed from the previous window")
    p.add_argument("--exact", action="store_true",
                   help="distribute the bit-parity exact engine over the "
                        "window axis (no tiling; post-warmup outputs are "
                        "bit-identical to a single-device exact run)")

    args = ap.parse_args(argv)
    if args.backend != "auto":
        import jax
        # env vars cannot override a sitecustomize-forced platform; the
        # config update after import can (this rig forces the remote TPU)
        if args.backend == "cpu":
            jax.config.update("jax_platforms", "cpu")
        else:
            jax.config.update("jax_platforms", None)  # default selection
            plat = jax.devices()[0].platform
            if plat == "cpu":
                sys.exit("error: --backend tpu requested but no accelerator "
                         "platform is available (found cpu only)")
    args.fn(args)


if __name__ == "__main__":
    main()
