import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Phase isolation for OPTICS d=3/d=4 (VERDICT r2 item 7).

Targets: d=3 n=100k <=120 ms, d=4 <=250 ms device time (ref 344/378 ms).
Current: d=3 grid 171 ms, d=4 dense 306 ms; cellpair d=3 measured 627 ms
(slot inflation ncells*B/N ~6.7x multiplies every phase).

--micro: primitive probes on synthetic panels shaped like the d=3 grid
  inner loop (selection of k=64 from (N, 432) masked rows; bucket-row
  gathers in 27x256B vs 9x768B layouts). Fast compiles; run FIRST.
--full: end-to-end neighbor-table variants through the public APIs.

Timing per CLAUDE.md: block_until_ready through the axon relay can return
early; every region ends with a 1-element np.asarray readback, reps chained.
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

import evflow_tpu
evflow_tpu.setup_cache()
from evflow_tpu.io.synthetic import uniform_cloud
from evflow_tpu.models import optics


def _drain(out):
    """1-ELEMENT draining readback (CLAUDE.md idiom): slice ON DEVICE first.
    np.asarray(leaf).ravel()[:1] is a catastrophic bug — it device_gets the
    WHOLE array (173 MB for a (100k,432) table) and leaves the relay degraded
    for minutes; every number measured with it was transfer, not compute."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timed(fn, *args, reps=3, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    comp = time.perf_counter() - t0
    _drain(out)
    # report min AND mean — min is robust to relay contention spikes
    laps = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _drain(out)
        laps.append(time.perf_counter() - t0)
    print(f"{label:44s} compile {comp:6.1f}s   min {min(laps)*1e3:8.2f}"
          f"  mean {sum(laps)/len(laps)*1e3:8.2f} ms", flush=True)
    return min(laps)


def micro():
    n, m, k = 100_352, 432, 64
    rng = np.random.default_rng(0)
    # panel shaped like the d=3 grid window: ~2.3% lanes finite (valid)
    dist_np = rng.uniform(0.0, 30.0, (n, m)).astype(np.float32)
    valid = rng.uniform(size=(n, m)) < 0.025
    dist_np[~valid] = np.inf
    idx_np = rng.integers(0, n, (n, m)).astype(np.int32)
    dist = jnp.asarray(dist_np); idx = jnp.asarray(idx_np)

    @jax.jit
    def sel_topk(d, i):
        neg, pos = jax.lax.top_k(-d, k)
        return -neg, jnp.take_along_axis(i, pos, axis=1)

    @jax.jit
    def sel_approx(d, i):
        neg, pos = jax.lax.approx_max_k(-d, k)
        return -neg, jnp.take_along_axis(i, pos, axis=1)

    @jax.jit
    def sel_sort(d, i):
        sd, si = jax.lax.sort((d, i), num_keys=1)
        return sd[:, :k], si[:, :k]

    @jax.jit
    def sel_compact(d, i):
        ok = jnp.isfinite(d)
        pos = jnp.cumsum(ok, axis=1) - 1
        pos = jnp.where(ok & (pos < k), pos, k)  # OOB-drop lane
        rows = jnp.broadcast_to(jnp.arange(n)[:, None], (n, m))
        out_d = jnp.full((n, k + 1), jnp.inf, jnp.float32).at[
            rows, pos].set(d, mode="drop")[:, :k]
        out_i = jnp.full((n, k + 1), -1, jnp.int32).at[
            rows, pos].set(i, mode="drop")[:, :k]
        # 64-wide row sort restores ascending order (core dist falls out)
        sd, si = jax.lax.sort((out_d, out_i), num_keys=1)
        return sd, si

    @jax.jit
    def sel_minpts_only(d, i):
        neg = jax.lax.top_k(-d, 10)[0]
        return -neg[:, 9]

    print(f"-- selection of k={k} from ({n},{m}) masked rows --", flush=True)
    timed(sel_topk, dist, idx, label="top_k(64)")
    timed(sel_approx, dist, idx, label="approx_max_k(64)")
    timed(sel_sort, dist, idx, label="row sort, take :64")
    timed(sel_compact, dist, idx, label="cumsum compaction scatter + 64-sort")
    timed(sel_minpts_only, dist, idx, label="top_k(10) core-dist only")

    # gather probes: 27 rows x 256B vs 9 segments x 768B (same total bytes)
    ncells = 42_875  # 35^3
    tab27 = jnp.asarray(rng.normal(size=(ncells, 64)).astype(np.float32))
    rows27 = jnp.asarray(rng.integers(0, ncells, (n, 27)).astype(np.int32))
    tab9 = jnp.asarray(rng.normal(size=(ncells // 3, 3 * 64)).astype(np.float32))
    rows9 = jnp.asarray(rng.integers(0, ncells // 3, (n, 9)).astype(np.int32))

    @jax.jit
    def g27(t, r):
        return jnp.take(t, r, axis=0).sum(axis=(1, 2))

    @jax.jit
    def g9(t, r):
        return jnp.take(t, r, axis=0).sum(axis=(1, 2))

    print(f"-- bucket-table gathers, {n} points --", flush=True)
    timed(g27, tab27, rows27, label="27 row-gathers x 256B/row")
    timed(g9, tab9, rows9, label="9 row-gathers x 768B/row")

    # the arithmetic core alone: (block, 27, 16) panels, fori over 25 blocks
    block, noff, bucket = 4096, 27, 16
    nblocks = n // block
    ptsq = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    cand = jnp.asarray(rng.normal(size=(n, noff, 4, bucket)).astype(np.float32))

    @jax.jit
    def arith(q, c):
        def body(i, acc):
            rq = jax.lax.dynamic_slice_in_dim(q, i * block, block, 0)
            rc = jax.lax.dynamic_slice_in_dim(c, i * block, block, 0)
            d2 = jnp.zeros((block, noff, bucket), jnp.float32)
            for j in range(3):
                dj = rc[:, :, j, :] - rq[:, j, None, None]
                d2 = d2 + dj * dj
            dist_b = jnp.sqrt(d2).reshape(block, noff * bucket)
            return jax.lax.dynamic_update_slice_in_dim(
                acc, dist_b.sum(axis=1), i * block, 0)
        return jax.lax.fori_loop(0, nblocks, body, jnp.zeros((n,), jnp.float32))

    timed(arith, ptsq, cand, label="distance arithmetic only (pre-gathered)")


def full(dims):
    n, min_pts, vol, kmax = 100_000, 10, 1000.0, 64
    for d in dims:
        pts = uniform_cloud(n, d, vol, seed=1)
        eps = optics.epsilon_estimation(pts, min_pts)
        print(f"-- d={d} n={n} eps={eps:.2f} --", flush=True)
        if optics.compute_neighbors_grid(pts, eps, min_pts,
                                         max_neighbors=kmax) is not None:
            timed(lambda: optics.compute_neighbors_grid(
                pts, eps, min_pts, max_neighbors=kmax),
                label=f"grid sort-select k={kmax}")
        if optics.compute_neighbors_grid(pts, eps, min_pts,
                                         max_neighbors=kmax,
                                         full_window=True) is not None:
            timed(lambda: optics.compute_neighbors_grid(
                pts, eps, min_pts, max_neighbors=kmax, full_window=True),
                label=f"grid full window (no select)")
        timed(lambda: optics.compute_neighbors(
            pts, eps, min_pts, max_neighbors=kmax, approx=True),
            label=f"dense approx")


def clean():
    """Two interleaved passes of the d=3 decision variants plus a fixed
    canary (top_k(64) micro) that exposes relay-state drift between passes.
    Run with NOTHING else on the host: concurrent CPU work inflates
    relay-mediated timings (first --full run measured fullwindow at 2.5 s
    while a pytest process ran; micro probes predict ~65 ms)."""
    n, m, k = 100_352, 432, 64
    rng = np.random.default_rng(0)
    dist_np = rng.uniform(0.0, 30.0, (n, m)).astype(np.float32)
    dist_np[rng.uniform(size=(n, m)) >= 0.025] = np.inf
    dist = jnp.asarray(dist_np)

    @jax.jit
    def canary(d):
        return jax.lax.top_k(-d, k)[0]

    pts = uniform_cloud(100_000, 3, 1000.0, seed=1)
    eps = optics.epsilon_estimation(pts, 10)
    for p in range(2):
        print(f"-- pass {p} --", flush=True)
        timed(canary, dist, reps=5, label="canary top_k(64) on (100k,432)")
        timed(lambda: optics.compute_neighbors_grid(
            pts, eps, 10, max_neighbors=64), reps=5,
            label="grid select_k=64 (top_k)")
        timed(lambda: optics.compute_neighbors_grid(
            pts, eps, 10, max_neighbors=2048), reps=5,
            label="grid full window (K=m=432)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", action="store_true")
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--clean", action="store_true")
    ap.add_argument("--dims", type=int, nargs="*", default=[3, 4])
    a = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    if a.micro:
        micro()
    if a.full:
        full(a.dims)
    if a.clean:
        clean()
