"""Dense OPTICS d>=4 stage isolation + bf16 two-stage prototype (r4,
VERDICT item 3: d=4 <= 120 ms, d=6 <= 250 ms at n=100k).

Variants per (d, n=100k):
  A  current dense compute_neighbors (HIGHEST panel + top_k)    [baseline]
  B  HIGHEST panel + count only (no selection)                  [selection cost]
  C  centered-bf16 1-pass panel + count only                    [panel floor]
  D  two-stage: bf16 panel + inflated mask + top_k on bf16 +
     exact gather-refine of k' candidates                       [the candidate]

Timing per CLAUDE.md: chained reps, on-device 1-element drain slices.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import evflow_tpu
evflow_tpu.setup_cache()
from evflow_tpu.io.synthetic import uniform_cloud
from evflow_tpu.models import optics
from evflow_tpu.ops.distance import pairwise_sqdist


def _drain(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timed(fn, *args, reps=3, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    _drain(out)
    comp = time.perf_counter() - t0
    laps = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _drain(out)
        laps.append(time.perf_counter() - t0)
    print(f"{label:52s} compile {comp:6.1f}s   min {min(laps)*1e3:8.2f} ms",
          flush=True)
    return out


BLOCK = 2048


@functools.partial(jax.jit, static_argnames=("nblocks", "count_only"))
def panel_highest(pts_pad, pts, eps, nblocks, count_only=True):
    def body(i, acc):
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * BLOCK, BLOCK, 0)
        d2 = pairwise_sqdist(rows, pts)
        cnt = jnp.sum(d2 <= eps * eps, axis=1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice_in_dim(acc, cnt, i * BLOCK, 0)
    return jax.lax.fori_loop(0, nblocks, body,
                             jnp.zeros((nblocks * BLOCK,), jnp.int32))


def _bf16_panel(rows, pts_c, q2, eps2_inflated_rowscale):
    """centered bf16 cross term + exact norms; returns (B, N) d2 estimate."""
    r2 = jnp.sum(rows * rows, axis=1, keepdims=True)
    cross = jnp.dot(rows.astype(jnp.bfloat16),
                    pts_c.T.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    return r2 + q2 - 2.0 * cross, r2


@functools.partial(jax.jit, static_argnames=("nblocks",))
def panel_bf16(pts_pad, pts, eps, nblocks):
    c = jnp.mean(pts, axis=0)
    pts_c = pts - c
    q2 = jnp.sum(pts_c * pts_c, axis=1)[None, :]

    def body(i, acc):
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * BLOCK, BLOCK, 0) - c
        d2b, r2 = _bf16_panel(rows, pts_c, q2, None)
        # inflated gate: |err(2 r.q)| <= 2^-7 |r||q| (bf16 input rounding,
        # Cauchy-Schwarz), 4x safety margin
        err = jnp.float32(2.0 ** -5) * jnp.sqrt(jnp.maximum(r2, 0.0)) \
            * jnp.sqrt(jnp.maximum(q2, 0.0))
        cnt = jnp.sum(d2b <= eps * eps + err, axis=1).astype(jnp.int32)
        return jax.lax.dynamic_update_slice_in_dim(acc, cnt, i * BLOCK, 0)
    return jax.lax.fori_loop(0, nblocks, body,
                             jnp.zeros((nblocks * BLOCK,), jnp.int32))


@functools.partial(jax.jit, static_argnames=("nblocks", "k", "min_pts"))
def two_stage(pts_pad, pts, eps, nblocks, k, min_pts):
    c = jnp.mean(pts, axis=0)
    pts_c = pts - c
    q2 = jnp.sum(pts_c * pts_c, axis=1)[None, :]
    n = pts.shape[0]

    def body(i, acc):
        ia, da, ca = acc
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * BLOCK, BLOCK, 0) - c
        d2b, r2 = _bf16_panel(rows, pts_c, q2, None)
        err = jnp.float32(2.0 ** -5) * jnp.sqrt(jnp.maximum(r2, 0.0)) \
            * jnp.sqrt(jnp.maximum(q2, 0.0))
        keep = d2b <= eps * eps + err
        masked = jnp.where(keep, d2b, jnp.inf)
        neg, idx = jax.lax.top_k(-masked, k)          # k' candidates by bf16
        # exact refine: gather candidate coords, exact diff-form distances
        cand = pts_c[idx]                             # (B, k, d) gather
        d2x = jnp.sum((rows[:, None, :] - cand) ** 2, axis=-1)
        d2x = jnp.where(jnp.isfinite(-neg), d2x, jnp.inf)
        dx = jnp.sqrt(d2x)
        ok = dx <= eps
        cnt = jnp.sum(ok, axis=1).astype(jnp.int32)
        dx = jnp.where(ok, dx, jnp.inf)
        # exact re-rank of the candidate set (narrow rows)
        order = jnp.argsort(dx, axis=1)
        dx = jnp.take_along_axis(dx, order, axis=1)
        idx = jnp.take_along_axis(idx, order, axis=1)
        idx = jnp.where(jnp.isfinite(dx), idx, -1)
        return (jax.lax.dynamic_update_slice_in_dim(ia, idx, i * BLOCK, 0),
                jax.lax.dynamic_update_slice_in_dim(da, dx, i * BLOCK, 0),
                jax.lax.dynamic_update_slice_in_dim(ca, cnt, i * BLOCK, 0))

    init = (jnp.zeros((nblocks * BLOCK, k), jnp.int32),
            jnp.full((nblocks * BLOCK, k), jnp.inf, jnp.float32),
            jnp.zeros((nblocks * BLOCK,), jnp.int32))
    idx, dist, cnt = jax.lax.fori_loop(0, nblocks, body, init)
    core = jnp.where(cnt >= min_pts, dist[:, min_pts - 1], jnp.inf)
    return idx[:n], dist[:n], cnt[:n], core[:n]


@functools.partial(jax.jit, static_argnames=("nblocks", "k", "min_pts"))
def two_stage_approx(pts_pad, pts, eps, nblocks, k, min_pts):
    """Variant E: selection via approx_max_k on the masked bf16 panel (the
    TPU-native partial sort — O(W) per row, not O(W·k) like top_k), with an
    exact per-row completeness check: `missed` counts rows where approx
    returned fewer finite survivors than the gate's exact count (capped at
    k). missed == 0 certifies the neighbor sets equal the exact gate's."""
    c = jnp.mean(pts, axis=0)
    pts_c = pts - c
    q2 = jnp.sum(pts_c * pts_c, axis=1)[None, :]
    qn = jnp.sqrt(jnp.maximum(q2, 0.0))
    n = pts.shape[0]

    def body(i, acc):
        ia, da, ca, ma = acc
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * BLOCK, BLOCK, 0) - c
        r2 = jnp.sum(rows * rows, axis=1, keepdims=True)
        cross = jnp.dot(rows.astype(jnp.bfloat16), pts_c.T.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        d2b = r2 + q2 - 2.0 * cross
        err = jnp.float32(2.0 ** -5) * jnp.sqrt(jnp.maximum(r2, 0.0)) * qn
        keep = d2b <= eps * eps + err
        cnt = jnp.sum(keep, axis=1).astype(jnp.int32)
        masked = jnp.where(keep, d2b, jnp.inf)
        neg, idx = jax.lax.approx_max_k(-masked, k)
        got = jnp.sum(jnp.isfinite(-neg), axis=1).astype(jnp.int32)
        miss = jnp.sum(got < jnp.minimum(cnt, k)).astype(jnp.int32)
        cand = pts_c[idx]
        d2x = jnp.sum((rows[:, None, :] - cand) ** 2, axis=-1)
        d2x = jnp.where(jnp.isfinite(-neg), d2x, jnp.inf)
        dx = jnp.sqrt(d2x)
        dx = jnp.where(dx <= eps, dx, jnp.inf)
        order = jnp.argsort(dx, axis=1)
        dx = jnp.take_along_axis(dx, order, axis=1)
        idx = jnp.take_along_axis(idx, order, axis=1)
        idx = jnp.where(jnp.isfinite(dx), idx, -1)
        return (jax.lax.dynamic_update_slice_in_dim(ia, idx, i * BLOCK, 0),
                jax.lax.dynamic_update_slice_in_dim(da, dx, i * BLOCK, 0),
                jax.lax.dynamic_update_slice_in_dim(ca, cnt, i * BLOCK, 0),
                ma + miss)

    init = (jnp.zeros((nblocks * BLOCK, k), jnp.int32),
            jnp.full((nblocks * BLOCK, k), jnp.inf, jnp.float32),
            jnp.zeros((nblocks * BLOCK,), jnp.int32),
            jnp.int32(0))
    idx, dist, cnt, missed = jax.lax.fori_loop(0, nblocks, body, init)
    core = jnp.where(cnt >= min_pts, dist[:, min_pts - 1], jnp.inf)
    return idx[:n], dist[:n], cnt[:n], core[:n], missed


def main():
    print("devices:", jax.devices(), flush=True)
    n = 100_000
    min_pts = 10
    for d in (4, 6):
        pts_np = uniform_cloud(n, d, seed=1)
        eps = optics.epsilon_estimation(pts_np, min_pts)
        pts = jnp.asarray(pts_np, jnp.float32)
        nblocks = -(-n // BLOCK)
        pts_pad = jnp.pad(pts, ((0, nblocks * BLOCK - n), (0, 0)),
                          constant_values=jnp.inf)
        print(f"-- d={d} n={n} eps={eps:.2f} scale={np.abs(pts_np).max():.0f} --",
              flush=True)
        if "--approx-only" not in sys.argv:
            timed(lambda: optics.compute_neighbors(pts_np, eps, min_pts, 256),
                  label=f"A dense current (HIGHEST + top_k256)")
            timed(lambda: panel_highest(pts_pad, pts, jnp.float32(eps), nblocks),
                  label=f"B HIGHEST panel + count only")
            timed(lambda: panel_bf16(pts_pad, pts, jnp.float32(eps), nblocks),
                  label=f"C bf16 centered panel + count only")
            o = timed(lambda: two_stage(pts_pad, pts, jnp.float32(eps), nblocks,
                                        256, min_pts),
                      label=f"D two-stage bf16 + exact refine k'=256")
        for k in (64, 256):
            oe = timed(lambda k=k: two_stage_approx(
                pts_pad, pts, jnp.float32(eps), nblocks, k, min_pts),
                label=f"E bf16 + approx_max_k({k}) + exact refine")
            print(f"   E k={k}: rows with approx-missed survivors: "
                  f"{int(oe[4])}", flush=True)
        if "--approx-only" in sys.argv:
            continue
        # correctness vs A
        ref = optics.compute_neighbors(pts_np, eps, min_pts, 256)
        ia, da, ca, ka = jax.device_get((ref.idx, ref.dist, ref.count,
                                         ref.core_dist))
        ib, db, cb, kb = jax.device_get(o)
        same_cnt = (ca == cb).mean()
        same_core = np.isclose(ka, kb, rtol=1e-5, atol=1e-5,
                               equal_nan=False) | (np.isinf(ka) & np.isinf(kb))
        # neighbor sets: compare as sets per row on a sample
        samp = np.random.default_rng(0).integers(0, n, 200)
        set_ok = all(set(ia[i][ia[i] >= 0]) == set(ib[i][ib[i] >= 0])
                     for i in samp)
        print(f"   parity: counts {same_cnt:.4f}  core {same_core.mean():.4f}"
              f"  sampled neighbor sets equal: {set_ok}", flush=True)


if __name__ == "__main__":
    main()
