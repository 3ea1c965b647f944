import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Probe the count-certified exact OPTICS selection design (r5, VERDICT #1).

Questions, each answered by measurement on the real TPU:
  P1. approx_max_k cost on the (B, N) masked gate panel at n=100k —
      vs k (64/128) and recall_target (default 0.95 / 0.99) — and its
      CAPTURE failure rate: how many rows lose >= 1 gate-passer (those rows
      need the exact fallback), how many passers are lost in total.
  P2. approx_max_k cost scaling with row WIDTH (100k vs 8192 vs 4096) —
      decides whether a segment top-C pre-reduction pays.
  P3. variadic (dist, idx) row-sort cost at fallback widths (512/2048 rows
      x 100k cols) — the exact fallback's price.
  P4. segment top-4 reduction cost fused after the bf16 gate panel
      (B, S, W) -> (B, 4*S) candidates + certification counts.

Methodology: chained laps, one 1-element on-device-sliced readback per
timed region (np.asarray(x.ravel()[:1])), quiet relay, measurements before
any big readback (CLAUDE.md r4b rules).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from evflow_tpu.io.synthetic import uniform_cloud
from evflow_tpu.models import optics

N = 100_000
BLOCK = 2048
LAPS = 4


def drain(x):
    return np.asarray(x.ravel()[:1])


def timed(fn, *args, laps=LAPS, label=""):
    out = fn(*args)
    drain(out[0] if isinstance(out, tuple) else out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(laps):
        out = fn(*args)
    drain(out[0] if isinstance(out, tuple) else out)
    dt = (time.perf_counter() - t0) / laps
    print(f"{label}: {dt*1e3:.1f} ms", flush=True)
    return dt, out


def centered(pts):
    c = jnp.mean(pts, axis=0)
    return pts - c


@functools.partial(jax.jit, static_argnames=("k", "block", "nblocks",
                                             "recall"))
def probe_approx(pts_pad, pts_c, eps, k, block, nblocks, recall):
    """bf16 gate panel + approx_max_k per block; returns per-row
    (cnt_gate, captured) plus the selected idx panel."""
    q2 = jnp.sum(pts_c * pts_c, axis=1)[None, :]
    qn = jnp.sqrt(jnp.maximum(q2, 0.0))
    npad = nblocks * block

    def body(i, acc):
        ca, fa = acc
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * block, block, 0)
        r2 = jnp.sum(rows * rows, axis=1, keepdims=True)
        cross = jnp.dot(rows.astype(jnp.bfloat16), pts_c.T.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        d2b = r2 + q2 - 2.0 * cross
        err = jnp.float32(2.0 ** -5) * jnp.sqrt(jnp.maximum(r2, 0.0)) * qn
        keep = d2b <= eps * eps + err
        cnt = jnp.sum(keep, axis=1).astype(jnp.int32)
        masked = jnp.where(keep, d2b, jnp.inf)
        neg, idx = jax.lax.approx_max_k(-masked, k, recall_target=recall)
        captured = jnp.sum(jnp.isfinite(-neg), axis=1).astype(jnp.int32)
        return (jax.lax.dynamic_update_slice_in_dim(ca, cnt, i * block, 0),
                jax.lax.dynamic_update_slice_in_dim(fa, captured, i * block, 0))

    init = (jnp.zeros((npad,), jnp.int32), jnp.zeros((npad,), jnp.int32))
    cnt, captured = jax.lax.fori_loop(0, nblocks, body, init)
    n = pts_c.shape[0]
    cnt, captured = cnt[:n], captured[:n]
    ok = (cnt <= k) & (captured == cnt)
    return (jnp.sum(~ok).astype(jnp.int32),
            jnp.sum(jnp.where(cnt <= k, cnt - captured, 0)),
            jnp.max(cnt), jnp.sum(cnt > k).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("k", "width", "rows", "recall"))
def probe_width(panel, k, width, rows, recall):
    neg, idx = jax.lax.approx_max_k(panel, k, recall_target=recall)
    return jnp.sum(neg[:, 0])


@functools.partial(jax.jit, static_argnames=("rows",))
def probe_sortsel(panel, idxs, rows):
    sd, si = jax.lax.sort((panel, idxs), num_keys=1)
    return sd[:, :256].sum() + si[:, :256].sum()


@functools.partial(jax.jit, static_argnames=("k", "block", "nblocks",
                                             "seg_w", "cap"))
def probe_segment(pts_pad, pts_c, eps, k, block, nblocks, seg_w, cap):
    """bf16 gate + per-segment top-`cap` reduction -> (B, cap*S) candidates,
    then approx_max_k on the narrow panel; returns certification counts."""
    n, d = pts_c.shape
    q2 = jnp.sum(pts_c * pts_c, axis=1)[None, :]
    qn = jnp.sqrt(jnp.maximum(q2, 0.0))
    npad = nblocks * block
    nseg = -(-n // seg_w)
    wpad = nseg * seg_w - n

    def body(i, acc):
        ca, fa = acc
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * block, block, 0)
        r2 = jnp.sum(rows * rows, axis=1, keepdims=True)
        cross = jnp.dot(rows.astype(jnp.bfloat16), pts_c.T.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        d2b = r2 + q2 - 2.0 * cross
        err = jnp.float32(2.0 ** -5) * jnp.sqrt(jnp.maximum(r2, 0.0)) * qn
        keep = d2b <= eps * eps + err
        cnt = jnp.sum(keep, axis=1).astype(jnp.int32)
        masked = jnp.where(keep, d2b, jnp.inf)
        masked = jnp.pad(masked, ((0, 0), (0, wpad)), constant_values=jnp.inf)
        seg = masked.reshape(block, nseg, seg_w)
        segcnt = jnp.sum(jnp.isfinite(seg), axis=2).astype(jnp.int32)
        outs = []
        cur = seg
        for _ in range(cap):
            m1 = jnp.min(cur, axis=2)
            a1 = jnp.argmin(cur, axis=2)
            outs.append(m1)
            cur = jnp.where(jnp.arange(seg_w)[None, None, :] == a1[..., None],
                            jnp.inf, cur)
        cand = jnp.stack(outs, axis=2).reshape(block, nseg * cap)
        captured_seg = jnp.sum(jnp.minimum(segcnt, cap), axis=1)
        neg, _ = jax.lax.approx_max_k(-cand, k)
        captured = jnp.sum(jnp.isfinite(-neg), axis=1).astype(jnp.int32)
        ok = (cnt <= k) & (captured == cnt) & (captured_seg == cnt)
        return (jax.lax.dynamic_update_slice_in_dim(
                    ca, (~ok).astype(jnp.int32), i * block, 0),
                jax.lax.dynamic_update_slice_in_dim(fa, cnt, i * block, 0))

    init = (jnp.zeros((npad,), jnp.int32), jnp.zeros((npad,), jnp.int32))
    bad, cnt = jax.lax.fori_loop(0, nblocks, body, init)
    return jnp.sum(bad[:n]), jnp.max(cnt[:n])


def main():
    for d in (4, 6):
        pts_np = uniform_cloud(N, d, 1000.0, seed=1)
        eps = optics.epsilon_estimation(pts_np, 10)
        pts = jnp.asarray(pts_np, jnp.float32)
        pts_c = centered(pts)
        nblocks = -(-N // BLOCK)
        pad = nblocks * BLOCK - N
        pts_pad = jnp.pad(pts_c, ((0, pad), (0, 0)), constant_values=jnp.inf)
        print(f"== d={d} eps={eps:.2f} ==", flush=True)

        for k, recall in ((64, 0.95), (64, 0.99), (128, 0.95)):
            dt, out = timed(probe_approx, pts_pad, pts_c, jnp.float32(eps),
                            k, BLOCK, nblocks, recall,
                            label=f"P1 d={d} approx k={k} recall={recall}")
            nu, lost, mx, nov = [int(np.asarray(v)) for v in out]
            print(f"   uncertified_rows={nu} lost_passers={lost} "
                  f"max_cnt={mx} overflow_rows={nov}", flush=True)

        if d == 4:
            rng = np.random.default_rng(0)
            for width in (100_000, 8192, 4096):
                panel = jnp.asarray(rng.normal(size=(BLOCK, width)),
                                    jnp.float32)
                timed(probe_width, panel, 64, width, BLOCK, 0.95,
                      label=f"P2 approx k=64 width={width} (one {BLOCK}-row block)")
            for rows in (512, 2048):
                panel = jnp.asarray(rng.normal(size=(rows, N)), jnp.float32)
                idxs = jnp.tile(jnp.arange(N, dtype=jnp.int32), (rows, 1))
                timed(probe_sortsel, panel, idxs, rows,
                      label=f"P3 variadic sort rows={rows} x {N}")

        for seg_w, cap in ((64, 4), (128, 4)):
            dt, out = timed(probe_segment, pts_pad, pts_c, jnp.float32(eps),
                            64, BLOCK, nblocks, seg_w, cap,
                            label=f"P4 d={d} segment W={seg_w} cap={cap} + approx")
            nu, mx = int(np.asarray(out[0])), int(np.asarray(out[1]))
            print(f"   uncertified_rows={nu} max_cnt={mx}", flush=True)


if __name__ == "__main__":
    main()
