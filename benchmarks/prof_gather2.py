"""Round-2 gather strategies for the eFAST ring lookup (extends prof_gather).

I  — 8x8-block SAE layout: 4 aligned 64-wide block gathers per event
     (4.5x fewer gather descriptors than E's 18 segments), then two-level
     (row, col) phase extraction.
J  — representative compaction: detect only one event per touched pixel
     (sae[y,x] == t marks the slice's newest event at that pixel; post-NMS
     results are identical since same-pixel duplicates are suppressed at
     distance 0), compacted to a fixed cap, then E's row-segment gather on
     the smaller panel. Measured at the bench's blob-stream occupancy.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.ops.efast import CIRCLE3, CIRCLE4

H, W, N, S = 720, 1280, 16384, 32
rng = np.random.default_rng(0)
# blob-like coords (the bench's distribution): 3 gaussians, sigma 12
cx = np.array([200, 900, 600]); cy = np.array([200, 500, 150])
k = rng.integers(0, 3, (S, N))
xs_np = np.clip(rng.normal(cx[k], 12), 4, W - 5).astype(np.int32)
ys_np = np.clip(rng.normal(cy[k], 12), 4, H - 5).astype(np.int32)
xs = jnp.asarray(xs_np); ys = jnp.asarray(ys_np)
ts = jnp.asarray(np.tile(np.arange(1, N + 1, dtype=np.int32), (S, 1)))
sae0 = jnp.asarray(rng.integers(0, 1 << 30, (H, W)), jnp.int32)
circ = np.concatenate([CIRCLE3, CIRCLE4])

uniq = len({(int(a), int(b)) for a, b in zip(xs_np[0], ys_np[0])})
print(f"blob stream: ~{uniq} unique pixels / {N} events per slice", flush=True)


def bench(name, fn):
    f = jax.jit(fn)
    t0 = time.perf_counter(); jax.block_until_ready(f(sae0, xs, ys, ts)); cmp = time.perf_counter() - t0
    np.asarray(f(sae0, xs, ys, ts)[1]).ravel()[:1]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = f(sae0, xs, ys, ts)
        np.asarray(r[1]).ravel()[:1]
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} compile {cmp:6.1f}s  per-slice {best/S*1e3:7.3f} ms", flush=True)


def scan_over(slice_fn):
    def run(sae, xs, ys, ts):
        def step(c, ev):
            x, y, t = ev
            return c, slice_fn(sae, x, y, t)
        return jax.lax.scan(step, 0, (xs, ys, ts))
    return run


SEG = 8
rows8 = W // SEG
dyu = np.unique(circ[:, 0])
rows_c = jnp.asarray(circ[:, 0] + 4)
cols_c = circ[:, 1] + 4


def rowseg_gather(sae, x, y):
    """E from prof_gather (the current implementation)."""
    sae8 = sae.reshape(H * rows8, SEG)
    b = (x - 4) & ~(SEG - 1)
    seg0 = b // SEG
    ridx = ((y[:, None] + jnp.asarray(dyu)[None, :]) * rows8)[:, :, None] \
        + (seg0[:, None] + jnp.asarray([0, 1])[None, :])[:, None, :]
    patch = jnp.take(sae8, ridx.reshape(-1, 18), axis=0, mode="clip")
    patch = patch.reshape(-1, 9, 16)
    phase = (x - 4) - b
    out = jnp.zeros((x.shape[0], 36), jnp.int32)
    for p in range(SEG):
        sel = patch[:, rows_c, jnp.asarray(cols_c + p)]
        out = jnp.where((phase == p)[:, None], sel, out)
    return out


def v_rowseg(sae, x, y, t):
    return jnp.sum(rowseg_gather(sae, x, y))


bench("E row-segment (blob coords)", scan_over(v_rowseg))


# I: 8x8 block layout, 4 gathers of 64-wide, two-level phase extraction
NBX = W // 8
def v_block(sae, x, y, t):
    blk = sae.reshape(H // 8, 8, NBX, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    bx = (x - 4) >> 3
    by = (y - 4) >> 3
    idx = ((by[:, None] + jnp.asarray([0, 1])[None, :]) * NBX)[:, :, None] \
        + (bx[:, None] + jnp.asarray([0, 1])[None, :])[:, None, :]
    blocks = jnp.take(blk, idx.reshape(-1, 4), axis=0, mode="clip")  # (N,4,64)
    patch = blocks.reshape(-1, 2, 2, 8, 8).transpose(0, 1, 3, 2, 4).reshape(-1, 16, 16)
    yp = (y - 4) & 7
    xp = (x - 4) & 7
    rp = jnp.zeros((x.shape[0], 9, 16), jnp.int32)
    for p in range(8):
        rp = jnp.where((yp == p)[:, None, None], patch[:, p:p + 9, :], rp)
    out = jnp.zeros((x.shape[0], 36), jnp.int32)
    for p in range(8):
        sel = rp[:, rows_c - 4 + 4, jnp.asarray(cols_c + p)]
        out = jnp.where((xp == p)[:, None], sel, out)
    return jnp.sum(out)


bench("I 8x8-block x4 (blob)", scan_over(v_block))


# J: representative compaction to a cap, then E's gather on the small panel
def make_vj(cap):
    def v_rep(sae, x, y, t):
        sae = sae.at[y, x].max(t, mode="drop")
        rep = sae[y, x] == t                      # newest event per pixel
        pos = jnp.cumsum(rep.astype(jnp.int32)) - 1
        keep = rep & (pos < cap)
        spos = jnp.where(keep, pos, cap)
        cxp = jnp.zeros((cap + 1,), jnp.int32).at[spos].set(
            jnp.where(keep, x, 0), mode="drop")[:cap]
        cyp = jnp.zeros((cap + 1,), jnp.int32).at[spos].set(
            jnp.where(keep, y, 0), mode="drop")[:cap]
        return jnp.sum(rowseg_gather(sae, cxp, cyp))
    return v_rep


bench("J rep-compact cap=8192", scan_over(make_vj(8192)))
bench("J rep-compact cap=4096", scan_over(make_vj(4096)))


# J2: compaction only (isolate its cost)
def v_compact_only(sae, x, y, t):
    cap = 8192
    sae = sae.at[y, x].max(t, mode="drop")
    rep = sae[y, x] == t
    pos = jnp.cumsum(rep.astype(jnp.int32)) - 1
    keep = rep & (pos < cap)
    spos = jnp.where(keep, pos, cap)
    cxp = jnp.zeros((cap + 1,), jnp.int32).at[spos].set(
        jnp.where(keep, x, 0), mode="drop")[:cap]
    return jnp.sum(cxp)


bench("J2 compaction alone", scan_over(v_compact_only))
