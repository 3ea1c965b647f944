"""Micro-benchmark of TPU gather strategies for the eFAST ring lookup.

36 ring values per event from a (720, 1280) int32 SAE, 16384 events/slice,
measured inside a 32-step lax.scan (per-dispatch overhead otherwise dominates).
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp, numpy as np
import evflow_tpu; evflow_tpu.setup_cache()
from evflow_tpu.ops.efast import CIRCLE3, CIRCLE4

H, W, N, S = 720, 1280, 16384, 32
rng = np.random.default_rng(0)
xs = jnp.asarray(rng.integers(4, W - 4, (S, N)), jnp.int32)
ys = jnp.asarray(rng.integers(4, H - 4, (S, N)), jnp.int32)
sae = jnp.asarray(rng.integers(0, 1 << 30, (H, W)), jnp.int32)
circ = np.concatenate([CIRCLE3, CIRCLE4])
OFF = jnp.asarray(circ[:, 0].astype(np.int64) * W + circ[:, 1], jnp.int32)


def bench(name, fn):
    f = jax.jit(fn)
    t0 = time.perf_counter(); jax.block_until_ready(f(sae, xs, ys)); cmp = time.perf_counter()-t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); jax.block_until_ready(f(sae, xs, ys)); best = min(best, time.perf_counter()-t0)
    print(f"{name:24s} compile {cmp:6.1f}s  per-slice {best/S*1e3:7.3f} ms", flush=True)


def scan_over(slice_fn):
    def run(sae, xs, ys):
        flat = sae.reshape(-1)
        def step(c, ev):
            x, y = ev
            return c, slice_fn(sae, flat, x, y)
        return jax.lax.scan(step, 0, (xs, ys))
    return run


# A: flat (N, 36) take, mode=clip  (current implementation)
def v_flat(sae, flat, x, y):
    lin = (y * W + x)[:, None] + OFF[None, :]
    return jnp.sum(jnp.take(flat, lin, mode="clip"))
bench("A flat (N,36) clip", scan_over(v_flat))

# A2: promise_in_bounds
def v_flat_pib(sae, flat, x, y):
    lin = (y * W + x)[:, None] + OFF[None, :]
    return jnp.sum(flat.at[lin].get(mode="promise_in_bounds"))
bench("A2 flat promise", scan_over(v_flat_pib))

# B: transposed (36, N)
def v_t(sae, flat, x, y):
    lin = OFF[:, None] + (y * W + x)[None, :]
    return jnp.sum(jnp.take(flat, lin, mode="clip"))
bench("B flat (36,N)", scan_over(v_t))

# C: sorted base + 36 one-offset takes with indices_are_sorted
def v_sorted(sae, flat, x, y):
    base = y * W + x
    sbase = jax.lax.sort(base)
    acc = jnp.int32(0)
    for i in range(36):
        acc += jnp.sum(flat.at[sbase + OFF[i]].get(
            mode="promise_in_bounds", indices_are_sorted=True))
    return acc
bench("C sorted cols", scan_over(v_sorted))

# E: row-segment gather — 18 aligned 8-wide segments per event, then 8-phase
# static extraction.
SEG = 8
rows8 = W // SEG
dyu = np.unique(circ[:, 0])  # -4..4
def v_rowseg(sae, flat, x, y):
    sae8 = sae.reshape(H * rows8, SEG)
    b = (x - 4) & ~(SEG - 1)
    seg0 = b // SEG
    # (N, 9, 2) segment row-ids
    ridx = ((y[:, None] + jnp.asarray(dyu)[None, :]) * rows8)[:, :, None] \
        + (seg0[:, None] + jnp.asarray([0, 1])[None, :])[:, None, :]
    patch = jnp.take(sae8, ridx.reshape(-1, 18), axis=0, mode="clip")  # (N,18,8)
    patch = patch.reshape(-1, 9, 16)
    phase = (x - 4) - b  # 0..7
    # static extraction per phase, select by phase
    out = jnp.zeros((x.shape[0], 36), jnp.int32)
    cols = circ[:, 1] + 4  # 0..8 relative to x-4
    rows = circ[:, 0] + 4
    for p in range(SEG):
        sel = patch[:, jnp.asarray(rows), jnp.asarray(cols + p)]
        out = jnp.where((phase == p)[:, None], sel, out)
    return jnp.sum(out)
bench("E row-segment", scan_over(v_rowseg))

# F: one (N,) single-offset gather x36 unsorted (baseline granularity probe)
def v_cols(sae, flat, x, y):
    base = y * W + x
    acc = jnp.int32(0)
    for i in range(36):
        acc += jnp.sum(jnp.take(flat, base + OFF[i], mode="clip"))
    return acc
bench("F 36 col takes", scan_over(v_cols))

# G: one multi-dim gather of a (9,16) patch per event
def v_patch2d(sae, flat, x, y):
    b = (x - 4) & ~7
    starts = jnp.stack([y - 4, b], axis=1)  # (N, 2)
    patch = jax.lax.gather(
        sae, starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0, 1)),
        slice_sizes=(9, 16), mode=jax.lax.GatherScatterMode.CLIP)
    phase = (x - 4) - b
    out = jnp.zeros((x.shape[0], 36), jnp.int32)
    cols = circ[:, 1] + 4
    rows = circ[:, 0] + 4
    for p in range(8):
        sel = patch[:, jnp.asarray(rows), jnp.asarray(cols + p)]
        out = jnp.where((phase == p)[:, None], sel, out)
    return jnp.sum(out)
bench("G patch (9,16) gather", scan_over(v_patch2d))

# H: paired-segment rows — 9 gathers of 16-wide from a precomputed paired view
def v_pairseg(sae, flat, x, y):
    sae8 = sae.reshape(H * rows8, SEG)
    sae_pairs = jnp.concatenate(
        [sae8, jnp.roll(sae8, -1, axis=0)], axis=1)      # (H*rows8, 16)
    b = (x - 4) & ~(SEG - 1)
    seg0 = b // SEG
    ridx = (y[:, None] + jnp.asarray(dyu)[None, :]) * rows8 + seg0[:, None]
    patch = jnp.take(sae_pairs, ridx, axis=0, mode="clip")  # (N,9,16)
    phase = (x - 4) - b
    out = jnp.zeros((x.shape[0], 36), jnp.int32)
    cols = circ[:, 1] + 4
    rows = circ[:, 0] + 4
    for p in range(SEG):
        sel = patch[:, jnp.asarray(rows), jnp.asarray(cols + p)]
        out = jnp.where((phase == p)[:, None], sel, out)
    return jnp.sum(out)
bench("H paired-seg (9x16)", scan_over(v_pairseg))
