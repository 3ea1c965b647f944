"""eFAST corner detection on the SAE time surface.

Reference: two concentric Bresenham circles — radius-3 (16 px) and radius-4
(20 px) — with a "streak" test: a corner exists if some contiguous arc of
length 3..6 on circle3 has all timestamps strictly newer than every off-arc
pixel (with boundary-neighbor monotonicity pre-checks), AND the same holds for
an arc of length 4..8 on circle4.
  - circle tables: metavision_time_surface_periodic_group_track.cpp:44-45
  - inlined per-event detector: group_track.cpp:944-1064 (the built target)
  - free-function variant: metavision_time_surface_fast_corner.cpp:24-147
    (transposed .at() argument order — see EFastConfig.group_track_axis_order)

The reference scans 36 ring pixels per event in nested scalar loops — the
single hottest loop in the repo (SURVEY §3.2). TPU formulation: one gather of
the (N, 16) and (N, 20) rings, then the entire (start, streak-length) search
space evaluated as boolean tensor reductions on the VPU — no data-dependent
control flow, fully fused by XLA.

Known reference quirk (documented, not reproduced): the per-event loop `break`s
out of the whole slice when it meets a border-adjacent event
(group_track.cpp:952-958); we mask border events instead.
"""

from __future__ import annotations

import functools
import numpy as np

import jax
import jax.numpy as jnp

from ..config import EFastConfig, SensorConfig

# (dy, dx) in group_track order: time_surface.at(y + c[i][0], x + c[i][1]).
CIRCLE3 = np.array(
    [[0, 3], [1, 3], [2, 2], [3, 1], [3, 0], [3, -1], [2, -2], [1, -3],
     [0, -3], [-1, -3], [-2, -2], [-3, -1], [-3, 0], [-3, 1], [-2, 2], [-1, 3]],
    dtype=np.int32,
)
CIRCLE4 = np.array(
    [[0, 4], [1, 4], [2, 3], [3, 2], [4, 1], [4, 0], [4, -1], [3, -2], [2, -3],
     [1, -4], [0, -4], [-1, -4], [-2, -3], [-3, -2], [-4, -1], [-4, 0], [-4, 1],
     [-3, 2], [-2, 3], [-1, 4]],
    dtype=np.int32,
)


_SEG = 8  # aligned gather segment width (lane-friendly)


def _gather_rings(sae: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                  circles: np.ndarray, axis_order_yx: bool) -> jnp.ndarray:
    """(N, R) ring timestamps around each event for a stacked offset table.

    Row-segment gather: every ring pixel lies in the 9x9 patch around the
    event, which is covered by two aligned 8-wide segments on each of 9 rows.
    Gathering 18 aligned segments per event and extracting the ring values
    with an 8-way static phase select is ~2x faster on TPU than 36 scalar
    gathers (measured: 2.6 ms vs 5.1 ms per 16384-event slice) — the TPU
    gather unit moves aligned rows, not scattered words. Border events may
    clip; they are masked out of candidacy anyway (4-px border, as the
    reference does)."""
    dy = circles[:, 0].copy()
    dx = circles[:, 1].copy()
    if not axis_order_yx:
        dy, dx = dx, dy  # fast_corner.cpp transposed variant
    h, w = sae.shape
    if w % _SEG:
        # pad columns to the segment width (DAVIS346-style sensors, tiled
        # slabs). For any w, the two segments of an in-border event fit the
        # padded row: b_max+16 = 8*(floor((w-9)/8)+2) <= 8*ceil(w/8), and
        # ring pixels of in-border events never read the padded columns.
        sae = jnp.pad(sae, ((0, 0), (0, _SEG - w % _SEG)))
        w = sae.shape[1]
    rows8 = w // _SEG
    sae8 = sae.reshape(h * rows8, _SEG)
    b = (x - 4) & ~(_SEG - 1)
    seg0 = b // _SEG
    drow = jnp.arange(-4, 5, dtype=jnp.int32)
    ridx = ((y[:, None] + drow[None, :]) * rows8)[:, :, None] \
        + (seg0[:, None] + jnp.asarray([0, 1], jnp.int32)[None, :])[:, None, :]
    patch = jnp.take(sae8, ridx.reshape(-1, 18), axis=0, mode="clip")
    patch = patch.reshape(-1, 9, 2 * _SEG)          # rows y-4..y+4, cols b..b+15
    phase = (x - 4) - b                              # 0.._SEG-1
    rows = jnp.asarray(dy + 4, jnp.int32)
    cols = dx + 4                                    # 0..8 relative to x-4
    out = jnp.zeros((x.shape[0], circles.shape[0]), sae.dtype)
    for p in range(_SEG):
        sel = patch[:, rows, jnp.asarray(cols + p, jnp.int32)]
        out = jnp.where((phase == p)[:, None], sel, out)
    return out


def _gather_ring(sae: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                 circle: np.ndarray, axis_order_yx: bool) -> jnp.ndarray:
    """(N, R) ring timestamps around each event (single-circle convenience)."""
    return _gather_rings(sae, x, y, circle, axis_order_yx)


def _gather_rings_block(sae: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                        circles: np.ndarray, axis_order_yx: bool) -> jnp.ndarray:
    """(N, R) ring gather via an 8x8-BLOCK SAE layout.

    The 9x9 ring patch is covered by a 2x2 square of aligned 8x8 blocks —
    4 gathers of 64-wide rows per event instead of the row-segment scheme's
    18 gathers of 8 (the TPU gather unit is descriptor-rate-bound here:
    measured 2.06 vs 2.71 ms per 16384-event slice on blob-distributed
    coords, benchmarks/prof_gather2.py). The (16, 16) reassembled patch is
    reduced to ring values by a row-phase select (y mod 8) then a col-phase
    select (x mod 8)."""
    dy = circles[:, 0].copy()
    dx = circles[:, 1].copy()
    if not axis_order_yx:
        dy, dx = dx, dy
    h, w = sae.shape
    if w % _SEG or h % _SEG:
        sae = jnp.pad(sae, ((0, (-h) % _SEG), (0, (-w) % _SEG)))
        h, w = sae.shape
    nbx = w // _SEG
    blk = sae.reshape(h // _SEG, _SEG, nbx, _SEG).transpose(0, 2, 1, 3) \
        .reshape(-1, _SEG * _SEG)
    bx = jnp.clip((x - 4) >> 3, 0, nbx - 2)
    by = jnp.clip((y - 4) >> 3, 0, h // _SEG - 2)
    idx = ((by[:, None] + jnp.asarray([0, 1])[None, :]) * nbx)[:, :, None] \
        + (bx[:, None] + jnp.asarray([0, 1])[None, :])[:, None, :]
    blocks = jnp.take(blk, idx.reshape(-1, 4), axis=0, mode="clip")  # (N,4,64)
    patch = blocks.reshape(-1, 2, 2, _SEG, _SEG).transpose(0, 1, 3, 2, 4) \
        .reshape(-1, 2 * _SEG, 2 * _SEG)                             # (N,16,16)
    yp = (y - 4) - (by << 3)      # 0..7 (clip keeps border events in range)
    xp = (x - 4) - (bx << 3)
    n = x.shape[0]
    rp = jnp.zeros((n, 9, 2 * _SEG), sae.dtype)
    for p in range(_SEG):
        rp = jnp.where((yp == p)[:, None, None], patch[:, p:p + 9, :], rp)
    rows = jnp.asarray(dy + 4, jnp.int32)
    cols = dx + 4
    out = jnp.zeros((n, circles.shape[0]), sae.dtype)
    for p in range(_SEG):
        sel = rp[:, rows, jnp.asarray(cols + p, jnp.int32)]
        out = jnp.where((xp == p)[:, None], sel, out)
    return out


def _sliding(x: jnp.ndarray, length: int, op) -> jnp.ndarray:
    """Sliding-window reduction along axis 1: out[i] = op(x[i..i+length-1]).

    Doubling (sparse-table) scheme — log2(length) shifted elementwise ops on
    (N, W) panels, no (N, W, W) materialization. out width = W - length + 1.
    """
    w = x.shape[1]
    assert length >= 1 and length <= w, (length, w)
    p, cur = 1, x
    while 2 * p <= length:
        cur = op(cur[:, :-p], cur[:, p:])
        p *= 2
    out_w = w - length + 1
    if p < length:
        cur = op(cur[:, :out_w], cur[:, length - p:length - p + out_w])
    else:
        cur = cur[:, :out_w]
    return cur


def _streak_any(ring: jnp.ndarray, smin: int, smax: int) -> jnp.ndarray:
    """Evaluate the streak test for all starts/lengths on one ring.

    ring: (N, R). Returns (N,) bool: some (start i, length s) passes
      ring[i] >= ring[i-1]
      ring[i+s-1] >= ring[i+s]
      min(ring[i..i+s-1]) > max(ring[i+s..i+R-1])
    (reference: "tj >= min_t → break" over off-arc pixels, group_track:986-995,
     i.e. every off-arc pixel must be < min_t).

    Circular windows come from a doubled ring (N, 2R); each (start, length)
    pair reduces to sliding min (arc) / sliding max (off-arc) panels — a few
    (N, 2R) VPU ops per streak length instead of the (N, R, R) rolled tensor
    (which cost ~20x the HBM traffic and dominated the whole pipeline).
    """
    n, r = ring.shape
    # smax == r would make the off-arc window empty: _sliding(ring2, 0, max)
    # would return raw ring values, not the vacuous empty-max — fail loudly
    # on such a config instead of producing wrong corner masks (ADVICE r1).
    assert 1 <= smin <= smax < r, (smin, smax, r)
    ring2 = jnp.concatenate([ring, ring], axis=1)            # (N, 2R)
    cond1 = ring >= jnp.roll(ring, 1, axis=1)                # ring[i] >= ring[i-1]

    found = jnp.zeros((n,), dtype=bool)
    for s in range(smin, smax + 1):
        arc_min = _sliding(ring2, s, jnp.minimum)[:, :r]     # start i, len s
        off_max = _sliding(ring2, r - s, jnp.maximum)[:, s:s + r]  # start i+s
        cond2 = ring2[:, s - 1:s - 1 + r] >= ring2[:, s:s + r]
        ok = cond1 & cond2 & (off_max < arc_min)
        found = found | jnp.any(ok, axis=1)
    return found


def detect_corners(
    sae: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: EFastConfig = EFastConfig(),
    sensor: SensorConfig = SensorConfig(),
) -> jnp.ndarray:
    """Batched eFAST over one slice of candidate events.

    Returns (N,) bool corner mask. The SAE must already contain this slice's
    events (the reference runs detection on slices after the first, with the
    surface continuously updated; group_track.cpp:926-1064).
    """
    cs = cfg.border
    in_bounds = (x >= cs) & (x < sensor.width - cs) & (y >= cs) & (y < sensor.height - cs)
    cand = valid & in_bounds

    rings = _gather_rings_block(sae, x, y, np.concatenate([CIRCLE3, CIRCLE4]),
                                cfg.group_track_axis_order)
    found3 = _streak_any(rings[:, :len(CIRCLE3)], cfg.streak3_min, cfg.streak3_max)
    found4 = _streak_any(rings[:, len(CIRCLE3):], cfg.streak4_min, cfg.streak4_max)
    return cand & found3 & found4


def detect_corners_reference_numpy(sae, xs, ys, cfg: EFastConfig = EFastConfig(),
                                   sensor: SensorConfig = SensorConfig()):
    """Scalar-loop oracle transliterating group_track.cpp:944-1054 semantics
    (border events skipped rather than breaking the slice)."""
    sae = np.asarray(sae)
    out = []
    c3, c4 = CIRCLE3, CIRCLE4
    for x, y in zip(np.asarray(xs).tolist(), np.asarray(ys).tolist()):
        cs = cfg.border
        if x < cs or x >= sensor.width - cs or y < cs or y >= sensor.height - cs:
            out.append(False)
            continue

        def at(dy, dx):
            if cfg.group_track_axis_order:
                return sae[y + dy, x + dx]
            return sae[y + dx, x + dy]

        def pass_circle(circle, smin, smax):
            r = len(circle)
            for i in range(r):
                for s in range(smin, smax + 1):
                    if at(*circle[i]) < at(*circle[(i - 1) % r]):
                        continue
                    if at(*circle[(i + s - 1) % r]) < at(*circle[(i + s) % r]):
                        continue
                    min_t = min(at(*circle[(i + j) % r]) for j in range(s))
                    if all(at(*circle[(i + j) % r]) < min_t for j in range(s, r)):
                        return True
            return False

        out.append(pass_circle(c3, cfg.streak3_min, cfg.streak3_max)
                   and pass_circle(c4, cfg.streak4_min, cfg.streak4_max))
    return np.array(out, dtype=bool)
