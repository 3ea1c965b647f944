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


def _gather_ring(sae: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                 circle: np.ndarray, axis_order_yx: bool) -> jnp.ndarray:
    """(N, R) ring timestamps around each event."""
    dy = jnp.asarray(circle[:, 0])
    dx = jnp.asarray(circle[:, 1])
    if not axis_order_yx:
        dy, dx = dx, dy  # fast_corner.cpp transposed variant
    h, w = sae.shape
    yy = jnp.clip(y[:, None] + dy[None, :], 0, h - 1)
    xx = jnp.clip(x[:, None] + dx[None, :], 0, w - 1)
    return sae[yy, xx]


def _streak_any(ring: jnp.ndarray, smin: int, smax: int) -> jnp.ndarray:
    """Evaluate the streak test for all starts/lengths on one ring.

    ring: (N, R). Returns (N,) bool: some (start i, length s) passes
      ring[i] >= ring[i-1]
      ring[i+s-1] >= ring[i+s]
      min(ring[i..i+s-1]) > max(ring[i+s..i+R-1])
    (reference: "tj >= min_t → break" over off-arc pixels, group_track:986-995,
     i.e. every off-arc pixel must be < min_t).
    """
    n, r = ring.shape
    # rolled[n, i, j] = ring[n, (i + j) % r]
    idx = (np.arange(r)[:, None] + np.arange(r)[None, :]) % r  # (R, R) static
    rolled = ring[:, jnp.asarray(idx)]  # (N, R, R)

    cond1 = rolled[:, :, 0] >= rolled[:, :, r - 1]  # ring[i] >= ring[i-1]

    # prefix mins along j (arc) and suffix maxes (off-arc)
    pref_min = jax.lax.associative_scan(jnp.minimum, rolled, axis=2)
    suf_max = jnp.flip(
        jax.lax.associative_scan(jnp.maximum, jnp.flip(rolled, axis=2), axis=2),
        axis=2,
    )

    found = jnp.zeros((n,), dtype=bool)
    for s in range(smin, smax + 1):
        cond2 = rolled[:, :, s - 1] >= rolled[:, :, s % r]
        min_arc = pref_min[:, :, s - 1]
        max_off = suf_max[:, :, s]           # max over j in [s, r-1]
        ok = cond1 & cond2 & (max_off < min_arc)
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

    ring3 = _gather_ring(sae, x, y, CIRCLE3, cfg.group_track_axis_order)
    found3 = _streak_any(ring3, cfg.streak3_min, cfg.streak3_max)
    ring4 = _gather_ring(sae, x, y, CIRCLE4, cfg.group_track_axis_order)
    found4 = _streak_any(ring4, cfg.streak4_min, cfg.streak4_max)
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
