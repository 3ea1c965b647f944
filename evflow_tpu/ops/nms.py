"""Corner non-maximum suppression — CornerFilter box filter.

Reference (metavision_time_surface_periodic_group_track.cpp:81-152): greedy
first-come suppression over the detection list — accept a corner iff no pixel
of its box ([cx±box/2, cy±box/2]) is marked in the CV_8UC1 mask, where accepted
corners paint their own (border-clipped) boxes; accepted labels are the
acceptance order. Two half-size boxes of in-image corners intersect (even after
border clipping) iff |dx|<=2*half && |dy|<=2*half, so the suppression predicate
is box-box intersection.

TPU formulation: the greedy result is the unique fixpoint of
    accepted[i] = NOT any(j < i, accepted[j], |xi-xj|<=2*half, |yi-yj|<=2*half)
which we reach by damped iteration inside a lax.while_loop (converges in at
most the suppression-chain depth; each sweep is one (C, C) masked reduction).
Candidate capacity is fixed; membership is masked.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NMSConfig


class NMSResult(NamedTuple):
    x: jnp.ndarray        # int32 (C,) accepted corners, compacted in order
    y: jnp.ndarray        # int32 (C,)
    label: jnp.ndarray    # int32 (C,) acceptance order (= position)
    count: jnp.ndarray    # int32 ()
    accepted: jnp.ndarray # bool (C,) per-candidate accept flag (input order)


def accept_corners(
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: NMSConfig = NMSConfig(),
    immune_x: jnp.ndarray | None = None,
    immune_y: jnp.ndarray | None = None,
    immune_valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy accept mask only — `filter_corners` without the output
    compaction. Returns (accepted bool (C,), count int32 ()). The single-
    device pipeline feeds the tracker the accepted CANDIDATE lanes directly
    (association/spawn/grouping are det-lane-order independent given the
    mask, and lane order preserves stream order), skipping the cumsum + two
    scatters per slice (r4b)."""
    c = x.shape[0]
    half = cfg.box_size // 2
    xf = x.astype(jnp.int32)
    yf = y.astype(jnp.int32)

    dx = jnp.abs(xf[:, None] - xf[None, :])
    dy = jnp.abs(yf[:, None] - yf[None, :])
    overlap = (dx <= 2 * half) & (dy <= 2 * half)
    earlier = jnp.arange(c)[:, None] > jnp.arange(c)[None, :]  # j < i
    both = valid[:, None] & valid[None, :]
    sup = overlap & earlier & both  # sup[i, j]: accepted j would suppress i

    base_ok = valid
    if immune_x is not None:
        pdx = jnp.abs(xf[:, None] - immune_x.astype(jnp.int32)[None, :])
        pdy = jnp.abs(yf[:, None] - immune_y.astype(jnp.int32)[None, :])
        hit = jnp.any((pdx <= 2 * half) & (pdy <= 2 * half)
                      & immune_valid[None, :], axis=1)
        base_ok = valid & ~hit

    def body(state):
        acc, _ = state
        new_acc = base_ok & ~jnp.any(sup & acc[None, :], axis=1)
        return new_acc, jnp.any(new_acc != acc)

    acc, _ = jax.lax.while_loop(lambda st: st[1], body,
                                (base_ok, jnp.array(True)))
    return acc, jnp.sum(acc.astype(jnp.int32))


def filter_corners(
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: NMSConfig = NMSConfig(),
    immune_x: jnp.ndarray | None = None,
    immune_y: jnp.ndarray | None = None,
    immune_valid: jnp.ndarray | None = None,
) -> NMSResult:
    """Greedy first-come box suppression over candidates in input order.

    x, y, valid: (C,). C is the fixed candidate capacity.

    immune_*: optional ALREADY-ACCEPTED corners that precede every candidate
    in greedy order — they suppress overlapping candidates but are not
    re-filtered or emitted. Used by the tile-parallel corner path: a tile's
    candidates follow its left neighbor's in tile-major order, and only the
    neighbor's accepted right-boundary strip can reach them (box overlap),
    so passing that strip as immune reproduces the full greedy result
    exactly (parallel/tiling.py).

    Implemented as `accept_corners` (the single home of the suppression
    fixpoint) followed by output compaction.
    """
    c = x.shape[0]
    xf = x.astype(jnp.int32)
    yf = y.astype(jnp.int32)
    acc, count = accept_corners(x, y, valid, cfg,
                                immune_x=immune_x, immune_y=immune_y,
                                immune_valid=immune_valid)
    # r5: sort-based stream-order output compaction (the r4b idiom) in
    # place of cumsum + two drop-scatters
    lane = jnp.arange(c, dtype=jnp.int32)
    key = jnp.where(acc, lane, jnp.int32(c))
    _, ox, oy = jax.lax.sort((key, xf, yf), num_keys=1)
    live = lane < count
    ox = jnp.where(live, ox, 0)
    oy = jnp.where(live, oy, 0)
    return NMSResult(ox, oy, jnp.where(live, lane, -1), count, acc)


def filter_corners_reference_numpy(xs, ys, width, height,
                                   cfg: NMSConfig = NMSConfig()):
    """Mask-based oracle transliterating CornerFilter::filterCorners."""
    mask = np.zeros((height, width), dtype=np.uint8)
    half = cfg.box_size // 2
    out = []
    for x, y in zip(np.asarray(xs).tolist(), np.asarray(ys).tolist()):
        sx, ex = max(0, x - half), min(width - 1, x + half)
        sy, ey = max(0, y - half), min(height - 1, y + half)
        if np.any(mask[sy:ey + 1, sx:ex + 1] > 0):
            continue
        out.append((x, y))
        mask[sy:ey + 1, sx:ex + 1] = 255
    return out
