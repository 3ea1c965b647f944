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


def _sliding_axis0(x: jnp.ndarray, length: int, op) -> jnp.ndarray:
    """_sliding along axis 0 (for (R, H, W) ring planes)."""
    w = x.shape[0]
    assert 1 <= length <= w, (length, w)
    p, cur = 1, x
    while 2 * p <= length:
        cur = op(cur[:-p], cur[p:])
        p *= 2
    out_w = w - length + 1
    if p < length:
        cur = op(cur[:out_w], cur[length - p:length - p + out_w])
    else:
        cur = cur[:out_w]
    return cur


def _streak_any_planes(rg: jnp.ndarray, smin: int, smax: int) -> jnp.ndarray:
    """_streak_any evaluated densely: rg is (R, H, W) ring planes (rg[i][y, x]
    = sae[y + dy_i, x + dx_i]); returns (H, W) bool."""
    r = rg.shape[0]
    assert 1 <= smin <= smax < r, (smin, smax, r)
    rg2 = jnp.concatenate([rg, rg], axis=0)
    cond1 = rg >= jnp.concatenate([rg[-1:], rg[:-1]], axis=0)
    found = jnp.zeros(rg.shape[1:], bool)
    for s in range(smin, smax + 1):
        arc_min = _sliding_axis0(rg2, s, jnp.minimum)[:r]
        off_max = _sliding_axis0(rg2, r - s, jnp.maximum)[s:s + r]
        cond2 = rg2[s - 1:s - 1 + r] >= rg2[s:s + r]
        ok = cond1 & cond2 & (off_max < arc_min)
        found = found | jnp.any(ok, axis=0)
    return found


def corner_mask_dense(sae: jnp.ndarray, cfg: EFastConfig = EFastConfig(),
                      sensor: SensorConfig = SensorConfig()) -> jnp.ndarray:
    """Dense eFAST: the corner mask for EVERY pixel of the SAE at once.

    Instead of gathering 36 ring pixels per candidate (descriptor-rate-bound
    on the TPU gather unit — ops/efast.py:_gather_rings_block), build each
    ring position as a SHIFTED COPY of the whole SAE plane and evaluate the
    streak tests as elementwise reductions over (R, H, W) panels — zero
    gathers, pure VPU work proportional to the image, independent of the
    candidate count. At 8192 candidates/slice this wins outright (measured,
    benchmarks/prof_efast.py); candidates then just look up mask[y, x].
    Border pixels (< cfg.border from any edge) are False, matching
    detect_corners' candidacy gate. Bit-identical streak semantics — the
    plane ops are the same _streak_any reductions transposed."""
    dyx = np.concatenate([CIRCLE3, CIRCLE4])
    dy = dyx[:, 0].copy()
    dx = dyx[:, 1].copy()
    if not cfg.group_track_axis_order:
        dy, dx = dx, dy
    h, w = sae.shape
    # plane i holds sae[y + dy_i, x + dx_i]; borders masked below so the
    # roll wrap never reaches a reported pixel
    planes = jnp.stack([jnp.roll(sae, (-int(a), -int(b)), (0, 1))
                        for a, b in zip(dy, dx)])
    n3 = len(CIRCLE3)
    found3 = _streak_any_planes(planes[:n3], cfg.streak3_min, cfg.streak3_max)
    found4 = _streak_any_planes(planes[n3:], cfg.streak4_min, cfg.streak4_max)
    cs = cfg.border
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    in_b = (xx >= cs) & (xx < sensor.width - cs) & (yy >= cs) \
        & (yy < sensor.height - cs)
    return found3 & found4 & in_b


def _band_mask(slab: jnp.ndarray, bh: int, w: int, cfg: EFastConfig):
    """eFAST mask for one y-band from its (bh+8, w+8) halo slab: all 36 ring
    planes are STATIC slices of the slab (no gathers, no rolls), the streak
    tests elementwise reductions over them. Shared by the banded-XLA and
    Pallas dense detectors."""
    dyx = np.concatenate([CIRCLE3, CIRCLE4])
    dy = dyx[:, 0].copy()
    dx = dyx[:, 1].copy()
    if not cfg.group_track_axis_order:
        dy, dx = dx, dy
    planes = jnp.stack([
        jax.lax.slice(slab, (4 + int(a), 4 + int(b)),
                      (4 + int(a) + bh, 4 + int(b) + w))
        for a, b in zip(dy, dx)])
    n3 = len(CIRCLE3)
    f3 = _streak_any_planes(planes[:n3], cfg.streak3_min, cfg.streak3_max)
    f4 = _streak_any_planes(planes[n3:], cfg.streak4_min, cfg.streak4_max)
    return f3 & f4


def corner_mask_dense_banded(sae: jnp.ndarray,
                             cfg: EFastConfig = EFastConfig(),
                             sensor: SensorConfig = SensorConfig(),
                             band: int = 8) -> jnp.ndarray:
    """corner_mask_dense evaluated in y-bands via lax.map so intermediates
    stay band-sized (the whole-image plane stack is HBM-bound: measured
    20.8 ms vs 1.0 ms banded, benchmarks/prof_efast.py)."""
    h, w = sae.shape
    assert h % band == 0, (h, band)
    pad = jnp.pad(sae, ((4, 4), (4, 4)))

    def one(i):
        slab = jax.lax.dynamic_slice(pad, (i * band, 0), (band + 8, w + 8))
        return _band_mask(slab, band, w, cfg)

    mask = jax.lax.map(one, jnp.arange(h // band)).reshape(h, w)
    cs = cfg.border
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    in_b = (xx >= cs) & (xx < sensor.width - cs) & (yy >= cs) \
        & (yy < sensor.height - cs)
    return mask & in_b


def corner_mask_dense_pallas(sae: jnp.ndarray,
                             cfg: EFastConfig = EFastConfig(),
                             sensor: SensorConfig = SensorConfig(),
                             band: int = 8,
                             interpret: bool = False) -> jnp.ndarray:
    """Pallas dense eFAST (VERDICT r2 item 6): one fused kernel per y-band —
    the padded SAE resident in VMEM, ring planes as in-register static
    slices, streak masks as fused VPU reductions, one (band, W) int32 mask
    write per grid step. Zero HBM round-trips for intermediates by
    construction (the property the XLA whole-image form lacks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = sae.shape
    assert h % band == 0, (h, band)
    pad = jnp.pad(sae, ((4, 4), (4, 4)))

    def kernel(sae_ref, out_ref):
        i = pl.program_id(0)
        slab = sae_ref[pl.ds(i * band, band + 8), :]
        out_ref[:] = _band_mask(slab, band, w, cfg).astype(jnp.int32)

    mask = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        grid=(h // band,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((band, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pad)
    cs = cfg.border
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    in_b = (xx >= cs) & (xx < sensor.width - cs) & (yy >= cs) \
        & (yy < sensor.height - cs)
    return (mask != 0) & in_b


def corner_mask_dense_pallas_sparse(sae: jnp.ndarray, active: jnp.ndarray,
                                    cfg: EFastConfig = EFastConfig(),
                                    sensor: SensorConfig = SensorConfig(),
                                    band: int = 24,
                                    interpret: bool = False) -> jnp.ndarray:
    """corner_mask_dense_pallas with per-band predication: bands whose
    `active` flag is False write zeros and SKIP the stencil (event slices
    touch a minority of y-bands on typical scenes — detection only consults
    the mask at touched pixels, so inactive bands never need computing;
    their rows come back 0). active: (H // band,) bool."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = sae.shape
    assert h % band == 0, (h, band)
    nb = h // band
    pad = jnp.pad(sae, ((4, 4), (4, 4)))
    act = active.astype(jnp.int32).reshape(nb, 1)

    def kernel(act_ref, sae_ref, out_ref):
        i = pl.program_id(0)

        @pl.when(act_ref[i, 0] != 0)
        def _():
            slab = sae_ref[pl.ds(i * band, band + 8), :]
            out_ref[:] = _band_mask(slab, band, w, cfg).astype(jnp.int32)

        @pl.when(act_ref[i, 0] == 0)
        def _():
            out_ref[:] = jnp.zeros((band, w), jnp.int32)

    mask = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((band, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(act, pad)
    cs = cfg.border
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    in_b = (xx >= cs) & (xx < sensor.width - cs) & (yy >= cs) \
        & (yy < sensor.height - cs)
    return (mask != 0) & in_b


def corner_mask_dense_pallas_sparse2(sae: jnp.ndarray, active: jnp.ndarray,
                                     cfg: EFastConfig = EFastConfig(),
                                     sensor: SensorConfig = SensorConfig(),
                                     band: int = 24, wtile: int = 128,
                                     interpret: bool = False) -> jnp.ndarray:
    """2-D-tile-predicated dense stencil (r4): corner_mask_dense_pallas with
    per-(y-band × x-tile) predication instead of whole rows — event slices
    touch a minority of x-tiles within each active band (a blob spans ~1-2
    of 10 column tiles), so the 1-D band predication still paid for the full
    1280-px width per active band. active: (H//band, W//wtile) bool.

    Column halos without pre-gathered windows (r4b): the grid stays 1-D over
    y-bands with the whole padded SAE resident in VMEM (as the 1-D kernel);
    the column tiles are a STATIC Python unroll inside the kernel — tile j's
    (band+8, wtile+8) halo slab is a static column slice of the band slab
    (dynamic lane slicing is Mosaic-hostile, static slicing is free), each
    wrapped in its own pl.when. An earlier revision pre-gathered overlapping
    windows XLA-side (~5 MB of takes per call), which cost about what the
    skipped stencil work saved. Detection only consults the mask at touched
    pixels, whose tiles are active by construction, so results are
    bit-identical to the full mask."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = sae.shape
    assert h % band == 0 and w % wtile == 0, (h, w, band, wtile)
    nb, nwt = h // band, w // wtile
    pad = jnp.pad(sae, ((4, 4), (4, 4)))
    act = active.astype(jnp.int32)

    def kernel(act_ref, sae_ref, out_ref):
        i = pl.program_id(0)
        for j in range(nwt):
            @pl.when(act_ref[i, j] != 0)
            def _(j=j):
                # tile slab read INSIDE the predicate (dynamic sublane
                # offset + static lane slice — both Mosaic-friendly), so a
                # fully-inactive band reads nothing
                tile = sae_ref[pl.ds(i * band, band + 8),
                               j * wtile:j * wtile + wtile + 8]
                out_ref[:, j * wtile:(j + 1) * wtile] = _band_mask(
                    tile, band, wtile, cfg).astype(jnp.int32)

            @pl.when(act_ref[i, j] == 0)
            def _(j=j):
                out_ref[:, j * wtile:(j + 1) * wtile] = jnp.zeros(
                    (band, wtile), jnp.int32)

    mask = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((band, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(act, pad)
    cs = cfg.border
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    in_b = (xx >= cs) & (xx < sensor.width - cs) & (yy >= cs) \
        & (yy < sensor.height - cs)
    return (mask != 0) & in_b


def _pick_band(h: int) -> int:
    """Largest divisor of h in the measured-good band range (VMEM-bounded
    above ~24 at W=1280; Mosaic failed at 40)."""
    for b in (24, 20, 16, 12, 10, 8, 6, 5, 4):
        if h % b == 0:
            return b
    return 0


def detect_corners_dense(sae, ev_y, ev_valid, x, y, valid,
                         cfg: EFastConfig = EFastConfig(),
                         sensor: SensorConfig = SensorConfig(),
                         ev_x=None) -> jnp.ndarray:
    """Dense-backend detection: build the per-tile corner mask once from the
    activity events (ev_x/ev_y/ev_valid), then look candidates up. The
    activity set need NOT be all events — the contract is only that every
    tile containing a consulted candidate pixel is active. Passing the
    candidates themselves as the activity set (r4b pipeline) satisfies this
    by construction and shrinks the activity scatter. Returns the (N,)
    corner mask for (x, y, valid) candidates — bit-identical to
    detect_corners (tests/test_ops.py).

    r4: when ev_x is given and W divides into 128-px tiles, predication is
    2-D (y-band × x-tile, corner_mask_dense_pallas_sparse2) — a blob spans
    ~1-2 of 10 column tiles, so the 1-D row predication overcomputed the
    stencil ~4-5x on typical scenes. Without ev_x: 1-D band predication."""
    h, w = sae.shape
    band = _pick_band(h)
    if band == 0:
        return detect_corners(sae, x, y, valid, cfg, sensor)
    nb = h // band
    act = jnp.zeros((nb,), bool).at[
        jnp.clip(ev_y // band, 0, nb - 1)].max(ev_valid, mode="drop")
    if jax.default_backend() != "cpu":   # TPU (this rig's remote platform)
        if ev_x is not None and w % 128 == 0:
            nwt = w // 128
            act2 = jnp.zeros((nb, nwt), bool).at[
                jnp.clip(ev_y // band, 0, nb - 1),
                jnp.clip(ev_x // 128, 0, nwt - 1)].max(ev_valid, mode="drop")
            mask = corner_mask_dense_pallas_sparse2(sae, act2, cfg, sensor,
                                                    band, 128)
        else:
            mask = corner_mask_dense_pallas_sparse(sae, act, cfg, sensor,
                                                   band)
    else:                                # tests: same results via banded XLA
        mask = corner_mask_dense_banded(sae, cfg, sensor, band)
    return mask[y, x] & valid


def detect_corners_stacked(saes: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                           valid: jnp.ndarray,
                           cfg: EFastConfig = EFastConfig(),
                           sensor: SensorConfig = SensorConfig()) -> jnp.ndarray:
    """Batched eFAST over Q surface snapshots at once (r4).

    saes: (Q, H, W) — snapshot q is the SAE after sub-slice q's scatter;
    x/y/valid: (Q, M) — sub-slice q's candidates, detected against snapshot
    q. One gather + ONE streak-test chain for all Q·M candidates instead of
    Q sequential detect_corners calls: the streak reductions are ~100 XLA
    ops regardless of candidate count. NEGATIVE RESULT (r4, kept documented):
    wired into the micro-slice pipeline this measured 3.83 ms/slice at q=8
    vs 3.17 for per-sub detection — materializing the q snapshots through
    the scan outweighs the saved streak chains; the pipeline keeps the
    per-sub path and this op remains available (bit-identical, tested) for
    callers that already hold stacked surfaces. Implementation: view the
    stack as one tall
    (Q·H, W) image and offset each candidate's y by q·H — ring reach (4 px)
    never crosses snapshot boundaries because candidates within `border` of
    an edge are rejected first. Bit-identical to per-sub detect_corners
    (tests/test_ops.py)."""
    q, h, w = saes.shape
    cs = cfg.border
    in_bounds = (x >= cs) & (x < sensor.width - cs) & (y >= cs) \
        & (y < sensor.height - cs)
    cand = valid & in_bounds
    off = (np.arange(q, dtype=np.int32) * h)[:, None]
    tall = saes.reshape(q * h, w)
    xf = x.reshape(-1)
    yf = (y + off).reshape(-1)
    rings = _gather_rings_block(tall, xf, yf,
                                np.concatenate([CIRCLE3, CIRCLE4]),
                                cfg.group_track_axis_order)
    found3 = _streak_any(rings[:, :len(CIRCLE3)], cfg.streak3_min,
                         cfg.streak3_max)
    found4 = _streak_any(rings[:, len(CIRCLE3):], cfg.streak4_min,
                         cfg.streak4_max)
    return cand & (found3 & found4).reshape(q, -1)


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
