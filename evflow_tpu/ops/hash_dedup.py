"""Hash-grid event dedup/downsampling — TPU-native coordinate_processor.cl.

The reference kernel (event-cam-pre-processing-opencl/event-cam-sampling/
build/coordinate_processor.cl:1-89) hashes each (x,y) into 8192 local-memory
buckets with `(x*1619 + y*31) % 8192` and atomically appends the first occupant
of each bucket to `unique_coords`; the second occupant of a bucket increments
`repeated_count`. Collisions alias distinct pixels, so the dedup is
*approximate* (SURVEY §2.5), and the GPU's append order is nondeterministic.

TPU formulation: no atomics. First-occupancy is a segment-min over event
indices keyed by bucket; compaction is a cumsum + scatter. Output order is
*stream order* (deterministic) rather than the GPU's race order — a strict
improvement that callers may rely on. `exact=True` keys on the true pixel id
(y*width + x) instead of the lossy hash, matching the CPU oracle
`analyzeCoordinates` (group_track.cpp:648-700).

All functions are jit/vmap-friendly: fixed shapes, masked invalid lanes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DedupConfig, SensorConfig


class DedupResult(NamedTuple):
    unique_x: jnp.ndarray       # int32 (N,) compacted unique xs (stream order)
    unique_y: jnp.ndarray       # int32 (N,) compacted unique ys
    unique_mask: jnp.ndarray    # bool  (N,) per-input-event first-occupant flag
    unique_count: jnp.ndarray   # int32 ()   number of unique coordinates
    repeated_count: jnp.ndarray # int32 ()   buckets with >=2 occupants


def hash_coordinate(x: jnp.ndarray, y: jnp.ndarray, cfg: DedupConfig) -> jnp.ndarray:
    """(x*1619 + y*31) % 8192 — coordinate_processor.cl:12."""
    return (x * cfg.hash_mul_x + y * cfg.hash_mul_y) % cfg.num_buckets


def _keys(x, y, valid, cfg: DedupConfig, sensor: SensorConfig):
    if cfg.exact:
        # width+1 stride: the reference's inclusive range check (cl:56) admits
        # x == width, which must not alias pixel (0, y+1)
        nkeys = (sensor.width + 1) * (sensor.height + 1)
        key = y * (sensor.width + 1) + x
    else:
        nkeys = cfg.num_buckets
        key = hash_coordinate(x, y, cfg)
    # Reference validates 0<=x<=1280, 0<=y<=720 (cl:56) — inclusive bounds, a
    # quirk (admits x==width). We gate on the supplied valid mask plus the same
    # inclusive check for parity.
    in_range = (x >= 0) & (x <= sensor.width) & (y >= 0) & (y <= sensor.height)
    ok = valid & in_range
    key = jnp.where(ok, key, nkeys)  # park invalid lanes in an overflow bucket
    return key, nkeys, ok


def dedup(
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: DedupConfig = DedupConfig(),
    sensor: SensorConfig = SensorConfig(),
) -> DedupResult:
    """Deduplicate one slice of events. Shapes: x, y, valid are (N,)."""
    n = x.shape[0]
    m = dedup_mask(x, y, valid, cfg, sensor)
    unique_mask, unique_count, repeated_count = m

    # Order-preserving compaction of unique coordinates.
    pos = jnp.cumsum(unique_mask.astype(jnp.int32)) - 1
    scatter_pos = jnp.where(unique_mask, pos, n - 1)  # parked writes are masked
    ux = jnp.zeros((n,), jnp.int32).at[scatter_pos].set(
        jnp.where(unique_mask, x, 0), mode="drop")
    uy = jnp.zeros((n,), jnp.int32).at[scatter_pos].set(
        jnp.where(unique_mask, y, 0), mode="drop")
    # The parked slot (n-1) may hold garbage from masked writes unless a real
    # unique landed there; zero it when it is beyond unique_count.
    lane = jnp.arange(n, dtype=jnp.int32)
    live = lane < unique_count
    ux = jnp.where(live, ux, 0)
    uy = jnp.where(live, uy, 0)
    return DedupResult(ux, uy, unique_mask, unique_count, repeated_count)


class DedupMask(NamedTuple):
    unique_mask: jnp.ndarray    # bool  (N,) per-input-event first-occupant flag
    unique_count: jnp.ndarray   # int32 ()
    repeated_count: jnp.ndarray # int32 ()


def dedup_mask(
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: DedupConfig = DedupConfig(),
    sensor: SensorConfig = SensorConfig(),
) -> DedupMask:
    """Compaction-free dedup: same first-occupant semantics as `dedup` but
    returns only the per-event mask — for consumers that mask lanes anyway
    (the fast cluster pipeline), skipping the two compaction scatters."""
    n = x.shape[0]
    key, nkeys, ok = _keys(x, y, valid, cfg, sensor)
    idx = jnp.arange(n, dtype=jnp.int32)

    # Sort-based first-occupant (r2): sorting (key, lane) puts each bucket's
    # lowest lane first, so run starts ARE the scatter-min winners — one sort
    # + one permutation scatter instead of scatter-min + gather + segment_sum
    # (bit-identical; 0.94 vs 1.34 ms/slice measured, benchmarks/prof_dedup).
    # r4b: when (nkeys+1)*n fits int32 (the 8192-bucket hash always does),
    # pack (key, lane) into ONE int32 key*n + lane — identical order, half
    # the sort operand traffic and one comparator column instead of two.
    if (nkeys + 1) * n <= 2**31:
        packed = key * n + idx
        sp = jax.lax.sort(packed)
        sk = sp // n
        sl = sp - sk * n
    else:
        sk, sl = jax.lax.sort((key, idx), num_keys=2)
    first = jnp.concatenate([jnp.array([True]), sk[1:] != sk[:-1]]) \
        & (sk < nkeys)                  # key == nkeys marks invalid lanes
    unique_mask = jnp.zeros((n,), bool).at[sl].set(first)
    unique_count = jnp.sum(first.astype(jnp.int32))
    # buckets hit >= twice: a run start whose successor shares the key
    run2 = first & jnp.concatenate([sk[1:] == sk[:-1], jnp.array([False])])
    repeated_count = jnp.sum(run2.astype(jnp.int32))
    return DedupMask(unique_mask, unique_count, repeated_count)


def dedup_batched(x, y, valid, cfg: DedupConfig = DedupConfig(),
                  sensor: SensorConfig = SensorConfig()) -> DedupResult:
    """vmap over slices: inputs (S, N)."""
    fn = functools.partial(dedup, cfg=cfg, sensor=sensor)
    return jax.vmap(fn)(x, y, valid)


def dedup_sorted(
    x: jnp.ndarray,
    y: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: DedupConfig = DedupConfig(),
    sensor: SensorConfig = SensorConfig(),
) -> DedupResult:
    """Sort-based variant of `dedup` (same semantics, different cost profile).

    Sorts (key, idx) pairs; a lane is unique if it is the first of its key run
    and its index is the minimal index in the run. Useful when N >> buckets.
    """
    n = x.shape[0]
    key, nkeys, ok = _keys(x, y, valid, cfg, sensor)
    idx = jnp.arange(n, dtype=jnp.int32)
    # Sort by (key, idx): stable order inside each bucket.
    skey, sidx = jax.lax.sort((key, idx), num_keys=2)
    first_of_run = jnp.concatenate([jnp.array([True]), skey[1:] != skey[:-1]])
    winner_sorted = first_of_run & (skey < nkeys)
    # Map back to original order.
    unique_mask = jnp.zeros((n,), bool).at[sidx].set(winner_sorted)
    unique_mask = unique_mask & ok

    run_len = jax.ops.segment_sum(jnp.ones_like(idx), skey, num_segments=nkeys + 1)
    repeated_count = jnp.sum((run_len[:nkeys] >= 2).astype(jnp.int32))

    pos = jnp.cumsum(unique_mask.astype(jnp.int32)) - 1
    unique_count = jnp.sum(unique_mask.astype(jnp.int32))
    scatter_pos = jnp.where(unique_mask, pos, n - 1)
    ux = jnp.zeros((n,), jnp.int32).at[scatter_pos].set(
        jnp.where(unique_mask, x, 0), mode="drop")
    uy = jnp.zeros((n,), jnp.int32).at[scatter_pos].set(
        jnp.where(unique_mask, y, 0), mode="drop")
    lane = jnp.arange(n, dtype=jnp.int32)
    live = lane < unique_count
    return DedupResult(jnp.where(live, ux, 0), jnp.where(live, uy, 0),
                       unique_mask, unique_count, repeated_count)


def dedup_reference_numpy(xs, ys, cfg: DedupConfig = DedupConfig(),
                          sensor: SensorConfig = SensorConfig()):
    """CPU-exact oracle mirroring the sequential semantics of the OpenCL kernel
    run with deterministic (stream) ordering. Returns (unique_list, repeated)."""
    import numpy as np

    buckets = {}
    uniques = []
    repeated = 0
    for x, y in zip(np.asarray(xs).tolist(), np.asarray(ys).tolist()):
        if not (0 <= x <= sensor.width and 0 <= y <= sensor.height):
            continue
        if cfg.exact:
            h = y * sensor.width + x
        else:
            h = (x * cfg.hash_mul_x + y * cfg.hash_mul_y) % cfg.num_buckets
        c = buckets.get(h, 0)
        if c == 0:
            uniques.append((x, y))
        elif c == 1:
            repeated += 1
        buckets[h] = c + 1
    return uniques, repeated
