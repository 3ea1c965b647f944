"""Device-mesh construction for spatio-temporal event tiling.

The reference's "distributed backend" is a single OpenCL command queue
(SURVEY §5: clCreateCommandQueue, …store.cpp:277) — no multi-device anything.
Here the stream is partitioned spatially (tile axis, ICI collectives) and
temporally (data axis across hosts/DCN), per the BASELINE.json north star.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ParallelConfig


def make_tile_mesh(n_tiles: Optional[int] = None,
                   cfg: ParallelConfig = ParallelConfig()) -> Mesh:
    """1-D mesh over the tile axis (single-host ICI)."""
    devs = jax.devices()
    n = n_tiles or len(devs)
    return jax.make_mesh((n,), (cfg.tile_axis,), devices=devs[:n])


def make_grid_mesh(n_data: int, n_tiles: int,
                   cfg: ParallelConfig = ParallelConfig()) -> Mesh:
    """(data, tile) mesh: time windows over hosts/DCN, tiles over ICI."""
    return jax.make_mesh((n_data, n_tiles), (cfg.data_axis, cfg.tile_axis))


def make_data_mesh(n_data: int,
                   cfg: ParallelConfig = ParallelConfig()) -> Mesh:
    """1-D mesh over the data (time-window) axis — used by the exact-engine
    temporal pipeline, which has no spatial tiling (the per-event deque
    semantics are order-sensitive; see temporal.make_temporal_exact_pipeline)."""
    devs = jax.devices()
    return jax.make_mesh((n_data,), (cfg.data_axis,), devices=devs[:n_data])


def tile_sharding(mesh: Mesh, cfg: ParallelConfig = ParallelConfig()):
    """Leading-axis sharding over tiles."""
    return NamedSharding(mesh, P(cfg.tile_axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (jax.distributed). No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
