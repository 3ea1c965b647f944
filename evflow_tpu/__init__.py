"""evflow-tpu: TPU-native event-camera clustering & optical-flow engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
LogicTronixInc/Event-Camera-Clustering-and-Optical-Flow-Estimation:
hash-grid event downsampling, k-means / OPTICS / DBSCAN / async-incremental
clustering over event point clouds, SAE time surfaces with eFAST corner
detection, and Luenberger-style corner tracking producing optical-flow output —
one engine of pure jitted stages over fixed-shape event tensors, sharded over
device meshes via shard_map, instead of eight OpenCL/C++ monoliths.
"""

import os as _os

from . import config
from .config import EngineConfig, DEFAULT

__version__ = "0.1.0"


def setup_cache(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache (first compiles of the
    bigger pipeline graphs take minutes; cached reloads take seconds)."""
    import jax

    if cache_dir is None:
        cache_dir = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
