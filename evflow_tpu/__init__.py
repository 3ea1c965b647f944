"""evflow-tpu: TPU-native event-camera clustering & optical-flow engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
LogicTronixInc/Event-Camera-Clustering-and-Optical-Flow-Estimation:
hash-grid event downsampling, k-means / OPTICS / DBSCAN / async-incremental
clustering over event point clouds, SAE time surfaces with eFAST corner
detection, and Luenberger-style corner tracking producing optical-flow output —
one engine of pure jitted stages over fixed-shape event tensors, sharded over
device meshes via shard_map, instead of eight OpenCL/C++ monoliths.
"""

from . import config
from .config import EngineConfig, DEFAULT

__version__ = "0.1.0"
