"""Checkpoint/resume for long event streams.

The reference has none (SURVEY §5: closest artifacts are per-frame JPEG dumps).
Streams are long-running; the engine's recurrent states (cluster sets, tracker
tracks, SAE surface) are flat pytrees of arrays, so checkpointing is a plain
npz round-trip keyed by field path — no framework dependency, restartable
mid-stream. Orbax is available in the image for sharded multi-host
checkpoints; use `save_orbax/restore_orbax` when running on a mesh.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import jax


def _flatten(tree: Any):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_npz(path: str, tree: Any, meta: dict | None = None) -> None:
    leaves, _ = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    if meta:
        for k, v in meta.items():
            arrays[f"meta_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_meta(path: str) -> dict:
    """The meta_* scalars stored alongside a save_npz checkpoint (e.g. the
    stream's t0 time rebase for the corner pipeline's SAE)."""
    with np.load(path) as z:
        return {k[len("meta_"):]: z[k] for k in z.files if k.startswith("meta_")}


def restore_npz(path: str, template: Any) -> Any:
    leaves, treedef = _flatten(template)
    with np.load(path) as z:
        new_leaves = []
        for i, l in enumerate(leaves):
            a = z[f"leaf_{i}"]
            assert a.shape == tuple(np.shape(l)), \
                f"leaf {i}: checkpoint shape {a.shape} != template {np.shape(l)}"
            new_leaves.append(a.astype(np.asarray(l).dtype))
    return jax.tree.unflatten(treedef, new_leaves)


def save_orbax(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def restore_orbax(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
