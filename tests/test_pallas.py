"""Pallas kernels vs their jnp oracles (interpret mode on CPU; the same
kernels compile for TPU via the default path)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evflow_tpu.ops import pallas_kernels as pk
from evflow_tpu.ops import sae as sae_ops
from evflow_tpu.config import SensorConfig


def test_assign_manhattan_matches_reference():
    rng = np.random.default_rng(0)
    n, c = 4096, 128
    x = jnp.asarray(rng.integers(0, 1280, n), jnp.int32)
    y = jnp.asarray(rng.integers(0, 720, n), jnp.int32)
    mu = jnp.asarray(rng.random((c, 2)) * 800, jnp.float32)
    alive = jnp.asarray(rng.random(c) > 0.4)
    labels, dists = pk.assign_manhattan(x, y, mu, alive.astype(jnp.int32),
                                        40.0, tile_n=1024, interpret=True)
    ref_l, ref_d = pk.assign_manhattan_reference(x, y, mu,
                                                 alive.astype(jnp.int32), 40.0)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(ref_l))
    np.testing.assert_allclose(np.asarray(dists), np.asarray(ref_d), rtol=1e-6)


def test_assign_manhattan_no_alive():
    n, c = 1024, 16
    x = jnp.zeros((n,), jnp.int32)
    y = jnp.zeros((n,), jnp.int32)
    mu = jnp.zeros((c, 2), jnp.float32)
    alive = jnp.zeros((c,), jnp.int32)
    labels, _ = pk.assign_manhattan(x, y, mu, alive, 40.0, tile_n=512,
                                    interpret=True)
    assert np.all(np.asarray(labels) == -1)


# A Pallas SAE scatter-max was removed: Mosaic cannot lower per-event scalar
# stores to VMEM on real TPUs (see ops/pallas_kernels.py). The XLA scatter in
# ops/sae.py is the TPU formulation and is oracle-tested in test_ops.py.
