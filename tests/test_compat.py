"""Compat-mode tests — the reference's behavioral quirks, config-gated
(SURVEY §2.5)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from evflow_tpu.config import (DEFAULT, DedupConfig, EngineConfig, ClusterConfig,
                               KMeansConfig, SensorConfig)
from evflow_tpu.models import pipeline, fastcluster
from evflow_tpu.models.kmeans import compat_labels
from evflow_tpu.ops import hash_dedup


def test_stride2_consumes_every_second_unique():
    """accel …store.cpp:435-445 strides by 4 over the interleaved unique array,
    i.e. consumes every 2nd unique coordinate."""
    import dataclasses
    cfg = dataclasses.replace(DEFAULT, dedup=DedupConfig(compat_stride2=True),
                              cluster=ClusterConfig(radius=40.0, min_n=5,
                                                    max_clusters=32))
    rng = np.random.default_rng(0)
    n = 2048
    x = jnp.asarray(rng.integers(100, 140, n), jnp.int32)
    y = jnp.asarray(rng.integers(100, 140, n), jnp.int32)
    state = fastcluster.init_state(cfg.cluster)
    state, out = pipeline.cluster_flow_step(state, x, y, jnp.ones(n, bool), cfg)
    # cluster membership counts only every 2nd unique coordinate
    uc = int(out.unique_count)
    n_used = int(np.asarray(out.n).sum())
    assert n_used == (uc + 1) // 2


def test_hash_bucket_saturation():
    """At most num_buckets unique coordinates can survive (cl:12 aliasing)."""
    rng = np.random.default_rng(1)
    n = 16384
    x = jnp.asarray(rng.integers(0, 1280, n), jnp.int32)
    y = jnp.asarray(rng.integers(0, 720, n), jnp.int32)
    res = hash_dedup.dedup(x, y, jnp.ones(n, bool), DedupConfig(num_buckets=512))
    assert int(res.unique_count) <= 512


def test_kmeans_compat_bytepair_labels():
    labels = jnp.asarray([0, 3, 7, -1], jnp.int32)
    np.testing.assert_array_equal(np.asarray(compat_labels(labels)),
                                  [0, 6, 14, 255])


def test_inclusive_range_quirk():
    """cl:56 validates x<=width (inclusive) — x==1280 is admitted."""
    x = jnp.asarray([1280, 1281], jnp.int32)
    y = jnp.asarray([10, 10], jnp.int32)
    res = hash_dedup.dedup(x, y, jnp.ones(2, bool))
    assert int(res.unique_count) == 1  # 1280 kept, 1281 rejected
