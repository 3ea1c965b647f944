"""Test harness.

Tests run on the CPU backend by default: results are bit-identical to TPU for
these integer/float32 kernels, XLA:CPU compiles the big pipeline graphs ~100x
faster than the remote TPU compiler, and an 8-virtual-device host platform
exercises the sharding paths. Set EVFLOW_TEST_TPU=1 to run the suite on the
attached TPU instead (the benchmark and __graft_entry__ always use the TPU).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

if not os.environ.get("EVFLOW_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import evflow_tpu
evflow_tpu.setup_cache()   # machine-keyed dir (cross-machine AOT mismatch spew)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


DATA_DIR = os.path.join(os.path.dirname(__file__), "data")
