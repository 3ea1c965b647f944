"""Reduction microbenchmark — the app-F reduce benchmark, TPU-native.

Reference: event-cam-pre-processing-opencl/event-cam-sampling/
metavision_sdk_get_started5_opencl_reduce.cpp:166-575 runs `reduction_scalar`
(local-memory halving tree, assign_to_centers.cl:121-140) and a float4
`reduction_vector` per 16384-event slice, checking GPU sums against a CPU loop
within 1% ("Check passed", :487-497). On TPU the whole kernel collapses into
jnp.sum; this microbench keeps the correctness check and reports bandwidth.
"""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

import evflow_tpu
evflow_tpu.setup_cache()


def main():
    for n in (16384, 1 << 20, 1 << 24):
        data = np.arange(n, dtype=np.float32)
        x = jnp.asarray(data)
        f = jax.jit(jnp.sum)
        jax.block_until_ready(f(x))
        best = 1e9
        for _ in range(10):
            t0 = time.perf_counter()
            s = f(x)
            jax.block_until_ready(s)
            best = min(best, time.perf_counter() - t0)
        actual = 1.0 * n / 2 * (n - 1)
        ok = abs(float(s) - actual) <= 0.01 * abs(actual)
        gbps = n * 4 / best / 1e9
        print(f"n={n}: sum={float(s):.6g} expected={actual:.6g} "
              f"{'Check passed' if ok else 'Check failed'}  "
              f"{best*1e6:.1f} µs  {gbps:.1f} GB/s")


if __name__ == "__main__":
    main()
