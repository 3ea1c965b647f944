import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""A/B the certified gate's panel formulation on TPU (r5): the HIGHEST
6-pass matmul vs the fused diff-form (sum over d of squared differences,
d <= 6 unrolled — both ~2^-19-accurate on this backend, prof gate_probe2).
Variants time the gate alone (sum-consumer) and gate + approx_max_k +
certificate (the real pass-1 shape)."""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from evflow_tpu.io.synthetic import uniform_cloud
from evflow_tpu.models import optics as O

N = 100_000
BLOCK = 2048
K = 64


def drain(x):
    return np.asarray(x.ravel()[:1])


def gate_diff(rows, pts_c, eps):
    d = rows.shape[1]
    d2b = None
    for j in range(d):
        t = (rows[:, j][:, None] - pts_c[:, j][None, :]) ** 2
        d2b = t if d2b is None else d2b + t
    keep = d2b <= eps * eps * jnp.float32(1.0 + 2.0 ** -12)
    cnt = jnp.sum(keep, axis=1).astype(jnp.int32)
    return jnp.where(keep, d2b, jnp.inf), cnt


@functools.partial(jax.jit, static_argnames=("nblocks", "form", "sel"))
def pass1(pts_pad, pts_c, q2, qn, eps, nblocks, form, sel):
    def body(i, acc):
        rows = jax.lax.dynamic_slice_in_dim(pts_pad, i * BLOCK, BLOCK, 0)
        if form == "highest":
            masked, cnt = O._certified_gate(rows, pts_c, q2, qn, eps)
        else:
            masked, cnt = gate_diff(rows, pts_c, eps)
        if sel:
            neg, idx = jax.lax.approx_max_k(-masked, K, recall_target=0.95)
            captured = jnp.sum(jnp.isfinite(-neg), axis=1)
            acc = acc + jnp.sum(idx[:, 0]) + jnp.sum(captured)
        return acc + jnp.sum(cnt)

    return jax.lax.fori_loop(0, nblocks, body, jnp.int32(0))


def main():
    for d in (4, 6):
        pts_np = uniform_cloud(N, d, 1000.0, seed=1)
        eps = O.epsilon_estimation(pts_np, 10)
        pts = jnp.asarray(pts_np, jnp.float32)
        c = jnp.mean(pts, axis=0)
        pts_c = pts - c
        q2 = jnp.sum(pts_c * pts_c, axis=1)[None, :]
        qn = jnp.sqrt(jnp.maximum(q2, 0.0))
        nblocks = -(-N // BLOCK)
        pts_pad = jnp.pad(pts_c, ((0, nblocks * BLOCK - N), (0, 0)),
                          constant_values=jnp.inf)
        for form in ("highest", "diff"):
            for sel in (False, True):
                out = pass1(pts_pad, pts_c, q2, qn, jnp.float32(eps),
                            nblocks, form, sel)
                drain(out)
                t0 = time.perf_counter()
                for _ in range(3):
                    out = pass1(pts_pad, pts_c, q2, qn, jnp.float32(eps),
                                nblocks, form, sel)
                drain(out)
                dt = (time.perf_counter() - t0) / 3
                print(f"d={d} gate={form} +approx={sel}: {dt*1e3:.1f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
