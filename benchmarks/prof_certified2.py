import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Measure the FULL count-certified exact OPTICS path on TPU (r5 task #1).

compute_neighbors_certified end-to-end per call (its internal compacted-row
readbacks and retry rounds are part of the algorithm and are included),
vs the grid path at d<=4 and the reference's exact kd-tree numbers
(BASELINE.md: d=4 378-514 ms, d=6 677-1422 ms at n=100k).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from evflow_tpu.io.synthetic import uniform_cloud
from evflow_tpu.models import optics

N = 100_000
LAPS = 3


@jax.jit
def _gate_panel(rows, pts_c):
    # probes the PRODUCTION gate expression (eps=inf keeps every entry, so
    # the masked panel IS the d2b panel)
    from evflow_tpu.models.optics import _certified_gate
    q2 = jnp.sum(pts_c * pts_c, axis=1)[None, :]
    qn = jnp.sqrt(jnp.maximum(q2, 0.0))
    masked, _ = _certified_gate(rows, pts_c, q2, qn, jnp.float32(np.inf))
    return masked


def gate_soundness(pts_np, d, rows_n=256, cols_n=4096):
    """Max |d2b - d2_f64| / (|r||q|) of the split-bf16 gate ON THIS BACKEND
    — must sit far below the 2^-10 margin (the r5 HIGH-precision incident:
    the requested 3-pass lowering silently wasn't)."""
    c = pts_np.mean(0)
    pc = (pts_np - c).astype(np.float32)
    rows = pc[:rows_n]
    d2b = np.asarray(_gate_panel(jnp.asarray(rows),
                                 jnp.asarray(pc))[:, :cols_n])
    exact = ((rows[:, None, :].astype(np.float64)
              - pc[None, :cols_n].astype(np.float64)) ** 2).sum(-1)
    rq = (np.linalg.norm(rows.astype(np.float64), axis=1)[:, None]
          * np.linalg.norm(pc[:cols_n].astype(np.float64), axis=1)[None, :])
    rel = np.abs(d2b - exact) / np.maximum(rq, 1e-9)
    print(f"  gate soundness d={d}: max_rel_err=2^{np.log2(rel.max()):.1f} "
          f"(margin 2^-13; must be well below)", flush=True)


def main():
    ks = [int(v) for v in (sys.argv[1].split(",") if len(sys.argv) > 1
                           else ["64", "128"])]
    for d in (4, 5, 6):
        pts = uniform_cloud(N, d, 1000.0, seed=1)
        eps = optics.epsilon_estimation(pts, 10)
        print(f"== d={d} eps={eps:.2f} ==", flush=True)
        if "--probe-gate" in sys.argv:
            # NOT in the default run: the (rows, cols) panel readback (even
            # 4 MB) crawls through a degraded relay and can stall the whole
            # job for tens of minutes. Run standalone on a quiet relay.
            gate_soundness(pts.astype(np.float32), d)
        for k in ks:
            stats = {}
            t = optics.compute_neighbors_certified(pts, eps, 10, k,
                                                   _stats=stats)
            np.asarray(t.idx.ravel()[:1])   # warm/compile + drain
            print(f"  warm stats k={k}: {stats}", flush=True)
            times = []
            for _ in range(LAPS):
                t0 = time.perf_counter()
                t = optics.compute_neighbors_certified(pts, eps, 10, k,
                                                       _stats=stats)
                np.asarray(t.idx.ravel()[:1])
                times.append(time.perf_counter() - t0)
            print(f"  certified d={d} k={k}: best={min(times)*1e3:.1f} ms "
                  f"mean={np.mean(times)*1e3:.1f} ms stats={stats}",
                  flush=True)
        if d == 4:
            g = optics.compute_neighbors_grid(pts, eps, 10, max_neighbors=64)
            if g is not None:
                np.asarray(g.idx.ravel()[:1])
                t0 = time.perf_counter()
                for _ in range(LAPS):
                    g = optics.compute_neighbors_grid(pts, eps, 10,
                                                      max_neighbors=64)
                np.asarray(g.idx.ravel()[:1])
                print(f"  grid d=4 (chained): "
                      f"{(time.perf_counter()-t0)/LAPS*1e3:.1f} ms",
                      flush=True)


if __name__ == "__main__":
    main()
