"""Cell-pair shift OPTICS neighbors vs the gather-based grid path (r2).

Reference rows (BASELINE.md): d=2 n=100k ~294-298 ms; d=3 ~344-376;
d=4 ~378-514 (Xeon, 1 thread). Round-1 device times: grid d=2 ~105 ms,
dense d=4 ~306 ms. Target (VERDICT item 4): d=2 <= 60 ms device, d=4 >= 2x.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax

import evflow_tpu
evflow_tpu.setup_cache()
from evflow_tpu.io.synthetic import uniform_cloud
from evflow_tpu.models import optics


def lap(fn, laps=3):
    fn()                                     # compile
    np.asarray(fn().count[:1])
    best = 1e9
    for _ in range(laps):
        t0 = time.perf_counter()
        t = fn()
        np.asarray(t.count[:1])
        best = min(best, time.perf_counter() - t0)
    return best


for dim in (2, 3, 4):
    pts = uniform_cloud(100_000, dim, 1000.0, seed=1)
    eps = optics.epsilon_estimation(pts, 10)
    cp = optics.compute_neighbors_cellpair(pts, eps, 10, max_neighbors=64)
    if cp is None:
        print(f"d={dim}: cellpair declined", flush=True)
        continue
    t_cp = lap(lambda: optics.compute_neighbors_cellpair(
        pts, eps, 10, max_neighbors=64))
    g = optics.compute_neighbors_grid(pts, eps, 10, max_neighbors=64)
    t_g = None
    if g is not None:
        t_g = lap(lambda: optics.compute_neighbors_grid(
            pts, eps, 10, max_neighbors=64))
    print(f"d={dim} n=100k: cellpair {t_cp*1e3:7.1f} ms   grid "
          f"{'%.1f ms' % (t_g*1e3) if t_g else 'n/a'}", flush=True)


print("--- projected grid (first-3-dims bucketing, full-D distances) ---",
      flush=True)
for dim in (4, 5, 6):
    pts = uniform_cloud(100_000, dim, 1000.0, seed=1)
    eps = optics.epsilon_estimation(pts, 10)
    g = optics.compute_neighbors_grid(pts, eps, 10, max_neighbors=64,
                                      approx=True)
    if g is None:
        print(f"d={dim}: projected grid declined", flush=True)
        continue
    t_g = lap(lambda: optics.compute_neighbors_grid(
        pts, eps, 10, max_neighbors=64, approx=True))
    t_d = lap(lambda: optics.compute_neighbors(
        pts, eps, 10, max_neighbors=64, approx=True))
    print(f"d={dim} n=100k: projected-grid {t_g*1e3:7.1f} ms   dense "
          f"{t_d*1e3:7.1f} ms", flush=True)
