import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Diagnose the rotated re-selection rounds (r5): after pass 1, what do the
failing rows look like (cnt distribution), and what fraction does ONE round
with k_sel slots certify? Readbacks kept tiny."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from evflow_tpu.io.synthetic import uniform_cloud
from evflow_tpu.models import optics as O

N = 100_000
D = int(sys.argv[1]) if len(sys.argv) > 1 else 4
K = 64


def main():
    pts_np = uniform_cloud(N, D, 1000.0, seed=1)
    eps = O.epsilon_estimation(pts_np, 10)
    pts = jnp.asarray(pts_np, jnp.float32)
    block = 2048
    nblocks = -(-N // block)
    pts_pad = jnp.pad(pts, ((0, nblocks * block - N), (0, 0)),
                      constant_values=jnp.inf)
    idx, dist, cnt, core, bad_rows, bad_cnt, nbad_d = \
        O._compute_neighbors_certified_jit(
            pts_pad, pts, jnp.float32(eps), K, block, nblocks, 10, 0.95)
    nbad = int(np.asarray(nbad_d))
    if nbad == 0:
        print(f"d={D}: pass 1 certified every row (exact backend?)")
        return
    bc = np.asarray(jnp.stack([bad_rows[:nbad], bad_cnt[:nbad]]))
    bad, bcnt = bc[0], bc[1]
    print(f"d={D} nbad={nbad} cnt-of-bad: max={bcnt.max()} "
          f"hist<=16/32/48/64/128/inf: "
          f"{[(bcnt <= t).sum() for t in (16, 32, 48, 64, 128, 10**9)]}",
          flush=True)

    c_np = np.asarray(pts, np.float64).mean(axis=0).astype(np.float32)
    pts_np32 = np.asarray(pts)
    bits = (N - 1).bit_length()
    npow = 1 << bits
    pts_c_pow = jnp.pad(pts - c_np[None, :], ((0, npow - N), (0, 0)),
                        constant_values=jnp.inf)
    pts_c = pts - c_np[None, :]
    retry = bad[bcnt <= K]
    for k_sel in (K, 256):
        for r in range(2):
            xmask = (((0x5A5A5A5A >> max(32 - bits, 0)) ^ (r * 0x1D951))
                     & (npow - 1))
            xm = jnp.int32(xmask)
            pp = O._certified_permute_jit(pts_c_pow, bits, xm)
            certs = []
            cnts = []
            for j in range(0, retry.size, 2048):
                rows = retry[j:j + 2048]
                fpts = np.full((2048, D), np.inf, np.float32)
                fpts[:rows.size] = pts_np32[rows] - c_np[None, :]
                fi, fd, fc, fcore, fcert = O._certified_round_jit(
                    jnp.asarray(fpts), pts_c, pp, jnp.float32(eps),
                    K, k_sel, 10, 0.95, bits, xm)
                certs.append(fcert[:rows.size])
                cnts.append(fc[:rows.size])
            ok = np.asarray(jnp.concatenate(certs))
            fc_np = np.asarray(jnp.concatenate(cnts))
            print(f"  k_sel={k_sel} rot={r}: certified {ok.sum()}/{retry.size}"
                  f" (fail cnt max={fc_np[~ok].max() if (~ok).any() else -1},"
                  f" fail cnt>{K}: {(fc_np[~ok] > K).sum()})", flush=True)


if __name__ == "__main__":
    main()
