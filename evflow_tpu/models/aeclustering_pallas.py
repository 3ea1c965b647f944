"""Sequential exact AEClustering engine as ONE Pallas TPU kernel.

The bit-parity engine (models/aeclustering.py:update_slice) is a lax.scan
whose per-event body is a chain of ~24 tiny XLA ops — r3 measured the scan
step cost as almost pure per-op DISPATCH (~0.7 µs/op on this backend,
17.1 µs/event total). This kernel moves the WHOLE per-event state machine
(reference semantics: AEClustering.cpp:47-118 + MyCluster.cpp forget/add/
EWMA) inside a single Mosaic program: one fori_loop over the slice's events
with the cluster state carried in vector registers/VMEM, so an event costs
VPU-op cycles instead of XLA dispatches.

Two structural changes vs the XLA scan body — both bit-neutral:

1. **Amortized-O(1) forget (the deque, TPU-native).** The member ring is
   written in add order, event times are monotone, and the sliding-window
   tMin is monotone (update times are pushed in stream order), so expiry is
   always a RING PREFIX — exactly MyCluster::forget's pop-front loop
   (MyCluster.cpp:50-61). The kernel keeps a tail pointer and per-cluster
   live counts n_c, advancing the tail while ring.t[tail] < tMin_i and
   decrementing n_c — total tail advances per slice <= total adds, i.e.
   amortized one per event, replacing the XLA body's per-event (M, C)
   equality panel (the single most expensive op in the scan).

2. **Row-granular ring access.** The ring is (M, 8) int32 rows
   [x, y, t, p, cid, 0, 0, 0]: appends are one dynamic-sublane (1, 8) row
   store and the forget chase one row load — Mosaic lowers these where
   per-element scalar VMEM stores are rejected (see
   ops/pallas_kernels.py's sae_scatter_max note).

Everything else mirrors `aeclustering._event_body` op-for-op on (1, C)
lanes: Manhattan distance to EWMA means, first-in-deque-order target
(argmin of creation keys), (1-α)·mu + α·pix updates (identical elementwise
fp32 ops → bit-identical), merge with post-add-count weights (the (M, C)
reassignment panel runs under pl.when — merges are rare), empty-removal
skipped on merge updates (AEClustering.cpp:104), overflow counting, and
last-updated tracking. The surrounding slice prep (precomputed per-event
tMin, push-buffer update) and finalize (lazy-forget normalization) are the
shared XLA paths (`_slice_prep` / `_finalize`), so `update_slice_pallas`
is a drop-in for `update_slice` — bit-equality on every AEState field is
regression-tested against it on merge/creation/removal-heavy streams, ring
wrap, capacity overflow, and invalid-lane holes
(tests/test_aeclustering.py::test_pallas_*).

Requires kappa == 0 (the apps' deployed default — the sampling branch never
matches, AEClustering.cpp:14); other configs fall back to update_slice.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ClusterConfig
from .aeclustering import (AEState, _slice_prep, _finalize, update_slice,
                           _BIG)

_I32 = jnp.int32


def _make_kernel(n: int, m: int, c: int, radius: float, alpha: float):
    """Build the kernel body for static (N, M, C, radius, alpha)."""
    radius = np.float32(radius)
    alpha = np.float32(alpha)
    one_minus = np.float32(1.0) - alpha

    def kernel(scal_ref, ev_ref, ring_in_ref, ivec_ref, mu_ref,
               ring_ref, ivec_o_ref, mu_o_ref, scal_o_ref):
        ring_ref[:] = ring_in_ref[:]
        iota_c = jax.lax.broadcasted_iota(_I32, (1, c), 1)

        n_eff = scal_ref[0, 6]

        def body(i, carry):
            (tail, eid, nord, ncid, lupd, ovf,
             alive, corder, cid, nc, mu) = carry
            row = ev_ref[pl.ds(i, 1), :]                    # (1, 8)
            xi, yi, ti, pi = row[0, 0], row[0, 1], row[0, 2], row[0, 3]
            vi = row[0, 4] > 0
            tmini = row[0, 5]

            # ---- forget: chase the expired ring prefix (amortized O(1))
            def chase(cr):
                tl, nc_, _go = cr
                r = ring_ref[pl.ds(tl % m, 1), :]
                is_exp = (tl < eid) & (r[0, 2] < tmini)
                dec = ((iota_c == r[0, 4]) & is_exp).astype(_I32)
                return (tl + is_exp.astype(_I32), nc_ - dec, is_exp)

            tail, nc, _ = jax.lax.while_loop(
                lambda cr: cr[2], chase, (tail, nc, True))

            # ---- match against live cluster means (Manhattan, radius gate)
            live = (alive > 0) & (nc > 0)
            fx = xi.astype(jnp.float32)
            fy = yi.astype(jnp.float32)
            dist = (jnp.abs(fx - mu[0:1, :]) + jnp.abs(fy - mu[1:2, :]))
            near = live & (dist <= radius)                  # (1, c)
            n_assigned = jnp.sum(near.astype(_I32))
            any_a = n_assigned > 0
            # index selections via min-reductions, NOT argmin/argmax:
            # Mosaic's argmin tie-break is not first-index (probed on
            # hardware), and XLA semantics require the FIRST free slot /
            # first-in-deque target. corder is unique per alive cluster, so
            # "lane holding the min key" is unambiguous; free-slot ties are
            # broken by taking the min lane index directly.
            okey = jnp.where(near, corder, _BIG)
            okm = jnp.min(okey)
            tgt_a = jnp.min(jnp.where(okey == okm, iota_c, c)).astype(_I32)
            free = alive == 0
            free_slot = jnp.min(jnp.where(free, iota_c, c)).astype(_I32)
            have_free = jnp.any(free)
            make_new = vi & ~any_a & have_free
            ovf = ovf + (vi & ~any_a & ~have_free).astype(_I32)
            target = jnp.where(any_a, tgt_a, free_slot)
            do_add = vi & (any_a | make_new)

            # ---- ring-full overwrite: the slot being written is the live
            # tail (eid - tail == m) — its occupant vanishes, like the XLA
            # panel recount after mcid[slot] is overwritten
            full = do_add & (eid - tail >= m)
            orow = ring_ref[pl.ds(eid % m, 1), :]
            nc = nc - ((iota_c == orow[0, 4]) & full).astype(_I32)
            tail = tail + full.astype(_I32)

            # ---- append member (one dynamic row store)
            @pl.when(do_add)
            def _():
                newrow = jnp.concatenate(
                    [row[:, 0:4],
                     jnp.full((1, 1), target, _I32),
                     jnp.zeros((1, 3), _I32)], axis=1)
                ring_ref[pl.ds(eid % m, 1), :] = newrow

            eid = eid + do_add.astype(_I32)

            # ---- EWMA mean of the target (identical fp32 ops to the XLA
            # body: (1-α)·mu + α·pix elementwise, first member copies pix)
            t_one = (iota_c == target) & do_add             # (1, c)
            nc_t = jnp.sum(jnp.where(iota_c == target, nc, 0))
            is_first = jnp.where(any_a, nc_t == 0, True)
            pix = jnp.concatenate([jnp.full((1, c), fx, jnp.float32),
                                   jnp.full((1, c), fy, jnp.float32)], axis=0)
            new_mu = jnp.where(is_first, pix, one_minus * mu + alpha * pix)
            mu = jnp.where(t_one, new_mu, mu)               # (2,c) broadcast
            nc = nc + t_one.astype(_I32)

            # ---- creation bookkeeping
            n_one = (iota_c == free_slot) & make_new
            alive = jnp.where(n_one, 1, alive)
            corder = jnp.where(n_one, nord, corder)
            cid = jnp.where(n_one, ncid, cid)
            nord = nord + make_new.astype(_I32)
            ncid = ncid + make_new.astype(_I32)

            # ---- merge (>= 2 matches): weights = post-add counts (nc
            # already includes the target's +1, matching n_post in the XLA
            # body); other matched slots die; members reassigned (panel
            # under pl.when — merges are rare)
            do_merge = vi & (n_assigned >= 2)
            wgt = jnp.where(near, nc.astype(jnp.float32), 0.0)
            msum = jnp.sum(wgt)
            mvec = jnp.sum(wgt * mu, axis=1, keepdims=True)  # (2, 1)
            merged = mvec / jnp.maximum(msum, 1.0)
            mu = jnp.where(do_merge & (iota_c == target), merged, mu)
            kill = near & (iota_c != target)
            alive = jnp.where(do_merge & kill, 0, alive)
            ntot = jnp.sum(jnp.where(near, nc, 0))
            nc = jnp.where(do_merge,
                           jnp.where(iota_c == target, ntot,
                                     jnp.where(near, 0, nc)),
                           nc)

            @pl.when(do_merge)
            def _():
                mcid = ring_ref[:, 4:5]                     # (m, 1)
                eq = mcid == jax.lax.broadcasted_iota(_I32, (m, c), 1)
                in_assigned = jnp.any(eq & near, axis=1, keepdims=True)
                ring_ref[:, 4:5] = jnp.where((mcid >= 0) & in_assigned,
                                             target, mcid)

            # ---- remove empties (skipped on merge updates, :104)
            empty = (alive > 0) & (nc == 0)
            alive = jnp.where(vi & ~do_merge & empty, 0, alive)
            corder = jnp.where(alive == 0, _BIG, corder)

            lupd = jnp.where(vi, jnp.where(do_add, target, -1), lupd)
            return (tail, eid, nord, ncid, lupd, ovf,
                    alive, corder, cid, nc, mu)

        carry0 = (scal_ref[0, 0], scal_ref[0, 1], scal_ref[0, 2],
                  scal_ref[0, 3], scal_ref[0, 4], scal_ref[0, 5],
                  ivec_ref[0:1, :], ivec_ref[1:2, :], ivec_ref[2:3, :],
                  ivec_ref[3:4, :], mu_ref[:])
        (tail, eid, nord, ncid, lupd, ovf,
         alive, corder, cid, nc, mu) = jax.lax.fori_loop(
            0, n_eff, body, carry0)

        ivec_o_ref[0:1, :] = alive
        ivec_o_ref[1:2, :] = corder
        ivec_o_ref[2:3, :] = cid
        ivec_o_ref[3:4, :] = nc
        mu_o_ref[:] = mu
        scal_o_ref[0, 0] = tail
        scal_o_ref[0, 1] = eid
        scal_o_ref[0, 2] = nord
        scal_o_ref[0, 3] = ncid
        scal_o_ref[0, 4] = lupd
        scal_o_ref[0, 5] = ovf
        scal_o_ref[0, 6] = 0
        scal_o_ref[0, 7] = 0

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def update_slice_pallas(state: AEState, x, y, t, p, valid,
                        cfg: ClusterConfig = ClusterConfig(),
                        interpret: bool = False) -> AEState:
    """Drop-in for aeclustering.update_slice — one Mosaic program per slice.

    Bit-equal to update_slice on every AEState field (see module docstring);
    requires kappa == 0, else falls back.
    """
    if cfg.kappa != 0:
        return update_slice(state, x, y, t, p, valid, cfg)
    m = cfg.max_members
    c = cfg.max_clusters
    n = x.shape[0]

    x, y, tr, p, t0, has_any, tmin, tbuf, thead = _slice_prep(
        state, x, y, t, p, valid, cfg)

    # events: (N, 8) rows [x, y, t, p, valid, tmin, 0, 0]
    zero = jnp.zeros((n,), _I32)
    ev = jnp.stack([x, y, tr, p, valid.astype(_I32), tmin, zero, zero],
                   axis=1)
    # effective trip count: index of last valid lane + 1 (holes handled by
    # the in-kernel vi gates; skipped tail lanes are no-ops by construction)
    n_eff = jnp.where(jnp.any(valid),
                      n - jnp.argmax(jnp.flip(valid)).astype(_I32), 0)

    # ring rows (M, 8); live window is the ring suffix [event_id - L,
    # event_id) — expiry is a ring prefix (see docstring), so the live count
    # L positions the tail
    ring = jnp.stack([state.mx, state.my, state.mt, state.mp, state.mcid,
                      jnp.zeros((m,), _I32), jnp.zeros((m,), _I32),
                      jnp.zeros((m,), _I32)], axis=1)
    n_live = jnp.sum((state.mcid >= 0).astype(_I32))
    tail0 = state.event_id - n_live

    ids = jnp.where(state.mcid >= 0, state.mcid, c)
    nc0 = jax.ops.segment_sum(
        (state.mcid >= 0).astype(_I32), ids, num_segments=c + 1)[:c]
    ivec = jnp.stack([state.alive.astype(_I32), state.corder, state.cid,
                      nc0], axis=0)
    mu = state.mu.T                                          # (2, C)
    scal = jnp.stack([tail0, state.event_id, state.next_order,
                      state.next_cid, state.last_updated, state.overflow,
                      n_eff, jnp.int32(0)])[None, :]

    kernel = _make_kernel(n, m, c, cfg.radius, cfg.alpha)
    ring_o, ivec_o, mu_o, scal_o = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((m, 8), _I32),
                   jax.ShapeDtypeStruct((4, c), _I32),
                   jax.ShapeDtypeStruct((2, c), jnp.float32),
                   jax.ShapeDtypeStruct((1, 8), _I32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        interpret=interpret,
    )(scal, ev, ring, ivec, mu)

    ring5 = jnp.stack([ring_o[:, 0], ring_o[:, 1], ring_o[:, 2],
                       ring_o[:, 3], ring_o[:, 4]], axis=0)
    carry = (ivec_o[0] > 0, ivec_o[1], ivec_o[2], mu_o.T, ring5,
             scal_o[0, 2], scal_o[0, 3], scal_o[0, 1], scal_o[0, 4],
             scal_o[0, 5])
    return _finalize(state, carry, t0, has_any, tmin, tbuf, thead,
                     valid, cfg)
