"""Pallas TPU kernel for FDCM window scoring — the probe-gather hot loop.

The FDCM score of a candidate at translation step ``m`` is
``sum_lines |LI[o, p2 + tr(m)] - LI[o, p1 + tr(m)]|`` (reference
``dt3cpu.cpp:126-179``); the optimizers evaluate it over a window of steps.
XLA lowers the per-probe lookups to a scalar gather that sustains only
~150M probes/s on TPU — the pipeline bottleneck (see ROADMAP.md).

This kernel restructures the evaluation around two facts:

1. Probes of one (candidate, line, endpoint) across the step window lie on a
   rasterized ray: the major axis advances +-1 per step, so all probes of an
   item sit inside a small patch of the orientation slice whose row count
   scales with the minor slope.  Steeper candidates get a reduced covered
   window (``tc``); the optimizer's straggler path finishes walks that leave
   the covered window — measured walk lengths are short (median stop 1,
   p99 ~21), so little ever straggles.
2. Mosaic supports per-lane dynamic gathers *within one vreg*
   (``tpu.dynamic_gather`` via ``jnp.take_along_axis`` on (8, 128) blocks)
   at ~10G elem/s, and dynamic-start vector loads from VMEM when the start
   is provably tile-aligned (``pl.multiple_of`` with 8 / 128).

Items = (candidate, line) pairs, sorted by (scene, major-axis,
orientation-slice).  The kernel walks the item stream; on a slice change it
DMAs that (Q, Q) slice (or its transpose, for y-major items) from HBM into
VMEM; per item it computes the exact f32 probe coordinates for both line
endpoints (replicating the reference's op order: ``tr = scene_tr + m*rast``
then ``p = endpoint + tr``, int-truncated), loads aligned 8-row patch
chunks, lane-gathers with the exact per-probe lane index, sublane-gathers
with the per-probe row index, and accumulates ``|v2 - v1| * weight`` into a
per-candidate accumulator, flushed to HBM per scene.  Patch origins and
chunk counts are precomputed (vectorized) on the XLA side.

Per-line values are bit-exact vs the XLA path; the per-candidate sum order
follows the sorted item order (the reference sums in line order — scores
agree to f32 summation-order tolerance, which the test suite's oracle
comparisons allow).

Lane layout of the 128-step window: lane l in [0, 64) is step ``m = +l``;
lane l in [64, 128) is step ``m = -(l - 63)`` (so lane 64 is m = -1).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K_LANES = 128          # 64 positive steps (incl. m=0) + 64 negative steps
K_POS = 64             # lane l < 64: m = +l
TC_MAX = 62            # max covered steps per direction.  The kernel computes
                       # all 128 lanes per item regardless of tc, so coverage
                       # is free up to the lane pattern's +-62; v3 items are
                       # additionally capped per candidate by x_fit (the widest
                       # symmetric window around each endpoint's base column
                       # that fits ONE aligned 128-chunk, plain or 64-rolled;
                       # always >= 31) and by the y budget for steep rays.
NCH = 4                # max 8-row chunks per patch (steeper candidates get
                       # a smaller covered window instead of a taller patch)
PATCH_W = 256          # two 128-lane chunks
IB = 256               # items per grid step (SMEM block)
NF = 19                # f32 fields per item
INTERPRET = False      # run the kernel in the Pallas interpreter (CPU tests)

# field indices
F_SID, F_SLOT, F_WT, F_TC = 0, 1, 2, 3
F_E0X, F_E0Y, F_E1X, F_E1Y = 4, 5, 6, 7
F_VX, F_VY, F_TRX, F_TRY = 8, 9, 10, 11
F_Y0A0, F_X0A0, F_NCH0 = 12, 13, 14
F_Y0A1, F_X0A1, F_NCH1 = 15, 16, 17
F_T0 = 18              # step offset: probe steps are t0 + m_lane (main
                       # pass: 0; straggler extension pass: the resume step)


def _m_lanes():
    l = jax.lax.broadcasted_iota(jnp.int32, (8, K_LANES), 1)
    return jnp.where(l < K_POS, l, -(l - (K_POS - 1))).astype(jnp.float32)


def _kernel(fields_ref, dt3_ref, dt3t_ref, out_ref, slab, acc, state, sem,
            *, s_dim, c_dim, depth, q, single_flush=False):
    """state: SMEM (2,) int32 = [current sid, current scene b].

    ``single_flush``: accumulator slots span the whole item stream (one
    output row-bank), written once at the end — used by the straggler
    extension pass, whose compacted candidate subset mixes scenes."""
    m_f32 = _m_lanes()                                    # (8, K) f32
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, K_LANES), 0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[...] = jnp.zeros((c_dim, K_LANES), jnp.float32)
        state[0] = -1
        state[1] = -1

    def flush(b):
        cp = pltpu.make_async_copy(acc, out_ref.at[b], sem)
        cp.start()
        cp.wait()
        acc[...] = jnp.zeros((c_dim, K_LANES), jnp.float32)

    def load_slice(sid):
        d = jax.lax.rem(sid, depth)
        bt = jax.lax.div(sid, depth)
        b = jax.lax.div(bt, 2)
        is_t = jax.lax.rem(bt, 2)

        @pl.when(is_t == 0)
        def _():
            cp = pltpu.make_async_copy(dt3_ref.at[b, d], slab, sem)
            cp.start()
            cp.wait()

        @pl.when(is_t == 1)
        def _():
            cp = pltpu.make_async_copy(dt3t_ref.at[b, d], slab, sem)
            cp.start()
            cp.wait()

    def body(it, _):
        sid = fields_ref[it, F_SID].astype(jnp.int32)

        @pl.when(sid != state[0])
        def _():
            b = jax.lax.div(sid, 2 * depth)

            if not single_flush:
                @pl.when((state[1] >= 0) & (b != state[1])
                         & (state[1] < s_dim))
                def _():
                    flush(state[1])

            @pl.when(b < s_dim)
            def _():
                load_slice(sid)
            state[0] = sid
            state[1] = b

        wt = fields_ref[it, F_WT]

        @pl.when(wt > 0.0)
        def _():
            slot = fields_ref[it, F_SLOT].astype(jnp.int32)
            vx = fields_ref[it, F_VX]
            vy = fields_ref[it, F_VY]
            m_used = m_f32 + fields_ref[it, F_T0]         # exact int add
            trx_l = fields_ref[it, F_TRX] + m_used * vx   # (8, K) f32
            try_l = fields_ref[it, F_TRY] + m_used * vy

            y0a0 = pl.multiple_of(fields_ref[it, F_Y0A0].astype(jnp.int32), 8)
            x0a0 = pl.multiple_of(
                fields_ref[it, F_X0A0].astype(jnp.int32), 128)
            y0a1 = pl.multiple_of(fields_ref[it, F_Y0A1].astype(jnp.int32), 8)
            x0a1 = pl.multiple_of(
                fields_ref[it, F_X0A1].astype(jnp.int32), 128)

            def probe_idx(ex, ey, x0a, y0a):
                xi = (ex + trx_l).astype(jnp.int32)
                yi = (ey + try_l).astype(jnp.int32)
                li = jnp.clip(xi - x0a, 0, PATCH_W - 1)
                dy = jnp.clip(yi - y0a, 0, NCH * 8 - 1)
                # split row index into (chunk, sublane) once per endpoint
                return li & 127, li < 128, dy >> 3, dy & 7

            lim0, sel0, dc0, ds0 = probe_idx(fields_ref[it, F_E0X],
                                             fields_ref[it, F_E0Y], x0a0, y0a0)
            lim1, sel1, dc1, ds1 = probe_idx(fields_ref[it, F_E1X],
                                             fields_ref[it, F_E1Y], x0a1, y0a1)

            zero = jnp.zeros((8, K_LANES), jnp.float32)

            def fetch(y0a, x0a, lim, sel, dc, dsub):
                # one tall load per lane-half; chunks are register slices
                p_l = slab[pl.ds(y0a, NCH * 8), pl.ds(x0a, 128)]
                p_r = slab[pl.ds(y0a, NCH * 8), pl.ds(x0a + 128, 128)]
                v = zero
                for k in range(NCH):
                    ckl = p_l[8 * k:8 * (k + 1)]
                    ckr = p_r[8 * k:8 * (k + 1)]
                    g = jnp.where(sel,
                                  jnp.take_along_axis(ckl, lim, axis=1),
                                  jnp.take_along_axis(ckr, lim, axis=1))
                    h = jnp.take_along_axis(g, dsub, axis=0)
                    v = jnp.where(dc == k, h, v)
                return v

            v0 = fetch(y0a0, x0a0, lim0, sel0, dc0, ds0)
            v1 = fetch(y0a1, x0a1, lim1, sel1, dc1, ds1)
            d = jnp.abs(v1 - v0) * wt                     # (8, K) rows equal
            base = pl.multiple_of((slot // 8) * 8, 8)
            acc[pl.ds(base, 8), :] = acc[pl.ds(base, 8), :] + \
                jnp.where(row8 == (slot % 8), d, 0.0)
        return 0

    jax.lax.fori_loop(0, IB, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        if single_flush:
            flush(0)
        else:
            @pl.when((state[1] >= 0) & (state[1] < s_dim))
            def _():
                flush(state[1])


def window_scores_device(dt3, dt3t, fields, *, s_dim, c_dim, depth, q,
                         single_flush=False):
    """Run the kernel.  ``fields``: ``(N, NF)`` f32, N a multiple of IB,
    sorted by ``F_SID``.  Returns ``(S, C, K_LANES)`` f32 (S = 1 when
    ``single_flush``)."""
    # The accumulator slot write covers a full 8-sublane block
    # (``acc[pl.ds((slot//8)*8, 8)]``): a c_dim that is not a multiple of 8
    # would write past the scratch for slots in the last partial block — an
    # out-of-bounds VMEM access that CRASHES the TPU runtime (r2's bench
    # wedge: the straggler pass compacted to b_ext=570 candidates).
    if c_dim % 8:
        c_pad = -(-c_dim // 8) * 8
        out = window_scores_device(dt3, dt3t, fields, s_dim=s_dim,
                                   c_dim=c_pad, depth=depth, q=q,
                                   single_flush=single_flush)
        return out[:, :c_dim]
    n = fields.shape[0]
    out_s = 1 if single_flush else s_dim
    return pl.pallas_call(
        partial(_kernel, s_dim=s_dim, c_dim=c_dim, depth=depth, q=q,
                single_flush=single_flush),
        grid=(n // IB,),
        in_specs=[
            pl.BlockSpec((IB, NF), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((out_s, c_dim, K_LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((q, q), jnp.float32),
            pltpu.VMEM((c_dim, K_LANES), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.25 * 4 * (q * q + c_dim * K_LANES))
            + 4 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(fields, dt3, dt3t)


# ---------------------------------------------------------------------------
# Kernel v3: sublane-first gathers on identity lane mapping
# ---------------------------------------------------------------------------
#
# The rasterized major-axis step is EXACTLY +-1.0, so when the probe base
# ``f = endpoint + scene_tr`` is combined with integer steps the probe column
# is ``trunc(f) + m`` for (almost) every step m.  That makes the per-column
# step index ``m(c) = s * (c - c0)`` a pure function of the column, uniform
# across sublanes, which inverts the gather order of the v2 kernel:
#
#   1. per 8-row chunk, ONE sublane gather picks each column's needed row
#      (``dy(c)`` is uniform across sublanes), chunk-selected by a compare;
#   2. ONE final lane gather maps columns to step lanes via the identity
#      ``li(l) = c0 - x0a + s * m(l)``.
#
# 5 shuffle-port ops per endpoint instead of 12, and one 8x128 vreg load per
# chunk instead of a 256-wide patch.  A rolled-by-64 copy of each slice
# (``dt3r``) makes every <=63-column window fit ONE 128-lane-aligned chunk:
# a window crossing a 128 boundary of the plain slice cannot also cross a
# boundary of the 64-rolled one.
#
# The identity ``trunc(f + (tr + m*vx)) == trunc(f + tr) + s*m`` can fail for
# rare f32 values where the reference's two-rounding order
# (``dt3cpu.cpp:151-165``: ``tr + m*rast`` then ``point + tr``) crosses an
# integer boundary.  ``build_fields_v3`` detects those items exactly
# (vectorized, on the XLA side) and zeroes their candidate's coverage, so the
# straggler walk recomputes the whole candidate on the bit-exact XLA gather
# path.  Measured incidence is ~1e-4 of items.

NF3 = 13               # f32 fields per item (v3 layout)
G_SID, G_SLOT, G_WT, G_TC = 0, 1, 2, 3
G_E0M, G_E0N, G_E1M, G_E1N = 4, 5, 6, 7
G_VX, G_VY, G_TRM, G_TRN = 8, 9, 10, 11
G_T0 = 12
Y_BUDGET3 = 11.5       # two-sided tc budget: rows <= 2*11.5+2+7 = 32 = NCH*8
Y_BUDGET3_EXT = 23.0   # one-sided cover budget: rows <= 23+2+7 = 32


def _kernel_v3(fields_ref, dt3_ref, dt3r_ref, dt3t_ref, dt3tr_ref, out_ref,
               slab, acc, state, sem, *, s_dim, c_dim, depth, q,
               two_sided=True, single_flush=False):
    """v3 kernel body.  ``slab`` is ``(2q, q)``: rows [0, q) hold the plain
    slice, rows [q, 2q) the 64-rolled copy."""
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, K_LANES), 1)
    m_pat = jnp.where(lane_i < K_POS, lane_i, -(lane_i - (K_POS - 1)))
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, K_LANES), 0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[...] = jnp.zeros((c_dim, K_LANES), jnp.float32)
        state[0] = -1
        state[1] = -1

    def flush(b):
        cp = pltpu.make_async_copy(acc, out_ref.at[b], sem)
        cp.start()
        cp.wait()
        acc[...] = jnp.zeros((c_dim, K_LANES), jnp.float32)

    def load_slice(sid):
        d = jax.lax.rem(sid, depth)
        bt = jax.lax.div(sid, depth)
        b = jax.lax.div(bt, 2)
        is_t = jax.lax.rem(bt, 2)

        def both(plain, rolled):
            c1 = pltpu.make_async_copy(plain.at[b, d], slab.at[pl.ds(0, q)],
                                       sem)
            c1.start()
            c1.wait()
            c2 = pltpu.make_async_copy(rolled.at[b, d], slab.at[pl.ds(q, q)],
                                       sem)
            c2.start()
            c2.wait()

        @pl.when(is_t == 0)
        def _():
            both(dt3_ref, dt3r_ref)

        @pl.when(is_t == 1)
        def _():
            both(dt3t_ref, dt3tr_ref)

    def body(it, _):
        sid = fields_ref[it, G_SID].astype(jnp.int32)

        @pl.when(sid != state[0])
        def _():
            b = jax.lax.div(sid, 2 * depth)

            if not single_flush:
                @pl.when((state[1] >= 0) & (b != state[1])
                         & (state[1] < s_dim))
                def _():
                    flush(state[1])

            @pl.when(b < s_dim)
            def _():
                load_slice(sid)
            state[0] = sid
            state[1] = b

        wt = fields_ref[it, G_WT]

        @pl.when(wt > 0.0)
        def _():
            slot = fields_ref[it, G_SLOT].astype(jnp.int32)
            tc_i = fields_ref[it, G_TC].astype(jnp.int32)
            t0_i = fields_ref[it, G_T0].astype(jnp.int32)
            vx = fields_ref[it, G_VX]
            vy = fields_ref[it, G_VY]
            trm = fields_ref[it, G_TRM]
            trn = fields_ref[it, G_TRN]
            s_i = jnp.where(vx < 0, -1, 1)
            m_lo = t0_i - (tc_i if two_sided else 0)
            m_hi = t0_i + tc_i

            def endpoint(em, en):
                base = em + trm
                c0 = base.astype(jnp.int32)
                xa = c0 + s_i * m_lo
                xb = c0 + s_i * m_hi
                xm = jnp.clip(jnp.minimum(xa, xb), 0, q - 1)
                x_hi = jnp.clip(jnp.maximum(xa, xb), 0, q - 1)
                crossing = (xm // 128) != (x_hi // 128)
                ls = jnp.where(crossing, ((xm - 64) // 128) * 128,
                               (xm // 128) * 128)
                ls = jnp.clip(ls, 0, q - 128)
                x0a = ls + jnp.where(crossing, 64, 0)
                # y window ends (monotone in m -> exact, no margin)
                ya = (en + (trn + m_lo.astype(jnp.float32) * vy)) \
                    .astype(jnp.int32)
                yb = (en + (trn + m_hi.astype(jnp.float32) * vy)) \
                    .astype(jnp.int32)
                ym = jnp.clip(jnp.minimum(ya, yb), 0, q - 1)
                y0a = jnp.clip((ym // 8) * 8, 0, q - NCH * 8)
                row0 = jnp.where(crossing, q, 0) + y0a
                lanestart = pl.multiple_of(ls, 128)

                off = x0a - c0
                m_col = s_i * (off + lane_i)               # step at column
                ycol = (en + (trn + m_col.astype(jnp.float32) * vy)) \
                    .astype(jnp.int32)
                dy = jnp.clip(ycol - y0a, 0, NCH * 8 - 1)
                dc = dy >> 3
                ds = dy & 7
                v = jnp.zeros((8, K_LANES), jnp.float32)
                for k in range(NCH):
                    ck = slab[pl.ds(pl.multiple_of(row0 + 8 * k, 8), 8),
                              pl.ds(lanestart, 128)]
                    h = jnp.take_along_axis(ck, ds, axis=0)
                    v = jnp.where(dc == k, h, v)
                li = jnp.clip(-off + s_i * (m_pat + t0_i), 0, 127)
                return jnp.take_along_axis(v, li, axis=1)

            v0 = endpoint(fields_ref[it, G_E0M], fields_ref[it, G_E0N])
            v1 = endpoint(fields_ref[it, G_E1M], fields_ref[it, G_E1N])
            d = jnp.abs(v1 - v0) * wt
            base_s = pl.multiple_of((slot // 8) * 8, 8)
            acc[pl.ds(base_s, 8), :] = acc[pl.ds(base_s, 8), :] + \
                jnp.where(row8 == (slot % 8), d, 0.0)
        return 0

    jax.lax.fori_loop(0, IB, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        if single_flush:
            flush(0)
        else:
            @pl.when((state[1] >= 0) & (state[1] < s_dim))
            def _():
                flush(state[1])


def prep_dt3_banks(dt3):
    """Per-dispatch HBM banks for the v3 kernel: the DT3 stack, its
    64-rolled copy, the transposed stack, and the rolled transpose."""
    dt3r = jnp.roll(dt3, -64, axis=-1)
    dt3t = jnp.swapaxes(dt3, -1, -2)
    dt3tr = jnp.roll(dt3t, -64, axis=-1)
    return dt3, dt3r, dt3t, dt3tr


def window_scores_device_v3(banks, fields, *, s_dim, c_dim, depth, q,
                            two_sided=True, single_flush=False):
    """Run the v3 kernel.  ``banks``: the 4-tuple from
    :func:`prep_dt3_banks`; ``fields``: ``(N, NF3)`` f32 sorted by sid."""
    if c_dim % 8:
        # See window_scores_device: a non-multiple-of-8 c_dim makes the
        # slot-block accumulator write run off the VMEM scratch.
        c_pad = -(-c_dim // 8) * 8
        out = window_scores_device_v3(banks, fields, s_dim=s_dim,
                                      c_dim=c_pad, depth=depth, q=q,
                                      two_sided=two_sided,
                                      single_flush=single_flush)
        return out[:, :c_dim]
    n = fields.shape[0]
    out_s = 1 if single_flush else s_dim
    return pl.pallas_call(
        partial(_kernel_v3, s_dim=s_dim, c_dim=c_dim, depth=depth, q=q,
                two_sided=two_sided, single_flush=single_flush),
        grid=(n // IB,),
        in_specs=[pl.BlockSpec((IB, NF3), lambda i: (i, 0),
                               memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((out_s, c_dim, K_LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * q, q), jnp.float32),
            pltpu.VMEM((c_dim, K_LANES), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.25 * 4 * (2 * q * q + c_dim * K_LANES))
            + 4 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(fields, *banks)


def _identity_deviance(e_maj, trx, vx, tc, t0=None, span=None):
    """Items whose reference-order probe columns deviate from the identity
    mapping ``trunc(e + tr) + s*m`` anywhere in the covered window.

    ``e_maj``: ``(..., L, E)`` endpoint major coords; ``trx``/``vx``/``tc``:
    ``(...,)`` candidate-level; ``t0``: optional ``(...,)`` resume step
    (one-sided window ``[t0, t0+tc]``; default two-sided ``[-tc, tc]``).
    Returns a boolean deviance mask of shape ``(..., L)``.
    """
    w = span if span is not None else 2 * TC_MAX + 1
    lanes = jnp.arange(w, dtype=jnp.float32)
    if t0 is None:
        m = lanes - float(TC_MAX)                          # (W,)
        m = jnp.broadcast_to(m, tc.shape + (w,))
        covered = jnp.abs(m) <= tc[..., None]
    else:
        m = t0[..., None] + lanes
        covered = lanes <= tc[..., None]
    mv = m[..., None, None, :]                             # (..., 1, 1, W)
    cov = covered[..., None, None, :]
    x_true = e_maj[..., None] + (trx[..., None, None, None]
                                 + mv * vx[..., None, None, None])
    base = (e_maj + trx[..., None, None]).astype(jnp.int32)
    s_i = jnp.where(vx < 0, -1, 1).astype(jnp.int32)
    ident = base[..., None] + s_i[..., None, None, None] * mv.astype(jnp.int32)
    dev = cov & (x_true >= 0.0) & (x_true < jnp.float32(2 ** 30)) \
        & (x_true.astype(jnp.int32) != ident)
    return jnp.any(dev, axis=(-1, -2))                     # reduce (E, W) -> L


def build_fields_v3(cand_lines, cand_mask, rast, valid, slice_idx, scene_tr,
                    *, depth, q, cap=None):
    """v3 item-field array: ``(N, NF3)`` f32 sorted by sid, plus per-candidate
    covered steps ``tc (S, C)`` (0 where the identity mapping deviates — those
    candidates resolve on the straggler path)."""
    s, c, l = cand_mask.shape
    rx, ry = rast[..., 0], rast[..., 1]
    finite = jnp.isfinite(rx) & jnp.isfinite(ry)
    is_x_major = jnp.abs(rx) >= jnp.abs(ry)

    vx = jnp.where(is_x_major, rx, ry)                    # (S, C) |.| == 1
    vy = jnp.where(is_x_major, ry, rx)
    trx = jnp.where(is_x_major, scene_tr[:, None, 0], scene_tr[:, None, 1])
    tr_y = jnp.where(is_x_major, scene_tr[:, None, 1], scene_tr[:, None, 0])

    avy = jnp.abs(vy)
    tc = jnp.minimum(float(TC_MAX),
                     jnp.floor(Y_BUDGET3 / jnp.maximum(avy, 1e-6)))
    tc = jnp.where(finite, tc, 0.0)                       # (S, C) f32

    ep = cand_lines.reshape(s, c, l, 2, 2)                # [p1, p2] x (x, y)
    e_x = ep[..., 0]                                      # (S, C, L, 2)
    e_y = ep[..., 1]
    e_maj = jnp.where(is_x_major[..., None, None], e_x, e_y)
    e_min = jnp.where(is_x_major[..., None, None], e_y, e_x)

    # x_fit: widest symmetric step window around each endpoint's base column
    # that fits ONE aligned 128-lane chunk — plain ([k*128, k*128+128)) or
    # 64-rolled.  The kernel picks whichever chunk the window doesn't cross,
    # so capping tc at the candidate's min x_fit guarantees a valid single
    # chunk for every line endpoint.  x_fit >= 31 for any column, so this
    # never reduces coverage below the old TC_MAX=30; most candidates gain.
    c0 = (e_maj + trx[..., None, None]).astype(jnp.int32)   # (S, C, L, 2)
    u = c0 % 128
    fit_plain = jnp.minimum(u, 127 - u)
    v = (c0 - 64) % 128
    fit_roll = jnp.minimum(v, 127 - v)
    x_fit = jnp.maximum(fit_plain, fit_roll)
    x_fit = jnp.where(cand_mask[..., None], x_fit, 127)
    tc = jnp.minimum(tc, jnp.min(x_fit, axis=(-1, -2)).astype(jnp.float32))

    dev = _identity_deviance(jnp.where(cand_mask[..., None], e_maj, 0.0),
                             trx, vx, tc)                 # (S, C, L)
    dev_cand = jnp.any(dev & cand_mask, axis=-1)          # (S, C)
    tc = jnp.where(dev_cand, 0.0, tc)

    use = cand_mask & valid[..., None] & finite[..., None] \
        & ~dev_cand[..., None]
    wt = use.astype(jnp.float32)
    scene_id = jax.lax.broadcasted_iota(jnp.int32, (s, c, l), 0)
    sid = (scene_id * 2 + (~is_x_major[..., None]).astype(jnp.int32)) * depth \
        + slice_idx.astype(jnp.int32)
    sid = jnp.where(use, sid, s * 2 * depth)              # skips sort last

    bc = lambda a: jnp.broadcast_to(a[..., None], (s, c, l)).reshape(-1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (s, c, l), 1)
    cols = [
        sid.reshape(-1).astype(jnp.float32),
        slot.reshape(-1).astype(jnp.float32),
        wt.reshape(-1),
        bc(tc),
        e_maj[..., 0].reshape(-1), e_min[..., 0].reshape(-1),
        e_maj[..., 1].reshape(-1), e_min[..., 1].reshape(-1),
        bc(vx), bc(vy), bc(trx), bc(tr_y),
        jnp.zeros(s * c * l, jnp.float32),                # G_T0
    ]
    fields = jnp.stack(cols, axis=-1)                     # (S*C*L, NF3)

    sent = jnp.zeros((s, NF3), jnp.float32)
    sent = sent.at[:, G_SID].set(
        (jnp.arange(s, dtype=jnp.int32) * 2 * depth).astype(jnp.float32))
    fields = jnp.concatenate([fields, sent], axis=0)

    n_raw = fields.shape[0]
    n_pad = -(-n_raw // IB) * IB
    pad = jnp.zeros((n_pad - n_raw, NF3), jnp.float32)
    pad = pad.at[:, G_SID].set(float(s * 2 * depth))
    fields = jnp.concatenate([fields, pad], axis=0)

    key = fields[:, G_SID].astype(jnp.int32)
    _, perm = jax.lax.sort_key_val(key, jnp.arange(n_pad, dtype=jnp.int32))
    if cap is not None and cap < n_pad:
        perm = perm[:cap]
    fields = jnp.take(fields, perm, axis=0)
    return fields, tc.astype(jnp.int32)


def build_fields_ext_v3(cand_lines, cand_mask, vdir, active, slice_idx,
                        scene_of, scene_tr, t0, *, depth, q):
    """v3 item fields for the straggler extension pass (one-sided window
    ``[t0, t0+cover]``; lanes ``l < 64`` hold steps ``t0 + l``)."""
    b, l = cand_mask.shape
    rx, ry = vdir[..., 0], vdir[..., 1]
    finite = jnp.isfinite(rx) & jnp.isfinite(ry)
    is_x_major = jnp.abs(rx) >= jnp.abs(ry)
    vx = jnp.where(is_x_major, rx, ry)
    vy = jnp.where(is_x_major, ry, rx)
    str_x = scene_tr[scene_of]                            # (b, 2)
    trx = jnp.where(is_x_major, str_x[:, 0], str_x[:, 1])
    tr_y = jnp.where(is_x_major, str_x[:, 1], str_x[:, 0])

    avy = jnp.abs(vy)
    cover = jnp.minimum(61.0,
                        jnp.floor(Y_BUDGET3_EXT / jnp.maximum(avy, 1e-6)))
    cover = jnp.where(finite & active, cover, 0.0)

    ep = cand_lines.reshape(b, l, 2, 2)
    e_x = ep[..., 0]
    e_y = ep[..., 1]
    e_maj = jnp.where(is_x_major[..., None, None], e_x, e_y)
    e_min = jnp.where(is_x_major[..., None, None], e_y, e_x)

    dev = _identity_deviance(jnp.where(cand_mask[..., None], e_maj, 0.0),
                             trx, vx, cover, t0=t0, span=62)   # (b, L)
    dev_cand = jnp.any(dev & cand_mask, axis=-1)
    cover = jnp.where(dev_cand, 0.0, cover)

    use = cand_mask & active[..., None] & finite[..., None] \
        & ~dev_cand[..., None]
    wt = use.astype(jnp.float32)
    sid = (scene_of[:, None] * 2 + (~is_x_major[:, None]).astype(jnp.int32)) \
        * depth + slice_idx.astype(jnp.int32)
    s_max = int(scene_tr.shape[0])
    sid = jnp.where(use, sid, s_max * 2 * depth)

    bc = lambda a: jnp.broadcast_to(a[..., None], (b, l)).reshape(-1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, l), 0)
    cols = [
        sid.reshape(-1).astype(jnp.float32),
        slot.reshape(-1).astype(jnp.float32),
        wt.reshape(-1),
        bc(cover),
        e_maj[..., 0].reshape(-1), e_min[..., 0].reshape(-1),
        e_maj[..., 1].reshape(-1), e_min[..., 1].reshape(-1),
        bc(vx), bc(vy), bc(trx), bc(tr_y),
        bc(t0),
    ]
    fields = jnp.stack(cols, axis=-1)

    n_raw = fields.shape[0]
    n_pad = -(-n_raw // IB) * IB
    pad = jnp.zeros((n_pad - n_raw, NF3), jnp.float32)
    pad = pad.at[:, G_SID].set(float(s_max * 2 * depth))
    fields = jnp.concatenate([fields, pad], axis=0)

    key = fields[:, G_SID].astype(jnp.int32)
    _, perm = jax.lax.sort_key_val(key, jnp.arange(n_pad, dtype=jnp.int32))
    fields = jnp.take(fields, perm, axis=0)
    return fields, cover.astype(jnp.int32)


def window_scores_ext_v3(banks, cand_lines, cand_mask, vdir, active,
                         slice_idx, scene_of, scene_tr, t0):
    """v3 extension-pass scores: ``(b, 64)`` where lane l is step ``t0 + l``
    along ``vdir``, plus per-candidate covered steps ``cover (b,)``."""
    s, depth, q, _ = banks[0].shape
    b = cand_mask.shape[0]
    fields, cover = build_fields_ext_v3(cand_lines, cand_mask, vdir, active,
                                        slice_idx, scene_of, scene_tr, t0,
                                        depth=depth, q=q)
    out = window_scores_device_v3(banks, fields, s_dim=s, c_dim=b,
                                  depth=depth, q=q, two_sided=False,
                                  single_flush=True)
    return out[0, :, :K_POS], cover


def window_scores_v3(dt3, scene_tr, cand_lines, cand_mask, rast, valid,
                     slice_idx):
    """v3 full entry, mirroring :func:`window_scores`."""
    s, depth, q, q2 = dt3.shape
    assert q == q2 and q % 128 == 0, "v3 kernel needs a square 128-mult canvas"
    c = cand_mask.shape[1]
    fields, tc = build_fields_v3(cand_lines, cand_mask, rast, valid,
                                 slice_idx, scene_tr, depth=depth, q=q)
    banks = prep_dt3_banks(dt3)
    out = window_scores_device_v3(banks, fields, s_dim=s, c_dim=c,
                                  depth=depth, q=q)
    return out, tc


def build_fields(cand_lines, cand_mask, rast, valid, slice_idx, scene_tr,
                 *, depth, q, cap=None):
    """Construct the sorted item-field array for the kernel.

    ``cand_lines``: ``(S, C, L, 4)`` aligned candidates;
    ``cand_mask``: ``(S, C, L)``; ``rast``: ``(S, C, 2)`` rasterized align
    vectors; ``valid``: ``(S, C)``; ``slice_idx``: ``(S, C, L)``;
    ``scene_tr``: ``(S, 2)``.

    Returns ``(fields (N, NF) f32, tc (S, C) int32)`` with ``N`` a multiple
    of IB; items sorted by sid; one zero-weight sentinel per scene keeps the
    kernel's scene-flush logic complete.

    ``cap``: static upper bound on the number of NON-skip items (masked /
    invalid items sort to the end, so the stream can be truncated there and
    the kernel grid shrinks accordingly).  Must be an IB multiple and count
    the per-scene sentinels.
    """
    s, c, l = cand_mask.shape
    rx, ry = rast[..., 0], rast[..., 1]
    finite = jnp.isfinite(rx) & jnp.isfinite(ry)
    is_x_major = jnp.abs(rx) >= jnp.abs(ry)

    # Swap x/y for y-major candidates so the kernel is major-agnostic
    # (it then reads the transposed slice).
    vx = jnp.where(is_x_major, rx, ry)                    # (S, C) |.| == 1
    vy = jnp.where(is_x_major, ry, rx)
    trx = jnp.where(is_x_major, scene_tr[:, None, 0], scene_tr[:, None, 1])
    tr_y = jnp.where(is_x_major, scene_tr[:, None, 1], scene_tr[:, None, 0])

    # Covered steps per direction.  Budgets (see origins below):
    #   y: floor-value span <= 2*tc*|vy| + 1 (+-1 f32 jitter), patch holds
    #      NCH*8 rows minus 1 jitter margin and up to 7 alignment rows:
    #      2*tc*|vy| <= NCH*8 - 12.
    #   x: lane span <= 2*tc + 2, the 256-lane patch loses up to 127 to
    #      alignment and 1 to jitter margin: tc <= 62.
    y_budget = (NCH * 8 - 12) / 2.0
    avy = jnp.abs(vy)
    tc = jnp.minimum(float(min(TC_MAX, 62)),
                     jnp.floor(y_budget / jnp.maximum(avy, 1e-6)))
    tc = jnp.where(finite, tc, 0.0)                       # (S, C) f32

    ep = cand_lines.reshape(s, c, l, 2, 2)                # [p1, p2] x (x, y)
    e_x = ep[..., 0]                                      # (S, C, L, 2)
    e_y = ep[..., 1]
    e_maj = jnp.where(is_x_major[..., None, None], e_x, e_y)
    e_min = jnp.where(is_x_major[..., None, None], e_y, e_x)

    # Patch origins per endpoint: monotone extremes of the covered window,
    # 1-unit margin for f32 rounding jitter between this evaluation and the
    # kernel's per-lane evaluation.
    # Window-end translation offsets are candidate-level — compute once per
    # candidate (23x fewer elements than per item), then only the endpoint
    # add + truncation runs per item.
    tx_lo = (trx + (-tc) * vx)[..., None]                 # (S, C, 1)
    tx_hi = (trx + tc * vx)[..., None]
    ty_lo = (tr_y + (-tc) * vy)[..., None]
    ty_hi = (tr_y + tc * vy)[..., None]

    def origin(ex, ey):
        # ex/ey: (S, C, L)
        xa = (ex + tx_lo).astype(jnp.int32)
        xb = (ex + tx_hi).astype(jnp.int32)
        ya = (ey + ty_lo).astype(jnp.int32)
        yb = (ey + ty_hi).astype(jnp.int32)
        xm = jnp.minimum(xa, xb) - 1
        xmax = jnp.maximum(xa, xb) + 1
        ym = jnp.minimum(ya, yb) - 1
        ymax = jnp.maximum(ya, yb) + 1
        x0a = jnp.clip((xm // 128) * 128, 0, q - PATCH_W)
        y0a = jnp.clip((ym // 8) * 8, 0, q - NCH * 8)
        nch = jnp.clip((ymax - y0a) // 8 + 1, 1, NCH)
        # pack: bit 3 = window needs the second 128-lane chunk
        two = (xmax > x0a + 127).astype(jnp.int32)
        return (y0a.astype(jnp.float32), x0a.astype(jnp.float32),
                (nch + 8 * two).astype(jnp.float32))

    y0a0, x0a0, nch0 = origin(e_maj[..., 0], e_min[..., 0])
    y0a1, x0a1, nch1 = origin(e_maj[..., 1], e_min[..., 1])

    use = cand_mask & valid[..., None] & finite[..., None]
    wt = use.astype(jnp.float32)
    scene_id = jax.lax.broadcasted_iota(jnp.int32, (s, c, l), 0)
    sid = (scene_id * 2 + (~is_x_major[..., None]).astype(jnp.int32)) * depth \
        + slice_idx.astype(jnp.int32)
    sid = jnp.where(use, sid, s * 2 * depth)              # skips sort last

    bc = lambda a: jnp.broadcast_to(a[..., None], (s, c, l)).reshape(-1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (s, c, l), 1)
    cols = [
        sid.reshape(-1).astype(jnp.float32),
        slot.reshape(-1).astype(jnp.float32),
        wt.reshape(-1),
        bc(tc),
        # endpoint p1 (major, minor), endpoint p2 (major, minor)
        e_maj[..., 0].reshape(-1), e_min[..., 0].reshape(-1),
        e_maj[..., 1].reshape(-1), e_min[..., 1].reshape(-1),
        bc(vx), bc(vy), bc(trx), bc(tr_y),
        y0a0.reshape(-1), x0a0.reshape(-1), nch0.reshape(-1),
        y0a1.reshape(-1), x0a1.reshape(-1), nch1.reshape(-1),
        jnp.zeros(s * c * l, jnp.float32),                # F_T0
    ]
    fields = jnp.stack(cols, axis=-1)                     # (S*C*L, NF)

    # Sentinels: one zero-weight item per scene, sid = b * 2 * depth.
    sent = jnp.zeros((s, NF), jnp.float32)
    sent = sent.at[:, F_SID].set(
        (jnp.arange(s, dtype=jnp.int32) * 2 * depth).astype(jnp.float32))
    fields = jnp.concatenate([fields, sent], axis=0)

    n_raw = fields.shape[0]
    n_pad = -(-n_raw // IB) * IB
    pad = jnp.zeros((n_pad - n_raw, NF), jnp.float32)
    pad = pad.at[:, F_SID].set(float(s * 2 * depth))
    fields = jnp.concatenate([fields, pad], axis=0)

    key = fields[:, F_SID].astype(jnp.int32)
    _, perm = jax.lax.sort_key_val(key, jnp.arange(n_pad, dtype=jnp.int32))
    if cap is not None and cap < n_pad:
        perm = perm[:cap]
    fields = jnp.take(fields, perm, axis=0)
    return fields, tc.astype(jnp.int32)


def build_fields_ext(cand_lines, cand_mask, vdir, active, slice_idx,
                     scene_of, scene_tr, t0, *, depth, q):
    """Item fields for the straggler EXTENSION pass.

    A compacted flat candidate subset (``b`` candidates, possibly spanning
    scenes): lanes ``l < 64`` hold steps ``m = t0 + l`` along ``vdir`` (the
    walk direction already folded into the rasterized vector's sign); lanes
    >= 64 are garbage.  ``scene_of``: ``(b,)`` scene of each candidate;
    ``t0``: ``(b,)`` resume step.  Returns ``(fields, cover (b,) int32)``
    where steps ``t0 .. t0+cover`` are validly covered.
    """
    b, l = cand_mask.shape
    rx, ry = vdir[..., 0], vdir[..., 1]
    finite = jnp.isfinite(rx) & jnp.isfinite(ry)
    is_x_major = jnp.abs(rx) >= jnp.abs(ry)
    vx = jnp.where(is_x_major, rx, ry)
    vy = jnp.where(is_x_major, ry, rx)
    str_x = scene_tr[scene_of]                            # (b, 2)
    trx = jnp.where(is_x_major, str_x[:, 0], str_x[:, 1])
    tr_y = jnp.where(is_x_major, str_x[:, 1], str_x[:, 0])

    # one-sided coverage: floor-span <= cover*|vy| + 1 (+-1 jitter), patch
    # holds NCH*8 rows minus 1 jitter margin and up to 7 alignment rows.
    y_budget = float(NCH * 8 - 12)
    avy = jnp.abs(vy)
    cover = jnp.minimum(62.0, jnp.floor(y_budget / jnp.maximum(avy, 1e-6)))
    cover = jnp.where(finite & active, cover, 0.0)

    ep = cand_lines.reshape(b, l, 2, 2)
    e_x = ep[..., 0]
    e_y = ep[..., 1]
    e_maj = jnp.where(is_x_major[..., None, None], e_x, e_y)
    e_min = jnp.where(is_x_major[..., None, None], e_y, e_x)

    def origin(ex, ey):
        t_lo = t0[..., None]
        t_hi = (t0 + cover)[..., None]
        xa = (ex + (trx[..., None] + t_lo * vx[..., None])).astype(jnp.int32)
        xb = (ex + (trx[..., None] + t_hi * vx[..., None])).astype(jnp.int32)
        ya = (ey + (tr_y[..., None] + t_lo * vy[..., None])).astype(jnp.int32)
        yb = (ey + (tr_y[..., None] + t_hi * vy[..., None])).astype(jnp.int32)
        xm = jnp.minimum(xa, xb) - 1
        xmax = jnp.maximum(xa, xb) + 1
        ym = jnp.minimum(ya, yb) - 1
        ymax = jnp.maximum(ya, yb) + 1
        x0a = jnp.clip((xm // 128) * 128, 0, q - PATCH_W)
        y0a = jnp.clip((ym // 8) * 8, 0, q - NCH * 8)
        nch = jnp.clip((ymax - y0a) // 8 + 1, 1, NCH)
        # pack: bit 3 = window needs the second 128-lane chunk
        two = (xmax > x0a + 127).astype(jnp.int32)
        return (y0a.astype(jnp.float32), x0a.astype(jnp.float32),
                (nch + 8 * two).astype(jnp.float32))

    y0a0, x0a0, nch0 = origin(e_maj[..., 0], e_min[..., 0])
    y0a1, x0a1, nch1 = origin(e_maj[..., 1], e_min[..., 1])

    use = cand_mask & active[..., None] & finite[..., None]
    wt = use.astype(jnp.float32)
    sid = (scene_of[:, None] * 2 + (~is_x_major[:, None]).astype(jnp.int32)) \
        * depth + slice_idx.astype(jnp.int32)
    s_max = int(scene_tr.shape[0])
    sid = jnp.where(use, sid, s_max * 2 * depth)

    bc = lambda a: jnp.broadcast_to(a[..., None], (b, l)).reshape(-1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, l), 0)
    cols = [
        sid.reshape(-1).astype(jnp.float32),
        slot.reshape(-1).astype(jnp.float32),
        wt.reshape(-1),
        bc(cover),
        e_maj[..., 0].reshape(-1), e_min[..., 0].reshape(-1),
        e_maj[..., 1].reshape(-1), e_min[..., 1].reshape(-1),
        bc(vx), bc(vy), bc(trx), bc(tr_y),
        y0a0.reshape(-1), x0a0.reshape(-1), nch0.reshape(-1),
        y0a1.reshape(-1), x0a1.reshape(-1), nch1.reshape(-1),
        bc(t0),
    ]
    fields = jnp.stack(cols, axis=-1)

    n_raw = fields.shape[0]
    n_pad = -(-n_raw // IB) * IB
    pad = jnp.zeros((n_pad - n_raw, NF), jnp.float32)
    pad = pad.at[:, F_SID].set(float(s_max * 2 * depth))
    fields = jnp.concatenate([fields, pad], axis=0)

    key = fields[:, F_SID].astype(jnp.int32)
    _, perm = jax.lax.sort_key_val(key, jnp.arange(n_pad, dtype=jnp.int32))
    fields = jnp.take(fields, perm, axis=0)
    return fields, cover.astype(jnp.int32)


def window_scores_ext(dt3, dt3t, cand_lines, cand_mask, vdir, active,
                      slice_idx, scene_of, scene_tr, t0):
    """Extension-pass scores: ``(b, 64)`` where lane l is step ``t0 + l``
    along ``vdir``, plus per-candidate covered steps ``cover (b,)``
    (steps t0..t0+cover are valid)."""
    s, depth, q, _ = dt3.shape
    b = cand_mask.shape[0]
    fields, cover = build_fields_ext(cand_lines, cand_mask, vdir, active,
                                     slice_idx, scene_of, scene_tr, t0,
                                     depth=depth, q=q)
    out = window_scores_device(dt3, dt3t, fields, s_dim=s, c_dim=b,
                               depth=depth, q=q, single_flush=True)
    return out[0, :, :K_POS], cover


def window_scores(dt3, scene_tr, cand_lines, cand_mask, rast, valid,
                  slice_idx):
    """Full entry: ``dt3 (S, D, Q, Q)`` -> scores ``(S, C, K_LANES)`` plus
    per-candidate covered steps ``tc (S, C)``.

    Lane l < 64: step ``m = +l``.  Lane l >= 64: step ``m = -(l - 63)``.
    Steps beyond ``tc`` (either sign) are garbage and must be masked by the
    caller's chain logic.
    """
    s, depth, q, q2 = dt3.shape
    assert q == q2, "DT3 slices must be square"
    assert q >= PATCH_W, "kernel needs a canvas of at least PATCH_W"
    c = cand_mask.shape[1]
    fields, tc = build_fields(cand_lines, cand_mask, rast, valid, slice_idx,
                              scene_tr, depth=depth, q=q)
    dt3t = jnp.swapaxes(dt3, -1, -2)
    out = window_scores_device(dt3, dt3t, fields, s_dim=s, c_dim=c,
                               depth=depth, q=q)
    return out, tc


# ---------------------------------------------------------------------------
# Kernel v4: branch-free unrolled groups on precomputed packed indices
# ---------------------------------------------------------------------------
#
# r4 hardware profiling (scripts/proto_v4b.py) falsified the r3 belief that
# the kernel ran at vector-issue speed-of-light: the v3 body is LATENCY
# bound — each item is one serial dependent chain (index arith -> dynamic
# load -> gather -> select -> gather -> accumulate), and the per-item
# ``pl.when`` branches stop Mosaic from interleaving independent items, so
# throughput ~ chain latency (~110-150 ns/item) regardless of op count
# (which is why r3's one_chunk/one_ep ablations barely moved).
#
# v4 removes both serializers:
#   1. NO per-item control flow — masked items multiply by wt=0; the slice
#      state machine runs once per 8-item GROUP (the item stream pads every
#      (scene, major, slice) run to a multiple of 8, so sid is
#      group-uniform by construction);
#   2. the per-lane probe indices are PRECOMPUTED in a batched XLA pass
#      (``pack_gidx_v4``) with the reference's exact f32 op order — per
#      endpoint per lane one packed int32 ``dy*128 + li`` — so the kernel
#      body is just loads, gathers, selects, and the accumulate.
# Eight independent item chains per group unroll into straight-line code
# that Mosaic's scheduler interleaves: measured 28 ns/item rtt-corrected
# vs 133 for v3 on the same stream (2026-08-19, v5e via axon).  Exactness
# is per-lane bit-exact vs the XLA path (the identity-mapping deviance
# machinery of v3 is unnecessary — indices are computed, not inferred).

NKF4 = 7
K_SID, K_SLOT, K_WT, K_R0, K_LS0, K_R1, K_LS1 = range(7)


def _kernel_v4(kf_ref, gidx_ref, dt3_ref, dt3r_ref, dt3t_ref, dt3tr_ref,
               out_ref, slab, acc, state, sem, *, s_dim, c_dim, depth, q,
               single_flush=False):
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, K_LANES), 0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[...] = jnp.zeros((c_dim, K_LANES), jnp.float32)
        state[0] = -1
        state[1] = -1

    def flush(b):
        cp = pltpu.make_async_copy(acc, out_ref.at[b], sem)
        cp.start()
        cp.wait()
        acc[...] = jnp.zeros((c_dim, K_LANES), jnp.float32)

    def load_slice(sid):
        d = jax.lax.rem(sid, depth)
        bt = jax.lax.div(sid, depth)
        b = jax.lax.div(bt, 2)
        is_t = jax.lax.rem(bt, 2)

        def both(plain, rolled):
            c1 = pltpu.make_async_copy(plain.at[b, d], slab.at[pl.ds(0, q)],
                                       sem)
            c1.start()
            c1.wait()
            c2 = pltpu.make_async_copy(rolled.at[b, d], slab.at[pl.ds(q, q)],
                                       sem)
            c2.start()
            c2.wait()

        @pl.when(is_t == 0)
        def _():
            both(dt3_ref, dt3r_ref)

        @pl.when(is_t == 1)
        def _():
            both(dt3t_ref, dt3tr_ref)

    def group(g, _):
        g8 = pl.multiple_of(g * 8, 8)
        sid = kf_ref[g * 8, K_SID].astype(jnp.int32)     # group-uniform

        @pl.when(sid != state[0])
        def _():
            b = jax.lax.div(sid, 2 * depth)

            if not single_flush:
                @pl.when((state[1] >= 0) & (b != state[1])
                         & (state[1] < s_dim))
                def _():
                    flush(state[1])

            @pl.when(b < s_dim)
            def _():
                load_slice(sid)
            state[0] = sid
            state[1] = b

        blk = gidx_ref[pl.ds(g8, 8), :]                  # (8, 256) i32
        li_all = blk & 127
        dy_all = blk >> 7
        ds_all = dy_all & 7
        dc_all = dy_all >> 3

        for r in range(8):
            it = g * 8 + r
            wt = kf_ref[it, K_WT]
            slot = kf_ref[it, K_SLOT].astype(jnp.int32)

            def endpoint(c0, kr, kls):
                row0 = kf_ref[it, kr].astype(jnp.int32)
                ls = kf_ref[it, kls].astype(jnp.int32)
                ds = jnp.broadcast_to(ds_all[r:r + 1, c0:c0 + 128],
                                      (8, K_LANES))
                dc = jnp.broadcast_to(dc_all[r:r + 1, c0:c0 + 128],
                                      (8, K_LANES))
                li = jnp.broadcast_to(li_all[r:r + 1, c0:c0 + 128],
                                      (8, K_LANES))
                lanestart = pl.multiple_of(ls, 128)
                # one tall (NCH*8, 128) load; chunks are register slices
                tall = slab[pl.ds(pl.multiple_of(row0, 8), NCH * 8),
                            pl.ds(lanestart, 128)]
                v = jnp.zeros((8, K_LANES), jnp.float32)
                for k in range(NCH):
                    h = jnp.take_along_axis(tall[8 * k:8 * (k + 1)], li,
                                            axis=1)
                    v = jnp.where(dc == k, h, v)
                return jnp.take_along_axis(v, ds, axis=0)

            v0 = endpoint(0, K_R0, K_LS0)
            v1 = endpoint(128, K_R1, K_LS1)
            d = jnp.abs(v1 - v0) * wt
            base_s = pl.multiple_of((slot // 8) * 8, 8)
            acc[pl.ds(base_s, 8), :] = acc[pl.ds(base_s, 8), :] + \
                jnp.where(row8 == (slot % 8), d, 0.0)
        return 0

    jax.lax.fori_loop(0, IB // 8, group, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        if single_flush:
            flush(0)
        else:
            @pl.when((state[1] >= 0) & (state[1] < s_dim))
            def _():
                flush(state[1])


def window_scores_device_v4(banks, kf, gidx, *, s_dim, c_dim, depth, q,
                            single_flush=False):
    """Run the v4 kernel.  ``kf``: ``(N, NKF4)`` f32 scalar fields; ``gidx``:
    ``(N, 256)`` int32 packed per-lane indices; N a multiple of IB, items
    sorted by sid with 8-aligned (scene, major, slice) runs."""
    if c_dim % 8:
        # See window_scores_device: partial slot blocks would write past
        # the accumulator scratch.
        c_pad = -(-c_dim // 8) * 8
        out = window_scores_device_v4(banks, kf, gidx, s_dim=s_dim,
                                      c_dim=c_pad, depth=depth, q=q,
                                      single_flush=single_flush)
        return out[:, :c_dim]
    n = kf.shape[0]
    out_s = 1 if single_flush else s_dim
    return pl.pallas_call(
        partial(_kernel_v4, s_dim=s_dim, c_dim=c_dim, depth=depth, q=q,
                single_flush=single_flush),
        grid=(n // IB,),
        in_specs=[pl.BlockSpec((IB, NKF4), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((IB, 2 * K_LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((out_s, c_dim, K_LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * q, q), jnp.float32),
            pltpu.VMEM((c_dim, K_LANES), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.25 * 4 * (2 * q * q + c_dim * K_LANES))
            + 8 * 1024 * 1024,
        ),
        interpret=INTERPRET,
    )(kf, gidx, *banks)


def pack_gidx_v4(fields, *, q, two_sided=True):
    """v4 kernel inputs from a sorted NF3-layout fields array:
    ``(kf (N, NKF4) f32, gidx (N, 256) int32)``.

    Per lane l the probe step is ``m(l) = m_pat(l) + t0``; probe coords
    replicate the reference's op order (``dt3cpu.cpp:151-165``:
    ``tr + m*v`` then ``e + tr`` then int-trunc) per lane, so the packed
    ``dy*128 + li`` indices are bit-exact vs the XLA gather path.  The
    x window always fits one plain-or-rolled 128-lane chunk because
    ``build_fields_v4`` caps tc at ``x_fit - 1`` (the -1 absorbs the <=1
    trunc jitter between ``trunc(e+tr)+-tc`` and the per-lane truncation).

    Window origins come from the COVERED-WINDOW EXTREMES, computed
    per item (not per lane): the probe x is monotone in m (|vx| == 1
    exactly) and so is y (vy has one sign), so the min/max over covered
    lanes equal the values at the extreme covered steps ``m_lo``/``m_hi``
    — identical to the r4 per-lane reduction, at O(1) per item.  This
    keeps the (N, 256) pass a single fused elementwise producer of gidx
    (measured r4: the reduce-then-rebroadcast form cost ~55 ms on-chip
    per 1.66M-item dispatch; this form ~10 ms).
    """
    t0 = fields[:, G_T0]
    tc = fields[:, G_TC]
    m_lo = t0 - (tc if two_sided else 0.0)                 # (N,)
    m_hi = t0 + tc

    vx = fields[:, G_VX]
    vy = fields[:, G_VY]
    trm = fields[:, G_TRM]
    trn = fields[:, G_TRN]

    def origin(em, en):
        xa = jnp.clip((em + (trm + m_lo * vx)).astype(jnp.int32), 0, q - 1)
        xb = jnp.clip((em + (trm + m_hi * vx)).astype(jnp.int32), 0, q - 1)
        ya = jnp.clip((en + (trn + m_lo * vy)).astype(jnp.int32), 0, q - 1)
        yb = jnp.clip((en + (trn + m_hi * vy)).astype(jnp.int32), 0, q - 1)
        xmin = jnp.minimum(xa, xb)
        xmax = jnp.maximum(xa, xb)
        ymin = jnp.minimum(ya, yb)
        crossing = (xmin // 128) != (xmax // 128)
        ls = jnp.where(crossing, ((xmin - 64) // 128) * 128,
                       (xmin // 128) * 128)
        ls = jnp.clip(ls, 0, q - 128)
        x0a = ls + jnp.where(crossing, 64, 0)
        y0a = jnp.clip((ymin // 8) * 8, 0, q - NCH * 8)
        row0 = jnp.where(crossing, q, 0) + y0a
        return row0, ls, x0a, y0a

    row0_0, ls0, x0a0, y0a0 = origin(fields[:, G_E0M], fields[:, G_E0N])
    row0_1, ls1, x0a1, y0a1 = origin(fields[:, G_E1M], fields[:, G_E1N])

    lane = jnp.arange(K_LANES, dtype=jnp.float32)
    m_pat = jnp.where(lane < K_POS, lane, -(lane - (K_POS - 1)))
    m = m_pat[None, :] + t0[:, None]                       # (N, K) f32 exact

    def lanes(em, en, x0a, y0a):
        xi = jnp.clip(
            (em[:, None] + (trm[:, None] + m * vx[:, None])).astype(jnp.int32),
            0, q - 1)
        yi = jnp.clip(
            (en[:, None] + (trn[:, None] + m * vy[:, None])).astype(jnp.int32),
            0, q - 1)
        li = jnp.clip(xi - x0a[:, None], 0, 127)
        dy = jnp.clip(yi - y0a[:, None], 0, NCH * 8 - 1)
        return dy * 128 + li

    g0 = lanes(fields[:, G_E0M], fields[:, G_E0N], x0a0, y0a0)
    g1 = lanes(fields[:, G_E1M], fields[:, G_E1N], x0a1, y0a1)
    gidx = jnp.concatenate([g0, g1], axis=1)               # (N, 256)
    f32 = lambda a: a.astype(jnp.float32)
    kf = jnp.stack([fields[:, G_SID], fields[:, G_SLOT], fields[:, G_WT],
                    f32(row0_0), f32(ls0), f32(row0_1), f32(ls1)], axis=-1)
    return kf, gidx


def build_fields_ext_v4(cand_lines, cand_mask, vdir, active, slice_idx,
                        scene_of, scene_tr, t0, *, depth, q):
    """v4 item fields for the straggler extension pass: one-sided window
    ``[t0, t0+cover]``, lanes ``l < 64`` hold steps ``t0 + l``.

    Mirrors :func:`build_fields_ext_v3` minus the identity-deviance
    machinery (v4 lane indices are computed, not inferred) and plus the
    8-aligned (scene, major, slice) run padding the v4 group state machine
    requires.  No per-candidate x-fit cap is needed: a one-sided window
    spans <= cover+1+1 <= 63 columns, which always fits the plain-or-
    rolled 128-lane chunk ``pack_gidx_v4`` selects from the covered
    extremes."""
    b, l = cand_mask.shape
    rx, ry = vdir[..., 0], vdir[..., 1]
    finite = jnp.isfinite(rx) & jnp.isfinite(ry)
    is_x_major = jnp.abs(rx) >= jnp.abs(ry)
    vx = jnp.where(is_x_major, rx, ry)
    vy = jnp.where(is_x_major, ry, rx)
    str_x = scene_tr[scene_of]                            # (b, 2)
    trx = jnp.where(is_x_major, str_x[:, 0], str_x[:, 1])
    tr_y = jnp.where(is_x_major, str_x[:, 1], str_x[:, 0])

    avy = jnp.abs(vy)
    cover = jnp.minimum(61.0,
                        jnp.floor(Y_BUDGET3_EXT / jnp.maximum(avy, 1e-6)))
    cover = jnp.where(finite & active, cover, 0.0)

    ep = cand_lines.reshape(b, l, 2, 2)
    e_x = ep[..., 0]
    e_y = ep[..., 1]
    e_maj = jnp.where(is_x_major[..., None, None], e_x, e_y)
    e_min = jnp.where(is_x_major[..., None, None], e_y, e_x)

    use = cand_mask & active[..., None] & finite[..., None]
    wt = use.astype(jnp.float32)
    sid = (scene_of[:, None] * 2 + (~is_x_major[:, None]).astype(jnp.int32)) \
        * depth + slice_idx.astype(jnp.int32)
    s_max = int(scene_tr.shape[0])
    sid = jnp.where(use, sid, s_max * 2 * depth)

    bc = lambda a: jnp.broadcast_to(a[..., None], (b, l)).reshape(-1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (b, l), 0)
    cols = [
        sid.reshape(-1).astype(jnp.float32),
        slot.reshape(-1).astype(jnp.float32),
        wt.reshape(-1),
        bc(cover),
        e_maj[..., 0].reshape(-1), e_min[..., 0].reshape(-1),
        e_maj[..., 1].reshape(-1), e_min[..., 1].reshape(-1),
        bc(vx), bc(vy), bc(trx), bc(tr_y),
        bc(t0),
    ]
    fields = jnp.stack(cols, axis=-1)
    # 8-align every (scene, major, slice) run (counts via the sort
    # fallback: the compacted ext stream is ~66k rows, negligible)
    fields = _pad_runs_to_groups(fields, s_max * 2 * depth)

    n_raw = fields.shape[0]
    n_pad = -(-n_raw // IB) * IB
    pad = jnp.zeros((n_pad - n_raw, NF3), jnp.float32)
    pad = pad.at[:, G_SID].set(float(s_max * 2 * depth))
    fields = jnp.concatenate([fields, pad], axis=0)

    key = fields[:, G_SID].astype(jnp.int32)
    _, perm = jax.lax.sort_key_val(key, jnp.arange(n_pad, dtype=jnp.int32))
    fields = jnp.take(fields, perm, axis=0)
    return fields, cover.astype(jnp.int32)


def window_scores_ext_v4(banks, cand_lines, cand_mask, vdir, active,
                         slice_idx, scene_of, scene_tr, t0):
    """v4 extension-pass scores: ``(b, 64)`` where lane l is step ``t0 + l``
    along ``vdir``, plus per-candidate covered steps ``cover (b,)`` —
    drop-in for :func:`window_scores_ext_v3` at the v4 per-item cost
    (the ext pass was the one remaining v3-latency consumer on the v4
    path, ~17 ms/scene-batch on the pose bench)."""
    s, depth, q, _ = banks[0].shape
    b = cand_mask.shape[0]
    fields, cover = build_fields_ext_v4(cand_lines, cand_mask, vdir, active,
                                        slice_idx, scene_of, scene_tr, t0,
                                        depth=depth, q=q)
    kf, gidx = pack_gidx_v4(fields, q=q, two_sided=False)
    out = window_scores_device_v4(banks, kf, gidx, s_dim=s, c_dim=b,
                                  depth=depth, q=q, single_flush=True)
    return out[0, :, :K_POS], cover


def pad_margin_v4(s_count: int, depth: int) -> int:
    """Static upper bound on the extra stream rows the v4 builder adds:
    per-scene sentinels plus up to 7 run-alignment pads per (scene, major,
    slice) bin."""
    return s_count + 7 * (2 * depth * s_count)


def _pad_runs_to_groups(fields, n_bins, counts=None):
    """Append zero-weight pad rows so every sid run length is a multiple of
    8, then sort by sid.  ``fields`` already carries its sentinels; pads
    carry the run's sid (so groups stay sid-uniform) and wt = 0.

    ``counts``: optional precomputed per-bin row counts (incl. sentinels,
    excl. skip-sid rows).  ``build_fields_v4`` derives them from the
    (S, C, L) structure with a fused compare-reduce — a second full sort
    of the 2M-row stream just to count runs cost ~15 ms/dispatch on the
    pose bench (r4)."""
    sid = fields[:, G_SID].astype(jnp.int32)
    if counts is None:
        # per-bin counts via sorted searchsorted (a dense one-hot histogram
        # would materialize N x bins; a scatter-add histogram is ~40x slower
        # than a sort on TPU)
        sid_sorted = jnp.sort(sid)
        edges = jnp.searchsorted(sid_sorted,
                                 jnp.arange(n_bins + 1, dtype=jnp.int32))
        counts = edges[1:] - edges[:-1]                         # (bins,)
    need = (-counts) % 8                                        # (bins,)
    j8 = jax.lax.broadcasted_iota(jnp.int32, (n_bins, 8), 1)
    pad_sid = jnp.where(j8 < need[:, None],
                        jax.lax.broadcasted_iota(jnp.int32, (n_bins, 8), 0),
                        n_bins).reshape(-1)
    pads = jnp.zeros((n_bins * 8, fields.shape[1]), jnp.float32)
    pads = pads.at[:, G_SID].set(pad_sid.astype(jnp.float32))
    return jnp.concatenate([fields, pads], axis=0)


def build_fields_v4(cand_lines, cand_mask, rast, valid, slice_idx, scene_tr,
                    *, depth, q, cap=None):
    """v4 sorted item stream: ``(fields (N, NF3) f32, tc (S, C) int32)``.

    Same item semantics as :func:`build_fields_v3` minus the deviance
    machinery (v4 indices are exact), plus 8-alignment padding of every
    (scene, major, slice) run so the kernel's group state machine sees one
    sid per 8-item group.  ``cap`` (static) must include
    :func:`pad_margin_v4`; rows at and beyond the cap are guaranteed pads.
    """
    s, c, l = cand_mask.shape
    rx, ry = rast[..., 0], rast[..., 1]
    finite = jnp.isfinite(rx) & jnp.isfinite(ry)
    is_x_major = jnp.abs(rx) >= jnp.abs(ry)

    vx = jnp.where(is_x_major, rx, ry)                    # (S, C) |.| == 1
    vy = jnp.where(is_x_major, ry, rx)
    trx = jnp.where(is_x_major, scene_tr[:, None, 0], scene_tr[:, None, 1])
    tr_y = jnp.where(is_x_major, scene_tr[:, None, 1], scene_tr[:, None, 0])

    avy = jnp.abs(vy)
    tc = jnp.minimum(float(TC_MAX),
                     jnp.floor(Y_BUDGET3 / jnp.maximum(avy, 1e-6)))
    tc = jnp.where(finite, tc, 0.0)                       # (S, C) f32

    ep = cand_lines.reshape(s, c, l, 2, 2)                # [p1, p2] x (x, y)
    e_x = ep[..., 0]                                      # (S, C, L, 2)
    e_y = ep[..., 1]
    e_maj = jnp.where(is_x_major[..., None, None], e_x, e_y)
    e_min = jnp.where(is_x_major[..., None, None], e_y, e_x)

    # x_fit - 1: widest symmetric step window around each endpoint's base
    # column fitting ONE aligned 128-chunk (see build_fields_v3), minus one
    # step for the f32 trunc jitter of the exact per-lane columns.
    c0 = (e_maj + trx[..., None, None]).astype(jnp.int32)   # (S, C, L, 2)
    u = c0 % 128
    fit_plain = jnp.minimum(u, 127 - u)
    v = (c0 - 64) % 128
    fit_roll = jnp.minimum(v, 127 - v)
    x_fit = jnp.maximum(fit_plain, fit_roll)
    x_fit = jnp.where(cand_mask[..., None], x_fit, 127)
    tc = jnp.minimum(
        tc, (jnp.min(x_fit, axis=(-1, -2)) - 1).astype(jnp.float32))
    tc = jnp.maximum(tc, 0.0)

    use = cand_mask & valid[..., None] & finite[..., None]
    wt = use.astype(jnp.float32)
    scene_id = jax.lax.broadcasted_iota(jnp.int32, (s, c, l), 0)
    sid = (scene_id * 2 + (~is_x_major[..., None]).astype(jnp.int32)) * depth \
        + slice_idx.astype(jnp.int32)
    sid = jnp.where(use, sid, s * 2 * depth)              # skips sort last

    bc = lambda a: jnp.broadcast_to(a[..., None], (s, c, l)).reshape(-1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (s, c, l), 1)
    cols = [
        sid.reshape(-1).astype(jnp.float32),
        slot.reshape(-1).astype(jnp.float32),
        wt.reshape(-1),
        bc(tc),
        e_maj[..., 0].reshape(-1), e_min[..., 0].reshape(-1),
        e_maj[..., 1].reshape(-1), e_min[..., 1].reshape(-1),
        bc(vx), bc(vy), bc(trx), bc(tr_y),
        jnp.zeros(s * c * l, jnp.float32),                # G_T0
    ]
    fields = jnp.stack(cols, axis=-1)                     # (S*C*L, NF3)

    sent = jnp.zeros((s, NF3), jnp.float32)
    sent = sent.at[:, G_SID].set(
        (jnp.arange(s, dtype=jnp.int32) * 2 * depth).astype(jnp.float32))
    fields = jnp.concatenate([fields, sent], axis=0)
    # per-(scene, major, slice) run counts from the (S, C, L) structure —
    # a fused compare-reduce, replacing a second full sort of the stream
    eq = slice_idx.astype(jnp.int32)[..., None] == \
        jnp.arange(depth, dtype=jnp.int32)                  # (S, C, L, D)
    xm = (use & is_x_major[..., None])[..., None] & eq
    ym = (use & ~is_x_major[..., None])[..., None] & eq
    counts = jnp.stack([jnp.sum(xm, axis=(1, 2)),
                        jnp.sum(ym, axis=(1, 2))], axis=1)  # (S, 2, D)
    counts = counts.reshape(-1).astype(jnp.int32)
    counts = counts.at[jnp.arange(s) * 2 * depth].add(1)    # sentinels
    fields = _pad_runs_to_groups(fields, s * 2 * depth, counts=counts)

    n_raw = fields.shape[0]
    n_pad = -(-n_raw // IB) * IB
    pad = jnp.zeros((n_pad - n_raw, NF3), jnp.float32)
    pad = pad.at[:, G_SID].set(float(s * 2 * depth))
    fields = jnp.concatenate([fields, pad], axis=0)

    key = fields[:, G_SID].astype(jnp.int32)
    _, perm = jax.lax.sort_key_val(key, jnp.arange(n_pad, dtype=jnp.int32))
    if cap is not None and cap < n_pad:
        perm = perm[:cap]
    fields = jnp.take(fields, perm, axis=0)
    return fields, tc.astype(jnp.int32)


def window_scores_v4(dt3, scene_tr, cand_lines, cand_mask, rast, valid,
                     slice_idx):
    """v4 full entry, mirroring :func:`window_scores_v3`."""
    s, depth, q, q2 = dt3.shape
    assert q == q2 and q % 128 == 0, "v4 kernel needs a square 128-mult canvas"
    c = cand_mask.shape[1]
    fields, tc = build_fields_v4(cand_lines, cand_mask, rast, valid,
                                 slice_idx, scene_tr, depth=depth, q=q)
    kf, gidx = pack_gidx_v4(fields, q=q)
    banks = prep_dt3_banks(dt3)
    out = window_scores_device_v4(banks, kf, gidx, s_dim=s, c_dim=c,
                                  depth=depth, q=q)
    return out, tc
