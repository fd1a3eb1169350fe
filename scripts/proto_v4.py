"""Prototype of window-kernel v4: precomputed packed per-lane gather indices.

ROOFLINE r3 showed the v3 kernel's cost is vector-issue count, dominated by
the per-endpoint index arithmetic (~25 vreg ops each); chunk loads/gathers
are nearly free.  v4 moves the whole per-lane index computation (probe
coords, dy, li) into a batched XLA pass that emits, per item, a packed
``(2 endpoints x 128 lanes)`` int32 vector ``dy*128 + li`` plus 6 scalar
fields (row0/lanestart/nch per endpoint).  The kernel body shrinks to:
unpack (amortized over 8-item groups), 3 sublane broadcasts per endpoint,
the 4 chunk loads+gathers, the final lane gather, and the accumulate.

As a bonus the packed indices are EXACT (computed with the reference's
float op order per lane), so v3's identity-deviance machinery disappears.

Usage: python scripts/proto_v4.py [n_items] [reps]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import openfdcm_tpu as of

of.ensure_backend()
of.enable_compilation_cache("/root/repo/.jax_cache")

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402
from jax.experimental import pallas as pl     # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from openfdcm_tpu.ops import window_kernel as wk  # noqa: E402

K_LANES, K_POS, IB, NCH = wk.K_LANES, wk.K_POS, wk.IB, wk.NCH

NKF = 9
K_SID, K_SLOT, K_WT = 0, 1, 2
K_R0, K_LS0, K_NCH0, K_R1, K_LS1, K_NCH1 = 3, 4, 5, 6, 7, 8


def pack_gidx_v4(fields, *, q, two_sided=True):
    """From a sorted NF3-layout fields array, the v4 kernel inputs:
    ``(kf (N, NKF) f32, gidx (N, 256) int32)``.

    Per lane l the probe step is ``m(l) = m_pat(l) + t0`` (identical to the
    v3 lane pattern); probe coords replicate the reference's op order
    ``tr + m*v`` then ``e + tr`` then int-trunc, so the packed indices are
    bit-exact vs the XLA gather path — no identity-mapping constraint.
    """
    lane = jnp.arange(K_LANES, dtype=jnp.float32)
    m_pat = jnp.where(lane < K_POS, lane, -(lane - (K_POS - 1)))
    t0 = fields[:, wk.G_T0]
    tc = fields[:, wk.G_TC]
    m = m_pat[None, :] + t0[:, None]                       # (N, K) f32 exact
    if two_sided:
        cov = jnp.abs(m_pat)[None, :] <= tc[:, None]
    else:
        cov = (m_pat >= 0)[None, :] & (m_pat[None, :] <= tc[:, None])

    vx = fields[:, wk.G_VX]
    vy = fields[:, wk.G_VY]
    tx = fields[:, wk.G_TRM][:, None] + m * vx[:, None]    # (N, K)
    ty = fields[:, wk.G_TRN][:, None] + m * vy[:, None]

    def endpoint(em, en):
        xi = jnp.clip((em[:, None] + tx).astype(jnp.int32), 0, q - 1)
        yi = jnp.clip((en[:, None] + ty).astype(jnp.int32), 0, q - 1)
        # lane-0 fallback keeps min/max defined when nothing is covered
        xs = jnp.where(cov, xi, xi[:, 0:1])
        ys = jnp.where(cov, yi, yi[:, 0:1])
        xmin = jnp.min(xs, axis=1)
        xmax = jnp.max(xs, axis=1)
        ymin = jnp.min(ys, axis=1)
        crossing = (xmin // 128) != (xmax // 128)
        ls = jnp.where(crossing, ((xmin - 64) // 128) * 128,
                       (xmin // 128) * 128)
        ls = jnp.clip(ls, 0, q - 128)
        x0a = ls + jnp.where(crossing, 64, 0)
        y0a = jnp.clip((ymin // 8) * 8, 0, q - NCH * 8)
        row0 = jnp.where(crossing, q, 0) + y0a
        li = jnp.clip(xi - x0a[:, None], 0, 127)
        dy = jnp.clip(yi - y0a[:, None], 0, NCH * 8 - 1)
        return row0, ls, dy * 128 + li

    row0_0, ls0, g0 = endpoint(fields[:, wk.G_E0M], fields[:, wk.G_E0N])
    row0_1, ls1, g1 = endpoint(fields[:, wk.G_E1M], fields[:, wk.G_E1N])
    gidx = jnp.concatenate([g0, g1], axis=1)               # (N, 256)
    f32 = lambda a: a.astype(jnp.float32)
    kf = jnp.stack([fields[:, wk.G_SID], fields[:, wk.G_SLOT],
                    fields[:, wk.G_WT], f32(row0_0), f32(ls0),
                    jnp.zeros_like(t0), f32(row0_1), f32(ls1),
                    jnp.zeros_like(t0)], axis=-1)
    return kf, gidx


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
        blk = gidx_ref[pl.ds(g8, 8), :]                    # (8, 256) i32
        li_all = blk & 127
        dy_all = blk >> 7
        ds_all = dy_all & 7
        dc_all = dy_all >> 3

        for r in range(8):
            it = g * 8 + r
            sid = kf_ref[it, K_SID].astype(jnp.int32)

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

            wt = kf_ref[it, K_WT]

            @pl.when(wt > 0.0)
            def _():
                slot = kf_ref[it, K_SLOT].astype(jnp.int32)

                def endpoint(c0, kr, kls):
                    # all index vectors are PER LANE (per step): gather
                    # columns->lanes first (per chunk), select the lane's
                    # chunk, then one sublane gather picks the lane's row.
                    row0 = kf_ref[it, kr].astype(jnp.int32)
                    ls = kf_ref[it, kls].astype(jnp.int32)
                    ds = jnp.broadcast_to(ds_all[r:r + 1, c0:c0 + 128],
                                          (8, K_LANES))
                    dc = jnp.broadcast_to(dc_all[r:r + 1, c0:c0 + 128],
                                          (8, K_LANES))
                    li = jnp.broadcast_to(li_all[r:r + 1, c0:c0 + 128],
                                          (8, K_LANES))
                    lanestart = pl.multiple_of(ls, 128)
                    v = jnp.zeros((8, K_LANES), jnp.float32)
                    for k in range(NCH):
                        ck = slab[pl.ds(pl.multiple_of(row0 + 8 * k, 8), 8),
                                  pl.ds(lanestart, 128)]
                        g = jnp.take_along_axis(ck, li, axis=1)
                        v = jnp.where(dc == k, g, v)
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
                            single_flush=False, interpret=False):
    n = kf.shape[0]
    out_s = 1 if single_flush else s_dim
    return pl.pallas_call(
        partial(_kernel_v4, s_dim=s_dim, c_dim=c_dim, depth=depth, q=q,
                single_flush=single_flush),
        grid=(n // IB,),
        in_specs=[pl.BlockSpec((IB, NKF), lambda i: (i, 0),
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
        interpret=interpret,
    )(kf, gidx, *banks)


def v4_full(banks, fields, *, s_dim, c_dim, depth, q):
    kf, gidx = pack_gidx_v4(fields, q=q)
    return window_scores_device_v4(banks, kf, gidx, s_dim=s_dim, c_dim=c_dim,
                                   depth=depth, q=q)


def oracle_np(dt3_np, fields_np, s_dim, c_dim, depth, q):
    """NumPy oracle: per covered lane the exact reference-order score sum."""
    lane = np.arange(K_LANES, dtype=np.float32)
    m_pat = np.where(lane < K_POS, lane, -(lane - (K_POS - 1)))
    out = np.zeros((s_dim, c_dim, K_LANES), np.float32)
    cov_any = np.zeros((s_dim, c_dim, K_LANES), bool)
    for f in fields_np:
        sid = int(f[wk.G_SID])
        if sid >= s_dim * 2 * depth or f[wk.G_WT] <= 0:
            continue
        b, rem = divmod(sid, 2 * depth)
        is_t, d = divmod(rem, depth)
        img = dt3_np[b, d]
        if is_t:
            img = img.T
        m = (m_pat + np.float32(f[wk.G_T0])).astype(np.float32)
        cov = np.abs(m_pat) <= f[wk.G_TC]
        tx = np.float32(f[wk.G_TRM]) + m * np.float32(f[wk.G_VX])
        ty = np.float32(f[wk.G_TRN]) + m * np.float32(f[wk.G_VY])
        vals = []
        for em, en in ((wk.G_E0M, wk.G_E0N), (wk.G_E1M, wk.G_E1N)):
            xi = (np.float32(f[em]) + tx).astype(np.int32)
            yi = (np.float32(f[en]) + ty).astype(np.int32)
            xi = np.clip(xi, 0, q - 1)
            yi = np.clip(yi, 0, q - 1)
            vals.append(img[yi, xi])
        slot = int(f[wk.G_SLOT])
        out[b, slot] += np.where(cov, np.abs(vals[1] - vals[0]), 0.0)
        cov_any[b, slot] |= cov
    return out, cov_any


def slotify(f_np, c_dim, rng):
    """Make the synthetic stream production-shaped: items of one slot
    (candidate) share the candidate-level fields (vx, vy, tr, tc) — the
    kernel writes ALL 128 lanes of every item (uncovered lanes hold
    garbage), so per-slot coverage must be consistent or the garbage of
    one item pollutes lanes covered by another."""
    f = f_np.copy()
    slots = f[:, wk.G_SLOT].astype(np.int64)
    for c in np.unique(slots):
        rows = np.where(slots == c)[0]
        for col in (wk.G_VX, wk.G_VY, wk.G_TRM, wk.G_TRN):
            f[rows, col] = f[rows[0], col]
    f[:, wk.G_TC] = np.minimum(
        30.0, np.floor(11.5 / np.maximum(np.abs(f[:, wk.G_VY]), 1e-6)))
    return f


def main():
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 204800
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    q, depth, c_dim = 640, 30, 512
    print(f"backend: {jax.default_backend()} {jax.devices()}")

    def sync(x):
        return float(jnp.sum(x.reshape(-1)[:2]))

    # ---- correctness on a small stream --------------------------------
    import scripts.profile_kernel as pk
    rng = np.random.default_rng(3)
    banks_s, fields_s = pk.make_workload(4096, q=q, depth=depth, c_dim=c_dim,
                                         seed=3)
    f_np = slotify(np.asarray(fields_s), c_dim, rng)
    fields_s = jnp.asarray(f_np)
    out4 = jax.jit(partial(v4_full, s_dim=1, c_dim=c_dim, depth=depth, q=q))(
        banks_s, fields_s)
    out4 = np.asarray(out4)
    want, cov = oracle_np(np.asarray(banks_s[0]), f_np, 1, c_dim, depth, q)
    bad = cov & (np.abs(out4 - want) > 1e-4 * np.maximum(np.abs(want), 1.0))
    print(f"correctness: {bad.sum()} mismatching covered lanes "
          f"of {cov.sum()}")
    if bad.sum():
        idx = np.argwhere(bad)[:8]
        for b, c, l in idx:
            print(f"  b={b} c={c} lane={l}: v4={out4[b, c, l]} "
                  f"want={want[b, c, l]}")
        sys.exit(1)

    # ---- perf ----------------------------------------------------------
    banks, fields = pk.make_workload(n_items, q=q, depth=depth, c_dim=c_dim)
    f_np = slotify(np.asarray(fields), c_dim, rng)
    fields = jnp.asarray(f_np)
    n = fields.shape[0]
    print(f"{n} items, q={q}, depth={depth}, c_dim={c_dim}, reps={reps}")

    tiny = jnp.ones((8, 128), jnp.float32)
    tiny_fn = jax.jit(lambda x: x + 1.0)
    sync(tiny_fn(tiny))
    rtts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(tiny_fn(tiny))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    print(f"relay rtt floor: {rtt*1e3:.2f} ms")

    def bench(name, fn, *args):
        sync(fn(*args))
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(*args))
            walls.append(time.perf_counter() - t0)
        med = sorted(walls)[len(walls) // 2]
        corr = max(med - rtt, 0.0)
        print(f"{name:18s}: {med*1e3:8.2f} ms  {med/n*1e9:7.1f} ns/item raw, "
              f"{corr/n*1e9:7.1f} rtt-corrected "
              f"(min {min(walls)/n*1e9:.1f})")
        return med

    # v3 baseline
    fn3 = jax.jit(partial(wk.window_scores_device_v3, s_dim=1, c_dim=c_dim,
                          depth=depth, q=q))
    bench("v3 kernel", fn3, banks, fields)

    # v4: pack+kernel fused in one jit
    fn4 = jax.jit(partial(v4_full, s_dim=1, c_dim=c_dim, depth=depth, q=q))
    bench("v4 pack+kernel", fn4, banks, fields)

    # pack alone (to split prep vs kernel cost)
    fnp = jax.jit(partial(pack_gidx_v4, q=q))
    sync(fnp(fields)[1])
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        kf, gidx = fnp(fields)
        sync(gidx)
        walls.append(time.perf_counter() - t0)
    med = sorted(walls)[len(walls) // 2]
    print(f"{'v4 pack alone':18s}: {med*1e3:8.2f} ms  "
          f"{max(med-rtt,0)/n*1e9:7.1f} ns/item rtt-corrected")

    # kernel alone on prebuilt inputs
    kf, gidx = jax.block_until_ready(fnp(fields))
    fnk = jax.jit(partial(window_scores_device_v4, s_dim=1, c_dim=c_dim,
                          depth=depth, q=q))
    bench("v4 kernel alone", fnk, banks, kf, gidx)


if __name__ == "__main__":
    main()
