"""Variant matrix for window-kernel v4: what actually bounds ns/item?

proto_v4 showed precomputed packed indices alone buy only ~8% — the kernel
is not arithmetic-issue-bound.  Hypothesis: per-item ``pl.when`` branches and
the serialized dependent chain (load->gather->select->gather->acc) make it
LATENCY-bound; Mosaic cannot interleave independent items across control
flow.  Variants (all on a stream whose (scene,major,slice) runs are padded
to 8-item groups so slice changes happen only at group boundaries):

  v4c  — unrolled 8-item groups, NO per-item branch (wt multiplies), packed
         gidx loaded as one (8,256) block + vreg broadcasts per item.
  v4d  — (dead: Mosaic rejects dynamic loads at unaligned sublane starts,
         "dynamic load with unaligned indices") replicated row loads.
  v4e  — like v4c but NO gidx: v3's in-kernel index arithmetic (identity
         mapping), branch-free + unrolled.  Tests whether branch removal
         alone is the lever (then the pack pass is unnecessary).

Usage: python scripts/proto_v4b.py [n_items] [reps]
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
import importlib.util                              # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "proto_v4", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "proto_v4.py"))
pv = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(pv)

K_LANES, K_POS, IB, NCH = wk.K_LANES, wk.K_POS, wk.IB, wk.NCH
NKF = pv.NKF
K_SID, K_SLOT, K_WT = pv.K_SID, pv.K_SLOT, pv.K_WT
K_R0, K_LS0, K_R1, K_LS1 = pv.K_R0, pv.K_LS0, pv.K_R1, pv.K_LS1


def _common(kf_ref, out_ref, slab, acc, state, sem, dt3_ref, dt3r_ref,
            dt3t_ref, dt3tr_ref, s_dim, c_dim, depth, q):
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

    def maybe_switch(sid):
        @pl.when(sid != state[0])
        def _():
            b = jax.lax.div(sid, 2 * depth)

            @pl.when((state[1] >= 0) & (b != state[1]) & (state[1] < s_dim))
            def _():
                flush(state[1])

            @pl.when(b < s_dim)
            def _():
                load_slice(sid)
            state[0] = sid
            state[1] = b

    def final():
        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            @pl.when((state[1] >= 0) & (state[1] < s_dim))
            def _():
                flush(state[1])

    return maybe_switch, final


def _kernel_v4c(kf_ref, gidx_ref, dt3_ref, dt3r_ref, dt3t_ref, dt3tr_ref,
                out_ref, slab, acc, state, sem, *, s_dim, c_dim, depth, q,
                variant):
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, K_LANES), 0)
    maybe_switch, final = _common(kf_ref, out_ref, slab, acc, state, sem,
                                  dt3_ref, dt3r_ref, dt3t_ref, dt3tr_ref,
                                  s_dim, c_dim, depth, q)

    def group(g, _):
        g8 = pl.multiple_of(g * 8, 8)
        sid = kf_ref[g * 8, K_SID].astype(jnp.int32)   # group-uniform
        maybe_switch(sid)

        if variant == "v4c":
            blk = gidx_ref[pl.ds(g8, 8), :]            # (8, 256) i32
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
                if variant == "v4c":
                    ds = jnp.broadcast_to(ds_all[r:r + 1, c0:c0 + 128],
                                          (8, K_LANES))
                    dc = jnp.broadcast_to(dc_all[r:r + 1, c0:c0 + 128],
                                          (8, K_LANES))
                    li = jnp.broadcast_to(li_all[r:r + 1, c0:c0 + 128],
                                          (8, K_LANES))
                else:  # v4d: replicated row load straight from the ref
                    rowv = gidx_ref[pl.ds(it, 1), pl.ds(c0, 128)]
                    rowb = jnp.broadcast_to(rowv, (8, K_LANES))
                    li = rowb & 127
                    dy = rowb >> 7
                    ds = dy & 7
                    dc = dy >> 3
                lanestart = pl.multiple_of(ls, 128)
                v = jnp.zeros((8, K_LANES), jnp.float32)
                for k in range(NCH):
                    ck = slab[pl.ds(pl.multiple_of(row0 + 8 * k, 8), 8),
                              pl.ds(lanestart, 128)]
                    g_ = jnp.take_along_axis(ck, li, axis=1)
                    v = jnp.where(dc == k, g_, v)
                return jnp.take_along_axis(v, ds, axis=0)

            v0 = endpoint(0, K_R0, K_LS0)
            v1 = endpoint(128, K_R1, K_LS1)
            d = jnp.abs(v1 - v0) * wt
            base_s = pl.multiple_of((slot // 8) * 8, 8)
            acc[pl.ds(base_s, 8), :] = acc[pl.ds(base_s, 8), :] + \
                jnp.where(row8 == (slot % 8), d, 0.0)
        return 0

    jax.lax.fori_loop(0, IB // 8, group, 0)
    final()


def _kernel_v4e(fields_ref, dt3_ref, dt3r_ref, dt3t_ref, dt3tr_ref,
                out_ref, slab, acc, state, sem, *, s_dim, c_dim, depth, q):
    """v3's in-kernel arithmetic, branch-free + 8-unrolled (no gidx)."""
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, K_LANES), 1)
    m_pat = jnp.where(lane_i < K_POS, lane_i, -(lane_i - (K_POS - 1)))
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, K_LANES), 0)
    maybe_switch, final = _common(fields_ref, out_ref, slab, acc, state, sem,
                                  dt3_ref, dt3r_ref, dt3t_ref, dt3tr_ref,
                                  s_dim, c_dim, depth, q)

    def group(g, _):
        sid = fields_ref[g * 8, wk.G_SID].astype(jnp.int32)
        maybe_switch(sid)

        for r in range(8):
            it = g * 8 + r
            wt = fields_ref[it, wk.G_WT]
            slot = fields_ref[it, wk.G_SLOT].astype(jnp.int32)
            tc_i = fields_ref[it, wk.G_TC].astype(jnp.int32)
            t0_i = fields_ref[it, wk.G_T0].astype(jnp.int32)
            vx = fields_ref[it, wk.G_VX]
            vy = fields_ref[it, wk.G_VY]
            trm = fields_ref[it, wk.G_TRM]
            trn = fields_ref[it, wk.G_TRN]
            s_i = jnp.where(vx < 0, -1, 1)
            m_lo = t0_i - tc_i
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
                ya = (en + (trn + m_lo.astype(jnp.float32) * vy)) \
                    .astype(jnp.int32)
                yb = (en + (trn + m_hi.astype(jnp.float32) * vy)) \
                    .astype(jnp.int32)
                ym = jnp.clip(jnp.minimum(ya, yb), 0, q - 1)
                y0a = jnp.clip((ym // 8) * 8, 0, q - NCH * 8)
                row0 = jnp.where(crossing, q, 0) + y0a
                lanestart = pl.multiple_of(ls, 128)

                off = x0a - c0
                m_col = s_i * (off + lane_i)
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

            v0 = endpoint(fields_ref[it, wk.G_E0M], fields_ref[it, wk.G_E0N])
            v1 = endpoint(fields_ref[it, wk.G_E1M], fields_ref[it, wk.G_E1N])
            d = jnp.abs(v1 - v0) * wt
            base_s = pl.multiple_of((slot // 8) * 8, 8)
            acc[pl.ds(base_s, 8), :] = acc[pl.ds(base_s, 8), :] + \
                jnp.where(row8 == (slot % 8), d, 0.0)
        return 0

    jax.lax.fori_loop(0, IB // 8, group, 0)
    final()


def run_v4c(banks, kf, gidx, *, s_dim, c_dim, depth, q, variant="v4c"):
    n = kf.shape[0]
    return pl.pallas_call(
        partial(_kernel_v4c, s_dim=s_dim, c_dim=c_dim, depth=depth, q=q,
                variant=variant),
        grid=(n // IB,),
        in_specs=[pl.BlockSpec((IB, NKF), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((IB, 2 * K_LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((s_dim, c_dim, K_LANES), jnp.float32),
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
    )(kf, gidx, *banks)


def run_v4e(banks, fields, *, s_dim, c_dim, depth, q):
    n = fields.shape[0]
    return pl.pallas_call(
        partial(_kernel_v4e, s_dim=s_dim, c_dim=c_dim, depth=depth, q=q),
        grid=(n // IB,),
        in_specs=[pl.BlockSpec((IB, wk.NF3), lambda i: (i, 0),
                               memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((s_dim, c_dim, K_LANES), jnp.float32),
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
    )(fields, *banks)


def make_grouped_workload(n_items, q=640, depth=30, c_dim=512, seed=0):
    """Synthetic stream with 8-aligned (sid) runs and slot-consistent
    candidate-level fields."""
    import scripts.profile_kernel as pk
    banks, fields = pk.make_workload(n_items, q=q, depth=depth, c_dim=c_dim,
                                     seed=seed)
    rng = np.random.default_rng(seed + 1)
    f = pv.__dict__.get("slotify")
    f_np = np.asarray(fields).copy()
    # group-uniform sids: assign sid per 8-item group, sorted
    n = f_np.shape[0]
    gsid = np.sort(rng.integers(0, 2 * depth, n // 8))
    f_np[:, wk.G_SID] = np.repeat(gsid, 8)
    f_np = pv.slotify(f_np, c_dim, rng)
    return banks, jnp.asarray(f_np), f_np


def main():
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 204800
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    q, depth, c_dim = 640, 30, 512
    print(f"backend: {jax.default_backend()} {jax.devices()}")

    def sync(x):
        return float(jnp.sum(x.reshape(-1)[:2]))

    # correctness of v4c/v4d/v4e on a small grouped stream
    banks_s, fields_s, f_np = make_grouped_workload(4096, q=q, depth=depth,
                                                    c_dim=c_dim, seed=3)
    packfn = jax.jit(lambda f: pv.pack_gidx_v4(f, q=q))
    kf_s, gidx_s = packfn(fields_s)
    want, cov = pv.oracle_np(np.asarray(banks_s[0]), f_np, 1, c_dim, depth, q)
    for name, fn in (
            ("v4c", jax.jit(partial(run_v4c, s_dim=1, c_dim=c_dim,
                                    depth=depth, q=q, variant="v4c"))),
    ):
        out = np.asarray(fn(banks_s, kf_s, gidx_s))
        bad = cov & (np.abs(out - want) > 1e-4 * np.maximum(np.abs(want), 1.0))
        print(f"correctness {name}: {bad.sum()} of {cov.sum()}")
    out = np.asarray(jax.jit(partial(run_v4e, s_dim=1, c_dim=c_dim,
                                     depth=depth, q=q))(banks_s, fields_s))
    bad = cov & (np.abs(out - want) > 1e-4 * np.maximum(np.abs(want), 1.0))
    print(f"correctness v4e: {bad.sum()} of {cov.sum()} "
          f"(identity deviance possible)")

    # ---- perf ----------------------------------------------------------
    banks, fields, f_np = make_grouped_workload(n_items, q=q, depth=depth,
                                                c_dim=c_dim)
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
        print(f"{name:16s}: {med*1e3:8.2f} ms  {med/n*1e9:7.1f} ns/item raw, "
              f"{corr/n*1e9:7.1f} rtt-corrected (min {min(walls)/n*1e9:.1f})")

    fn3 = jax.jit(partial(wk.window_scores_device_v3, s_dim=1, c_dim=c_dim,
                          depth=depth, q=q))
    bench("v3 kernel", fn3, banks, fields)

    kf, gidx = jax.block_until_ready(packfn(fields))
    for variant in ("v4c",):
        fnv = jax.jit(partial(run_v4c, s_dim=1, c_dim=c_dim, depth=depth,
                              q=q, variant=variant))
        bench(f"{variant} kernel", fnv, banks, kf, gidx)
    fne = jax.jit(partial(run_v4e, s_dim=1, c_dim=c_dim, depth=depth, q=q))
    bench("v4e kernel", fne, banks, fields)


if __name__ == "__main__":
    main()
