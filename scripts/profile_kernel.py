"""Per-phase hardware profiling of the window-scoring kernel (VERDICT r2
next-step #2: explain the 142 ns/item v3 measurement that falsified the
60 ns shuffle-port model).

Hypothesis under test: the per-item bound is NOT the VPU shuffle port but
the SCALAR unit — each ``fori_loop`` iteration performs ~13 SMEM scalar
reads, index arithmetic for 8 dynamic-start VMEM loads, and ``pl.when``
branch overhead, which at ~940 MHz puts a ~120-cycle (~130 ns) floor per
item regardless of the vector op mix.  The decisive variant is ``noop``
(scalar loop + state machine only, no vector work): if it measures close
to the full kernel, op-mix shaving is dead and the lever is item-level
batching (amortize scalar work across >=2 items per iteration).

Variants (all on the same synthetic item stream, q=640, depth=30):
  full      — the production v3 body
  one_ep    — single endpoint gathered (halves vector work)
  one_chunk — NCH=1 (one dynamic load + one sublane gather per endpoint)
  no_lane   — skip the final lane gather
  noop      — scalar loop + slice state machine only, accumulate a constant
  v2        — the production v2 kernel for the same stream (NF layout)

Usage: python scripts/profile_kernel.py [n_items] [reps]
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


def sync(x):
    """Honest completion through the axon relay: block_until_ready returns
    before remote execution finishes (the relay acks the enqueue), so force
    a tiny d2h readback instead."""
    return float(jnp.sum(x.reshape(-1)[:2]))


def _kernel_v3_phase(fields_ref, dt3_ref, dt3r_ref, dt3t_ref, dt3tr_ref,
                     out_ref, slab, acc, state, sem, *, s_dim, c_dim, depth,
                     q, phase):
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (8, wk.K_LANES), 1)
    m_pat = jnp.where(lane_i < wk.K_POS, lane_i, -(lane_i - (wk.K_POS - 1)))
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, wk.K_LANES), 0)
    NCH = wk.NCH

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc[...] = jnp.zeros((c_dim, wk.K_LANES), jnp.float32)
        state[0] = -1
        state[1] = -1

    def flush(b):
        cp = pltpu.make_async_copy(acc, out_ref.at[b], sem)
        cp.start()
        cp.wait()
        acc[...] = jnp.zeros((c_dim, wk.K_LANES), jnp.float32)

    def load_slice(sid):
        d = jax.lax.rem(sid, depth)
        bt = jax.lax.div(sid, depth)
        b = jax.lax.div(bt, 2)
        is_t = jax.lax.rem(bt, 2)

        def both(plain, rolled):
            c1 = pltpu.make_async_copy(plain.at[b, d], slab.at[pl.ds(0, q)], sem)
            c1.start()
            c1.wait()
            c2 = pltpu.make_async_copy(rolled.at[b, d], slab.at[pl.ds(q, q)], sem)
            c2.start()
            c2.wait()

        @pl.when(is_t == 0)
        def _():
            both(dt3_ref, dt3r_ref)

        @pl.when(is_t == 1)
        def _():
            both(dt3t_ref, dt3tr_ref)

    def body(it, _):
        sid = fields_ref[it, wk.G_SID].astype(jnp.int32)

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

        if phase == "noop_bare":
            # loop + sid state machine only: no wt branch, no acc write
            return 0
        wt = fields_ref[it, wk.G_WT]
        run_branchless = phase in ("nobranch", "nobranch_half")
        if phase == "noop_fixedacc":
            # unconditional accumulate at a FIXED base: isolates the cost of
            # the dynamic-base VMEM read-modify-write vs a static one
            acc[pl.ds(0, 8), :] = acc[pl.ds(0, 8), :] + wt
            return 0

        def guarded(body):
            # branchless phases: execute unconditionally (wt multiplies to
            # zero); baseline phases: skip masked items via pl.when
            if run_branchless:
                body()
                return body
            return pl.when(wt > 0.0)(body)

        @guarded
        def _():
            slot = fields_ref[it, wk.G_SLOT].astype(jnp.int32)
            base_s = pl.multiple_of((slot // 8) * 8, 8)
            if phase == "noop_noacc":
                # scalar reads + branch, no accumulator write
                state[2] = slot
                return
            if phase == "noop":
                acc[pl.ds(base_s, 8), :] = acc[pl.ds(base_s, 8), :] + wt
                return
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
                ya = (en + (trn + m_lo.astype(jnp.float32) * vy)).astype(jnp.int32)
                yb = (en + (trn + m_hi.astype(jnp.float32) * vy)).astype(jnp.int32)
                ym = jnp.clip(jnp.minimum(ya, yb), 0, q - 1)
                y0a = jnp.clip((ym // 8) * 8, 0, q - NCH * 8)
                row0 = jnp.where(crossing, q, 0) + y0a
                lanestart = pl.multiple_of(ls, 128)

                off = x0a - c0
                m_col = s_i * (off + lane_i)
                ycol = (en + (trn + m_col.astype(jnp.float32) * vy)).astype(jnp.int32)
                dy = jnp.clip(ycol - y0a, 0, NCH * 8 - 1)
                dc = dy >> 3
                ds = dy & 7
                v = jnp.zeros((8, wk.K_LANES), jnp.float32)
                nch = 1 if phase == "one_chunk" else NCH
                for k in range(nch):
                    ck = slab[pl.ds(pl.multiple_of(row0 + 8 * k, 8), 8),
                              pl.ds(lanestart, 128)]
                    h = jnp.take_along_axis(ck, ds, axis=0)
                    v = jnp.where(dc == k, h, v)
                if phase == "no_lane":
                    return v
                li = jnp.clip(-off + s_i * (m_pat + t0_i), 0, 127)
                return jnp.take_along_axis(v, li, axis=1)

            v0 = endpoint(fields_ref[it, wk.G_E0M], fields_ref[it, wk.G_E0N])
            if phase == "one_ep":
                d = jnp.abs(v0) * wt
            else:
                v1 = endpoint(fields_ref[it, wk.G_E1M], fields_ref[it, wk.G_E1N])
                d = jnp.abs(v1 - v0) * wt
            acc[pl.ds(base_s, 8), :] = acc[pl.ds(base_s, 8), :] + \
                jnp.where(row8 == (slot % 8), d, 0.0)
        return 0

    jax.lax.fori_loop(0, wk.IB, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        @pl.when((state[1] >= 0) & (state[1] < s_dim))
        def _():
            flush(state[1])


def run_phase(banks, fields, *, s_dim, c_dim, depth, q, phase):
    n = fields.shape[0]
    return pl.pallas_call(
        partial(_kernel_v3_phase, s_dim=s_dim, c_dim=c_dim, depth=depth,
                q=q, phase=phase),
        grid=(n // wk.IB,),
        in_specs=[pl.BlockSpec((wk.IB, wk.NF3), lambda i: (i, 0),
                               memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((s_dim, c_dim, wk.K_LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * q, q), jnp.float32),
            pltpu.VMEM((c_dim, wk.K_LANES), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.25 * 4 * (2 * q * q + c_dim * wk.K_LANES))
            + 4 * 1024 * 1024,
        ),
    )(fields, *banks)


def make_workload(n_items, q=640, depth=30, c_dim=512, seed=0):
    """Synthetic sorted item stream shaped like the pose bench (one scene)."""
    rng = np.random.default_rng(seed)
    n = -(-n_items // wk.IB) * wk.IB
    f = np.zeros((n, wk.NF3), np.float32)
    # sids sorted, spread over 2*depth slices of scene 0
    sid = np.sort(rng.integers(0, 2 * depth, n))
    f[:, wk.G_SID] = sid
    f[:, wk.G_SLOT] = rng.integers(0, c_dim, n)
    f[:, wk.G_WT] = 1.0
    f[:, wk.G_TC] = wk.TC_MAX
    ang = rng.uniform(-0.4, 0.4, n)                       # shallow rays
    f[:, wk.G_VX] = np.sign(rng.uniform(-1, 1, n)) * 1.0
    f[:, wk.G_VY] = np.tan(ang)
    f[:, wk.G_TRM] = rng.uniform(100, q - 100, n)
    f[:, wk.G_TRN] = rng.uniform(100, q - 100, n)
    f[:, wk.G_E0M] = rng.uniform(-40, 40, n)
    f[:, wk.G_E0N] = rng.uniform(-40, 40, n)
    f[:, wk.G_E1M] = rng.uniform(-40, 40, n)
    f[:, wk.G_E1N] = rng.uniform(-40, 40, n)
    # clamp probes to the canvas: recenter so e+tr stays in [64, q-64]
    for em, en in ((wk.G_E0M, wk.G_E0N), (wk.G_E1M, wk.G_E1N)):
        f[:, em] = np.clip(f[:, em] + f[:, wk.G_TRM], 96, q - 96) - f[:, wk.G_TRM]
        f[:, en] = np.clip(f[:, en] + f[:, wk.G_TRN], 96, q - 96) - f[:, wk.G_TRN]
    dt3 = jnp.asarray(rng.uniform(0, 50, (1, depth, q, q)).astype(np.float32))
    banks = wk.prep_dt3_banks(dt3)
    return jax.block_until_ready(banks), jnp.asarray(f)


def main():
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 204800
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    q, depth, c_dim = 640, 30, 512
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    banks, fields = make_workload(n_items, q=q, depth=depth, c_dim=c_dim)
    n = fields.shape[0]
    print(f"{n} items, q={q}, depth={depth}, c_dim={c_dim}, reps={reps}")

    # Relay round-trip floor: a trivial dispatch + 2-float d2h.  Every
    # wall below includes this constant; report raw and rtt-corrected.
    tiny = jnp.ones((8, 128), jnp.float32)
    tiny_fn = jax.jit(lambda x: x + 1.0)
    sync(tiny_fn(tiny))
    rtts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(tiny_fn(tiny))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]
    print(f"relay rtt floor: {rtt*1e3:.2f} ms (min {min(rtts)*1e3:.2f})")

    results = {}
    for phase in ["noop_bare", "noop_fixedacc", "noop_noacc", "noop",
                  "one_chunk", "no_lane", "one_ep", "full", "nobranch",
                  "nobranch_half"]:
        fields_use = fields
        if phase == "nobranch_half":
            f2h = np.asarray(fields).copy()
            f2h[::2, wk.G_WT] = 0.0                       # 50% masked
            fields_use = jnp.asarray(f2h)
        fn = jax.jit(partial(run_phase, s_dim=1, c_dim=c_dim, depth=depth,
                             q=q, phase=phase))
        sync(fn(banks, fields_use))                       # compile
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(banks, fields_use))
            walls.append(time.perf_counter() - t0)
        med = sorted(walls)[len(walls) // 2]
        results[phase] = med
        corr = max(med - rtt, 0.0)
        print(f"v3/{phase:13s}: {med*1e3:8.2f} ms  {med/n*1e9:7.1f} ns/item "
              f"raw, {corr/n*1e9:7.1f} rtt-corrected  "
              f"(min {min(walls)/n*1e9:.1f}, max {max(walls)/n*1e9:.1f})")

    # v2 for the same stream: build an equivalent NF-layout fields array
    f3 = np.asarray(fields)
    f2 = np.zeros((n, wk.NF), np.float32)
    f2[:, wk.F_SID] = f3[:, wk.G_SID]
    f2[:, wk.F_SLOT] = f3[:, wk.G_SLOT]
    f2[:, wk.F_WT] = f3[:, wk.G_WT]
    f2[:, wk.F_TC] = np.minimum(f3[:, wk.G_TC], 10)       # v2 y-budget
    f2[:, wk.F_E0X] = f3[:, wk.G_E0M]
    f2[:, wk.F_E0Y] = f3[:, wk.G_E0N]
    f2[:, wk.F_E1X] = f3[:, wk.G_E1M]
    f2[:, wk.F_E1Y] = f3[:, wk.G_E1N]
    f2[:, wk.F_VX] = f3[:, wk.G_VX]
    f2[:, wk.F_VY] = f3[:, wk.G_VY]
    f2[:, wk.F_TRX] = f3[:, wk.G_TRM]
    f2[:, wk.F_TRY] = f3[:, wk.G_TRN]
    tc2 = f2[:, wk.F_TC]
    for (em, en, gy, gx, gn) in ((wk.F_E0X, wk.F_E0Y, wk.F_Y0A0, wk.F_X0A0,
                                  wk.F_NCH0),
                                 (wk.F_E1X, wk.F_E1Y, wk.F_Y0A1, wk.F_X0A1,
                                  wk.F_NCH1)):
        xlo = (f2[:, em] + f2[:, wk.F_TRX] - tc2).astype(np.int32) - 1
        xhi = (f2[:, em] + f2[:, wk.F_TRX] + tc2).astype(np.int32) + 1
        ylo = (f2[:, en] + f2[:, wk.F_TRY] - tc2 * np.abs(f2[:, wk.F_VY])).astype(np.int32) - 1
        yhi = (f2[:, en] + f2[:, wk.F_TRY] + tc2 * np.abs(f2[:, wk.F_VY])).astype(np.int32) + 1
        x0a = np.clip((xlo // 128) * 128, 0, q - wk.PATCH_W)
        y0a = np.clip((ylo // 8) * 8, 0, q - wk.NCH * 8)
        nch = np.clip((yhi - y0a) // 8 + 1, 1, wk.NCH)
        two = (xhi > x0a + 127).astype(np.int32)
        f2[:, gy] = y0a
        f2[:, gx] = x0a
        f2[:, gn] = nch + 8 * two
    dt3 = banks[0]
    dt3t = banks[2]
    fn2 = jax.jit(partial(wk.window_scores_device, s_dim=1, c_dim=c_dim,
                          depth=depth, q=q))
    f2j = jnp.asarray(f2)
    sync(fn2(dt3, dt3t, f2j))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn2(dt3, dt3t, f2j))
        walls.append(time.perf_counter() - t0)
    med = sorted(walls)[len(walls) // 2]
    results["v2"] = med
    corr = max(med - rtt, 0.0)
    print(f"v2/full         : {med*1e3:8.2f} ms  {med/n*1e9:7.1f} ns/item "
          f"raw, {corr/n*1e9:7.1f} rtt-corrected  "
          f"(min {min(walls)/n*1e9:.1f}, max {max(walls)/n*1e9:.1f})")

    noop = results["noop"] / n * 1e9
    full = results["full"] / n * 1e9
    print(f"\nscalar floor (noop) = {noop:.1f} ns/item "
          f"= {noop/full*100:.0f}% of full v3 — "
          + ("SCALAR-BOUND: batch items per iteration"
         if noop > 0.6 * full else "vector work dominates: shave op mix"))


if __name__ == "__main__":
    main()
