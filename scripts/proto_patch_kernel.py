"""Prototype: Pallas patch-gather scoring primitive (ROADMAP item).

Measures the achievable probe rate of the patch-DMA + sublane-gather
formulation of FDCM scoring: per (candidate, line, endpoint) the K probes
lie on consecutive x (lane-affine) with a <=16-row y window, so one ~4KB DMA
+ two single-vreg take_along_axis ops cover K probes.  Compares against
XLA's scalar gather on the same probe set.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import openfdcm_tpu as of

of.enable_compilation_cache("/root/repo/.jax_cache")

D, PH, PW = 30, 512, 576          # PW has a 64-col slack margin
C, L, K = 1024, 24, 16            # candidates x lines x window
BC = 8                            # candidates per grid cell
ROWS, KW = 16, 64
NSLOT = 8

rng = np.random.default_rng(0)
dt3 = jnp.asarray(rng.uniform(0, 100, (D, PH, PW)).astype(np.float32))
o_idx = jnp.asarray(rng.integers(0, D, (C, L)).astype(np.int32))
x0 = jnp.asarray(rng.integers(0, PW - 80, (C, L, 2)).astype(np.int32))
y0 = jnp.asarray(rng.integers(0, PH - 1, (C, L, 2)).astype(np.int32))
r = jnp.asarray(rng.uniform(-1, 1, (C,)).astype(np.float32))
lm = jnp.asarray(np.ones((C, L), np.float32))


def xla_scores(dt3, o_idx, x0, y0, r, lm):
    k = jnp.arange(K, dtype=jnp.float32)
    dy = jnp.round(r[:, None] * k).astype(jnp.int32)          # (C, K)
    xi = x0[..., None] + jnp.arange(K, dtype=jnp.int32)       # (C,L,2,K)
    yi = jnp.clip(y0[..., None] + dy[:, None, None, :], 0, PH - 1)
    flat = o_idx[..., None, None] * (PH * PW) + yi * PW + xi
    vals = jnp.take(dt3.reshape(-1), flat, mode="clip")       # (C,L,2,K)
    per_line = jnp.abs(vals[:, :, 1, :] - vals[:, :, 0, :])
    return jnp.sum(per_line * lm[..., None], axis=1)          # (C, K)


def kernel(o_ref, x_ref, y_ref, dy_ref, lm_ref, dt3_ref, out_ref,
           patch, acc_ref, sem):
    def issue(ci, l, e, slot):
        return pltpu.make_async_copy(
            dt3_ref.at[o_ref[ci, l],
                       pl.ds(y_ref[ci, l, e], ROWS),
                       pl.ds(x_ref[ci, l, e], KW)],
            patch.at[slot], sem.at[slot])

    def sel_patch(slot, ci):
        idx = dy_ref[ci, 0:8]                  # (8, KW) lane indices
        lo = jnp.take_along_axis(patch[slot][0:8], jnp.clip(idx, 0, 7), axis=0)
        hi = jnp.take_along_axis(patch[slot][8:16], jnp.clip(idx - 8, 0, 7),
                                 axis=0)
        return jnp.where(idx < 8, lo, hi)[0]   # (KW,)

    acc_ref[...] = jnp.zeros((BC, KW), jnp.float32)
    n_pairs = BC * L

    def body(i, carry):
        ci = jax.lax.div(i, L)
        l = jax.lax.rem(i, L)
        s0 = jax.lax.rem(2 * i, NSLOT)
        s1 = jax.lax.rem(2 * i + 1, NSLOT)
        nxt = i + NSLOT // 2

        @pl.when(nxt < n_pairs)
        def _():
            nci = jax.lax.div(nxt, L)
            nl = jax.lax.rem(nxt, L)
            issue(nci, nl, 0, jax.lax.rem(2 * nxt, NSLOT)).start()
            issue(nci, nl, 1, jax.lax.rem(2 * nxt + 1, NSLOT)).start()

        issue(ci, l, 0, s0).wait()
        issue(ci, l, 1, s1).wait()
        v0 = sel_patch(s0, ci)
        v1 = sel_patch(s1, ci)
        acc_ref[ci, :] = acc_ref[ci, :] + jnp.abs(v1 - v0) * lm_ref[ci, l]
        return carry

    for i in range(NSLOT // 2):
        issue(i // L, i % L, 0, (2 * i) % NSLOT).start()
        issue(i // L, i % L, 1, (2 * i + 1) % NSLOT).start()

    jax.lax.fori_loop(0, n_pairs, body, 0)
    out_ref[...] = acc_ref[...]


@jax.jit
def pallas_scores(dt3, o_idx, x0, y0, r, lm):
    k = jnp.arange(K, dtype=jnp.float32)
    dyk = jnp.round(r[:, None] * k).astype(jnp.int32)          # (C, K)
    ymin = y0 + jnp.minimum(jnp.round(r * (K - 1)), 0).astype(jnp.int32)[:, None, None]
    ylo = jnp.clip(ymin, 0, PH - ROWS)                          # (C, L, 2)
    off = (y0 - ylo)                                            # (C, L, 2)
    # Prototype simplification: common offset per candidate (perf only).
    dy_l = jnp.clip(off[:, 0, 0][:, None] + dyk, 0, ROWS - 1)   # (C, K)
    dy_lanes = jnp.zeros((C, ROWS, KW), jnp.int32)
    dy_lanes = dy_lanes.at[:, :, :K].set(dy_l[:, None, :])
    return pl.pallas_call(
        kernel,
        grid=(C // BC,),
        in_specs=[
            pl.BlockSpec((BC, L), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BC, L, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BC, L, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BC, ROWS, KW), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BC, L), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BC, KW), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, KW), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, ROWS, KW), jnp.float32),
            pltpu.VMEM((BC, KW), jnp.float32),
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
    )(o_idx, x0, ylo, dy_lanes, lm, dt3)


def bench(fn, *args, n=20):
    res = fn(*args)
    jax.block_until_ready(res)
    float(jnp.sum(res))
    t0 = time.perf_counter()
    for _ in range(n):
        res = fn(*args)
    float(jnp.sum(res))            # one real sync at the end
    total = time.perf_counter() - t0
    return max(total - 0.05, 1e-9) / n, res   # subtract ~one d2h round trip


if __name__ == "__main__":
    probes = C * L * 2 * K
    t_x, r_x = bench(jax.jit(xla_scores), dt3, o_idx, x0, y0, r, lm)
    print(f"XLA gather:   {t_x*1e3:.2f} ms  ({probes/t_x/1e6:.0f} M probes/s)")
    try:
        t_p, r_p = bench(pallas_scores, dt3, o_idx, x0, y0, r, lm)
        print(f"Pallas patch: {t_p*1e3:.2f} ms  ({probes/t_p/1e6:.0f} M probes/s)")
    except Exception as e:
        print("Pallas FAIL:", str(e)[:400])
        sys.exit(1)
