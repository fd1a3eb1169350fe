"""Prototype: measure Mosaic in-VMEM gather primitives for the FDCM scoring
kernel (ROADMAP "slice-resident" path).

The scoring wall is XLA's scalar gather (~150M probes/s).  A slice-resident
Pallas kernel needs three primitives to beat it:
  E1  tpu.dynamic_gather along sublanes  (jnp.take_along_axis axis=0)
  E2  tpu.dynamic_gather along lanes     (jnp.take_along_axis axis=1)
  E3  dynamic-start VMEM vector loads    (ref[pl.ds(y, R), pl.ds(x, W)])
  E4  an end-to-end item loop: per (candidate,line) load a patch from the
      resident slice, sublane-gather the ray, accumulate per-candidate.

Run on the axon TPU: python scripts/proto_vmem_gather.py [e1 e2 e3 e4]
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
import openfdcm_tpu as of

of.enable_compilation_cache("/root/repo/.jax_cache")

ITERS = 2048


def timeit(fn, *args, n=30):
    res = fn(*args)
    jax.block_until_ready(res)
    float(jnp.sum(res if isinstance(res, jax.Array) else res[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        res = fn(*args)
    float(jnp.sum(res if isinstance(res, jax.Array) else res[0]))
    return (time.perf_counter() - t0 - 0.03) / n


# ---------------------------------------------------------------- E1 / E2
def gather_loop_kernel(tbl_ref, idx_ref, out_ref, *, axis, iters):
    tbl = tbl_ref[...]
    idx0 = idx_ref[...]

    def body(i, carry):
        acc, idx = carry
        g = jnp.take_along_axis(tbl, idx, axis=axis)
        r = tbl.shape[axis]
        idx = jnp.where(idx + 1 >= r, 0, idx + 1)
        return acc + g, idx

    acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.zeros_like(tbl), idx0))
    out_ref[...] = acc


def run_gather_shape(shape, axis):
    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.uniform(0, 100, shape).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, shape[axis], shape).astype(np.int32))
    fn = jax.jit(lambda t, i: pl.pallas_call(
        partial(gather_loop_kernel, axis=axis, iters=ITERS),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, i))
    try:
        dt = timeit(fn, tbl, idx)
        n_el = shape[0] * shape[1] * ITERS
        print(f"  axis={axis} {shape}: {dt/ITERS*1e9:8.1f} ns/gather-op "
              f"({n_el/dt/1e9:7.2f} G elem/s)")
    except Exception as e:
        print(f"  axis={axis} {shape}: FAIL {str(e)[:200]}")


# ---------------------------------------------------------------- E3
def dynload_kernel(s_ref, ys_ref, xs_ref, out_ref, *, rows, width, iters,
                   align):
    def body(i, acc):
        y = ys_ref[i]
        x = xs_ref[i]
        if align:
            x = pl.multiple_of(x, 128)
        patch = s_ref[pl.ds(y, rows), pl.ds(x, width)]
        return acc + patch

    out_ref[...] = jax.lax.fori_loop(
        0, iters, body, jnp.zeros((rows, width), jnp.float32))


def run_dynload(rows, width, align):
    rng = np.random.default_rng(1)
    H, W = 640, 768
    s = jnp.asarray(rng.uniform(0, 100, (H, W)).astype(np.float32))
    ys = rng.integers(0, H - rows, ITERS).astype(np.int32)
    xs = rng.integers(0, W - width, ITERS).astype(np.int32)
    if align:
        xs = (xs // 128) * 128
    fn = jax.jit(lambda s, ys, xs: pl.pallas_call(
        partial(dynload_kernel, rows=rows, width=width, iters=ITERS,
                align=align),
        out_shape=jax.ShapeDtypeStruct((rows, width), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(s, ys, xs))
    try:
        dt = timeit(fn, s, jnp.asarray(ys), jnp.asarray(xs))
        print(f"  load ({rows},{width}) align={align}: {dt/ITERS*1e9:8.1f} ns/load")
    except Exception as e:
        print(f"  load ({rows},{width}) align={align}: FAIL {str(e)[:200]}")


# ---------------------------------------------------------------- E4
# Realistic mini scoring loop: N items, each = one (candidate,line) pair.
# Slice resident; per item and endpoint: load R/8 aligned row-chunks of a
# (R, 256) patch (y0 8-aligned, x0 128-aligned), lane-gather with the exact
# per-probe lane index (li in [0,256)), sublane-gather with the per-probe
# row index, select across chunks, |diff|, accumulate into acc[slot].
def item_kernel(scal_ref, li_ref, dy_ref, w_ref, s_ref, out_ref, acc_ref, *,
                rows, k_lanes, n_items, n_cand):
    ib = scal_ref.shape[0]
    n_chunks = rows // 8
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, k_lanes), 0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[...] = jnp.zeros((n_cand, k_lanes), jnp.float32)

    def fetch(y0, x0, lim_b, sel, dy):
        y0 = pl.multiple_of(y0, 8)
        x0 = pl.multiple_of(x0, 128)
        val = jnp.zeros((8, k_lanes), jnp.float32)
        for k in range(n_chunks):
            ckl = s_ref[pl.ds(y0 + 8 * k, 8), pl.ds(x0, 128)]
            ckr = s_ref[pl.ds(y0 + 8 * k, 8), pl.ds(x0 + 128, 128)]
            g = jnp.where(sel, jnp.take_along_axis(ckl, lim_b, axis=1),
                          jnp.take_along_axis(ckr, lim_b, axis=1))
            h = jnp.take_along_axis(g, jnp.clip(dy - 8 * k, 0, 7), axis=0)
            val = jnp.where((dy >= 8 * k) & (dy < 8 * (k + 1)), h, val)
        return val

    def body(it, _):
        y0 = scal_ref[it, 0]
        x0 = scal_ref[it, 1]
        y1 = scal_ref[it, 2]
        x1 = scal_ref[it, 3]
        slot = scal_ref[it, 4]
        vs = []
        for e in range(2):
            li = jnp.broadcast_to(li_ref[it, e], (8, k_lanes))
            dy = jnp.broadcast_to(dy_ref[it, e], (8, k_lanes))
            lim = li & 127
            sel = li < 128
            vs.append(fetch(y0 if e == 0 else y1, x0 if e == 0 else x1,
                            lim, sel, dy))
        d = jnp.abs(vs[1] - vs[0]) * w_ref[it, 0]       # (8, K) rows identical
        base = pl.multiple_of((slot // 8) * 8, 8)
        contrib = jnp.where(row8 == (slot % 8), d, 0.0)
        acc_ref[pl.ds(base, 8), :] = acc_ref[pl.ds(base, 8), :] + contrib
        return 0

    jax.lax.fori_loop(0, ib, body, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = acc_ref[...]


def run_items(rows=16, k_lanes=128, n_items=4096, n_cand=512):
    rng = np.random.default_rng(2)
    H, W = 640, 768
    s = jnp.asarray(rng.uniform(0, 100, (H, W)).astype(np.float32))
    scal = np.zeros((n_items, 5), np.int32)
    scal[:, 0] = rng.integers(0, (H - rows) // 8, n_items) * 8
    scal[:, 1] = rng.integers(0, (W - 256) // 128, n_items) * 128
    scal[:, 2] = rng.integers(0, (H - rows) // 8, n_items) * 8
    scal[:, 3] = rng.integers(0, (W - 256) // 128, n_items) * 128
    scal[:, 4] = rng.integers(0, n_cand, n_items)
    li = rng.integers(0, 256, (n_items, 2, k_lanes)).astype(np.int32)
    dy = rng.integers(0, rows, (n_items, 2, k_lanes)).astype(np.int32)
    wt = np.ones((n_items, 1), np.float32)

    IB = 256
    fn = jax.jit(lambda sc, li, dy, w, s: pl.pallas_call(
        partial(item_kernel, rows=rows, k_lanes=k_lanes, n_items=n_items,
                n_cand=n_cand),
        grid=(n_items // IB,),
        out_shape=jax.ShapeDtypeStruct((n_cand, k_lanes), jnp.float32),
        in_specs=[pl.BlockSpec((IB, 5), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((IB, 2, k_lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((IB, 2, k_lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((IB, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_cand, k_lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_cand, k_lanes), jnp.float32)],
    )(sc, li, dy, w, s))
    try:
        dt = timeit(fn, jnp.asarray(scal), jnp.asarray(li),
                    jnp.asarray(dy), jnp.asarray(wt), s, n=10)
        probes = n_items * 2 * k_lanes
        print(f"  items R={rows} K={k_lanes} N={n_items}: {dt*1e3:.3f} ms "
              f"-> {dt/n_items*1e9:6.1f} ns/item, {probes/dt/1e9:6.2f} G probes/s")
    except Exception as e:
        print(f"  items R={rows}: FAIL {str(e)[:300]}")


# ---------------------------------------------------------------- E5
# XLA-level costs of building a slice-sorted item order on device.
def run_sortbench(n=1_200_000, nkeys=240):
    rng = np.random.default_rng(3)
    keys = jnp.asarray(rng.integers(0, nkeys, n).astype(np.int32))
    rows = jnp.asarray(rng.uniform(0, 1, (n, 8)).astype(np.float32))

    f_sort = jax.jit(lambda k: jax.lax.sort_key_val(
        k, jax.lax.iota(jnp.int32, n))[1])
    perm = f_sort(keys)
    t = timeit(f_sort, keys, n=10)
    print(f"  sort_key_val {n}: {t*1e3:.2f} ms")

    f_gather = jax.jit(lambda r, p: jnp.take(r, p, axis=0))
    t = timeit(f_gather, rows, perm, n=10)
    print(f"  row-gather {n}x8: {t*1e3:.2f} ms")

    def counting_perm(k):
        counts = jnp.bincount(k, length=nkeys)
        offs = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        onehot = jax.nn.one_hot(k, nkeys, dtype=jnp.int32)
        rank = jnp.take_along_axis(jnp.cumsum(onehot, axis=0), k[:, None],
                                   axis=1)[:, 0] - 1
        pos = offs[k] + rank
        return jnp.zeros(n, jnp.int32).at[pos].set(jax.lax.iota(jnp.int32, n))

    f_cnt = jax.jit(counting_perm)
    try:
        t = timeit(f_cnt, keys, n=10)
        print(f"  counting-perm {n}: {t*1e3:.2f} ms")
    except Exception as e:
        print(f"  counting-perm: FAIL {str(e)[:200]}")


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"e1", "e2", "e3", "e4"}
    print("backend:", jax.default_backend())
    if "e1" in which:
        print("E1: sublane dynamic_gather (take_along_axis axis=0)")
        for shape in [(8, 128), (16, 128), (32, 128), (64, 128), (8, 512)]:
            run_gather_shape(shape, 0)
    if "e2" in which:
        print("E2: lane dynamic_gather (take_along_axis axis=1)")
        for shape in [(8, 128), (8, 256), (8, 1024), (32, 128)]:
            run_gather_shape(shape, 1)
    if "e3" in which:
        print("E3: dynamic-start VMEM loads")
        run_dynload(16, 128, False)
        run_dynload(16, 128, True)
        run_dynload(32, 128, False)
        run_dynload(8, 256, False)
    if "e4" in which:
        print("E4: end-to-end item loop")
        run_items(16, 128)
        run_items(32, 128)
        run_items(64, 128)
    if "e5" in which:
        print("E5: on-device item ordering")
        run_sortbench()
