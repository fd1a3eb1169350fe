"""Fine-grained timing of match_many internals on the bench workload.

Dev tool. Reproduces the exact bench.py configuration and times each stage
with explicit d2h syncs so the axon relay cannot hide queue time.
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openfdcm_tpu as of
from openfdcm_tpu.core import geometry as geo
from openfdcm_tpu.matching import featuremap as fm
from openfdcm_tpu.matching import optimize as opt
from openfdcm_tpu.matching import pipeline as pl
from openfdcm_tpu.matching.match import prepare_templates

ASSETS = "/root/reference/notebooks/assets"


def sync(x):
    # honest sync through the relay: tiny d2h
    return float(jnp.sum(x.reshape(-1)[:1]))


def main():
    of.enable_compilation_cache("/root/repo/.jax_cache")
    obj = "obj_01"
    templates = [of.read(p) for p in sorted(glob.glob(f"{ASSETS}/{obj}/templates/*.tmpl"))]
    scenes = [of.read(p) for p in sorted(glob.glob(f"{ASSETS}/{obj}/scene_*/camera_0.scene"))]
    params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
    optimizer = of.BatchOptimize(10)
    searcher = of.DefaultSearch(4, 10)
    lengths = of.get_template_lengths(templates)
    bank = prepare_templates(templates)
    print(f"{len(templates)} templates, {len(scenes)} scenes", file=sys.stderr)

    def full():
        return of.match_many(scenes, bank, params, searcher, optimizer,
                             penalty=of.ExponentialPenalty(1.5),
                             template_lengths=lengths, top_k=10)

    t0 = time.perf_counter()
    full()
    print(f"warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    for it in range(3):
        t0 = time.perf_counter()
        full()
        print(f"full match_many: {time.perf_counter()-t0:.3f}s", file=sys.stderr)

    # --- stage 1: featuremap build ------------------------------------
    for it in range(3):
        t0 = time.perf_counter()
        fms = pl.build_featuremap_batch(scenes, params, pad_to=128)
        sync(fms.dt3)
        t1 = time.perf_counter()
        print(f"build_featuremap_batch(10): {t1-t0:.3f}s  shape={fms.dt3.shape}",
              file=sys.stderr)

    # --- stage 2: host pair generation --------------------------------
    arrs = [geo.as_lines_np(s) for s in scenes]
    for it in range(2):
        t0 = time.perf_counter()
        per_scene_pairs = [pl._bank_pairs_for_scene(searcher, bank, a) for a in arrs]
        t1 = time.perf_counter()
        print(f"host pair-gen x10: {t1-t0:.3f}s  pmax={max(p.shape[0] for p in per_scene_pairs)}",
              file=sys.stderr)

    # --- stage 3: search dispatch + convert ---------------------------
    post = (jnp.asarray(lengths, jnp.float32), jnp.float32(1.5), 10)
    for it in range(3):
        t0 = time.perf_counter()
        disp = pl._search_chunk_dispatch(searcher, optimizer, fms, bank,
                                         scenes, mesh=None, post=post)
        t1 = time.perf_counter()
        res = pl._search_chunk_convert(*disp)
        t2 = time.perf_counter()
        print(f"search dispatch: {t1-t0:.3f}s  convert(d2h+host): {t2-t1:.3f}s",
              file=sys.stderr)

    # --- stage 3b: device-only optimize (direct) ----------------------
    # time the jitted search fn alone by re-calling dispatch with the same
    # inputs; the dispatch includes host prep, so separately time the jit'd
    # inner call via the parts already built.
    from openfdcm_tpu.matching.optimize_kernel import (
        optimize_candidates_batch_kernel, kernel_supported)
    print("kernel_supported:",
          kernel_supported(fms.dt3.shape, "batch", None), file=sys.stderr)

    # --- stage 4: kernel sub-stages on the real candidate set ---------
    # (VERDICT r3 #3: where the non-kernel half of the per-scene time goes)
    from openfdcm_tpu.matching.match import _make_candidates
    from openfdcm_tpu.core import rasterize as ras
    from openfdcm_tpu.ops import window_kernel as wk
    import jax
    from functools import partial as _part

    pairs0 = pl._bank_pairs_for_scene(searcher, bank, arrs[0])
    pb = -(-pairs0.shape[0] // 64) * 64
    pair_arr = np.zeros((len(scenes), pb, 3), np.int32)
    for i, a in enumerate(arrs):
        pp = pl._bank_pairs_for_scene(searcher, bank, a)
        pair_arr[i, : pp.shape[0]] = pp
    s_count = len(scenes)
    p = pb

    @jax.jit
    def gen_all(pt, ptl, psl, sc):
        def gen(pt, ptl, psl, sc):
            aligned, transforms, align_vecs = _make_candidates(
                bank.lines, bank.mask, pt, ptl, psl, sc, bank.lmax)
            return (aligned.reshape(2 * p, bank.lmax, 4),
                    jnp.repeat(bank.mask[pt], 2, axis=0),
                    jnp.repeat(align_vecs, 2, axis=0))
        return jax.vmap(gen)(pt, ptl, psl, sc)

    nb = pl._bucket(max(a.shape[0] for a in arrs), 128)
    scene_arr = np.zeros((s_count, nb, 4), np.float32)
    for i, a in enumerate(arrs):
        scene_arr[i, : a.shape[0]] = a
    scene_dev = jnp.asarray(scene_arr)
    pt = jnp.asarray(pair_arr[:, :, 0])
    ptl = jnp.asarray(pair_arr[:, :, 1])
    psl = jnp.asarray(pair_arr[:, :, 2])
    fsd = jnp.asarray([[float(w), float(h)] for (w, h) in fms.feature_sizes])

    def timeit(label, f, *args, reps=3, **kw):
        out = jax.block_until_ready(f(*args, **kw))
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(*args, **kw))
            walls.append(time.perf_counter() - t0)
        med = sorted(walls)[len(walls) // 2]
        print(f"  {label}: {med*1e3:8.2f} ms (min {min(walls)*1e3:.1f}, "
              f"max {max(walls)*1e3:.1f})", file=sys.stderr)
        return out

    if not kernel_supported(fms.dt3.shape, "batch", None):
        print("kernel path unsupported on this backend; stopping at stage 3",
              file=sys.stderr)
        return
    print("-- kernel sub-stages (candidate set of the full scene batch):",
          file=sys.stderr)
    cl, cm, ca = timeit("make_candidates", gen_all, pt, ptl, psl, scene_dev)
    s, d, q, _ = fms.dt3.shape

    full_fn = _part(optimize_candidates_batch_kernel, mode="batch", window=10)
    timeit("optimize full (kernel+chains+stragglers)", full_fn,
           fms.dt3, fms.angles, fms.scene_translations, fsd, cl, cm, ca)
    nostrag = _part(optimize_candidates_batch_kernel, mode="batch",
                    window=10, skip_straggler=True)
    timeit("optimize skip_straggler", nostrag,
           fms.dt3, fms.angles, fms.scene_translations, fsd, cl, cm, ca)

    @jax.jit
    def prep_only(cl, cm, ca, scene_tr, fsz):
        from openfdcm_tpu.core import geometry as geo2
        from openfdcm_tpu.matching import featuremap as fm2
        null_align = geo2.relatively_equal(jnp.sum(jnp.abs(ca), axis=-1), 0.0)
        rast = ras.rasterize_vector(ca)
        neg, pos = fm2.minmax_translation_raw(
            cl, rast, fsz[:, None, :], scene_tr[:, None, :], cm)
        valid = jnp.isfinite(neg) & jnp.isfinite(pos) & ~null_align
        theta = geo2.get_angle(cl)
        slice_idx = fm2.closest_orientation_idx(fms.angles, theta)
        return rast, valid, slice_idx

    rast, valid, slice_idx = timeit(
        "minmax/slice prep", prep_only, cl, cm, ca, fms.scene_translations,
        fsd)
    fields_fn = jax.jit(_part(wk.build_fields_v4, depth=d, q=q))
    fields, _tc = timeit("build_fields_v4", fields_fn, cl, cm, rast, valid,
                         slice_idx, fms.scene_translations)
    pack_fn = jax.jit(_part(wk.pack_gidx_v4, q=q))
    kf, gidx = timeit(f"pack_gidx_v4 ({fields.shape[0]} items)", pack_fn,
                      fields)
    banks = timeit("prep_dt3_banks", jax.jit(wk.prep_dt3_banks), fms.dt3)
    c_dim = cm.shape[1]
    kern4 = jax.jit(_part(wk.window_scores_device_v4, s_dim=s, c_dim=c_dim,
                          depth=d, q=q))
    timeit(f"window kernel v4 main ({kf.shape[0]} items)", kern4,
           tuple(banks), kf, gidx)
    kern3 = jax.jit(_part(wk.window_scores_device_v3, s_dim=s, c_dim=c_dim,
                          depth=d, q=q))
    fields3_fn = jax.jit(_part(wk.build_fields_v3, depth=d, q=q))
    fields3, _ = fields3_fn(cl, cm, rast, valid, slice_idx,
                            fms.scene_translations)
    timeit(f"window kernel v3 main ({fields3.shape[0]} items)", kern3,
           tuple(banks), fields3)
    n_items = fields.shape[0]
    print(f"  (kernel items: {n_items}; see profile_kernel.py for ns/item "
          f"phase breakdown)", file=sys.stderr)

    # --- stage 5: DT3 build sub-stages --------------------------------
    from openfdcm_tpu.core.dt import dt_from_indicator
    from openfdcm_tpu.core import integral
    from openfdcm_tpu.matching import featuremap as fm2
    print("-- DT3 build sub-stages (scene batch):", file=sys.stderr)
    metas = [fm2.scene_centered_translation(a, params.padding) for a in arrs]
    phys = max(max(w, h) for _, (w, h) in metas)
    phys = -(-phys // 128) * 128
    nbl = max(-(-a.shape[0] // 128) * 128 for a in arrs)
    lines = np.zeros((s_count, nbl, 4), np.float32)
    lmask = np.zeros((s_count, nbl), bool)
    lhw = np.zeros((s_count, 2), np.int32)
    for i, (a, (tr, (w, h))) in enumerate(zip(arrs, metas)):
        lines[i, : a.shape[0]] = a + np.concatenate([tr, tr]).astype(np.float32)
        lmask[i, : a.shape[0]] = True
        lhw[i] = (h, w)
    angles = fm2.make_angles(params.depth)
    linesd, lmaskd, lhwd = jnp.asarray(lines), jnp.asarray(lmask), jnp.asarray(lhw)
    mp = phys

    ind_fn = jax.jit(lambda l, m, hw: jax.vmap(
        lambda li, mi, hwi: fm2._indicator(
            li, mi, hwi, depth=params.depth, phys_h=phys, phys_w=phys,
            max_points=mp))(l, m, hw))
    ind = timeit("indicator scatter", ind_fn, linesd, lmaskd, lhwd)
    dt_fn = jax.jit(_part(dt_from_indicator, metric=params.distance))
    dt3 = timeit("separable DT (col+banded row)", dt_fn, ind)
    steps = fm2.propagation_steps(angles, float(params.dt3_coeff))
    prop_fn = jax.jit(lambda x: fm2.propagate_orientation_relax(x, steps))
    dt3p = timeit("orientation propagation", prop_fn, dt3)
    li_fn = jax.jit(lambda x, hw: jax.vmap(
        lambda di, hwi: integral.line_integral_stack(
            di, list(angles), logical_hw=hwi))(x, hw))
    timeit("line integral", li_fn, dt3p, lhwd)


if __name__ == "__main__":
    main()
