"""Honest prefix timing of the search dispatch at bench shapes.

Each prefix is one fused jit with an explicit tiny-d2h sync; differences
between prefixes give true marginal stage costs inside the fused program.
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from functools import partial

import openfdcm_tpu as of
from openfdcm_tpu.core import geometry as geo
from openfdcm_tpu.core import rasterize as ras
from openfdcm_tpu.core import integral
from openfdcm_tpu.core.dt import dt_from_indicator
from openfdcm_tpu.matching import featuremap as fm
from openfdcm_tpu.matching import optimize as opt
from openfdcm_tpu.matching import optimize_kernel as ok
from openfdcm_tpu.matching import pipeline as pline
from openfdcm_tpu.matching.match import prepare_templates, _make_candidates, _bucket
from openfdcm_tpu.ops import window_kernel as wk

ASSETS = "/root/reference/notebooks/assets"


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)   # compile
    jax.tree_util.tree_map(lambda x: x.block_until_ready()
                           if hasattr(x, "block_until_ready") else x, out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        for leaf in jax.tree_util.tree_leaves(out):
            if hasattr(leaf, "reshape"):
                float(jnp.sum(leaf.reshape(-1)[:1]))   # honest d2h sync
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    of.enable_compilation_cache("/root/repo/.jax_cache")
    obj = "obj_01"
    templates = [of.read(q) for q in sorted(glob.glob(f"{ASSETS}/{obj}/templates/*.tmpl"))]
    scenes = [of.read(q) for q in sorted(glob.glob(f"{ASSETS}/{obj}/scene_*/camera_0.scene"))]
    params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
    searcher = of.DefaultSearch(4, 10)
    bank = prepare_templates(templates)

    fms = pline.build_featuremap_batch(scenes, params, pad_to=128)
    arrs = [geo.as_lines_np(s) for s in scenes]
    per_scene_pairs = [pline._bank_pairs_for_scene(searcher, bank, a) for a in arrs]
    pb = _bucket(max(q.shape[0] for q in per_scene_pairs))
    s_count = len(scenes)
    pair_arr = np.zeros((s_count, pb, 3), np.int32)
    for i, q in enumerate(per_scene_pairs):
        pair_arr[i, : q.shape[0]] = q
    nb = _bucket(max(a.shape[0] for a in arrs), 128)
    scene_arr = np.zeros((s_count, nb, 4), np.float32)
    for i, a in enumerate(arrs):
        scene_arr[i, : a.shape[0]] = a

    lmax = bank.lmax
    dt3 = fms.dt3
    s, d, q, _ = dt3.shape
    angles = fms.angles
    scene_tr = fms.scene_translations
    fs = jnp.asarray([[float(w), float(h)] for (w, h) in fms.feature_sizes], jnp.float32)
    scenes_dev = jnp.asarray(scene_arr)
    pt, ptl, psl = (jnp.asarray(pair_arr[:, :, i]) for i in range(3))
    counts = np.asarray([x.shape[0] for x in bank.host], np.int64)
    n_items = int(2 * counts[pair_arr[:, :, 0]].sum()) + s_count
    items_cap = -(-n_items // 4096) * 4096

    def gen(pt, ptl, psl, sc):
        aligned, transforms, align_vecs = _make_candidates(
            bank.lines, bank.mask, pt, ptl, psl, sc, lmax)
        p = pt.shape[0]
        return (aligned.reshape(2 * p, lmax, 4),
                jnp.repeat(bank.mask[pt], 2, axis=0),
                jnp.repeat(align_vecs, 2, axis=0),
                transforms.reshape(2 * p, 2, 3))

    def prefix_body(stage, pt, ptl, psl, sc):
        cl, cm, ca, mats = jax.vmap(gen)(pt, ptl, psl, sc)
        if stage == 1:
            return cl, mats
        null_align = geo.relatively_equal(jnp.sum(jnp.abs(ca), axis=-1), 0.0)
        rast = ras.rasterize_vector(ca)
        neg, pos = fm.minmax_translation_raw(cl, rast, fs[:, None, :],
                                             scene_tr[:, None, :], cm)
        valid = jnp.isfinite(neg) & jnp.isfinite(pos) & ~null_align
        theta = geo.get_angle(cl)
        slice_idx = fm.closest_orientation_idx(angles, theta)
        if stage == 2:
            return rast, neg, pos, valid, slice_idx
        fields, tc = wk.build_fields(cl, cm, rast, valid, slice_idx, scene_tr,
                                     depth=d, q=q, cap=items_cap)
        if stage == 3:
            return fields, tc
        dt3t = jnp.swapaxes(dt3, -1, -2)
        win = wk.window_scores_device(dt3, dt3t, fields, s_dim=s,
                                      c_dim=cm.shape[1], depth=d, q=q)
        return win

    pfx = {k: jax.jit(partial(prefix_body, k)) for k in (1, 2, 3, 4)}
    t1 = timeit(pfx[1], pt, ptl, psl, scenes_dev)
    print(f"P1 cand-gen                 : {t1*1e3:7.1f}ms", file=sys.stderr)
    t2 = timeit(pfx[2], pt, ptl, psl, scenes_dev)
    print(f"P2 +prep                    : {t2*1e3:7.1f}ms  (prep={1e3*(t2-t1):.1f})", file=sys.stderr)
    t3 = timeit(pfx[3], pt, ptl, psl, scenes_dev)
    print(f"P3 +fields                  : {t3*1e3:7.1f}ms  (fields={1e3*(t3-t2):.1f})", file=sys.stderr)
    t4 = timeit(pfx[4], pt, ptl, psl, scenes_dev)
    print(f"P4 +main kernel             : {t4*1e3:7.1f}ms  (kernel={1e3*(t4-t3):.1f})", file=sys.stderr)

    def full(skip):
        cl, cm, ca, mats = jax.jit(jax.vmap(gen))(pt, ptl, psl, scenes_dev)
        return ok.optimize_candidates_batch_kernel(
            dt3, angles, scene_tr, fs, cl, cm, ca, mode="batch", window=10,
            items_cap=items_cap, skip_straggler=skip)
    t5 = timeit(full, True)
    print(f"P5 full optimize -straggler : {t5*1e3:7.1f}ms  (chains={1e3*(t5-t4):.1f})", file=sys.stderr)
    t6 = timeit(full, False)
    print(f"P6 full optimize +straggler : {t6*1e3:7.1f}ms  (straggler={1e3*(t6-t5):.1f})", file=sys.stderr)

    # build prefixes
    nb2 = _bucket(max(a.shape[0] for a in arrs), 128)
    lines_b = np.zeros((s_count, nb2, 4), np.float32)
    mask_b = np.zeros((s_count, nb2), bool)
    lhw = np.zeros((s_count, 2), np.int32)
    for i, (a, (tr, (w, h))) in enumerate(
            zip(arrs, [fm.scene_centered_translation(a, params.padding) for a in arrs])):
        lines_b[i, : a.shape[0]] = a + np.concatenate([tr, tr]).astype(np.float32)
        mask_b[i, : a.shape[0]] = True
        lhw[i] = (h, w)
    lines_d, mask_d, lhw_d = jnp.asarray(lines_b), jnp.asarray(mask_b), jnp.asarray(lhw)

    def build_body(stage, lines, mask, lhw):
        mp = q
        ind = jax.vmap(lambda l, m, x: fm._indicator(
            l, m, x, depth=d, phys_h=q, phys_w=q, max_points=mp))(lines, mask, lhw)
        if stage == 1:
            return ind
        dtv = dt_from_indicator(ind, metric=params.distance)
        if stage == 2:
            return dtv
        dt3x = jnp.where(jax.vmap(lambda l: fm._logical_mask(l, q, q))(
            lhw)[:, None], dtv, 0.0)
        dt3x = fm.propagate_orientation_relax(
            dt3x, fm.propagation_steps(angles, float(params.dt3_coeff)))
        if stage == 3:
            return dt3x
        return jax.vmap(lambda x, l: integral.line_integral_stack(
            x, list(np.asarray(angles)), logical_hw=l))(dt3x, lhw)

    bfx = {k: jax.jit(partial(build_body, k)) for k in (1, 2, 3, 4)}
    b1 = timeit(bfx[1], lines_d, mask_d, lhw_d)
    print(f"B1 indicator                : {b1*1e3:7.1f}ms", file=sys.stderr)
    b2 = timeit(bfx[2], lines_d, mask_d, lhw_d)
    print(f"B2 +EDT                     : {b2*1e3:7.1f}ms  (edt={1e3*(b2-b1):.1f})", file=sys.stderr)
    b3 = timeit(bfx[3], lines_d, mask_d, lhw_d)
    print(f"B3 +propagation             : {b3*1e3:7.1f}ms  (prop={1e3*(b3-b2):.1f})", file=sys.stderr)
    b4 = timeit(bfx[4], lines_d, mask_d, lhw_d)
    print(f"B4 +line integral           : {b4*1e3:7.1f}ms  (integral={1e3*(b4-b3):.1f})", file=sys.stderr)


if __name__ == "__main__":
    main()
