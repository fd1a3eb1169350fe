"""Time the internals of optimize_candidates_batch_kernel on the bench
workload shapes (dev tool).  Stages are jitted separately, so the sum is an
upper bound on the fused dispatch — ratios are what matter.
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
from openfdcm_tpu.matching import featuremap as fm
from openfdcm_tpu.matching import optimize as opt
from openfdcm_tpu.matching import optimize_kernel as ok
from openfdcm_tpu.matching import pipeline as pline
from openfdcm_tpu.matching.match import prepare_templates, _make_candidates, _bucket
from openfdcm_tpu.ops import window_kernel as wk

ASSETS = "/root/reference/notebooks/assets"


def t(fn, *args, n=3, **kw):
    fn(*args, **kw)  # compile
    outs = None
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        outs = fn(*args, **kw)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            outs)
        best = min(best, time.perf_counter() - t0)
    return best, outs


def main():
    of.enable_compilation_cache("/root/repo/.jax_cache")
    obj = "obj_01"
    templates = [of.read(p) for p in sorted(glob.glob(f"{ASSETS}/{obj}/templates/*.tmpl"))]
    scenes = [of.read(p) for p in sorted(glob.glob(f"{ASSETS}/{obj}/scene_*/camera_0.scene"))]
    params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
    searcher = of.DefaultSearch(4, 10)
    bank = prepare_templates(templates)

    fms = pline.build_featuremap_batch(scenes, params, pad_to=128)
    arrs = [geo.as_lines_np(s) for s in scenes]
    per_scene_pairs = [pline._bank_pairs_for_scene(searcher, bank, a) for a in arrs]
    pb = _bucket(max(p.shape[0] for p in per_scene_pairs))
    s_count = len(scenes)
    pair_arr = np.zeros((s_count, pb, 3), np.int32)
    for i, p in enumerate(per_scene_pairs):
        pair_arr[i, : p.shape[0]] = p
    nb = _bucket(max(a.shape[0] for a in arrs), 128)
    scene_arr = np.zeros((s_count, nb, 4), np.float32)
    for i, a in enumerate(arrs):
        scene_arr[i, : a.shape[0]] = a

    lmax = bank.lmax
    counts = np.asarray([tt.shape[0] for tt in bank.host], np.int64)
    n_items = int(2 * counts[pair_arr[:, :, 0]].sum()) + s_count
    items_cap = -(-n_items // 4096) * 4096

    dt3 = fms.dt3
    s, d, q, _ = dt3.shape
    angles = fms.angles
    scene_tr = fms.scene_translations
    fs = jnp.asarray([[float(w), float(h)] for (w, h) in fms.feature_sizes], jnp.float32)
    scenes_dev = jnp.asarray(scene_arr)
    pt, ptl, psl = (jnp.asarray(pair_arr[:, :, i]) for i in range(3))

    print(f"S={s} d={d} q={q} pb={pb} lmax={lmax} items_cap={items_cap}",
          file=sys.stderr)

    # stage A: candidate generation
    @jax.jit
    def gen_all(pt, ptl, psl, sc):
        def gen(pt, ptl, psl, sc):
            aligned, transforms, align_vecs = _make_candidates(
                bank.lines, bank.mask, pt, ptl, psl, sc, lmax)
            p = pt.shape[0]
            return (aligned.reshape(2 * p, lmax, 4),
                    jnp.repeat(bank.mask[pt], 2, axis=0),
                    jnp.repeat(align_vecs, 2, axis=0),
                    transforms.reshape(2 * p, 2, 3))
        return jax.vmap(gen)(pt, ptl, psl, sc)

    tA, (cl, cm, ca, mats) = t(gen_all, pt, ptl, psl, scenes_dev)
    print(f"A cand-gen: {tA*1e3:.1f}ms  cl={cl.shape}", file=sys.stderr)

    # stage B: prep (rast, minmax, slice idx) + fields build incl sort
    @jax.jit
    def prep(cl, cm, ca):
        null_align = geo.relatively_equal(jnp.sum(jnp.abs(ca), axis=-1), 0.0)
        rast = ras.rasterize_vector(ca)
        neg, pos = fm.minmax_translation_raw(cl, rast, fs[:, None, :],
                                             scene_tr[:, None, :], cm)
        valid = jnp.isfinite(neg) & jnp.isfinite(pos) & ~null_align
        theta = geo.get_angle(cl)
        slice_idx = fm.closest_orientation_idx(angles, theta)
        return rast, neg, pos, valid, slice_idx

    tB, (rast, neg, pos, valid, slice_idx) = t(prep, cl, cm, ca)
    print(f"B prep: {tB*1e3:.1f}ms", file=sys.stderr)

    @partial(jax.jit, static_argnames=("cap",))
    def fields_build(cl, cm, rast, valid, slice_idx, cap):
        return wk.build_fields(cl, cm, rast, valid, slice_idx, scene_tr,
                               depth=d, q=q, cap=cap)

    tC, (fields, tc) = t(fields_build, cl, cm, rast, valid, slice_idx, items_cap)
    print(f"C fields build+sort: {tC*1e3:.1f}ms  fields={fields.shape}", file=sys.stderr)

    # stage D: main kernel pass
    @jax.jit
    def main_pass(dt3, fields):
        dt3t = jnp.swapaxes(dt3, -1, -2)
        c = cm.shape[1]
        return wk.window_scores_device(dt3, dt3t, fields, s_dim=s, c_dim=c,
                                       depth=d, q=q)

    tD, win = t(main_pass, dt3, fields)
    print(f"D main kernel: {tD*1e3:.1f}ms  win={win.shape}  "
          f"({tD/fields.shape[0]*1e9:.0f}ns/item x {fields.shape[0]})", file=sys.stderr)

    # stage E: full optimize (everything incl straggler + chains)
    tE, _ = t(ok.optimize_candidates_batch_kernel, dt3, angles, scene_tr, fs,
              cl, cm, ca, mode="batch", window=10, items_cap=items_cap)
    print(f"E full optimize: {tE*1e3:.1f}ms  (E-D-C-B ~= chains+straggler = "
          f"{(tE-tD-tC-tB)*1e3:.1f}ms)", file=sys.stderr)

    # stage F: transpose cost check
    @jax.jit
    def transp(dt3):
        return jnp.swapaxes(dt3, -1, -2) + 0.0
    tF, _ = t(transp, dt3)
    print(f"F dt3 transpose(copy): {tF*1e3:.1f}ms", file=sys.stderr)


if __name__ == "__main__":
    main()
