"""Honest-sync decomposition of the kernel-path optimize on the real pose
candidate set (obj_01, 10 scenes): every stage is timed with an explicit
tiny d2h readback (the axon relay acks block_until_ready before remote
execution finishes).

Usage: python scripts/profile_optimize.py
"""
import glob
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

from openfdcm_tpu.core import geometry as geo  # noqa: E402
from openfdcm_tpu.core import rasterize as ras  # noqa: E402
from openfdcm_tpu.matching import featuremap as fm  # noqa: E402
from openfdcm_tpu.matching import optimize_kernel as ok  # noqa: E402
from openfdcm_tpu.matching import pipeline as pl  # noqa: E402
from openfdcm_tpu.matching.match import _make_candidates, prepare_templates  # noqa: E402
from openfdcm_tpu.ops import window_kernel as wk  # noqa: E402

ASSETS = "/root/reference/notebooks/assets"


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].reshape(-1)[:1]))


def timeit(label, f, *args, reps=3, **kw):
    out = f(*args, **kw)
    sync(out)
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args, **kw)
        sync(out)
        walls.append(time.perf_counter() - t0)
    med = sorted(walls)[len(walls) // 2]
    print(f"  {label}: {med*1e3:8.2f} ms (min {min(walls)*1e3:.1f})",
          flush=True)
    return out


def main():
    obj = "obj_01"
    templates = [of.read(p) for p in sorted(
        glob.glob(f"{ASSETS}/{obj}/templates/*.tmpl"))]
    scenes = [of.read(p) for p in sorted(
        glob.glob(f"{ASSETS}/{obj}/scene_*/camera_0.scene"))]
    arrs = [geo.as_lines_np(s) for s in scenes]
    params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
    bank = prepare_templates(templates)
    searcher = of.DefaultSearch(4, 10)

    fms = pl.build_featuremap_batch(scenes, params)
    sync(fms.dt3)
    s, d, q, _ = fms.dt3.shape
    print(f"dt3 {fms.dt3.shape}", flush=True)

    pairs = [pl._bank_pairs_for_scene(searcher, bank, a) for a in arrs]
    pb = -(-max(p.shape[0] for p in pairs) // 64) * 64
    pair_arr = np.zeros((len(scenes), pb, 3), np.int32)
    for i, p in enumerate(pairs):
        pair_arr[i, : p.shape[0]] = p
    nb = pl._bucket(max(a.shape[0] for a in arrs), 128)
    scene_arr = np.zeros((len(scenes), nb, 4), np.float32)
    for i, a in enumerate(arrs):
        scene_arr[i, : a.shape[0]] = a
    scene_dev = jnp.asarray(scene_arr)
    pt = jnp.asarray(pair_arr[:, :, 0])
    ptl = jnp.asarray(pair_arr[:, :, 1])
    psl = jnp.asarray(pair_arr[:, :, 2])
    fsd = jnp.asarray([[float(w), float(h)] for (w, h) in fms.feature_sizes])
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

    cl, cm, ca = timeit("make_candidates", gen_all, pt, ptl, psl, scene_dev)

    @jax.jit
    def prep(cl, cm, ca, scene_tr, fsz):
        null_align = geo.relatively_equal(jnp.sum(jnp.abs(ca), axis=-1), 0.0)
        rast = ras.rasterize_vector(ca)
        neg, pos = fm.minmax_translation_raw(
            cl, rast, fsz[:, None, :], scene_tr[:, None, :], cm)
        valid = jnp.isfinite(neg) & jnp.isfinite(pos) & ~null_align
        slice_idx = fm.classify_lines(fms.angles, cl)
        return rast, valid, slice_idx

    rast, valid, slice_idx = timeit("minmax+rast+classify", prep, cl, cm, ca,
                                    fms.scene_translations, fsd)

    @jax.jit
    def classify_only(cl):
        return fm.classify_lines(fms.angles, cl)
    timeit("  classify_lines alone", classify_only, cl)

    fields_fn = jax.jit(partial(wk.build_fields_v4, depth=d, q=q))
    fields, tc = timeit("build_fields_v4", fields_fn, cl, cm, rast, valid,
                        slice_idx, fms.scene_translations)
    pack_fn = jax.jit(partial(wk.pack_gidx_v4, q=q))
    kf, gidx = timeit(f"pack_gidx_v4 ({fields.shape[0]} items)", pack_fn,
                      fields)
    banks = jax.jit(wk.prep_dt3_banks)(fms.dt3)
    sync(banks)
    c_dim = cm.shape[1]
    kern = jax.jit(partial(wk.window_scores_device_v4, s_dim=s, c_dim=c_dim,
                           depth=d, q=q))
    timeit(f"window kernel v4 ({fields.shape[0]} items)", kern, banks, kf,
           gidx)

    full = partial(ok.optimize_candidates_batch_kernel, mode="batch",
                   window=10)
    timeit("optimize full", full, fms.dt3, fms.angles,
           fms.scene_translations, fsd, cl, cm, ca)
    nost = partial(ok.optimize_candidates_batch_kernel, mode="batch",
                   window=10, skip_straggler=True)
    timeit("optimize skip_straggler", nost, fms.dt3, fms.angles,
           fms.scene_translations, fsd, cl, cm, ca)


if __name__ == "__main__":
    main()
