"""Stage timing of the ACTUAL bench dispatch path (genpairs top-k).

bench.py runs match_many -> _genpairs_batch_arrays -> one jitted
_search_device_batch_topk_genpairs per (scene-chunk, template-chunk).
bench_breakdown.py times the OTHER path (host pairs, no top-k); this script
times the real one and its internals with honest d2h syncs.
"""
import glob
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openfdcm_tpu as of
from openfdcm_tpu.core import geometry as geo
from openfdcm_tpu.matching import featuremap as fm
from openfdcm_tpu.matching import match as mt
from openfdcm_tpu.matching import optimize as opt
from openfdcm_tpu.matching import pipeline as pl
from openfdcm_tpu.matching.match import prepare_templates
from openfdcm_tpu.matching.search import bank_line_table, scene_length_mask
from openfdcm_tpu.matching.optimize_kernel import cap_bucket

ASSETS = "/root/reference/notebooks/assets"


def sync(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    return float(jnp.sum(x.reshape(-1)[:1]))


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
    print(f"  {label}: {med*1e3:8.2f} ms (min {min(walls)*1e3:.1f}, "
          f"max {max(walls)*1e3:.1f})", flush=True)
    return out


def main():
    of.enable_compilation_cache("/root/repo/.jax_cache")
    print(f"backend: {jax.default_backend()}", flush=True)
    obj = "obj_01"
    templates = [of.read(p) for p in sorted(
        glob.glob(f"{ASSETS}/{obj}/templates/*.tmpl"))]
    scenes = [of.read(p) for p in sorted(
        glob.glob(f"{ASSETS}/{obj}/scene_*/camera_0.scene"))]
    params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
    searcher = of.DefaultSearch(4, 10)
    optimizer = of.BatchOptimize(10)
    lengths = np.asarray(of.get_template_lengths(templates), np.float32)
    bank = prepare_templates(templates)
    arrs = [geo.as_lines_np(s) for s in scenes]
    fms = pl.build_featuremap_batch(scenes, params, pad_to=128)

    counts = bank.counts_np.astype(np.int64)
    lmax = bank.lmax
    t_count = len(bank.host)
    mt_ = min(searcher.get_max_tmpl_lines(), lmax)
    ms = searcher.get_max_scene_lines()
    ord_t, k_t = bank_line_table(bank.lengths_np, counts, mt_)
    lens_m = np.where(np.arange(lmax)[None, :] < counts[:, None],
                      bank.lengths_np, -np.inf)
    top_vals = np.take_along_axis(
        lens_m, ord_t.astype(np.int64), axis=1).astype(np.float32)
    rank_ok = np.arange(mt_)[None, :] < k_t[:, None]

    s_total = len(scenes)
    nb = pl._bucket(max(a.shape[0] for a in arrs), 128)
    scene_arr = np.zeros((s_total, nb, 4), np.float32)
    slen_arr = np.zeros((s_total, nb), np.float32)
    svalid_arr = np.zeros((s_total, nb), bool)
    for i, a in enumerate(arrs):
        scene_arr[i, : a.shape[0]] = a
        slen_arr[i], svalid_arr[i] = scene_length_mask(a, nb, None)

    ph, pw = fms.dt3.shape[2], fms.dt3.shape[3]
    fs = np.asarray([[float(w), float(h)] for (w, h) in fms.feature_sizes],
                    np.float32)
    n_eff = np.asarray([int(v.sum()) for v in svalid_arr], np.int64)
    kc = np.minimum(counts, mt_)
    lines_per_rank = int((kc * counts).sum())
    per_scene = 2 * lines_per_rank * np.minimum(n_eff, ms) + 1
    items = int(per_scene.sum())
    print(f"items(real)={items}  cap={cap_bucket(items)}", flush=True)

    static = dict(lmax=lmax, hw=(ph, pw), mode="batch", window=10,
                  dense_steps=0, k=10, ms=ms, use_kernel=True,
                  items_cap=cap_bucket(items))
    args = (bank.lines, bank.mask, jnp.asarray(top_vals),
            jnp.asarray(ord_t), jnp.asarray(rank_ok),
            jnp.asarray(scene_arr), jnp.asarray(slen_arr),
            jnp.asarray(svalid_arr), fms.dt3.reshape(s_total, -1),
            fms.angles, fms.scene_translations, jnp.asarray(fs),
            jnp.asarray(lengths), jnp.float32(1.5))

    genpairs_fn = jax.jit(partial(mt._search_device_batch_topk_genpairs,
                                  **static))
    timeit("genpairs top-k dispatch (FULL)", genpairs_fn, *args)

    # --- pieces -------------------------------------------------------
    from openfdcm_tpu.matching.search import device_pairs

    @jax.jit
    def pairs_only(slen, svalid):
        def one(ln, va):
            sl, wok = device_pairs(ln, va, jnp.asarray(top_vals),
                                   jnp.asarray(rank_ok), ms)
            return sl.reshape(-1), wok.reshape(-1)
        return jax.vmap(one)(slen, svalid)

    sl, wok = timeit("device_pairs only", pairs_only, args[6], args[7])

    p = t_count * mt_ * ms
    pair_t = jnp.broadcast_to(
        jnp.repeat(jnp.arange(t_count, dtype=jnp.int32), mt_ * ms)[None],
        (s_total, p))
    pair_tl = jnp.broadcast_to(
        jnp.repeat(np.asarray(ord_t).reshape(-1).astype(np.int32), ms)[None],
        (s_total, p))

    sdb = jax.jit(partial(mt._search_device_batch, lmax=lmax, hw=(ph, pw),
                          mode="batch", window=10, dense_steps=0,
                          use_kernel=True, items_cap=cap_bucket(items)))
    timeit("_search_device_batch (cands+optimize+mats)", sdb,
           bank.lines, bank.mask, pair_t, pair_tl, sl, jnp.asarray(scene_arr),
           fms.dt3.reshape(s_total, -1), fms.angles, fms.scene_translations,
           jnp.asarray(fs), cand_ok=jnp.repeat(wok, 2, axis=1))

    # optimize alone (same candidate tensors the kernel path sees)
    from openfdcm_tpu.matching.match import _make_candidates
    from openfdcm_tpu.matching.optimize_kernel import (
        optimize_candidates_batch_kernel)

    @jax.jit
    def gen_only(pt, ptl, psl, sc):
        def gen(pt, ptl, psl, sc):
            aligned, transforms, align_vecs = _make_candidates(
                bank.lines, bank.mask, pt, ptl, psl, sc, bank.lmax)
            return (aligned.reshape(2 * p, bank.lmax, 4),
                    jnp.repeat(bank.mask[pt], 2, axis=0),
                    jnp.repeat(align_vecs, 2, axis=0), transforms)
        return jax.vmap(gen)(pt, ptl, psl, sc)

    cl, cm, ca, tf = timeit("make_candidates (+transforms)", gen_only,
                            pair_t, pair_tl, sl, jnp.asarray(scene_arr))
    for cap, label in [(cap_bucket(items), f"cap={cap_bucket(items)}"),
                       (-(-items // 256) * 256, "cap=exact"),
                       (None, "uncapped")]:
        opt_fn = jax.jit(partial(optimize_candidates_batch_kernel,
                                 mode="batch", window=10, items_cap=cap))
        timeit(f"optimize ({label})", opt_fn, fms.dt3, fms.angles,
               fms.scene_translations, jnp.asarray(fs), cl, cm, ca,
               cand_ok=jnp.repeat(wok, 2, axis=1))
        skip_fn = jax.jit(partial(optimize_candidates_batch_kernel,
                                  mode="batch", window=10, items_cap=cap,
                                  skip_straggler=True))
        timeit(f"optimize skip_straggler ({label})", skip_fn, fms.dt3,
               fms.angles, fms.scene_translations, jnp.asarray(fs), cl, cm,
               ca, cand_ok=jnp.repeat(wok, 2, axis=1))

    # kernel-only at the real cap: fields + banks + window kernel
    from openfdcm_tpu.core import rasterize as ras
    from openfdcm_tpu.ops import window_kernel as wk
    cap = -(-items // 256) * 256
    s, d, q, _ = fms.dt3.shape
    c = cm.shape[1]

    @jax.jit
    def kernel_only(dt3, angles, scene_tr, fsz, cl, cm, ca, wok):
        null_align = geo.relatively_equal(jnp.sum(jnp.abs(ca), axis=-1), 0.0)
        rast = ras.rasterize_vector(ca)
        neg, pos = fm.minmax_translation_raw(
            cl, rast, fsz[:, None, :], scene_tr[:, None, :], cm)
        valid = (jnp.isfinite(neg) & jnp.isfinite(pos) & ~null_align
                 & jnp.repeat(wok, 2, axis=1))
        theta = geo.get_angle(cl)
        slice_idx = fm.closest_orientation_idx(angles, theta)
        fields, tc = wk.build_fields_v3(cl, cm, rast, valid, slice_idx,
                                        scene_tr, depth=d, q=q, cap=cap)
        banks = wk.prep_dt3_banks(dt3)
        return wk.window_scores_device_v3(banks, fields, s_dim=s, c_dim=c,
                                          depth=d, q=q)

    timeit("fields+banks+kernel (exact cap)", kernel_only, fms.dt3,
           fms.angles, fms.scene_translations, jnp.asarray(fs), cl, cm, ca,
           wok)

    @jax.jit
    def fields_only(scene_tr, fsz, cl, cm, ca, wok):
        null_align = geo.relatively_equal(jnp.sum(jnp.abs(ca), axis=-1), 0.0)
        rast = ras.rasterize_vector(ca)
        neg, pos = fm.minmax_translation_raw(
            cl, rast, fsz[:, None, :], scene_tr[:, None, :], cm)
        valid = (jnp.isfinite(neg) & jnp.isfinite(pos) & ~null_align
                 & jnp.repeat(wok, 2, axis=1))
        theta = geo.get_angle(cl)
        slice_idx = fm.closest_orientation_idx(angles, theta)
        return wk.build_fields_v3(cl, cm, rast, valid, slice_idx,
                                  scene_tr, depth=d, q=q, cap=cap)

    angles = fms.angles
    timeit("fields only (exact cap)", fields_only, fms.scene_translations,
           jnp.asarray(fs), cl, cm, ca, wok)


if __name__ == "__main__":
    main()
