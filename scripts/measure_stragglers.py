"""Measure live-walker counts after the kernel's covered window on the pose
bench candidate set — sizes the straggler compaction (b_ext / b_tail).

Also times the straggler sub-stages (compaction sort, ext pass, tail walk)
to locate the ~11 ms/scene the straggler path costs when it fires.
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
from openfdcm_tpu.core import rasterize as ras
from openfdcm_tpu.matching import featuremap as fm
from openfdcm_tpu.matching import optimize_kernel as ok
from openfdcm_tpu.matching import pipeline as pl
from openfdcm_tpu.matching.match import prepare_templates, _make_candidates
from openfdcm_tpu.ops import window_kernel as wk

ASSETS = "/root/reference/notebooks/assets"


def main():
    of.enable_compilation_cache("/root/repo/.jax_cache")
    obj = "obj_01"
    templates = [of.read(p) for p in sorted(
        glob.glob(f"{ASSETS}/{obj}/templates/*.tmpl"))]
    scenes = [of.read(p) for p in sorted(
        glob.glob(f"{ASSETS}/{obj}/scene_*/camera_0.scene"))]
    params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
    searcher = of.DefaultSearch(4, 10)
    bank = prepare_templates(templates)
    arrs = [geo.as_lines_np(s) for s in scenes]
    fms = pl.build_featuremap_batch(scenes, params, pad_to=128)

    pairs0 = pl._bank_pairs_for_scene(searcher, bank, arrs[0])
    pb = -(-pairs0.shape[0] // 64) * 64
    s_count = len(scenes)
    pair_arr = np.zeros((s_count, pb, 3), np.int32)
    for i, a in enumerate(arrs):
        pp = pl._bank_pairs_for_scene(searcher, bank, a)
        pair_arr[i, : pp.shape[0]] = pp
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
    pt = jnp.asarray(pair_arr[:, :, 0])
    ptl = jnp.asarray(pair_arr[:, :, 1])
    psl = jnp.asarray(pair_arr[:, :, 2])
    fsd = jnp.asarray([[float(w), float(h)] for (w, h) in fms.feature_sizes])
    cl, cm, ca = gen_all(pt, ptl, psl, jnp.asarray(scene_arr))

    dt3, angles, scene_tr = fms.dt3, fms.angles, fms.scene_translations
    s, d, q, _ = dt3.shape
    c, l = cm.shape[1:]
    m = s * c
    window = 10

    @jax.jit
    def live_counts(dt3, angles, scene_tr, feature_size, cand_lines,
                    cand_mask, cand_align):
        null_align = geo.relatively_equal(
            jnp.sum(jnp.abs(cand_align), axis=-1), 0.0)
        rast = ras.rasterize_vector(cand_align)
        neg, pos = fm.minmax_translation_raw(
            cand_lines, rast, feature_size[:, None, :],
            scene_tr[:, None, :], cand_mask)
        valid = jnp.isfinite(neg) & jnp.isfinite(pos) & ~null_align
        theta = geo.get_angle(cand_lines)
        slice_idx = fm.closest_orientation_idx(angles, theta)
        fields, tc = wk.build_fields_v3(cand_lines, cand_mask, rast, valid,
                                        slice_idx, scene_tr, depth=d, q=q)
        banks = wk.prep_dt3_banks(dt3)
        win = wk.window_scores_device_v3(banks, fields, s_dim=s, c_dim=c,
                                         depth=d, q=q)
        valid_f = valid.reshape(m)
        t_pos = jnp.where(valid_f, jnp.trunc(jnp.where(
            valid_f, pos.reshape(m), 0.0)), 0.0)
        t_neg = jnp.where(valid_f, jnp.trunc(jnp.where(
            valid_f, -neg.reshape(m), 0.0)), 0.0)
        tc_f = tc.reshape(m).astype(jnp.float32)
        s0 = win.reshape(m, wk.K_LANES)[:, 0]
        pos_scores = win.reshape(m, wk.K_LANES)[:, 1:wk.K_POS]
        neg_scores = win.reshape(m, wk.K_LANES)[:, wk.K_POS:]
        chain_cov = partial(ok._batch_chain_cov, batch=window)
        ones = jnp.ones(m, jnp.float32)

        state = (s0, s0, jnp.zeros(m, jnp.float32), t_pos < 1, ones)
        state = chain_cov(pos_scores, t_pos, tc_f, state, 1.0)
        live_pos = jnp.sum(~state[3])

        nstate = (state[0], state[1], state[2], t_neg < 1, ones)
        nstate = chain_cov(neg_scores, t_neg, tc_f, nstate, -1.0)
        live_neg = jnp.sum(~nstate[3])
        return live_pos, live_neg, jnp.sum(valid_f), tc_f

    lp, ln, nvalid, tc_f = live_counts(dt3, angles, scene_tr, fsd, cl, cm, ca)
    lp, ln, nvalid = int(lp), int(ln), int(nvalid)
    tc_np = np.asarray(tc_f)
    print(f"m = {m} candidates ({nvalid} valid)")
    print(f"live after +dir chain: {lp}  ({100.0*lp/m:.3f}% of m)")
    print(f"live after -dir chain: {ln}  ({100.0*ln/m:.3f}% of m)")
    print(f"b_ext currently: {max(256, -(-(m // 16) // 8) * 8)}")
    print(f"b_tail currently: {max(64, m // 64)}")
    print(f"tc quantiles: p50={np.percentile(tc_np,50):.0f} "
          f"p90={np.percentile(tc_np,90):.0f} p99={np.percentile(tc_np,99):.0f} "
          f"min={tc_np.min():.0f}")

    # --- timing: full optimize vs skip_straggler, plus isolated pieces ---
    def timeit(label, f, *args, reps=3):
        out = jax.block_until_ready(f(*args))
        walls = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(*args))
            walls.append(time.perf_counter() - t0)
        med = sorted(walls)[len(walls) // 2]
        print(f"  {label}: {med*1e3:8.2f} ms (min {min(walls)*1e3:.1f}, "
              f"max {max(walls)*1e3:.1f})")
        return out

    full_fn = partial(ok.optimize_candidates_batch_kernel, mode="batch",
                      window=window)
    skip_fn = partial(ok.optimize_candidates_batch_kernel, mode="batch",
                      window=window, skip_straggler=True)
    timeit("optimize full", full_fn, dt3, angles, scene_tr, fsd, cl, cm, ca)
    timeit("optimize skip_straggler", skip_fn, dt3, angles, scene_tr, fsd,
           cl, cm, ca)

    done0 = jnp.zeros(m, bool).at[:lp].set(True)

    @jax.jit
    def sort_only(done):
        return ok._compact_sel(done, max(256, -(-(m // 32) // 8) * 8), m)

    timeit("compact_sel argsort(m)", sort_only, done0)

    b_ext = max(256, -(-(m // 32) // 8) * 8)
    sel0 = jnp.arange(b_ext, dtype=jnp.int32)
    st0 = (jnp.zeros(m, jnp.float32),) * 3 + (done0, jnp.ones(m, jnp.float32))

    @jax.jit
    def scatterback(state, sel):
        sub = tuple(x[sel] * 2 for x in state[:3]) + tuple(
            x[sel] for x in state[3:])
        return tuple(x.at[sel].set(v) for x, v in zip(state, sub))

    timeit(f"gather+scatter-back 5x{b_ext}", scatterback, st0, sel0)


if __name__ == "__main__":
    main()
