"""Surgical per-candidate bisect of the r4 golden drift on obj_02/scene_3.

Builds the exact candidate set the genpairs path generates for scene_3
(bench bank bucket: lmax_to=40, count_to=128), then scores it two ways in
the SAME process on the TPU:
  - the Pallas kernel walk (`optimize_candidates_batch_kernel`, v4/v3)
  - the XLA dense walk (`opt.optimize_candidates`, reference-exact)
and prints every candidate whose (score, translation) differ.

Usage: python scripts/debug_scene3.py [capped|uncapped]
"""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openfdcm_tpu as of
from openfdcm_tpu.matching import featuremap as fm
from openfdcm_tpu.matching import match as mt
from openfdcm_tpu.matching import optimize as opt
from openfdcm_tpu.matching import optimize_kernel as ok
from openfdcm_tpu.matching import pipeline as pl
from openfdcm_tpu.matching.search import (bank_line_table, device_pairs,
                                          scene_length_mask)

ASSETS = "/root/reference/notebooks/assets"
of.enable_compilation_cache("/root/repo/.jax_cache")

mode_cap = sys.argv[1] if len(sys.argv) > 1 else "capped"

templates = [of.read(p) for p in sorted(
    glob.glob(f"{ASSETS}/obj_02/templates/*.tmpl"))]
scene = of.read(f"{ASSETS}/obj_02/scene_3/camera_0.scene")
bank = of.prepare_templates(templates, lmax_to=40, count_to=128)
params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)

fmb = pl.build_featuremap_batch([scene], params)
s_count, depth, ph, pw = fmb.dt3.shape
print(f"# dt3 {fmb.dt3.shape}")

mt_lines, ms = 4, 10
counts = bank.counts_np.astype(np.int64)
lmax = bank.lmax
t_count = len(bank.host)
ord_t, k_t = bank_line_table(bank.lengths_np, counts, mt_lines)
lens_m = np.where(np.arange(lmax)[None, :] < counts[:, None],
                  bank.lengths_np, -np.inf)
top_vals = np.take_along_axis(lens_m, ord_t.astype(np.int64), axis=1
                              ).astype(np.float32)
rank_ok = np.arange(mt_lines)[None, :] < k_t[:, None]

arr = np.asarray(of.core.geometry.as_lines_np(scene), np.float32)
nb = -(-arr.shape[0] // 128) * 128
scene_arr = np.zeros((nb, 4), np.float32)
scene_arr[: arr.shape[0]] = arr
slen, svalid = scene_length_mask(arr, nb, None)

sl, wok = device_pairs(jnp.asarray(slen), jnp.asarray(svalid),
                       jnp.asarray(top_vals), jnp.asarray(rank_ok), ms)
sl = sl.reshape(-1)
wok = wok.reshape(-1)
p = t_count * mt_lines * ms
pair_t = jnp.repeat(jnp.arange(t_count, dtype=jnp.int32), mt_lines * ms)
pair_tl = jnp.repeat(jnp.asarray(ord_t.reshape(-1).astype(np.int32)), ms)

aligned, transforms, align_vecs = mt._make_candidates(
    bank.lines, bank.mask, pair_t, pair_tl, sl, jnp.asarray(scene_arr), lmax)
c = 2 * p
cand_lines = aligned.reshape(1, c, lmax, 4)
cand_mask = jnp.repeat(bank.mask[pair_t], 2, axis=0)[None]
cand_align = jnp.repeat(align_vecs, 2, axis=0)[None]
cand_ok = jnp.repeat(wok, 2)[None]

fs = jnp.asarray([[float(w), float(h)] for (w, h) in fmb.feature_sizes],
                 jnp.float32)

# items_cap as pipeline._genpairs_batch_arrays computes it
n_eff = int(svalid.sum())
kc = np.minimum(counts, mt_lines)
lines_per_rank = int((kc * counts).sum())
per_scene = 2 * lines_per_rank * min(n_eff, ms) + 1
items_cap = ok.cap_bucket(per_scene) if mode_cap == "capped" else None
print(f"# n_eff={n_eff} per_scene_items={per_scene} items_cap={items_cap}")

kscores, ktrans, kvalid = ok.optimize_candidates_batch_kernel(
    fmb.dt3, fmb.angles, fmb.scene_translations, fs,
    cand_lines, cand_mask, cand_align, mode="batch", window=10,
    items_cap=items_cap, cand_ok=cand_ok)
kscores, ktrans, kvalid = (np.asarray(kscores)[0], np.asarray(ktrans)[0],
                           np.asarray(kvalid)[0])

xscores, xtrans, xvalid = opt.optimize_candidates(
    fmb.dt3.reshape(-1), fmb.angles, fmb.scene_translations[0], (ph, pw),
    fs[0], cand_lines[0], cand_mask[0], cand_align[0],
    mode="batch", window=10, dense_steps=0)
xscores, xtrans, xvalid = (np.asarray(xscores), np.asarray(xtrans),
                           np.asarray(xvalid))

okm = np.asarray(cand_ok)[0] & kvalid & xvalid
sd = okm & (np.abs(kscores - xscores) > 1e-5 + 1e-5 * np.abs(xscores))
td = okm & np.any(ktrans != xtrans, axis=-1)
print(f"# candidates={c} ok={okm.sum()} score_diff={sd.sum()} "
      f"trans_diff={td.sum()}")
tof = np.repeat(np.asarray(pair_t), 2)
for i in np.nonzero(sd | td)[0][:40]:
    print(f"cand {i} tmpl={tof[i]} k=({kscores[i]:.6f}, {ktrans[i]}) "
          f"x=({xscores[i]:.6f}, {xtrans[i]})")
