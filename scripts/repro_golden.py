"""Reproduce the r4 golden mismatch (obj_02/scene_3, tmpl 74).

Runs the bench's EXACT protocol (shared lmax/count bucket over all four
objects) for obj_02 only, on a selectable backend/kernel-generation, and
prints the top-3 of every scene vs the committed goldens.

Usage:
  python scripts/repro_golden.py cpu        # CPU, XLA path
  python scripts/repro_golden.py tpu        # TPU, default (v4) kernel
  OPENFDCM_TPU_KERNEL_VERSION=3 python scripts/repro_golden.py tpu
  OPENFDCM_TPU_KERNEL=0 python scripts/repro_golden.py tpu
"""
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

backend = sys.argv[1] if len(sys.argv) > 1 else "cpu"
only_scene = sys.argv[2] if len(sys.argv) > 2 else None
if backend == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"

import openfdcm_tpu as of  # noqa: E402

ASSETS = "/root/reference/notebooks/assets"
of.enable_compilation_cache(
    "/root/repo/.jax_cache" if backend == "tpu" else "/root/repo/.jax_cache_cpu")

# Shared bucket exactly as bench.py computes it over ALL four objects.
objs = ["obj_01", "obj_02", "obj_03", "obj_04"]
data = {}
for obj in objs:
    templates = [of.read(p) for p in sorted(
        glob.glob(f"{ASSETS}/{obj}/templates/*.tmpl"))]
    scene_paths = sorted(glob.glob(f"{ASSETS}/{obj}/scene_*/camera_0.scene"))
    scenes = [of.read(p) for p in scene_paths]
    data[obj] = (templates, scene_paths, scenes)

lmax_to = -(-max(max(len(t) for t in ts) for ts, _, _ in data.values()) // 8) * 8
count_to = -(-max(len(ts) for ts, _, _ in data.values()) // 32) * 32
print(f"# shared bucket: lmax_to={lmax_to} count_to={count_to}")

params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
optimizer = of.BatchOptimize(10)
searcher = of.DefaultSearch(4, 10)

with open("/root/repo/tests/goldens/pose_best.json") as f:
    goldens = json.load(f)

obj = "obj_02"
templates, scene_paths, scenes = data[obj]
if only_scene is not None:
    keep = [i for i, p in enumerate(scene_paths) if only_scene in p]
    scene_paths = [scene_paths[i] for i in keep]
    scenes = [scenes[i] for i in keep]
bank = of.prepare_templates(templates, lmax_to=lmax_to, count_to=count_to)
lengths = np.zeros(count_to, np.float32)
lengths[: len(templates)] = of.get_template_lengths(templates)
res = of.match_many(scenes, bank, params, searcher, optimizer,
                    penalty=of.ExponentialPenalty(1.5),
                    template_lengths=lengths, top_k=10)
bad = 0
for path, matches in zip(scene_paths, res):
    key = os.path.relpath(path, ASSETS)
    want = goldens.get(key)
    line = f"{key}:"
    for rank, (m, w) in enumerate(zip(matches[:3], want[:3])):
        ok = (m.tmpl_idx == w["tmpl_idx"]
              and abs(m.score - w["score"]) <= 1e-5 + 1e-4 * abs(w["score"]))
        bad += not ok
        mark = "" if ok else "  <-- MISMATCH"
        line += (f"\n  [{rank}] got tmpl={m.tmpl_idx} score={m.score:.6f}"
                 f"  want tmpl={w['tmpl_idx']} score={w['score']:.6f}{mark}")
    print(line, flush=True)
print(f"# mismatched entries: {bad}")
