"""Pose-estimation template matching, mirroring the reference notebook
(``/root/reference/notebooks/pose_extimation_example.ipynb``): for each scene
of an object, match its pre-rendered template bank and report the top
matches and per-stage timings.

Usage: python examples/pose_estimation.py [obj_01|obj_02|obj_03|obj_04]
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import openfdcm_tpu as of

ASSETS = "/root/reference/notebooks/assets"


def main(obj: str = "obj_01"):
    of.enable_compilation_cache()
    t0 = time.perf_counter()
    tmpl_paths = sorted(glob.glob(f"{ASSETS}/{obj}/templates/*.tmpl"))
    scene_paths = sorted(glob.glob(f"{ASSETS}/{obj}/scene_*/camera_0.scene"))
    templates = of.io.read_batch(tmpl_paths)
    scenes = of.io.read_batch(scene_paths)
    print(f"loaded {len(templates)} templates, {len(scenes)} scenes "
          f"in {time.perf_counter() - t0:.2f}s")

    # Notebook configuration (pose notebook cell 13).
    params = of.Dt3Params(depth=30, dt3_coeff=5.0, padding=1.0,
                          distance=of.Distance.L2)
    searcher = of.DefaultSearch(4, 10)
    optimizer = of.BatchOptimize(10)
    penalizer = of.ExponentialPenalty(1.5)
    lengths = of.get_template_lengths(templates)
    bank = of.prepare_templates(templates)

    t0 = time.perf_counter()
    fms = of.build_featuremap_batch(scenes, params)
    all_matches = of.search_batch(of.DefaultMatch(), searcher, optimizer,
                                  fms, bank, scenes)
    for path, matches in zip(scene_paths, all_matches):
        best = of.sort_matches(of.penalize(penalizer, matches, lengths))[:3]
        tops = ", ".join(f"tmpl {m.tmpl_idx} (score {m.score:.4f})" for m in best)
        print(f"{os.path.basename(os.path.dirname(path))}: {tops}")
    wall = time.perf_counter() - t0
    print(f"{len(scenes)} scenes in {wall:.2f}s "
          f"({len(scenes) / wall:.2f} scenes/s, incl. compile on first run)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "obj_01")
