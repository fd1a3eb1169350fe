"""Secondary benchmarks for the BASELINE.json metric set (run on the
attached TPU): DT3 build latency at 1080p-class resolution, template-scoring
throughput, and a large-bank (all 421 pose templates) scale test.

The official driver benchmark is /root/repo/bench.py (one JSON line)."""
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import openfdcm_tpu as of

ASSETS = "/root/reference/notebooks/assets"


def sync(x):
    return float(jnp.sum(x[0, 0, :2])) if hasattr(x, "ndim") else x


def bench_dt3_1080p():
    rng = np.random.default_rng(0)
    n = 700
    x1 = rng.uniform(0, 1900, n)
    y1 = rng.uniform(0, 1000, n)
    ang = rng.uniform(-np.pi / 2, np.pi / 2, n)
    ln = rng.uniform(20, 200, n)
    scene = np.stack([x1, y1, np.clip(x1 + ln * np.cos(ang), 0, 1919),
                      np.clip(y1 + ln * np.sin(ang), 0, 1079)], 1).astype(np.float32)
    params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
    fm = of.build_featuremap(scene, params, pad_to=128)
    sync(fm.dt3)
    t0 = time.perf_counter()
    fm = of.build_featuremap(scene, params, pad_to=128)
    sync(fm.dt3)
    ms = (time.perf_counter() - t0) * 1e3
    out = [{"metric": "dt3_build_1080p_ms", "value": round(ms, 1),
            "unit": "ms", "canvas": list(fm.feature_size)}]

    # BASELINE.json config #2 verbatim: depth=60, L2_SQUARED, padding=1.5.
    params = of.Dt3Params(60, 5.0, 1.5, of.Distance.L2_SQUARED)
    fm = of.build_featuremap(scene, params, pad_to=128)
    sync(fm.dt3)
    t0 = time.perf_counter()
    fm = of.build_featuremap(scene, params, pad_to=128)
    sync(fm.dt3)
    ms = (time.perf_counter() - t0) * 1e3
    out.append({"metric": "dt3_build_1080p_d60_l2sq_ms", "value": round(ms, 1),
                "unit": "ms", "canvas": list(fm.feature_size)})
    return out


def bench_pose(objs, label):
    tmpl_paths = []
    for obj in objs:
        tmpl_paths += sorted(glob.glob(f"{ASSETS}/{obj}/templates/*.tmpl"))
    scene_paths = sorted(glob.glob(f"{ASSETS}/obj_01/scene_*/camera_0.scene"))
    templates = of.io.read_batch(tmpl_paths)
    scenes = of.io.read_batch(scene_paths)
    params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
    bank = of.prepare_templates(templates)
    lengths = of.get_template_lengths(templates)

    def run():
        return of.match_many(scenes, bank, params, of.DefaultSearch(4, 10),
                             of.BatchOptimize(10),
                             penalty=of.ExponentialPenalty(1.5),
                             template_lengths=lengths, top_k=10)

    run()
    t0 = time.perf_counter()
    best = run()
    wall = time.perf_counter() - t0
    n = len(scenes)
    return {
        "metric": f"pose_{label}",
        "scenes_per_s": round(n / wall, 3),
        "templates_scored_per_s": round(len(templates) * n / wall, 1),
        "templates": len(templates), "scenes": n,
        "best0": [best[0][0].tmpl_idx, round(best[0][0].score, 6)],
    }


def main():
    backend = of.ensure_backend()
    of.enable_compilation_cache(
        "/root/repo/.jax_cache" if backend == "tpu"
        else "/root/repo/.jax_cache_cpu")
    out = [*bench_dt3_1080p(),
           bench_pose(["obj_01"], "bank114"),
           bench_pose(["obj_01", "obj_02", "obj_03", "obj_04"], "bank421")]
    for o in out:
        print(json.dumps(o))


if __name__ == "__main__":
    main()
