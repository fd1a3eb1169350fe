"""Regenerate PUBLISHED.json: hardware numbers for all five BASELINE.json
configs, one config-keyed record each, with the measurement protocol
(VERDICT r2 next-step #4).

Configs (BASELINE.json "configs"):
  1. general_template_matching notebook workload (45-variant multi-scale
     bank, 1 scene) — steady-state scenes/s.
  2. DT3 featuremap microbench: 1080p, depth=60, L2_SQUARED, padding=1.5
     — build ms (runs scripts/bench_micro.py).
  3. 10k-template bank x 1 scene — templates scored/s
     (runs scripts/bench_bank.py 10000 30).
  4. pose_estimation notebook pipeline — scenes/s (runs bench.py).
  5. 1M-template sweep — single-chip TPU chunk rate measured over a 131072-
     template prefix of the same lazy bank demo_sweep_1m.py sweeps on CPU
     (kill+resume evidence lives in SWEEP_1M.json).

Each config is run in a SUBPROCESS with a timeout; a failing config records
its error and the rest still publish.  Usage:

  python scripts/publish_baselines.py [--only 1,3] [--timeout 900]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "PUBLISHED.json")


def sh(cmd, timeout):
    """Run a config subprocess; return (json_records, raw_tail, error)."""
    try:
        r = subprocess.run(cmd, cwd=REPO, timeout=timeout,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return [], "", f"timeout after {timeout}s"
    recs = []
    for line in r.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                recs.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    err = "" if r.returncode == 0 else \
        f"rc={r.returncode}: {r.stderr.strip().splitlines()[-1:]}"
    return recs, r.stdout[-500:], err


def config1_general(timeout):
    """General-notebook workload, measured steady-state (the example script
    prints a compile-inclusive wall; here: warm loop median)."""
    code = r"""
import sys, time, json
import numpy as np
sys.path.insert(0, "REPO")
import openfdcm_tpu as of
of.ensure_backend(); of.enable_compilation_cache("REPO/.jax_cache")
sys.path.insert(0, "REPO/examples")
from general_template_matching import detect_lines, ASSETS
tmpl1 = detect_lines(f"{ASSETS}/ulaval_laboratoire_robotique_tmpl.png")
tmpl2 = detect_lines(f"{ASSETS}/logo_innoptech.png")
scene = detect_lines(f"{ASSETS}/ulaval_laboratoire_robotique_scene.png")
bank_list = [tmpl1 * s for s in np.linspace(0.1, 0.8, 25)] + \
            [tmpl2 * s for s in np.linspace(0.3, 1.0, 20)]
params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
lengths = of.get_template_lengths(bank_list)
bank = of.prepare_templates(bank_list)
def run():
    return of.match_many([scene], bank, params, of.DefaultSearch(3, 10),
                         of.BatchOptimize(5), penalty=of.ExponentialPenalty(1.5),
                         template_lengths=lengths, top_k=10)
run()
walls = []
for _ in range(5):
    t0 = time.perf_counter(); res = run(); walls.append(time.perf_counter() - t0)
w = sorted(walls)[len(walls)//2]
best = res[0][0]
print(json.dumps({"metric": "general_notebook_scenes_per_s",
                  "value": round(1.0/w, 3), "unit": "scenes/s",
                  "bank": len(bank_list), "wall_ms": round(w*1e3, 1),
                  "best": [best.tmpl_idx, round(best.score, 6)]}))
""".replace("REPO", REPO)
    return sh([sys.executable, "-c", code], timeout)


def config5_tpu_sweep(timeout):
    """TPU chunk rate on a 131072-template prefix of the 1M lazy bank."""
    code = r"""
import sys, time, json, glob
import numpy as np
sys.path.insert(0, "REPO")
import openfdcm_tpu as of
of.ensure_backend(); of.enable_compilation_cache("REPO/.jax_cache")
sys.path.insert(0, "REPO/scripts")
from demo_sweep_1m import LazyAugmentedBank, ASSETS
base = [of.read(p) for p in sorted(glob.glob(f"{ASSETS}/obj_01/templates/*.tmpl"))]
scene = of.read(f"{ASSETS}/obj_01/scene_0/camera_0.scene")
n = 131072
bank = LazyAugmentedBank(base, n)
lengths = np.concatenate([
    np.asarray(of.get_template_lengths(bank[lo:min(lo+65536, n)]), np.float32)
    for lo in range(0, n, 65536)])
params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
import shutil, tempfile
state = tempfile.mkdtemp(prefix="sweep_tpu_")
t0 = time.perf_counter()
res = of.resumable_sweep([scene], bank, params, of.DefaultSearch(4, 10),
                         of.BatchOptimize(10), top_k=10, state_dir=state,
                         penalty=of.ExponentialPenalty(1.5),
                         template_lengths=lengths, chunk_size=4096)
wall = time.perf_counter() - t0
shutil.rmtree(state, ignore_errors=True)
best = res[0][0]
print(json.dumps({"metric": "sweep_templates_per_s_tpu",
                  "value": round(n / wall, 1), "unit": "templates/s",
                  "n_templates": n, "depth": 30, "chunk_size": 4096,
                  "wall_s": round(wall, 1),
                  "best": [best.tmpl_idx, round(best.score, 6)],
                  "note": "includes compile warmup of the first chunks; "
                          "prefix of the same lazy 1M bank as SWEEP_1M.json"}))
""".replace("REPO", REPO)
    return sh([sys.executable, "-c", code], timeout)


CONFIGS = {
    "1": ("general_template_matching notebook: 45-variant multi-scale bank, "
          "1 scene, depth=30 L2, DefaultSearch(3,10), BatchOptimize(5), "
          "ExponentialPenalty(1.5); metric = steady-state scenes/s "
          "(median of 5 warm loops)", None),
    "2": ("DT3 featuremap microbench: 1080p-class 700-line scene, depth=60, "
          "L2_SQUARED, padding=1.5, pad_to=128; metric = warm build ms "
          "(one warm rebuild, device-synced)",
          lambda t: sh([sys.executable, "scripts/bench_micro.py"], t)),
    "3": ("10k-template bank x 1 scene, depth=30 L2, DefaultSearch(4,10), "
          "BatchOptimize(10), device-side penalize+top-k; metric = "
          "templates scored/s (median of 3 warm loops)",
          lambda t: sh([sys.executable, "scripts/bench_bank.py",
                        "10000", "30"], t)),
    "4": ("pose_estimation notebook pipeline: obj_01, 114 templates x 40 "
          "scenes, depth=30 L2 padding=1.0, DefaultSearch(4,10), "
          "BatchOptimize(10), ExponentialPenalty(1.5), top-10; metric = "
          "scenes/s (median of 3 warm loops) — same protocol as bench.py",
          lambda t: sh([sys.executable, "bench.py"], t)),
    "5": ("1M-template sweep, single-chip rate: 131072-template prefix of "
          "the lazy 1M bank, depth=30, chunk=4096, resumable_sweep; "
          "metric = templates/s incl. checkpointing (kill+resume evidence: "
          "SWEEP_1M.json)", None),
}
CONFIGS["1"] = (CONFIGS["1"][0], config1_general)
CONFIGS["5"] = (CONFIGS["5"][0], config5_tpu_sweep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="1,2,3,4,5")
    ap.add_argument("--timeout", type=float, default=1800.0)
    args = ap.parse_args()

    published = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            published = json.load(f)

    for key in args.only.split(","):
        key = key.strip()
        proto, fn = CONFIGS[key]
        print(f"=== config {key}: {proto.split(';')[0]}", flush=True)
        t0 = time.time()
        recs, tail, err = fn(args.timeout)
        entry = {"protocol": proto, "records": recs,
                 "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                               time.gmtime()),
                 "wall_s": round(time.time() - t0, 1)}
        if err:
            entry["error"] = err
            print(f"    ERROR: {err}", flush=True)
        for r in recs:
            print(f"    {json.dumps(r)}", flush=True)
        published[f"config_{key}"] = entry
        with open(OUT, "w") as f:         # persist after every config
            json.dump(published, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
