"""Randomized parity fuzz: the framework's equivalence surfaces.

For each seed, random geometry (templates with duplicate lengths, scenes
with collinear/degenerate lines, varying depths/metrics) runs through:

1. device-pairs `match_many` vs host-pairs (flag off) — same matches;
2. `search_spatial` on an 8-way H-sharded DT3 vs single-device `search`;
3. scene-mesh `match_many` vs single device.

Any mismatch prints the seed + details and exits 1.  Runs until
``n_seeds`` or a time budget is exhausted.

Usage: python scripts/fuzz_parity.py [n_seeds] [time_budget_s] [start_seed]
"""
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import openfdcm_tpu as of
from openfdcm_tpu.parallel import make_mesh, build_featuremap_spatial, \
    search_spatial


def random_case(rng):
    n_tmpl = int(rng.integers(2, 8))
    templates = []
    for _ in range(n_tmpl):
        n = int(rng.integers(1, 9))
        t = np.zeros((n, 4), np.float32)
        t[:, 0:2] = rng.uniform(0, 30, (n, 2))
        ang = rng.uniform(0, 2 * np.pi, n)
        ln = rng.choice([5.0, 5.0, 12.0, rng.uniform(1, 25)], n)
        t[:, 2] = t[:, 0] + ln * np.cos(ang)
        t[:, 3] = t[:, 1] + ln * np.sin(ang)
        if rng.random() < 0.3 and n > 1:
            t[1] = t[0]                     # duplicate line (length ties)
        templates.append(t.astype(np.float32))
    scenes = []
    for j in range(int(rng.integers(1, 4))):
        src = templates[int(rng.integers(0, n_tmpl))]
        th = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(th), np.sin(th)
        r = np.asarray([[c, -s], [s, c]], np.float32)
        off = rng.uniform(2, 20, 2).astype(np.float32)
        sc = np.concatenate([src[:, 0:2] @ r.T + off,
                             src[:, 2:4] @ r.T + off], axis=1)
        scenes.append(sc.astype(np.float32))
    depth = int(rng.choice([2, 4, 8]))
    metric = rng.choice([of.Distance.L2, of.Distance.L1,
                         of.Distance.L2_SQUARED])
    params = of.Dt3Params(depth, 5.0, float(rng.uniform(1.0, 3.0)), metric)
    opt = rng.choice([of.BatchOptimize(int(rng.integers(1, 12))),
                      of.DefaultOptimize(), of.DenseOptimize()])
    return templates, scenes, params, opt


def keyset(matches, nd=5):
    return sorted((round(m.score, nd), m.tmpl_idx) for m in matches)


def check_seed(seed, mesh_scene, mesh_rows):
    rng = np.random.default_rng(seed)
    templates, scenes, params, optimizer = random_case(rng)
    searcher = of.DefaultSearch(int(rng.integers(1, 6)),
                                int(rng.integers(1, 12)))
    lengths = of.get_template_lengths(templates)
    kw = dict(penalty=of.ExponentialPenalty(1.5), template_lengths=lengths,
              top_k=int(rng.integers(1, 8)))

    # 1) devpairs vs host pairs
    os.environ["OPENFDCM_TPU_DEVPAIRS"] = "0"
    host = of.match_many(scenes, templates, params, searcher, optimizer, **kw)
    os.environ["OPENFDCM_TPU_DEVPAIRS"] = "1"
    dev = of.match_many(scenes, templates, params, searcher, optimizer, **kw)
    for h, d in zip(host, dev):
        assert keyset(h) == keyset(d), ("devpairs", keyset(h), keyset(d))

    # 2) spatial search vs dense
    fm_dense = of.build_featuremap(scenes[0], params)
    fm_spatial = build_featuremap_spatial(scenes[0], params, mesh=mesh_rows,
                                          pad_to=16)
    single = of.search(of.DefaultMatch(), searcher, optimizer, fm_dense,
                       templates, scenes[0])
    sharded = search_spatial(searcher, optimizer, fm_spatial, templates,
                             scenes[0], mesh=mesh_rows)
    assert keyset(single) == keyset(sharded), \
        ("spatial", keyset(single)[:5], keyset(sharded)[:5])

    # 3) scene mesh vs single
    meshed = of.match_many(scenes, templates, params, searcher, optimizer,
                           mesh=mesh_scene, **kw)
    for h, d in zip(dev, meshed):
        assert keyset(h) == keyset(d), ("scene-mesh", keyset(h), keyset(d))


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 1e9
    start = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    mesh_scene = make_mesh(shape=(2,), axis_names=("scene",))
    mesh_rows = make_mesh(shape=(8,), axis_names=("rows",))
    t0 = time.time()
    done = 0
    for seed in range(start, start + n_seeds):
        if time.time() - t0 > budget:
            break
        try:
            check_seed(seed, mesh_scene, mesh_rows)
        except AssertionError as e:
            print(f"FUZZ FAIL seed={seed}: {e}")
            sys.exit(1)
        except Exception as e:  # noqa: BLE001
            print(f"FUZZ ERROR seed={seed}: {type(e).__name__}: {e}")
            sys.exit(2)
        done += 1
        if done % 5 == 0:
            print(f"{done} seeds ok ({time.time() - t0:.0f}s)", flush=True)
            # every seed compiles fresh shapes; drop accumulated
            # executables or the process eventually exhausts memory
            jax.clear_caches()
    print(f"fuzz OK: {done} seeds in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
