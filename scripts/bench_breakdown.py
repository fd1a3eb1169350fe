"""Fine-grained timing of match_many internals on the bench workload.

Dev tool. Reproduces the exact bench.py configuration and times each stage
with explicit d2h syncs so the axon relay cannot hide queue time.
"""
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openfdcm_tpu as of
from openfdcm_tpu.core import geometry as geo
from openfdcm_tpu.matching import featuremap as fm
from openfdcm_tpu.matching import optimize as opt
from openfdcm_tpu.matching import pipeline as pl
from openfdcm_tpu.matching.match import prepare_templates

ASSETS = "/root/reference/notebooks/assets"


def sync(x):
    # honest sync through the relay: tiny d2h
    return float(jnp.sum(x.reshape(-1)[:1]))


def main():
    of.enable_compilation_cache("/root/repo/.jax_cache")
    obj = "obj_01"
    templates = [of.read(p) for p in sorted(glob.glob(f"{ASSETS}/{obj}/templates/*.tmpl"))]
    scenes = [of.read(p) for p in sorted(glob.glob(f"{ASSETS}/{obj}/scene_*/camera_0.scene"))]
    params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
    optimizer = of.BatchOptimize(10)
    searcher = of.DefaultSearch(4, 10)
    lengths = of.get_template_lengths(templates)
    bank = prepare_templates(templates)
    print(f"{len(templates)} templates, {len(scenes)} scenes", file=sys.stderr)

    def full():
        return of.match_many(scenes, bank, params, searcher, optimizer,
                             penalty=of.ExponentialPenalty(1.5),
                             template_lengths=lengths, top_k=10)

    t0 = time.perf_counter()
    full()
    print(f"warmup {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    for it in range(3):
        t0 = time.perf_counter()
        full()
        print(f"full match_many: {time.perf_counter()-t0:.3f}s", file=sys.stderr)

    # --- stage 1: featuremap build ------------------------------------
    for it in range(3):
        t0 = time.perf_counter()
        fms = pl.build_featuremap_batch(scenes, params, pad_to=128)
        sync(fms.dt3)
        t1 = time.perf_counter()
        print(f"build_featuremap_batch(10): {t1-t0:.3f}s  shape={fms.dt3.shape}",
              file=sys.stderr)

    # --- stage 2: host pair generation --------------------------------
    arrs = [geo.as_lines_np(s) for s in scenes]
    for it in range(2):
        t0 = time.perf_counter()
        per_scene_pairs = [pl._bank_pairs_for_scene(searcher, bank, a) for a in arrs]
        t1 = time.perf_counter()
        print(f"host pair-gen x10: {t1-t0:.3f}s  pmax={max(p.shape[0] for p in per_scene_pairs)}",
              file=sys.stderr)

    # --- stage 3: search dispatch + convert ---------------------------
    post = (jnp.asarray(lengths, jnp.float32), jnp.float32(1.5), 10)
    for it in range(3):
        t0 = time.perf_counter()
        disp = pl._search_chunk_dispatch(searcher, optimizer, fms, bank,
                                         scenes, mesh=None, post=post)
        t1 = time.perf_counter()
        res = pl._search_chunk_convert(*disp)
        t2 = time.perf_counter()
        print(f"search dispatch: {t1-t0:.3f}s  convert(d2h+host): {t2-t1:.3f}s",
              file=sys.stderr)

    # --- stage 3b: device-only optimize (direct) ----------------------
    # time the jitted search fn alone by re-calling dispatch with the same
    # inputs; the dispatch includes host prep, so separately time the jit'd
    # inner call via the parts already built.
    from openfdcm_tpu.matching.optimize_kernel import (
        optimize_candidates_batch_kernel, kernel_supported)
    print("kernel_supported:",
          kernel_supported(fms.dt3.shape, "batch", None), file=sys.stderr)


if __name__ == "__main__":
    main()
