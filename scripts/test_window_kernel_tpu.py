"""On-TPU validation + perf of the window-scoring kernel vs the XLA path.

Random DT3 banks and candidates with realistic geometry; checks that kernel
scores match the XLA evaluate path for all covered lanes of valid
candidates, then times both at pose-bench-like sizes.

Run: python scripts/test_window_kernel_tpu.py [perf]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import openfdcm_tpu as of
from openfdcm_tpu.matching import featuremap as fm
from openfdcm_tpu.ops import window_kernel as wk
from openfdcm_tpu.core import rasterize as ras

of.enable_compilation_cache("/root/repo/.jax_cache")


def make_case(rng, s=2, c=64, l=8, d=30, q=256):
    dt3 = rng.uniform(0, 100, (s, d, q, q)).astype(np.float32)
    scene_tr = rng.uniform(10, 30, (s, 2)).astype(np.float32)
    # candidate lines well inside the canvas so +-62 steps stay in bounds
    center = rng.uniform(q * 0.35, q * 0.65, (s, c, l, 2)).astype(np.float32)
    delta = rng.uniform(-q * 0.05, q * 0.05, (s, c, l, 2)).astype(np.float32)
    p1 = center - delta
    p2 = center + delta
    cand_lines = np.concatenate([p1, p2], axis=-1) - \
        np.concatenate([scene_tr, scene_tr], axis=-1)[:, None, None, :]
    cand_mask = rng.uniform(size=(s, c, l)) < 0.8
    cand_mask[:, :, 0] = True
    ang = rng.uniform(0, 2 * np.pi, (s, c)).astype(np.float32)
    align = np.stack([np.cos(ang), np.sin(ang)], axis=-1).astype(np.float32)
    valid = rng.uniform(size=(s, c)) < 0.9
    return (jnp.asarray(dt3), jnp.asarray(scene_tr), jnp.asarray(cand_lines),
            jnp.asarray(cand_mask), jnp.asarray(align), jnp.asarray(valid))


def xla_window(dt3, scene_tr, cand_lines, cand_mask, rast, valid, slice_idx):
    """Reference: evaluate all 128 lanes via the existing XLA gather path."""
    s, d, q, _ = dt3.shape
    c, l = cand_mask.shape[1:]
    lane = jnp.arange(wk.K_LANES)
    m = jnp.where(lane < wk.K_POS, lane, -(lane - (wk.K_POS - 1))).astype(jnp.float32)
    trans = scene_tr[:, None, None, :] + \
        m[None, None, :, None] * rast[:, :, None, :]        # (S,C,K,2)

    def one(dt3_s, si, ep, lm, tr):
        return fm.evaluate_batched(dt3_s.reshape(-1), (q, q), si,
                                   ep, lm, tr)
    return jax.vmap(one)(dt3, slice_idx,
                         cand_lines.reshape(s, c, l, 2, 2),
                         cand_mask.astype(jnp.float32), trans)


def check_exactness(verbose=True) -> int:
    """Kernel-vs-XLA parity on random realistic geometry; returns mismatch
    count (0 = exact).  Callable from the bench harness so every BENCH run
    exercises the real-hardware kernel."""
    rng = np.random.default_rng(7)
    dt3, scene_tr, cand_lines, cand_mask, align, valid = make_case(rng)
    rast = ras.rasterize_vector(align)
    angles = jnp.asarray(fm.make_angles(30))
    theta = jnp.arctan2(cand_lines[..., 3] - cand_lines[..., 1],
                        cand_lines[..., 2] - cand_lines[..., 0])
    theta = jnp.where(theta >= jnp.pi / 2, theta - jnp.pi,
                      jnp.where(theta < -jnp.pi / 2, theta + jnp.pi, theta))
    slice_idx = fm.closest_orientation_idx(angles, theta)

    # Exercise the SAME kernel version production uses (v4 by default) —
    # a version-specific Mosaic crash or mismatch must not hide behind
    # an older one.
    from openfdcm_tpu.matching.optimize_kernel import kernel_version
    entry = {4: wk.window_scores_v4, 3: wk.window_scores_v3}.get(
        kernel_version(), wk.window_scores)
    kout, tc = jax.jit(entry)(dt3, scene_tr, cand_lines, cand_mask,
                              rast, valid, slice_idx)
    xout = jax.jit(xla_window)(dt3, scene_tr, cand_lines, cand_mask, rast,
                               valid, slice_idx)
    kout = np.asarray(kout)
    xout = np.asarray(xout)
    tc = np.asarray(tc)
    valid_np = np.asarray(valid)

    lane = np.arange(wk.K_LANES)
    m_abs = np.where(lane < wk.K_POS, lane, lane - (wk.K_POS - 1))
    cover = m_abs[None, None, :] <= tc[:, :, None]
    check = cover & valid_np[:, :, None]
    diff = np.abs(kout - xout)
    rel = diff / np.maximum(np.abs(xout), 1.0)
    bad = check & (rel > 1e-5)
    if verbose:
        print(f"checked lanes: {check.sum()}  mismatches: {bad.sum()}")
    if bad.sum() and verbose:
        idx = np.argwhere(bad)[:10]
        for s_, c_, l_ in idx:
            print(f"  s={s_} c={c_} lane={l_} m_abs={m_abs[l_]} "
                  f"tc={tc[s_, c_]} kout={kout[s_, c_, l_]} xout={xout[s_, c_, l_]}")
    return int(bad.sum())


def main():
    rng = np.random.default_rng(7)
    if check_exactness():
        sys.exit(1)
    print("EXACTNESS OK")

    if "perf" in sys.argv:
        angles = jnp.asarray(fm.make_angles(30))
        s, c, l, q = 8, 9216, 16, 640
        dt3, scene_tr, cand_lines, cand_mask, align, valid = make_case(
            rng, s=s, c=c, l=l, q=q)
        rast = ras.rasterize_vector(align)
        theta = jnp.arctan2(cand_lines[..., 3] - cand_lines[..., 1],
                            cand_lines[..., 2] - cand_lines[..., 0])
        theta = jnp.where(theta >= jnp.pi / 2, theta - jnp.pi,
                          jnp.where(theta < -jnp.pi / 2, theta + jnp.pi, theta))
        slice_idx = fm.closest_orientation_idx(angles, theta)
        from openfdcm_tpu.matching.optimize_kernel import kernel_version
        entry = {4: wk.window_scores_v4, 3: wk.window_scores_v3}.get(
            kernel_version(), wk.window_scores)
        f = jax.jit(entry)
        r = f(dt3, scene_tr, cand_lines, cand_mask, rast, valid, slice_idx)
        jax.block_until_ready(r)
        float(jnp.sum(r[0]))
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            r = f(dt3, scene_tr, cand_lines, cand_mask, rast, valid,
                  slice_idx)
        float(jnp.sum(r[0]))
        dt = (time.perf_counter() - t0 - 0.03) / n
        items = s * c * l
        print(f"perf: {dt*1e3:.1f} ms for {items} items "
              f"({dt/items*1e9:.0f} ns/item, {dt/s*1e3:.1f} ms/scene)")


if __name__ == "__main__":
    main()
