"""Arbitrate the r4 golden drift: is the CPU or the TPU DT3 wrong?

Builds scene_3's DT3 with the framework on the requested backend, dumps it
to .npy, and (on CPU) additionally builds an INDEPENDENT oracle DT3:
  - indicator from the framework's own clip+rasterize (geometry is shared
    and pinned by reference-ported tests),
  - exact per-slice EDT via scipy.ndimage.distance_transform_edt,
  - orientation propagation + directional line integral transliterated
    from the reference (dt3cpu.cpp:77-107, imgproc.h:38-84) in numpy.

Usage: python scripts/debug_dt3_scene3.py cpu|tpu
Then:  python scripts/debug_dt3_scene3.py diff
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ASSETS = "/root/reference/notebooks/assets"
SCENE = f"{ASSETS}/obj_02/scene_3/camera_0.scene"
mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"


def build_framework(backend):
    if backend == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import openfdcm_tpu as of
    from openfdcm_tpu.matching import pipeline as pl
    of.enable_compilation_cache(
        "/root/repo/.jax_cache" if backend == "tpu"
        else "/root/repo/.jax_cache_cpu")
    scene = of.read(SCENE)
    params = of.Dt3Params(30, 5.0, 1.0, of.Distance.L2)
    fmb = pl.build_featuremap_batch([scene], params)
    np.save(f"/tmp/dt3_scene3_{backend}.npy", np.asarray(fmb.dt3[0]))
    np.save("/tmp/dt3_scene3_tr.npy", np.asarray(fmb.scene_translations[0]))
    print(f"saved /tmp/dt3_scene3_{backend}.npy shape={fmb.dt3[0].shape} "
          f"fs={fmb.feature_sizes[0]}")


def build_oracle():
    os.environ["JAX_PLATFORMS"] = "cpu"
    import openfdcm_tpu as of
    from openfdcm_tpu.core import geometry as geo
    from openfdcm_tpu.matching import featuremap as fm
    from scipy.ndimage import distance_transform_edt

    scene = geo.as_lines_np(of.read(SCENE))
    tr, (w, h) = fm.scene_centered_translation(scene, 1.0)
    depth = 30
    angles = np.asarray(fm.make_angles(depth), np.float32)
    phys = 640
    lines = scene + np.concatenate([tr, tr]).astype(np.float32)

    # classify lines to nearest angle (reference closestOrientation)
    import tests.oracle as orc
    d = lines[:, 2:4] - lines[:, 0:2]
    with np.errstate(divide="ignore", invalid="ignore"):
        theta = np.arctan(d[:, 1] / d[:, 0]).astype(np.float32)
    theta = np.where(np.isnan(theta), np.float32(np.pi / 2), theta)
    sl_of_line = np.asarray([orc.closest_orientation_idx(angles, float(t))
                             for t in theta])

    # indicator via the reference rasterization: LinSpaced + round
    ind = np.zeros((depth, phys, phys), bool)
    for ln, sl in zip(lines, sl_of_line):
        x1, y1, x2, y2 = (np.float64(v) for v in ln)
        # clip against logical box [0, w-1] x [0, h-1] not needed: scene
        # centered inside; assert instead
        n = int(np.trunc(max(abs(x2 - x1), abs(y2 - y1)))) + 1
        xs = np.rint(np.linspace(x1, x2, n)).astype(int)
        ys = np.rint(np.linspace(y1, y2, n)).astype(int)
        assert xs.min() >= 0 and ys.min() >= 0 and xs.max() < w and ys.max() < h
        ind[sl, ys, xs] = True

    # exact EDT per slice over the LOGICAL canvas (h, w); outside = 0
    dt3 = np.zeros((depth, phys, phys), np.float32)
    for s in range(depth):
        if ind[s].any():
            dt3[s, :h, :w] = distance_transform_edt(
                ~ind[s][:h, :w]).astype(np.float32)
        else:
            dt3[s, :h, :w] = np.float32(np.finfo(np.float32).max)

    # orientation propagation (dt3cpu.cpp:77-107): 1.5 forward + 1.5
    # backward cycles of circular relaxation with coeff*circular dtheta
    coeff = np.float32(5.0)
    def circ(a, b):
        dd = abs(a - b)
        return min(dd, abs(dd - np.pi))
    n_loop = int(depth * 1.5)
    for c in range(1, n_loop):
        c1, c0 = c % depth, (c - 1) % depth
        pen = np.float32(coeff * circ(float(angles[c1]), float(angles[c0])))
        dt3[c1, :h, :w] = np.minimum(dt3[c1, :h, :w], dt3[c0, :h, :w] + pen)
    for c in range(n_loop - 1, 0, -1):
        c1, c0 = (c - 1) % depth, c % depth
        pen = np.float32(coeff * circ(float(angles[c1]), float(angles[c0])))
        dt3[c1, :h, :w] = np.minimum(dt3[c1, :h, :w], dt3[c0, :h, :w] + pen)

    # directional line integral (imgproc.h:38-84): cumulative shifted sums
    for s in range(depth):
        ang = float(angles[s])
        v = np.array([np.cos(ang), np.sin(ang)], np.float32)
        # rasterizeVector: snap dominant axis to +-1 (drawing.h:57-67)
        if abs(v[0]) >= abs(v[1]):
            rv = np.array([np.sign(v[0]) if v[0] else 1.0,
                           v[1] / abs(v[0]) if v[0] else 0.0], np.float64)
        else:
            rv = np.array([v[0] / abs(v[1]), np.sign(v[1])], np.float64)
        img = dt3[s, :h, :w].copy()
        if abs(rv[0]) == 1.0:
            prev_y = 0
            for i in range(1, w):
                x = i if rv[0] > 0 else w - 1 - i
                xp = x - int(np.sign(rv[0]))
                y_off = int(np.rint(i * rv[1])) - prev_y if False else 0
                # per-column shift: y(i) = round(i * rv[1])
                yo = int(np.rint(i * rv[1]))
                yp = int(np.rint((i - 1) * rv[1]))
                dy = yo - yp
                # img[:, x] += shift(img[:, xp], dy)
                col = img[:, xp]
                if dy == 0:
                    img[:, x] += col
                elif dy > 0:
                    img[dy:, x] += col[:-dy]
                else:
                    img[:dy, x] += col[-dy:]
            dt3[s, :h, :w] = img
        else:
            prev = 0
            for i in range(1, h):
                y = i if rv[1] > 0 else h - 1 - i
                yp = y - int(np.sign(rv[1]))
                xo = int(np.rint(i * rv[0]))
                xp = int(np.rint((i - 1) * rv[0]))
                dx = xo - xp
                row = img[yp, :]
                if dx == 0:
                    img[y, :] += row
                elif dx > 0:
                    img[y, dx:] += row[:-dx]
                else:
                    img[y, :dx] += row[-dx:]
            dt3[s, :h, :w] = img
    np.save("/tmp/dt3_scene3_oracle.npy", dt3)
    print(f"saved /tmp/dt3_scene3_oracle.npy (logical {h}x{w})")


def diff():
    import itertools
    avail = {b: np.load(f"/tmp/dt3_scene3_{b}.npy")
             for b in ("cpu", "tpu", "oracle")
             if os.path.exists(f"/tmp/dt3_scene3_{b}.npy")}
    for a, b in itertools.combinations(avail, 2):
        x, y = avail[a], avail[b]
        d = np.abs(x - y)
        rel = d / np.maximum(np.abs(y), 1.0)
        bad = rel > 1e-5
        print(f"{a} vs {b}: maxrel={rel.max():.3e} bad_px={bad.sum()}")
        if bad.sum():
            idx = np.argwhere(bad)
            print("  slices with bad px:", np.unique(idx[:, 0])[:20])
            for s_, yy, xx in idx[:10]:
                print(f"  [{s_},{yy},{xx}] {a}={x[s_, yy, xx]:.4f} "
                      f"{b}={y[s_, yy, xx]:.4f}")


if mode == "diff":
    diff()
elif mode == "oracle":
    build_oracle()
else:
    build_framework(mode)
