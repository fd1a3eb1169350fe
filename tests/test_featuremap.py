"""DT3 featuremap tests ported from reference
``tests/matching/src/featuremaps/dt3cpu.test.cpp``."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from openfdcm_tpu.core import geometry as geo
from openfdcm_tpu.core.types import Distance
from openfdcm_tpu.matching import featuremap as fmap
from tests.utils import make_rotation


def test_scene_centered_translation():
    # dt3cpu.test.cpp:35-74
    scene = np.array([[0, 0, 9, 0], [0, 0, 0, 9]], np.float32)
    tr, size = fmap.scene_centered_translation(scene, 1.0)
    assert size == (10, 10)
    assert np.allclose(tr, [0, 0])

    scene = np.array([[-6, 1, 4, 1], [0, -10, 0, 10]], np.float32)
    tr, size = fmap.scene_centered_translation(scene, 2.0)
    assert size == (41, 41)
    assert np.allclose(tr, [21, 20])
    # new center == (size-1)/2
    pts = scene.reshape(-1, 2)
    center = (pts.max(0) + tr + pts.min(0) + tr) / 2
    assert np.allclose(center, (np.array(size, np.float32) - 1) / 2)


# --- minmaxTranslation — dt3cpu.test.cpp:76-225 --------------------------

def _mm(tmpl, align_vec, size_wh, extra=(0.0, 0.0)):
    neg, pos = fmap.minmax_translation_raw(
        geo.as_lines(np.asarray(tmpl, np.float32)),
        jnp.asarray(align_vec, jnp.float32),
        (float(size_wh[0]), float(size_wh[1])),
        jnp.asarray(extra, jnp.float32))
    return float(neg), float(pos)


def test_minmax_along_x():
    tmpl = [[4, 0, 5, 0], [5, 0, 6, 0]]
    neg, pos = _mm(tmpl, [1, 0], (10, 1))
    assert np.isclose(neg, -4) and np.isclose(pos, 3)


def test_minmax_along_y():
    tmpl = [[0, 4, 0, 5], [0, 5, 0, 6]]
    neg, pos = _mm(tmpl, [0, 1], (1, 10))
    assert np.isclose(neg, -4) and np.isclose(pos, 3)


def test_minmax_along_xy():
    tmpl = [[3, 4, 4, 5], [4, 5, 4, 6]]
    neg, pos = _mm(tmpl, [0.5, 0.5], (10, 10))
    assert np.isclose(neg, -6) and np.isclose(pos, 6)


def test_minmax_null_align_vec():
    neg, pos = _mm([[0, 0, 1, 1]], [0, 0], (10, 10))
    assert np.isinf(neg) and np.isinf(pos)


def test_minmax_out_of_bounds_nan():
    for tmpl in ([[3, 4, 4, 5], [4, 5, 10, 6]],   # x overflow
                 [[-1, 4, 4, 5], [4, 5, 9, 6]],   # x negative
                 [[3, 4, 4, 5], [10, 5, 9, 6]],   # y overflow (as coords)
                 [[1, 4, 4, 5], [4, -1, 9, 6]]):  # y negative
        neg, pos = _mm(tmpl, [1, 1], (10, 10))
        assert np.isnan(neg) and np.isnan(pos)


def test_minmax_touching_borders():
    neg, pos = _mm([[0, 0, 10, 10]], [1, 0], (20, 20))
    assert np.isclose(neg, 0) and np.isclose(pos, 9)
    neg, pos = _mm([[19, 0, 19, 19]], [1, 0], (20, 20))
    assert np.isclose(neg, -19) and np.isclose(pos, 0)
    neg, pos = _mm([[0, 0, 19, 19]], [1, 0], (20, 20))
    assert np.isclose(neg, 0) and np.isclose(pos, 0)


def test_minmax_negative_align_vec():
    neg, pos = _mm([[10, 0, 10, 10]], [-1, 0], (20, 20))
    assert np.isclose(neg, -9) and np.isclose(pos, 10)
    neg, pos = _mm([[0, 10, 10, 10]], [0, -1], (20, 20))
    assert np.isclose(neg, -9) and np.isclose(pos, 10)


# --- closestOrientation / classifyLines — dt3cpu.test.cpp:230-267 --------

def test_closest_orientation_circular():
    angle_set = np.array(sorted([-math.pi / 2 + math.pi / 100, -math.pi / 4, 0.0,
                                 math.pi / 4, math.pi / 2 - math.pi / 100, math.pi]),
                         np.float32)
    for angle in angle_set:
        line = geo.as_lines(np.array([0, 0, 1, 0], np.float32))
        rot = np.asarray(geo.rotate(line, jnp.asarray(make_rotation(float(angle)))))
        theta = float(np.asarray(geo.get_angle(geo.as_lines(rot)))[0])
        idx = int(np.asarray(fmap.closest_orientation_idx(jnp.asarray(angle_set), theta)))
        expect = float(geo.constrain_half_angle(float(angle)))
        assert np.isclose(angle_set[idx], expect, atol=1e-5), (angle, angle_set[idx], expect)


def test_classify_lines():
    # lines at angles pi/2, -pi/4(y=-x dir), 0, pi/4, pi/2
    lines = np.array([
        [0, 0, 0, 10],
        [0, 0, 20, 20],
        [0, 0, 10, 0],
        [0, 10, 10, 0],
        [10, 10, 10, 0],
    ], np.float32)
    angle_set = np.array([-math.pi / 4, 0.0, math.pi / 4, math.pi / 2], np.float32)
    theta = np.asarray(geo.get_angle(geo.as_lines(lines)))
    idx = np.asarray(fmap.closest_orientation_idx(jnp.asarray(angle_set), jnp.asarray(theta)))
    assert list(idx) == [3, 2, 1, 0, 3]


# --- propagateOrientation — dt3cpu.test.cpp:268-295 ----------------------

def test_propagate_orientation_closed_form():
    coeff = 0.5
    w, h = 30, 40
    angles = np.array(sorted([-math.pi / 2, -math.pi / 4, 0.0, math.pi / 4]), np.float32)
    from openfdcm_tpu.core import dt as dtmod
    img = dtmod.distance_transform(np.array([[0, 0, 0, 39]], np.float32), (w, h))
    stack = jnp.stack([img] + [jnp.full((h, w), jnp.inf, jnp.float32)] * 3)
    wmat = fmap.propagation_weights(angles, coeff)
    out = np.asarray(fmap.propagate_orientation(stack, jnp.asarray(wmat)))
    # the build path's reference-order relaxation must agree
    out_relax = np.asarray(fmap.propagate_orientation_relax(
        stack, fmap.propagation_steps(tuple(float(a) for a in angles), coeff)))
    assert np.allclose(out, out_relax, atol=1e-5)
    d1 = out[0][0, 29]
    assert d1 == 29.0
    for k in range(4):
        dang = abs(float(geo.constrain_half_angle(angles[0] - angles[k])))
        assert np.isclose(out[k][0, 29], d1 + dang * coeff, atol=1e-5)


# --- full build — dt3cpu.test.cpp:296-345 --------------------------------

def test_build_featuremap_integral_consistency():
    scene = np.array([
        [0, 0, 0, 1],
        [0, 0, 1, 1],
        [0, 0, 1, 0],
        [0, 1, 1, 0],
        [1, 1, 1, 0],
    ], np.float32)
    fm = fmap.build_featuremap(scene, fmap.Dt3Params(4, 50.0, 1.0))
    for i in range(scene.shape[0]):
        ln = scene[i]
        theta = float(np.asarray(geo.get_angle(geo.as_lines(ln)))[0])
        o = int(np.asarray(fmap.closest_orientation_idx(fm.angles, theta)))
        f = np.asarray(fm.dt3[o])
        a = np.round(ln[:2]).astype(int)
        b = np.round(ln[2:]).astype(int)
        assert abs(f[b[1], b[0]] - f[a[1], a[0]]) <= 1.0


def test_build_featuremap_precision_pinned():
    scene = np.array([[2, 0, 5, 0]], np.float32)
    fm = fmap.build_featuremap(scene, fmap.Dt3Params(4, 1.0, 2.0))
    theta = 0.0
    o = int(np.asarray(fmap.closest_orientation_idx(fm.angles, theta)))
    w, h = fm.feature_size
    row = np.asarray(fm.dt3[o][h // 2, :w])
    assert np.allclose(row, [2, 3, 3, 3, 3, 3, 4], atol=1e-5)


def test_build_featuremap_precision_scaled():
    scene = np.array([[4, 0, 10, 0]], np.float32)
    fm = fmap.build_featuremap(scene, fmap.Dt3Params(4, 1.0, 2.0))
    o = int(np.asarray(fmap.closest_orientation_idx(fm.angles, 0.0)))
    w, h = fm.feature_size
    row = np.asarray(fm.dt3[o][h // 2, :w])
    assert np.allclose(row, [3, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7, 9, 12], atol=1e-5)


def test_build_featuremap_empty_scene():
    fm = fmap.build_featuremap(np.zeros((0, 4), np.float32), fmap.Dt3Params())
    assert fm.feature_size == (0, 0)


@pytest.mark.parametrize("metric", [Distance.L2, Distance.L1, Distance.L2_SQUARED])
def test_build_featuremap_metrics(metric):
    scene = np.array([[2, 0, 5, 0]], np.float32)
    fm = fmap.build_featuremap(scene, fmap.Dt3Params(4, 1.0, 2.0, metric))
    assert fm.dt3.shape[0] == 4
    assert np.isfinite(np.asarray(fm.dt3)).all()


def test_build_featuremap_padded_physical_canvas_matches():
    """Physical tile padding must not change logical values — including for
    flipped sweeps with non-trivial shear (depth=6 covers those angles)."""
    scene = np.array([[2, 0, 5, 0], [1, 1, 4, 3], [0, 4, 3, 0]], np.float32)
    fm0 = fmap.build_featuremap(scene, fmap.Dt3Params(6, 1.0, 2.0), pad_to=None)
    fm1 = fmap.build_featuremap(scene, fmap.Dt3Params(6, 1.0, 2.0), pad_to=16)
    w, h = fm0.feature_size
    assert fm1.feature_size == (w, h)
    assert np.allclose(np.asarray(fm0.dt3), np.asarray(fm1.dt3)[:, :h, :w], atol=1e-5)


def test_evaluate_matches_direct_lookup():
    scene = np.array([[2, 0, 5, 0]], np.float32)
    fm = fmap.build_featuremap(scene, fmap.Dt3Params(4, 1.0, 2.0))
    tmpl = np.array([[0, 0, 3, 0]], np.float32)
    scores = fmap.evaluate(fm, [tmpl], [[np.array([0.0, 0.0], np.float32)]])
    o = int(np.asarray(fmap.closest_orientation_idx(fm.angles, 0.0)))
    f = np.asarray(fm.dt3[o])
    tr = np.asarray(fm.scene_translation)
    a = (tmpl[0, :2] + tr).astype(int)
    b = (tmpl[0, 2:] + tr).astype(int)
    expect = abs(f[a[1], a[0]] - f[b[1], b[0]])
    assert np.isclose(scores[0][0], expect, atol=1e-5)


def test_evaluate_zip_truncation():
    """evaluate() drops extra templates/translations beyond the shorter
    list, like the reference's per-template zip loop (regression: the
    batched rewrite raised IndexError)."""
    tmpl = np.asarray([[0.0, 0.0, 5.0, 0.0]], np.float32)
    feat = fmap.build_featuremap(tmpl, fmap.Dt3Params(4, 5.0, 2.2))
    out = fmap.evaluate(feat, [tmpl, tmpl], [[(0.0, 0.0)]])
    assert len(out) == 1 and len(out[0]) == 1
    out2 = fmap.evaluate(feat, [tmpl], [[(0.0, 0.0)], [(1.0, 1.0)]])
    assert len(out2) == 1
