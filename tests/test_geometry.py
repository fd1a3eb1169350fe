"""Geometry/angle tests ported from reference ``tests/core/src/math.test.cpp``."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from openfdcm_tpu.core import geometry as geo
from tests.utils import make_rotation, create_lines, apply_transform


def test_minmax_point():
    lines = np.array([[0, 0, 9, 0], [0, 0, 0, 9], [-3, 2, 4, -1]], np.float32)
    mn, mx = geo.minmax_point(geo.as_lines(lines))
    assert np.allclose(mn, [-3, -1])
    assert np.allclose(mx, [9, 9])


def test_constrain_half_angle():
    # [-pi/2, pi/2) wrap — reference math.test.cpp:65-81
    assert np.isclose(float(geo.constrain_half_angle(0.0)), 0.0)
    assert np.isclose(float(geo.constrain_half_angle(math.pi / 2)), -math.pi / 2)
    assert np.isclose(float(geo.constrain_half_angle(math.pi / 4 + math.pi)), math.pi / 4)
    assert np.isclose(float(geo.constrain_half_angle(-3 * math.pi / 4)), math.pi / 4)
    arr = geo.constrain_half_angle(jnp.array([0.0, math.pi, -math.pi / 2]))
    assert np.allclose(arr, [0.0, 0.0, -math.pi / 2], atol=1e-6)


def test_constrain_angle():
    assert np.isclose(float(geo.constrain_angle(math.pi)), -math.pi)
    assert np.isclose(float(geo.constrain_angle(3 * math.pi / 2)), -math.pi / 2)
    assert np.isclose(float(geo.constrain_angle(-math.pi / 4)), -math.pi / 4)


def test_line_accessors():
    line = geo.as_lines(np.array([1, 2, 3, 4], np.float32))
    assert np.allclose(geo.p1(line), [[1, 2]])
    assert np.allclose(geo.p2(line), [[3, 4]])
    assert np.allclose(geo.get_center(line), [[2, 3]])
    assert np.isclose(float(geo.get_length(line)[0]), math.hypot(2, 2))


def test_get_angle():
    lines = np.array([
        [0, 0, 1, 0],    # 0
        [0, 0, 1, 1],    # pi/4
        [0, 0, 0, 1],    # pi/2 (atan of +inf)
        [0, 0, -1, 1],   # -pi/4 (atan of -1)
        [0, 0, 0, -1],   # -pi/2
    ], np.float32)
    ang = np.asarray(geo.get_angle(geo.as_lines(lines)))
    assert np.allclose(ang, [0, math.pi / 4, math.pi / 2, -math.pi / 4, -math.pi / 2])


def test_degenerate_angle_nan():
    ang = np.asarray(geo.get_angle(geo.as_lines(np.array([1, 1, 1, 1], np.float32))))
    assert np.isnan(ang[0])


def test_transform_translate_rotate():
    lines = create_lines(5, 10)
    t = np.array([3.0, -2.0], np.float32)
    moved = np.asarray(geo.translate(geo.as_lines(lines), t))
    assert np.allclose(moved[:, :2], lines[:, :2] + t)
    assert np.allclose(moved[:, 2:], lines[:, 2:] + t)

    rot = make_rotation(0.7)
    mat = np.concatenate([rot, np.zeros((2, 1), np.float32)], axis=1)
    r1 = np.asarray(geo.transform(geo.as_lines(lines), jnp.asarray(mat)))
    r2 = np.asarray(geo.rotate(geo.as_lines(lines), jnp.asarray(rot)))
    assert np.allclose(r1, r2, atol=1e-5)
    # length preserved under rotation
    assert np.allclose(np.asarray(geo.get_length(geo.as_lines(r1))),
                       np.asarray(geo.get_length(geo.as_lines(lines))), atol=1e-4)


def test_rotate_about_point():
    line = geo.as_lines(np.array([8, 8, 11, 8], np.float32))
    out = np.asarray(geo.rotate(line, jnp.asarray(make_rotation(math.pi / 2)),
                                np.array([8, 8], np.float32)))
    assert np.allclose(out, [[8, 8, 8, 11]], atol=1e-5)


def test_align_recovers_transform():
    """align() returns two transforms; one maps the template line onto the
    scene line (reference math.test.cpp:131-249 invariants)."""
    rng = np.random.default_rng(0)
    for _ in range(10):
        a = rng.normal(size=4).astype(np.float32)
        rot = make_rotation(rng.uniform(-3, 3))
        t = rng.normal(size=2).astype(np.float32)
        mat = np.concatenate([rot, t[:, None]], axis=1).astype(np.float32)
        b = apply_transform(a[None], mat)[0]
        mats = np.asarray(geo.align(geo.as_lines(a)[0], geo.as_lines(b)[0]))
        ok = False
        for m in mats:
            mapped = apply_transform(a[None], m)[0]
            fwd = np.allclose(mapped, b, atol=1e-3)
            rev = np.allclose(mapped, np.concatenate([b[2:], b[:2]]), atol=1e-3)
            ok = ok or fwd or rev
        assert ok


def test_combine():
    rot = make_rotation(0.3)
    mat = np.concatenate([rot, np.array([[1.0], [2.0]], np.float32)], axis=1)
    tr = np.array([0.5, -0.5], np.float32)
    # combine(mat, translation): translation first, then mat
    c1 = np.asarray(geo.combine(jnp.asarray(mat), jnp.asarray(tr)))
    assert np.allclose(c1[:, :2], rot)
    assert np.allclose(c1[:, 2], mat[:, 2] + rot @ tr, atol=1e-6)
    # combine(translation, mat): mat first, then translation
    c2 = np.asarray(geo.combine(jnp.asarray(tr), jnp.asarray(mat)))
    assert np.allclose(c2[:, 2], mat[:, 2] + tr, atol=1e-6)


def test_normalize_zero_line():
    n = np.asarray(geo.normalize(geo.as_lines(np.array([1, 1, 1, 1], np.float32))))
    assert np.allclose(n, 0.0)


def test_get_template_lengths():
    tmpl = create_lines(10, 7)
    lens = geo.get_template_lengths([tmpl])
    assert np.isclose(lens[0], 70.0, atol=1e-3)


# ---------------------------------------------------------------------------
# argsort / binary_search — reference math.test.cpp:31-64
# ---------------------------------------------------------------------------

def test_argsort_reference_cases():
    from openfdcm_tpu.core.utils import argsort
    unsorted = [-4, 3, -1, 2]
    assert argsort(unsorted, descending=True) == [1, 3, 2, 0]
    assert argsort(unsorted) == [0, 2, 3, 1]


def test_binary_search_reference_cases():
    from openfdcm_tpu.core.utils import binary_search
    vec = [0, 2, 3, 6, 7, 10, 14, 30, 40, 123]
    assert binary_search(vec, 0) == 0
    assert binary_search(vec, 123) == 9
    assert binary_search(vec, 2) == 1
    assert binary_search(vec, 40) == 8
    assert binary_search(vec, 5) == 3
    assert binary_search(vec, 4) == 2
