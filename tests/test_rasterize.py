"""Rasterization/clipping tests ported from reference
``tests/core/src/{math,drawing,imgproc}.test.cpp``."""
import math

import numpy as np
import jax.numpy as jnp

from openfdcm_tpu.core import geometry as geo, rasterize as ras, draw
from tests.utils import make_rotation


def _rot_line(line, angle, about):
    return np.asarray(geo.rotate(geo.as_lines(line), jnp.asarray(make_rotation(angle)),
                                 np.asarray(about, np.float32)))


def test_rasterize_vector_octants():
    # math.test.cpp:251-300 — all 8 octants; angle preserved, max-abs comp = 1
    for ang in np.linspace(-math.pi, math.pi, 16, endpoint=False):
        v = np.array([math.cos(ang), math.sin(ang)], np.float32)
        r = np.asarray(ras.rasterize_vector(jnp.asarray(v)))
        assert np.isclose(max(abs(r[0]), abs(r[1])), 1.0, atol=1e-6)
        # direction preserved (same or scaled-positive)
        cross = v[0] * r[1] - v[1] * r[0]
        dot = v[0] * r[0] + v[1] * r[1]
        assert abs(cross) < 1e-5 and dot > 0


def test_rasterize_vector_null_nan():
    r = np.asarray(ras.rasterize_vector(jnp.zeros(2)))
    assert np.isnan(r).any()


def test_rasterize_line_axis_aligned():
    line = np.array([8, 8, 11, 8], np.float32)
    assert np.array_equal(ras.rasterize_line(line), [[8, 9, 10, 11], [8, 8, 8, 8]])
    l5 = _rot_line(line, math.pi / 2, [8, 8])
    assert np.array_equal(ras.rasterize_line(l5), [[8, 8, 8, 8], [8, 9, 10, 11]])
    l1 = _rot_line(line, -math.pi / 2, [8, 8])
    assert np.array_equal(ras.rasterize_line(l1), [[8, 8, 8, 8], [8, 7, 6, 5]])


def test_rasterize_line_diagonals():
    line = np.array([8, 8, 11, 8], np.float32)
    l2 = _rot_line(line, -math.pi / 4, [8, 8])
    assert np.array_equal(ras.rasterize_line(l2), [[8, 9, 10], [8, 7, 6]])
    l4 = _rot_line(line, math.pi / 4, [8, 8])
    assert np.array_equal(ras.rasterize_line(l4), [[8, 9, 10], [8, 9, 10]])


def test_rasterize_short_line():
    r = ras.rasterize_line(np.array([0, 0, 0.4, 0], np.float32))
    assert r.shape == (2, 1)
    assert np.array_equal(r, [[0], [0]])


def test_clip_inside_kept():
    lines = np.array([[1, 1, 2, 2]], np.float32)
    out = ras.clip_lines(lines, (0, 3, 0, 3))
    assert np.allclose(out, lines)


def test_clip_partial():
    lines = np.array([[-1, 0, 3, 0]], np.float32)
    out = ras.clip_lines(lines, (0, 3, 0, 3))
    assert np.allclose(out, [[0, 0, 3, 0]])


def test_clip_crossing():
    lines = np.array([[-2, 1, 5, 1]], np.float32)
    out = ras.clip_lines(lines, (0, 3, 0, 3))
    assert np.allclose(out, [[0, 1, 3, 1]])


def test_clip_outside_removed_or_zeroed():
    lines = np.array([[5, 5, 7, 9]], np.float32)
    out = ras.clip_lines(lines, (0, 3, 0, 3), delete_oob=True)
    assert out.shape == (0, 4)
    out = ras.clip_lines(lines, (0, 3, 0, 3), delete_oob=False)
    assert np.allclose(out, 0.0)


def test_clip_diagonal_corner():
    lines = np.array([[-1, -1, 3, 3]], np.float32)
    out = ras.clip_lines(lines, (0, 1, 0, 1))
    assert out.shape == (1, 4)
    assert np.all(out >= -1e-6) and np.all(out <= 1 + 1e-6)


def test_draw_lines_pinned():
    # imgproc.test.cpp:97-144
    img = draw.draw_lines(jnp.zeros((1, 7), jnp.float32), np.array([[2, 0, 5, 0]], np.float32), 1)
    assert np.array_equal(np.asarray(img)[0], [0, 0, 1, 1, 1, 1, 0])
    img = draw.draw_lines(jnp.zeros((7, 1), jnp.float32), np.array([[0, 2, 0, 5]], np.float32), 1)
    assert np.array_equal(np.asarray(img)[:, 0], [0, 0, 1, 1, 1, 1, 0])
    img = np.asarray(draw.draw_lines(jnp.zeros((5, 5), jnp.float32),
                                     np.array([[1, 1, 3, 3]], np.float32), 1))
    expected = np.eye(5, dtype=np.float32)
    expected[0, 0] = expected[4, 4] = 0
    assert np.array_equal(img, expected)


def test_draw_lines_oob():
    img = np.asarray(draw.draw_lines(jnp.zeros((2, 2), jnp.float32),
                                     np.array([[1, -1, -1, 0]], np.float32), 1))
    assert np.all(img == 0)
    img = np.asarray(draw.draw_lines(jnp.zeros((2, 2), jnp.float32),
                                     np.array([[-1, -1, 3, 3]], np.float32), 1))
    assert np.any(img != 0)


def test_draw_lines_empty():
    img = draw.draw_lines(jnp.zeros((2, 2), jnp.float32), np.zeros((0, 4), np.float32), 1)
    assert np.all(np.asarray(img) == 0)
