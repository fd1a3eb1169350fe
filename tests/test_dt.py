"""Distance transform + line integral tests, value-pinned against reference
``tests/core/src/imgproc.test.cpp:146-213``."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from openfdcm_tpu.core import geometry as geo, dt, draw, integral
from openfdcm_tpu.core.types import Distance, F32_MAX
from tests.utils import make_rotation


@pytest.mark.parametrize("metric,single,line", [
    (Distance.L2, [2, 1, 0, 1], [2, 1, 0, 0, 0, 0, 1, 2]),
    (Distance.L1, [2, 1, 0, 1], [2, 1, 0, 0, 0, 0, 1, 2]),
    (Distance.L2_SQUARED, [4, 1, 0, 1], [4, 1, 0, 0, 0, 0, 1, 4]),
])
def test_distance_transform_pinned(metric, single, line):
    r = np.asarray(dt.distance_transform(np.array([[2, 0, 2, 0]], np.float32), (4, 1), metric))
    assert np.allclose(r[0], single, atol=1e-5)
    r = np.asarray(dt.distance_transform(np.array([[2, 0, 5, 0]], np.float32), (8, 2), metric))
    assert np.allclose(r[0], line, atol=1e-5)


@pytest.mark.parametrize("metric", [Distance.L2, Distance.L1, Distance.L2_SQUARED])
def test_distance_transform_column_ramp(metric):
    # vertical line in col 0 of a (5,10) canvas: col i == i (or i^2)
    r = np.asarray(dt.distance_transform(np.array([[0, 0, 0, 9]], np.float32), (5, 10), metric))
    assert r[:, 0].sum() == 0
    for i in range(5):
        expect = i ** 2 if metric == Distance.L2_SQUARED else i
        assert np.allclose(r[:, i], expect, atol=1e-5)


def test_distance_transform_empty():
    r = np.asarray(dt.distance_transform(np.zeros((0, 4), np.float32), (4, 4)))
    assert np.all(r == np.float32(F32_MAX))


def test_line_integral_max_invariant():
    # imgproc.test.cpp:146-164: a drawn 4-px line integrated along its own
    # angle accumulates to 3 or 4.
    line = np.array([8, 8, 11, 8], np.float32)
    for angle in [-math.pi / 2, -math.pi / 4, 0.0, math.pi / 4, math.pi / 2 - 1e-4]:
        lr = np.asarray(geo.rotate(geo.as_lines(line), jnp.asarray(make_rotation(angle)),
                                   np.array([8, 8], np.float32)))
        img = draw.draw_lines(jnp.zeros((20, 20), jnp.float32), lr, 1.0)
        out = integral.line_integral(img, angle)
        assert float(jnp.max(out)) in (3.0, 4.0)


def test_line_integral_horizontal_exact():
    # integral along x of a constant row == cumsum
    img = jnp.ones((3, 6), jnp.float32)
    out = np.asarray(integral.line_integral(img, 0.0))
    assert np.allclose(out, np.cumsum(np.ones((3, 6)), axis=1))


def test_line_integral_vertical_exact():
    img = jnp.ones((6, 3), jnp.float32)
    out = np.asarray(integral.line_integral(img, math.pi / 2 - 1e-6))
    assert np.allclose(out, np.cumsum(np.ones((6, 3)), axis=0))


def test_line_integral_negative_direction():
    # angle ~ -pi/2: sweep from the bottom edge upward
    img = jnp.ones((5, 2), jnp.float32)
    out = np.asarray(integral.line_integral(img, -math.pi / 2))
    assert np.allclose(out[:, 0], [5, 4, 3, 2, 1])


def test_line_integral_matches_sequential_reference():
    """Cross-check the shear-cumsum against a direct port of the reference's
    sequential block-shift algorithm (imgproc.h:38-84)."""
    rng = np.random.default_rng(42)

    def reference_line_integral(img, angle):
        img = img.copy()
        c, s = np.float32(np.cos(np.float32(angle))), np.float32(np.sin(np.float32(angle)))
        tan = s / c
        if -1.0 <= tan < 1.0:
            cond = c < 0
            rv = np.array([1 - 2 * cond, tan - 2.0 * cond * tan], np.float32)
        else:
            cond = s < 0
            inv = np.float32(1.0) / tan
            rv = np.array([inv - 2.0 * cond * inv, 1 - 2 * cond], np.float32)
        h, w = img.shape
        p0 = [0, 0]
        if rv[0] < 0: p0[0] = w - 1
        if rv[1] < 0: p0[1] = h - 1
        rnd = lambda v: int(np.sign(v) * np.floor(abs(v) + 0.5))
        if abs(rv[0]) == 1:
            prev_x = p0[0]
            for i in range(1, w):
                px = p0[0] + i * int(rv[0])
                py = rnd(i * rv[1]) - rnd((i - 1) * rv[1])
                y1, y2 = max(py, 0), max(-py, 0)
                n = h - abs(py)
                img[y1:y1 + n, px] += img[y2:y2 + n, prev_x]
                prev_x = px
        elif abs(rv[1]) == 1:
            prev_y = p0[1]
            for i in range(1, h):
                py = p0[1] + i * int(rv[1])
                px = rnd(i * rv[0]) - rnd((i - 1) * rv[0])
                x1, x2 = max(px, 0), max(-px, 0)
                n = w - abs(px)
                img[py, x1:x1 + n] += img[prev_y, x2:x2 + n]
                prev_y = py
        return img

    for angle in np.linspace(-math.pi / 2, math.pi / 2, 13, endpoint=False):
        img = rng.uniform(size=(12, 9)).astype(np.float32)
        ours = np.asarray(integral.line_integral(jnp.asarray(img), float(angle)))
        ref = reference_line_integral(img, float(angle))
        assert np.allclose(ours, ref, atol=1e-4), f"angle={angle}"
