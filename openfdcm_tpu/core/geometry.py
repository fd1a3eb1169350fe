"""Line geometry primitives for Fast Directional Chamfer Matching on TPU.

Data model
----------
A *line array* is a float32 tensor of shape ``(..., 4)`` where the last axis
holds ``(x1, y1, x2, y2)``.  This is the transpose of the reference library's
column-major ``4 x N`` Eigen layout (reference ``core/math.h:57-66``): putting
the line axis first makes every op batchable with ``jax.vmap`` and keeps the
last axis small and contiguous.

All functions are pure, shape-polymorphic over leading batch axes, and safe
to ``jax.jit``.  Semantics mirror the reference implementations cited in each
docstring; where the reference relies on IEEE-754 edge cases (NaN/inf
propagation in ``normalize``/``getAngle``), those are preserved.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

PI = math.pi
HALF_PI = math.pi / 2.0


def _apply2x2(rot: jax.Array, v: jax.Array) -> jax.Array:
    """Exact-f32 2x2 matrix application (elementwise — keeps the MXU out of
    tiny K=2 contractions and avoids low-precision matmul defaults)."""
    x = rot[..., 0, 0] * v[..., 0] + rot[..., 0, 1] * v[..., 1]
    y = rot[..., 1, 0] * v[..., 0] + rot[..., 1, 1] * v[..., 1]
    return jnp.stack([x, y], axis=-1)


def as_lines(lines) -> jax.Array:
    """Coerce input to a float32 ``(N, 4)`` line array.

    Accepts the reference's ``(4, N)`` layout (reference ``core/math.h:66``)
    as well as the native ``(N, 4)`` layout.  A ``(4, 4)`` array is ambiguous
    and interpreted as native ``(N, 4)``.
    """
    arr = jnp.asarray(lines, dtype=jnp.float32)
    if arr.ndim == 1:
        arr = arr.reshape(1, 4)
    if arr.ndim == 2 and arr.shape[0] == 4 and arr.shape[1] != 4:
        arr = arr.T
    if arr.shape[-1] != 4:
        raise ValueError(f"line array must have a trailing axis of 4, got {arr.shape}")
    return arr


def as_lines_np(lines) -> "np.ndarray":
    """Host (numpy) twin of :func:`as_lines` — no device round-trip.

    Orchestration code (search strategies, candidate bookkeeping) runs on
    host data; going through jnp would cost a tunnel round-trip per call on
    remote-attached TPUs.
    """
    import numpy as np
    arr = np.asarray(lines, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr.reshape(1, 4)
    if arr.ndim == 2 and arr.shape[0] == 4 and arr.shape[1] != 4:
        arr = arr.T
    if arr.shape[-1] != 4:
        raise ValueError(f"line array must have a trailing axis of 4, got {arr.shape}")
    return arr


def p1(lines: jax.Array) -> jax.Array:
    """First endpoint, ``(..., 2)``.  Reference ``core/math.h:282``."""
    return lines[..., 0:2]


def p2(lines: jax.Array) -> jax.Array:
    """Second endpoint, ``(..., 2)``.  Reference ``core/math.h:283``."""
    return lines[..., 2:4]


@jax.jit
def get_center(lines: jax.Array) -> jax.Array:
    """Midpoint of each line, ``(..., 2)``.  Reference ``core/math.h:286-288``."""
    return (p1(lines) + p2(lines)) * 0.5


@jax.jit
def get_angle(lines: jax.Array) -> jax.Array:
    """Angle of each line in ``[-pi/2, pi/2]``, shape ``(...,)``.

    Matches reference ``core/math.h:295-299``: ``atan(dy/dx)`` — NOT atan2 —
    so a vertical line maps to ``+/-pi/2`` (atan of ``+/-inf``) and a
    degenerate point line maps to NaN (atan of ``0/0``).
    """
    d = p2(lines) - p1(lines)
    return jnp.arctan(d[..., 1] / d[..., 0])


@jax.jit
def get_length(lines: jax.Array) -> jax.Array:
    """Euclidean length of each line, shape ``(...,)``.  Reference ``core/math.h:306-308``."""
    d = p2(lines) - p1(lines)
    return jnp.sqrt(d[..., 0] ** 2 + d[..., 1] ** 2)


def get_template_lengths(templates) -> list:
    """Total line length per template.  Reference ``core/math.h:319-324``.

    Host-side (numpy): template metadata lives on host and this is called
    once per search; no reason to pay device dispatch per template.
    """
    import numpy as np
    out = []
    for t in templates:
        arr = np.asarray(t, dtype=np.float32)
        if arr.ndim == 2 and arr.shape[0] == 4 and arr.shape[1] != 4:
            arr = arr.T
        arr = arr.reshape(-1, 4)
        if arr.shape[0] == 0:
            out.append(0.0)
            continue
        d = arr[:, 2:4] - arr[:, 0:2]
        out.append(float(np.sum(np.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2), dtype=np.float32)))
    return out


@jax.jit
def normalize(lines: jax.Array) -> jax.Array:
    """Unit direction vector of each line, ``(..., 2)``.

    Reference ``core/math.h:331-333`` (Eigen ``colwise().normalized()``):
    a zero-length line yields ``(0, 0)`` (Eigen's normalized() of a zero
    vector returns the zero vector).
    """
    d = p2(lines) - p1(lines)
    n = jnp.sqrt(d[..., 0:1] ** 2 + d[..., 1:2] ** 2)
    return jnp.where(n > 0, d / jnp.where(n > 0, n, 1.0), 0.0)


@jax.jit
def transform(lines: jax.Array, mat23: jax.Array) -> jax.Array:
    """Apply a 2x3 affine transform to a line array.  Reference ``core/math.h:341-344``.

    ``mat23`` may carry leading batch axes ``(..., 2, 3)`` broadcast against
    the lines' leading axes.
    """
    a = _apply2x2(mat23[..., :2, :2], p1(lines)) + mat23[..., :2, 2]
    b = _apply2x2(mat23[..., :2, :2], p2(lines)) + mat23[..., :2, 2]
    return jnp.concatenate([a, b], axis=-1)


@jax.jit
def translate(lines: jax.Array, translation: jax.Array) -> jax.Array:
    """Translate a line array by a 2-vector.  Reference ``core/math.h:352-354``."""
    translation = jnp.asarray(translation, dtype=lines.dtype)
    return lines + jnp.concatenate([translation, translation], axis=-1)


@jax.jit
def rotate(lines: jax.Array, rot: jax.Array, rot_point: jax.Array | None = None) -> jax.Array:
    """Rotate a line array by a 2x2 matrix, optionally about a point.

    Reference ``core/math.h:362-378``.
    """
    if rot_point is None:
        a = _apply2x2(rot, p1(lines))
        b = _apply2x2(rot, p2(lines))
        return jnp.concatenate([a, b], axis=-1)
    rot_point = jnp.asarray(rot_point, dtype=jnp.float32)
    t = rot_point - _apply2x2(rot, rot_point)
    mat = jnp.concatenate([rot, t[:, None]], axis=-1)
    return transform(lines, mat)


@jax.jit
def align(alignment_line: jax.Array, ref_line: jax.Array) -> jax.Array:
    """The two rigid transforms aligning ``alignment_line`` onto ``ref_line``.

    Returns ``(..., 2, 2, 3)``: both polarities (the aligned line may point
    either way along the reference line).  Closed form of reference
    ``core/math.h:387-406``: rotation from the two unit directions, then a
    translation matching midpoints.

    Batched: both inputs may carry identical leading axes ``(..., 4)``.
    """
    td = normalize(alignment_line)  # tmpl_d
    ad = normalize(ref_line)        # align_d
    cos = ad[..., 0] * td[..., 0] + ad[..., 1] * td[..., 1]
    sin = ad[..., 1] * td[..., 0] - ad[..., 0] * td[..., 1]

    def mk(c, s):
        rot = jnp.stack([jnp.stack([c, -s], axis=-1),
                         jnp.stack([s, c], axis=-1)], axis=-2)  # (...,2,2)
        center_a = get_center(alignment_line)
        rotated_center = _apply2x2(rot, center_a)
        t = get_center(ref_line) - rotated_center
        return jnp.concatenate([rot, t[..., :, None]], axis=-1)  # (...,2,3)

    m1 = mk(cos, sin)
    m2 = mk(-cos, -sin)
    return jnp.stack([m1, m2], axis=-3)


@jax.jit
def combine(a, b) -> jax.Array:
    """Compose a 2x3 transform with a translation.

    ``combine(mat23, translation)``: translation applied *before* the
    transform (reference ``core/math.h:414-419``).
    ``combine(translation, mat23)``: translation applied *after* (reference
    ``core/math.h:427-432``).  Dispatch follows trailing shape.
    """
    a = jnp.asarray(a, dtype=jnp.float32)
    b = jnp.asarray(b, dtype=jnp.float32)
    if a.shape[-1] == 3 and a.ndim >= 2 and a.shape[-2] == 2:  # (mat, translation)
        rot = a[..., :2, :2]
        t = a[..., :2, 2] + _apply2x2(rot, b)
        return jnp.concatenate([rot, t[..., :, None]], axis=-1)
    # (translation, mat)
    rot = b[..., :2, :2]
    t = b[..., :2, 2] + a
    return jnp.concatenate([rot, t[..., :, None]], axis=-1)


@jax.jit
def minmax_point(lines: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Min and max corner of the bounding box over all endpoints.

    Reference ``core/math.h:166-171``.  Returns ``(min_point, max_point)``
    each of shape ``(..., 2)`` reduced over the line axis (axis ``-2``).
    """
    pts = lines.reshape(*lines.shape[:-1], 2, 2)  # (..., N, 2 endpoints, 2)
    mn = jnp.min(pts, axis=(-3, -2))
    mx = jnp.max(pts, axis=(-3, -2))
    return mn, mx


# ----------------------------------------------------------------------------
# Angle utilities — reference core/math.h:182-272
# ----------------------------------------------------------------------------

@jax.jit
def constrain_half_angle(x: jax.Array) -> jax.Array:
    """Wrap angle(s) to ``[-pi/2, pi/2)``.  Reference ``core/math.h:218-223``."""
    x = jnp.asarray(x)
    y = jnp.fmod(x + HALF_PI, PI)
    y = y + PI * (y < 0)
    return y - HALF_PI


@jax.jit
def constrain_angle(x: jax.Array) -> jax.Array:
    """Wrap angle(s) to ``[-pi, pi)``.  Reference ``core/math.h:244-249``."""
    x = jnp.asarray(x)
    y = jnp.fmod(x + PI, 2 * PI)
    y = y + 2 * PI * (y < 0)
    return y - PI


def wrap_max(x, mx):
    """Reference ``core/math.h:264-267``."""
    return jnp.fmod(mx + jnp.fmod(x, mx), mx)


def wrap_min_max(x, mn, mx):
    """Reference ``core/math.h:269-272``."""
    return mn + wrap_max(x - mn, mx - mn)


@jax.jit
def relatively_equal(a, b, rtol=1e-10, atol=1.1920929e-07) -> jax.Array:
    """Reference ``core/math.h:183-188`` (default atol = f32 epsilon)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return jnp.abs(a - b) <= atol + rtol * jnp.maximum(jnp.abs(a), jnp.abs(b))


def all_close(a, b, rtol=0.0, atol=1e-5) -> bool:
    """Reference ``core/math.h:203-208``."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    return bool(jnp.all(jnp.abs(a - b) <= (atol + rtol * jnp.abs(b))))
