"""Directional line integrals (cumulative sums along a rasterized direction).

The reference implements this as a sequential in-place column/row block-shift
accumulation (``core/imgproc.h:38-84``): sweeping along the major axis, each
swept column adds the previously swept column shifted by
``round(i*r) - round((i-1)*r)`` rows.

That recurrence expands to

    out[y, i] = sum_{j<=i} img[y - (S(i) - S(j)), j]    (in-bounds terms)

with ``S(i) = round(i * r)``.  Because S is monotone, a term is included
exactly when its final index is in bounds, so the whole op is equivalent to
a *shear-gather -> cumsum -> unshear-gather* — fully parallel and
TPU-friendly.  The shear offsets depend only on the (static) angle, so they
are precomputed host-side in float32 to replicate the reference's rounding.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import rasterize as ras


def sweep_spec(angle: float, height: int, width: int):
    """Host-side sweep geometry for ``lineIntegral`` at a static angle.

    Returns ``(x_major, flip, offsets)`` where ``offsets`` is the int32
    shear ``S(i) = round(i * r_minor)`` for each swept index ``i`` along the
    major axis (length ``width`` if x-major else ``height``), computed in
    float32 like the reference (``imgproc.h:42-57``).
    """
    c = np.float32(np.cos(np.float32(angle)))
    s = np.float32(np.sin(np.float32(angle)))
    tan = s / c
    if -1.0 <= tan < 1.0:  # x-major (drawing.h:60-64)
        cond = c < 0
        rv = (np.float32(1 - 2 * cond), np.float32(tan - 2.0 * cond * tan))
    else:
        cond = s < 0
        inv = np.float32(1.0) / tan
        rv = (np.float32(inv - 2.0 * cond * inv), np.float32(1 - 2 * cond))
    x_major = abs(float(rv[0])) == 1.0
    if x_major:
        n, r, flip = width, rv[1], float(rv[0]) < 0
    else:
        n, r, flip = height, rv[0], float(rv[1]) < 0
    i = np.arange(n, dtype=np.float32)
    # std::round: half away from zero.
    prod = i * np.float32(r)
    offsets = (np.sign(prod) * np.floor(np.abs(prod) + np.float32(0.5))).astype(np.int32)
    return x_major, flip, offsets


@partial(jax.jit, static_argnames=("pad",))
def _sheared_cumsum(img: jax.Array, offsets: jax.Array, pad: int) -> jax.Array:
    """Core kernel: sweep along axis 1 (x, ascending), shear along axis 0 (y).

    ``offsets``: int32 ``(W,)`` shear per swept column.  ``pad`` >= max|offset|.
    """
    h, w = img.shape
    cols = jnp.arange(w)[None, :]
    z = jnp.arange(-pad, h + pad)[:, None]                     # (H+2P, 1)
    rows = z + offsets[None, :]                                # (H+2P, W)
    valid = (rows >= 0) & (rows < h)
    sheared = jnp.where(valid, img[jnp.clip(rows, 0, h - 1), cols], 0.0)
    cs = jnp.cumsum(sheared, axis=1)
    out_rows = jnp.arange(h)[:, None] - offsets[None, :] + pad  # (H, W)
    return cs[out_rows, cols]


def line_integral(img: jax.Array, angle: float) -> jax.Array:
    """Line integral of one image along ``angle``.  Reference ``imgproc.h:38-84``."""
    return line_integral_stack(img[None], [angle])[0]


def line_integral_stack(imgs: jax.Array, angles) -> jax.Array:
    """Line integrals of a ``(D, H, W)`` stack, one static angle per slice.

    Slices are grouped by sweep orientation; each group runs as a single
    vmapped shear-cumsum with a shared (static) pad.
    """
    d, h, w = imgs.shape
    assert len(angles) == d
    specs = [sweep_spec(float(a), h, w) for a in angles]
    out = [None] * d

    for want_x_major in (True, False):
        idxs = [i for i, sp in enumerate(specs) if sp[0] == want_x_major]
        if not idxs:
            continue
        offs = np.stack([specs[i][2] for i in idxs])            # (G, n)
        flips = np.array([specs[i][1] for i in idxs])
        pad = max(1, int(np.max(np.abs(offs))))
        group = imgs[np.array(idxs)]
        if not want_x_major:
            group = jnp.swapaxes(group, 1, 2)                   # sweep axis -> axis 2
        # A flipped sweep = flip along the sweep axis, integrate, flip back.
        group = jnp.where(jnp.asarray(flips)[:, None, None], group[:, :, ::-1], group)
        res = jax.vmap(lambda im, of: _sheared_cumsum(im, of, pad))(group, jnp.asarray(offs))
        res = jnp.where(jnp.asarray(flips)[:, None, None], res[:, :, ::-1], res)
        if not want_x_major:
            res = jnp.swapaxes(res, 1, 2)
        for k, i in enumerate(idxs):
            out[i] = res[k]
    return jnp.stack(out)
