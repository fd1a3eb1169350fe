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

Physical canvases may be padded beyond the logical region for tile
alignment; sweep positions are assigned so that only the logical region
participates with reference-exact indices (padded rows are zero so they
never perturb the sums; padded columns sit at trailing sweep positions).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sweep_spec", "line_integral", "line_integral_stack"]


def sweep_spec(angle: float):
    """Host-side sweep geometry for ``lineIntegral`` at a static angle.

    Returns ``(x_major, flip, r_minor)``: whether the sweep runs along x,
    whether it starts from the far edge, and the minor-axis step ratio —
    all computed in float32 like the reference (``imgproc.h:42-57``,
    ``drawing.h:57-67``).
    """
    c = np.float32(np.cos(np.float32(angle)))
    s = np.float32(np.sin(np.float32(angle)))
    tan = s / c
    if -1.0 <= tan < 1.0:  # x-major
        cond = c < 0
        rv = (np.float32(1 - 2 * cond), np.float32(tan - 2.0 * cond * tan))
    else:
        cond = s < 0
        inv = np.float32(1.0) / tan
        rv = (np.float32(inv - 2.0 * cond * inv), np.float32(1 - 2 * cond))
    x_major = abs(float(rv[0])) == 1.0
    if x_major:
        return True, float(rv[0]) < 0, rv[1]
    return False, float(rv[1]) < 0, rv[0]


def _offsets(r: np.float32, n: int) -> np.ndarray:
    """S(i) = round(i*r) with std::round (half away from zero) in f32."""
    prod = np.arange(n, dtype=np.float32) * np.float32(r)
    return (np.sign(prod) * np.floor(np.abs(prod) + np.float32(0.5))).astype(np.int32)


@partial(jax.jit, static_argnames=("pad",))
def _sheared_cumsum(img: jax.Array, offsets: jax.Array, s2p: jax.Array,
                    p2s: jax.Array, pad: int) -> jax.Array:
    """Sweep along axis 1 through columns in the order given by the
    sweep->physical permutation ``s2p``; shear along axis 0 by ``offsets``
    (indexed by sweep position).  ``p2s`` is the inverse permutation."""
    h, w = img.shape
    z = jnp.arange(-pad, h + pad)[:, None]                 # (H+2P, 1)
    rows = z + offsets[None, :]                            # (H+2P, W)
    valid = (rows >= 0) & (rows < h)
    sheared = jnp.where(valid, img[jnp.clip(rows, 0, h - 1), s2p[None, :]], 0.0)
    cs = jnp.cumsum(sheared, axis=1)
    pos = p2s[None, :]                                     # sweep pos of col x
    out_rows = jnp.arange(h)[:, None] - offsets[pos] + pad
    return cs[out_rows, pos]


def line_integral(img: jax.Array, angle: float) -> jax.Array:
    """Line integral of one image along ``angle``.  Reference ``imgproc.h:38-84``."""
    h, w = img.shape
    return line_integral_stack(img[None], [angle], logical_hw=(h, w))[0]


def line_integral_stack(imgs: jax.Array, angles, logical_hw=None) -> jax.Array:
    """Line integrals of a ``(D, PH, PW)`` stack, one static angle per slice.

    ``logical_hw``: the logical ``(H, W)``; trailing physical padding (which
    must be zero-valued) is kept out of the reference-exact index pattern.
    """
    d, ph, pw = imgs.shape
    lh, lw = logical_hw if logical_hw is not None else (ph, pw)
    assert len(angles) == d
    specs = [sweep_spec(float(a)) for a in angles]
    out = [None] * d

    for want_x_major in (True, False):
        idxs = [i for i, sp in enumerate(specs) if sp[0] == want_x_major]
        if not idxs:
            continue
        n_phys, n_log = (pw, lw) if want_x_major else (ph, lh)
        offs, s2ps, p2ss = [], [], []
        for i in idxs:
            _, flip, r = specs[i]
            sweep_log = (n_log - 1 - np.arange(n_log)) if flip else np.arange(n_log)
            s2p = np.concatenate([sweep_log, np.arange(n_log, n_phys)]).astype(np.int32)
            p2s = np.empty(n_phys, np.int32)
            p2s[s2p] = np.arange(n_phys, dtype=np.int32)
            offs.append(_offsets(r, n_phys))
            s2ps.append(s2p)
            p2ss.append(p2s)
        offs = np.stack(offs)
        pad = max(1, int(np.max(np.abs(offs))))
        group = imgs[np.array(idxs)]
        if not want_x_major:
            group = jnp.swapaxes(group, 1, 2)   # sweep axis -> axis 1's cols
        res = jax.vmap(lambda im, of, a, b: _sheared_cumsum(im, of, a, b, pad))(
            group, jnp.asarray(offs), jnp.asarray(np.stack(s2ps)), jnp.asarray(np.stack(p2ss)))
        if not want_x_major:
            res = jnp.swapaxes(res, 1, 2)
        for k, i in enumerate(idxs):
            out[i] = res[k]
    return jnp.stack(out)
