"""Exact distance transforms of line sets, TPU-first.

The reference computes the DT with sequential separable passes
(Felzenszwalb–Huttenlocher lower envelope for L2/L2², two-pass min
propagation for L1 — ``core/imgproc.h:86-194``).  Both are *exact* EDTs of
the rasterized seed-pixel set, so on TPU we compute the mathematically
identical quantity directly:

    dt[p] = min over seed pixels s of metric(p - s)

as a blocked min-reduction over seeds — dense, branch-free, and VPU/MXU
friendly.  Coordinates are integers < 2^12 in practice, so squared
distances are exact in float32 and the result is bit-comparable with the
reference (which also ends in exact integer arithmetic in f32).

Empty seed sets produce an all-``F32_MAX`` image, matching the reference's
initialization value surviving the passes (``imgproc.h:174``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry as geo
from . import draw
from .types import Distance, F32_MAX

# Seeds are processed in chunks of this size to bound the fused
# broadcast-reduce working set.
_SEED_CHUNK = 1024


def _pad_seeds(points: jax.Array, mask: jax.Array, chunk: int) -> tuple[jax.Array, jax.Array]:
    s = points.shape[0]
    pad = (-s) % chunk
    if pad:
        points = jnp.pad(points, ((0, pad), (0, 0)))
        mask = jnp.pad(mask, (0, pad))
    return points, mask


@partial(jax.jit, static_argnames=("height", "width", "metric"))
def distance_from_seeds(points: jax.Array, mask: jax.Array, *, height: int,
                        width: int, metric: Distance) -> jax.Array:
    """Exact DT image ``(height, width)`` from integer seed pixels.

    ``points``: ``(S, 2)`` int32 ``(x, y)``; ``mask``: ``(S,)`` validity.
    Invalid seeds are ignored.  All-invalid -> all ``F32_MAX``.
    """
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]   # (H,1)
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]    # (1,W)

    points, mask = _pad_seeds(points, mask, _SEED_CHUNK)
    n_chunks = points.shape[0] // _SEED_CHUNK
    pts = points.reshape(n_chunks, _SEED_CHUNK, 2).astype(jnp.float32)
    msk = mask.reshape(n_chunks, _SEED_CHUNK)

    def chunk_min(carry, inp):
        p, m = inp  # (C,2), (C,)
        dx = jnp.abs(xs[None, :, :] - p[:, 0][:, None, None])  # (C,H,W) via bcast
        dy = jnp.abs(ys[None, :, :] - p[:, 1][:, None, None])
        if metric == Distance.L1:
            d = dx + dy
        else:
            d = dx * dx + dy * dy
        d = jnp.where(m[:, None, None], d, F32_MAX)
        return jnp.minimum(carry, jnp.min(d, axis=0)), None

    init = jnp.full((height, width), F32_MAX, jnp.float32)
    out, _ = jax.lax.scan(chunk_min, init, (pts, msk))
    if metric == Distance.L2:
        out = jnp.where(out >= F32_MAX, F32_MAX, jnp.sqrt(out))
    return out


def distance_transform(lines, size, metric: Distance = Distance.L2,
                       max_points: int | None = None) -> jax.Array:
    """DT of a line set on a ``(W, H) = size`` canvas.  Reference ``imgproc.h:169-194``.

    ``size`` follows the reference's ``Size`` convention ``(width, height)``.
    """
    lines = geo.as_lines(lines)
    w, h = int(size[0]), int(size[1])
    if lines.shape[0] == 0:
        return jnp.full((h, w), F32_MAX, jnp.float32)
    if max_points is None:
        max_points = int(np.hypot(w, h)) + 2
    pts, mask = draw.seed_points(lines, h, w, max_points)
    return distance_from_seeds(pts, mask, height=h, width=w, metric=metric)
