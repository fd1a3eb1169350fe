"""Pallas TPU kernel for the directional line integral's sweep scan.

The reference's ``lineIntegral`` (``core/imgproc.h:38-84``) accumulates a
carry column-by-column along the sweep axis, shifting the carry by the
per-step row delta (always in {-1, 0, +1}) before each add.  The XLA
formulation (:func:`openfdcm_tpu.core.integral._sweep_scan`) is a
``lax.scan`` whose per-step work is a handful of ops on an ``(H,)``
carry — the scan is step-overhead-bound on TPU even with the 8-column
unroll (~30-60 ms of a 10-scene pose build).

This kernel runs the same recurrence with the carry VMEM-resident and the
column loop inside one program:

* slices are packed 8 per grid row (full sublane utilization: the carry is
  an ``(8, H)`` block, one slice per sublane row);
* the sweep axis is tiled into ``WB``-column blocks along the minor grid
  dimension, the carry persisting in scratch across blocks (TPU grid steps
  execute in order);
* per column: ``carry = col + shift(carry, delta)`` where the shift is a
  lane-roll with zero-fill — one add per (row, column) in exactly the
  reference's sequential order, so results are BIT-IDENTICAL to the XLA
  scan (verified by ``tests/test_integral_kernel.py``);
* a flipped sweep (reference sweeps from the far edge) reverses both the
  block order (via the index maps) and the in-block column loop.

Inputs are pre-transposed to ``(G, W, H)`` on the XLA side so each column
read is a contiguous ``(8, H)`` vreg block (H rides the lanes; canvases
are 128-multiples).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GB = 8        # slices per grid row (sublane packing)
WB = 128      # sweep columns per block
INTERPRET = False


def _shift_fill0(x, d):
    """Shift ``x (8, H)`` along lanes by ``d`` in {-1, +1} with zero fill.

    d=+1: out[:, y] = x[:, y-1] (out[:, 0] = 0) — the reference's
    "block moves down one row" case; d=-1 mirrors it.
    """
    h = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    r = pltpu.roll(x, d if d > 0 else h + d, 1)   # shift must be >= 0
    edge = lane == (0 if d == 1 else h - 1)
    return jnp.where(edge, 0.0, r)


def _kernel(img_ref, d_ref, out_ref, carry, *, nwb, flip):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    order = range(WB - 1, -1, -1) if flip else range(WB)

    def col(c):
        cur = img_ref[:, c, :]                      # (GB, H)
        d = d_ref[:, c][:, None]                    # (GB, 1) f32
        cy = carry[...]
        down = _shift_fill0(cy, 1)
        up = _shift_fill0(cy, -1)
        shifted = jnp.where(d == 1.0, down, jnp.where(d == -1.0, up, cy))
        new = cur + shifted
        carry[...] = new
        out_ref[:, c, :] = new

    for c in order:
        col(c)


def sweep_scan_tpu(imgs: jax.Array, deltas: jax.Array, flip: bool,
                   interpret: bool = False) -> jax.Array:
    """Sweep-integrate ``imgs (G, H, W)`` along W with per-column row
    ``deltas (G, W)`` (values in {-1, 0, +1}); ``flip`` reverses the sweep
    direction over the physical axis (reference far-edge sweeps).

    Bit-identical to :func:`openfdcm_tpu.core.integral._sweep_scan` applied
    per slice.  Requires H % 128 == 0 and W % WB == 0 (physical canvases
    are 128-multiples); G pads to a multiple of 8 internally.
    """
    g, h, w = imgs.shape
    assert h % 128 == 0 and w % WB == 0, (h, w)
    gp = -(-g // GB) * GB
    if gp != g:
        imgs = jnp.concatenate(
            [imgs, jnp.zeros((gp - g, h, w), imgs.dtype)], axis=0)
        deltas = jnp.concatenate(
            [deltas, jnp.zeros((gp - g, w), deltas.dtype)], axis=0)

    imgs_t = jnp.swapaxes(imgs, 1, 2)               # (G, W, H)
    dlt = deltas.astype(jnp.float32)
    nwb = w // WB

    if flip:
        imap = lambda i, j: (i, nwb - 1 - j, 0)
        dmap = lambda i, j: (i, nwb - 1 - j)
    else:
        imap = lambda i, j: (i, j, 0)
        dmap = lambda i, j: (i, j)

    out_t = pl.pallas_call(
        partial(_kernel, nwb=nwb, flip=flip),
        grid=(gp // GB, nwb),
        in_specs=[
            pl.BlockSpec((GB, WB, h), imap),
            pl.BlockSpec((GB, WB), dmap),
        ],
        out_specs=pl.BlockSpec((GB, WB, h), imap),
        out_shape=jax.ShapeDtypeStruct((gp, w, h), jnp.float32),
        scratch_shapes=[pltpu.VMEM((GB, h), jnp.float32)],
        interpret=interpret or INTERPRET,
    )(imgs_t, dlt)

    return jnp.swapaxes(out_t, 1, 2)[:g]


def supported(h: int, w: int) -> bool:
    """Shape gate.  The (GB, WB, h) in+out blocks are double-buffered by
    the Pallas pipeline: ~4 * GB * WB * h * 4 B of scoped VMEM.  Beyond
    h=896 that exceeds the 16 MB scoped-vmem limit (observed: 30.09 MB
    requested at h=1920, PUBLISHED config-2), so large canvases fall back
    to the XLA sweep scan."""
    vmem = 4 * GB * WB * h * 4
    return (h % 128 == 0 and w % WB == 0 and h >= 128 and w >= WB
            and vmem <= 15 * 1024 * 1024)
