"""Pallas TPU kernel for the exact L2² row pass of the distance transform,
banded by an L1-distance bound.

The separable EDT's row pass is a min-plus convolution with a quadratic
kernel: ``out[r, x] = min_s (g2[r, s] + (x - s)^2)`` (``core/dt.py``).  XLA
computes the dense O(W²) form at VPU peak, which dominates DT3 build time at
large canvases (~425ms of a 1080p-class build).

Two independent, composable exactness-preserving prunes cut the scan:

1. **L1 band.** The winning source for a pixel satisfies
   ``|x - s*| <= d_L2(x) <= d_L1(x)`` (the L2 distance is bounded by the
   L1 distance of the same seed set, and the quadratic term alone already
   exceeds the optimum beyond that radius).  The L1 distance transform
   costs only two cumulative-min passes, so each (256-row × 128-col) tile
   gets a cheap exact search radius ``R = max d_L1 + 1``.

2. **Active-source compaction.**  After the column pass, ``g2[r, s]`` is
   finite only for columns ``s`` that contain at least one seed (the
   column pass propagates along columns, so a seedless column stays
   +inf for every row); infinite sources can never win the min-plus.
   Each tile therefore scans only the source chunks that hold a finite
   value somewhere in the tile's rows — far-field tiles of *sparse*
   orientation slices (where ``d_L1`` is large and the band alone
   degrades to the full scan) drop to the handful of chunks the slice's
   lines actually touch.

The per-tile chunk list is the intersection of both prunes, precomputed
vectorized on the XLA side and streamed through SMEM.

Kernel layout: sources and rows ride the vregs — per (dest column, source
octet) step the tile updates an ``(8 sources, RB rows)`` minimum carrier,
then a sublane reduce collapses sources; the output tile is (CB, RB)
(transposed), untransposed on the XLA side.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

def _read_rb() -> int:
    """Rows per tile from ``OPENFDCM_TPU_MINPLUS_RB``.  128 aligns tiles to
    orientation slices on 128-multiple canvases (a 256-row tile straddles
    slice boundaries in the flattened (S*D*H) row axis, unioning two slices'
    bands and active-chunk sets).

    A value that is not a positive multiple of 8 would mis-tile the kernel
    (misaligned accumulator writes crash the TPU runtime — ADVICE r3), so
    invalid values fall back to the default with a warning."""
    raw = _os.environ.get("OPENFDCM_TPU_MINPLUS_RB", "128")
    try:
        rb = int(raw)
    except ValueError:
        rb = -1
    if rb <= 0 or rb % 8:
        if raw != "128":
            import warnings
            warnings.warn(
                f"OPENFDCM_TPU_MINPLUS_RB={raw!r} is not a positive multiple"
                " of 8; using the default 128", stacklevel=2)
        return 128
    return rb


RB = _read_rb()
CB = 128      # dest columns per tile
INTERPRET = False


def _kernel(chunks_ref, nch_ref, g2t_ref, out_ref, *, w):
    """One (row-tile i, col-tile j) program.

    ``g2t_ref``: (1, W, RB) transposed source block (rows on lanes).
    ``out_ref``: (1, CB, RB) transposed dest block.
    ``chunks/nch``: SMEM — per-tile compacted source-chunk list and its
    length (band ∩ active sources).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    nch = nch_ref[i, j]
    x0 = j * CB

    sub8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, RB), 0)

    out_ref[0, :, :] = jnp.full((CB, RB), jnp.inf, jnp.float32)

    def chunk(ci, _):
        c = chunks_ref[0, j, ci]
        base = pl.multiple_of(c * CB, 128)
        src = g2t_ref[0, pl.ds(base, CB), :]              # (CB srcs, RB)
        basef = (c * CB).astype(jnp.float32)

        def dest_group(g, _):
            base_g = pl.multiple_of(g * 8, 8)
            grp = out_ref[0, pl.ds(base_g, 8), :]         # (8 dests, RB)
            for di in range(8):
                xf = (x0 + base_g + di).astype(jnp.float32)
                acc = jnp.full((8, RB), jnp.inf, jnp.float32)
                for o in range(CB // 8):
                    a8 = src[8 * o:8 * (o + 1), :]        # (8 srcs, RB)
                    d = xf - (basef + jnp.float32(8 * o) + sub8)
                    acc = jnp.minimum(acc, a8 + d * d)
                red = jnp.min(acc, axis=0, keepdims=True)  # (1, RB)
                grp = jnp.where(row8 == di, jnp.minimum(grp, red), grp)
            out_ref[0, pl.ds(base_g, 8), :] = grp
            return 0

        jax.lax.fori_loop(0, CB // 8, dest_group, 0)
        return 0

    jax.lax.fori_loop(0, nch, chunk, 0)


def minplus_rows_banded(g2: jax.Array, l1: jax.Array) -> jax.Array:
    """Exact ``out[r, x] = min_s (g2[r, s] + (x-s)^2)`` over the last axis.

    ``g2``: (N, W) with W a multiple of CB and N a multiple of RB;
    ``l1``: (N, W) exact L1 distances of the same seed set (the band bound).
    """
    n, w = g2.shape
    assert w % CB == 0 and n % RB == 0
    nbr, nbc = n // RB, w // CB
    chunks, nch = _plan_chunks(g2, l1)

    g2t = jnp.swapaxes(g2.reshape(nbr, RB, w), 1, 2)      # (nbr, W, RB)

    out_t = pl.pallas_call(
        partial(_kernel, w=w),
        grid=(nbr, nbc),
        in_specs=[
            pl.BlockSpec((1, nbc, nbc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, w, RB), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CB, RB), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nbr, nbc * CB, RB), jnp.float32),
        interpret=INTERPRET,
    )(chunks, nch, g2t)

    return jnp.swapaxes(out_t, 1, 2).reshape(n, w)


def _plan_chunks(g2: jax.Array, l1: jax.Array):
    """Per-tile compacted source-chunk plan: ``(chunks (nbr, nbc, nbc)
    int32, nch (nbr, nbc) int32)``.  Chunk ``c`` is scanned by tile
    ``(i, j)`` iff it intersects the tile's L1 winner-radius window AND
    holds a finite source anywhere in the tile's rows."""
    n, w = g2.shape
    nbr, nbc = n // RB, w // CB

    # L1 band -> source chunk window per (row tile, dest col tile)
    r_tile = jnp.max(l1.reshape(nbr, RB, nbc, CB), axis=(1, 3))
    r_tile = jnp.minimum(r_tile, jnp.float32(w)) + 1.0    # inf-safe clamp
    r_tile = r_tile.astype(jnp.int32)
    x0 = (jnp.arange(nbc, dtype=jnp.int32) * CB)[None, :]
    c_lo = jnp.maximum(0, (x0 - r_tile) // CB)            # (nbr, nbc)
    c_hi = jnp.minimum(nbc - 1, (x0 + CB - 1 + r_tile) // CB)

    # active sources per (row tile, source chunk)
    act = jnp.any(jnp.isfinite(g2).reshape(nbr, RB, nbc, CB), axis=(1, 3))

    c = jnp.arange(nbc, dtype=jnp.int32)
    sel = (act[:, None, :] & (c[None, None, :] >= c_lo[:, :, None])
           & (c[None, None, :] <= c_hi[:, :, None]))      # (nbr, nbc, nbc)
    nch = jnp.sum(sel, axis=-1).astype(jnp.int32)
    # stable compaction: selected chunks first, ascending
    key = jnp.where(sel, c[None, None, :], c[None, None, :] + nbc)
    chunks = jnp.sort(key, axis=-1).astype(jnp.int32) % nbc
    return chunks, nch
