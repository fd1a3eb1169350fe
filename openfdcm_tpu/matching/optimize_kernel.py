"""Kernel-backed optimizer path: greedy/batch walks on Pallas window scores.

The Pallas kernel (:mod:`openfdcm_tpu.ops.window_kernel`) evaluates, for
every candidate at once, the score window ``m in [-tc, +tc]`` around the
aligned position (``tc <= 24`` steps, smaller for steep rays).  The walk
logic of the reference optimizers then runs as vectorized mask algebra on
those windows — identical decision sequences to the reference
(``defaultoptimize.cpp:49-64``, ``batchoptimize.cpp:60-93``) — and the few
candidates whose walk leaves the covered window continue on the existing
XLA-gather lockstep walk (:func:`openfdcm_tpu.matching.optimize._greedy_walk`
/ ``_batch_walk``), compacted so stragglers cost only their own work.

Scene-batched: operates on ``(S, C, ...)`` candidate tensors against a
``(S, D, Q, Q)`` DT3 stack in one dispatch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import geometry as geo
from ..core import rasterize as ras
from ..ops import window_kernel as wk
from . import featuremap as fm
from . import optimize as opt

_BIG = opt._BIG

# Window-kernel generation: 4 = branch-free unrolled groups on precomputed
# packed indices (latency-bound fix, ~4.7x v3 — window_kernel.py r4 notes),
# 3 = sublane-first identity-mapped gathers, 2 = the round-1 patch-gather
# kernel.
import os as _os


def kernel_version() -> int:
    """Read at TRACE time so a runtime fallback (set the env var, then
    ``jax.clear_caches()``) can switch kernel generations — e.g. the bench
    dropping v4 -> v3 -> XLA if a generation fails on hardware."""
    return int(_os.environ.get("OPENFDCM_TPU_KERNEL_VERSION", "4"))


KERNEL_VERSION = kernel_version()   # import-time snapshot (back-compat)


# ---------------------------------------------------------------------------
# Coverage-aware chain decisions on precomputed windows
# ---------------------------------------------------------------------------

def _greedy_chain_cov(scores, t_limit, tcov, state, sign):
    """One greedy-walk pass over kernel window ``scores (M, H)`` holding
    steps ``t0 .. t0+H-1`` (t0 = 1), where only steps ``<= tcov`` were
    evaluated.  Stops caused purely by coverage leave the candidate
    not-done with ``t_next`` at the first unevaluated step."""
    prev, best, bmul, done, t0 = state
    m, h = scores.shape
    idx = t0[:, None] + jnp.arange(h, dtype=jnp.float32)[None, :]
    evaluated = idx <= tcov[:, None]
    in_range = idx <= t_limit[:, None]
    active = ~done[:, None]

    prev_chain = jnp.concatenate([prev[:, None], scores[:, :-1]], axis=1)
    ascent = evaluated & (scores > prev_chain)
    stop = (ascent | ~in_range | ~evaluated) | ~active
    any_stop = jnp.any(stop, axis=1)
    k = jnp.where(any_stop, jnp.argmax(stop, axis=1), h)

    lane = jnp.arange(h)[None, :]
    kept = lane < k[:, None]
    masked = jnp.where(kept, scores, _BIG)
    wmin = jnp.min(masked, axis=1)
    wmin_idx = jnp.argmin(masked, axis=1)          # first occurrence
    has_kept = k > 0
    new_prev = jnp.where(has_kept, jnp.take_along_axis(
        masked, jnp.maximum(k - 1, 0)[:, None], axis=1)[:, 0], prev)

    improve = wmin < best
    best = jnp.where(improve, wmin, best)
    bmul = jnp.where(improve, sign * (t0 + wmin_idx.astype(jnp.float32)),
                     bmul)

    stop_at_k = jnp.take_along_axis(
        ascent | ~in_range, jnp.minimum(k, h - 1)[:, None], axis=1)[:, 0]
    ended = any_stop & (k < h) & stop_at_k
    done = done | ended
    return new_prev, best, bmul, done, t0 + k.astype(jnp.float32)


def _batch_chain_cov(scores, t_limit, tcov, state, sign, batch):
    """BatchOptimize decisions over kernel window ``scores (M, H)`` (steps
    ``t0..t0+H-1``, t0 = 1).  A batch is decidable only when all its legal
    steps were evaluated (``min(batch_end, t_limit) <= tcov``); undecidable
    batches freeze the candidate (continues on the straggler walk)."""
    prev, best, bmul, done, t0 = state
    m, h = scores.shape
    nb = h // batch
    hh = nb * batch
    bmin, barg, last, t0s = opt._batch_stats(scores[:, :hh], t_limit, t0,
                                             batch)

    def step(carry, inp):
        st, frozen = carry
        bmin_i, barg_i, last_i, t0b = inp
        legal_end = jnp.minimum(t0b + batch - 1, t_limit)
        decidable = (legal_end <= tcov) & ~frozen
        nst = opt._batch_step(st, (bmin_i, barg_i, last_i, t0b),
                              sign=sign, batch=batch, t_limit=t_limit)
        st = tuple(jnp.where(decidable, n, o) for n, o in zip(nst, st))
        return (st, frozen | ~decidable), None

    (st, frozen), _ = jax.lax.scan(
        step, ((prev, best, bmul, done), jnp.zeros_like(done)),
        (bmin.T, barg.T, last.T, t0s))
    prev, best, bmul, done = st
    nb_dec = jnp.clip(jnp.floor((tcov - t0 + 1) / batch), 0, nb)
    t_next = t0 + nb_dec * batch
    return prev, best, bmul, done, t_next


# ---------------------------------------------------------------------------
# Straggler continuation (compacted lockstep walk via the XLA gather path)
# ---------------------------------------------------------------------------

def _compact_sel(done, b, m):
    """First ``b`` active candidate indices (actives in index order; spare
    slots hold the lowest done candidates — processing those is a no-op).
    Stable sort instead of cumsum+scatter: XLA's TPU scatter is ~40x slower
    than its sort."""
    order = jnp.argsort(done.astype(jnp.int32), stable=True)
    return order[:b].astype(jnp.int32)


def _straggler(state, sign, t_lim, chain_cov, walk, eval_at, window, m,
               ext_eval):
    """Finish walks that left the kernel's covered window.

    One kernel EXTENSION pass on a cumsum-compacted subset — the same
    Pallas kernel re-aimed at per-candidate resume steps (64 forward steps,
    full coverage even for steep rays; walks rarely go further) — then a
    small lockstep XLA walk backstop, then a full-width walk that only
    iterates in the (never-seen) overflow case.

    The machinery runs under a runtime ``lax.switch`` ladder on the live
    count: 0 live -> identity; few live -> a small extension pass; many ->
    the full-size one.  The ext kernel's cost scales with its static
    ``b_ext`` (masked items cost the same as real ones — measured r3), so
    matching its size to the live population is the whole game.  Any
    walker beyond the chosen rung's capacity still finishes correctly via
    the tail / full-width backstop walks."""
    def run_with(b_ext):
        # b_ext MUST be a multiple of 8: it becomes the ext kernel's c_dim,
        # and the kernel's accumulator writes full 8-sublane slot blocks (a
        # partial last block is an out-of-bounds VMEM write -> TPU runtime
        # crash; hit via the genpairs path where m = 9120 gave b_ext = 570).
        def run(state):
            sel = _compact_sel(state[3], b_ext, m)
            sub = tuple(x[sel] for x in state)
            scores, cover = ext_eval(sel, ~sub[3], sign, sub[4])
            tc_abs = sub[4] + cover.astype(jnp.float32)
            sub = chain_cov(scores, t_lim[sel], tc_abs, sub, sign)
            state = tuple(x.at[sel].set(v) for x, v in zip(state, sub))
            # ONE narrow compacted lockstep walk carries the (few,
            # far-walking) survivors of the ext pass at a small
            # per-iteration eval; anything beyond its capacity finishes on
            # the full-width backstop below (a while_loop that exits after
            # one any-live reduce when nobody is live).  r4: the second
            # (m//64) rung cost an extra 91k argsort + walk setup per
            # direction (~8 ms/dispatch) and its population was empty in
            # every measured pose run.
            tails = [min(m, max(64, m // 512))]
            for b_tail in tails:
                sel = _compact_sel(state[3], b_tail, m)
                sub = tuple(x[sel] for x in state)
                sub = walk(eval_at(sign, window, sel), t_lim[sel], sub, sign,
                           window)
                state = tuple(x.at[sel].set(v) for x, v in zip(state, sub))
            return walk(eval_at(sign, window), t_lim, state, sign, window)
        return run

    b_small = max(256, -(-(m // 32) // 8) * 8)
    b_big = max(256, -(-(m // 16) // 8) * 8)
    live = jnp.sum(~state[3])
    if b_small >= b_big:
        return jax.lax.cond(live > 0, run_with(b_big), lambda s: s, state)
    branch = jnp.where(live == 0, 0, jnp.where(live <= b_small, 1, 2))
    return jax.lax.switch(branch,
                          [lambda s: s, run_with(b_small), run_with(b_big)],
                          state)


# ---------------------------------------------------------------------------
# Entry
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("mode", "window", "items_cap",
                                   "skip_straggler"))
def optimize_candidates_batch_kernel(dt3, angles, scene_tr, feature_size,
                                     cand_lines, cand_mask, cand_align, *,
                                     mode: str, window: int,
                                     items_cap: int | None = None,
                                     skip_straggler: bool = False,
                                     cand_ok=None):
    """Scene-batched optimize using the Pallas window kernel.

    ``dt3``: ``(S, D, Q, Q)``; ``cand_lines``: ``(S, C, L, 4)``;
    ``cand_mask``: ``(S, C, L)``; ``cand_align``: ``(S, C, 2)``;
    ``scene_tr`` / ``feature_size``: ``(S, 2)``.
    ``cand_ok``: optional ``(S, C)`` — candidates the caller will mask out
    anyway (e.g. invalid search windows on the on-device pair-generation
    path); folding them into ``valid`` here keeps them out of the kernel
    item stream AND the straggler passes.
    Returns ``(scores (S, C), translations (S, C, 2), valid (S, C))``.
    """
    s, d, q, _ = dt3.shape
    c, l = cand_mask.shape[1:]
    m = s * c

    null_align = geo.relatively_equal(
        jnp.sum(jnp.abs(cand_align), axis=-1), 0.0)
    rast = ras.rasterize_vector(cand_align)               # (S, C, 2)
    neg, pos = fm.minmax_translation_raw(
        cand_lines, rast, feature_size[:, None, :],
        scene_tr[:, None, :], cand_mask)
    valid = jnp.isfinite(neg) & jnp.isfinite(pos) & ~null_align
    if cand_ok is not None:
        valid = valid & cand_ok

    slice_idx = fm.classify_lines(angles, cand_lines)     # (S, C, L)

    if kernel_version() == 4:
        cap4 = None if items_cap is None else \
            cap_bucket(items_cap + wk.pad_margin_v4(s, d))
        fields, tc = wk.build_fields_v4(cand_lines, cand_mask, rast, valid,
                                        slice_idx, scene_tr, depth=d, q=q,
                                        cap=cap4)
        kf, gidx = wk.pack_gidx_v4(fields, q=q)
        banks = wk.prep_dt3_banks(dt3)
        win = wk.window_scores_device_v4(banks, kf, gidx, s_dim=s, c_dim=c,
                                         depth=d, q=q)
    elif kernel_version() == 3:
        fields, tc = wk.build_fields_v3(cand_lines, cand_mask, rast, valid,
                                        slice_idx, scene_tr, depth=d, q=q,
                                        cap=items_cap)
        banks = wk.prep_dt3_banks(dt3)
        win = wk.window_scores_device_v3(banks, fields, s_dim=s, c_dim=c,
                                         depth=d, q=q)
    else:
        fields, tc = wk.build_fields(cand_lines, cand_mask, rast, valid,
                                     slice_idx, scene_tr, depth=d, q=q,
                                     cap=items_cap)
        dt3t = jnp.swapaxes(dt3, -1, -2)
        win = wk.window_scores_device(dt3, dt3t, fields, s_dim=s, c_dim=c,
                                      depth=d, q=q)

    # --- flatten to one candidate axis ---------------------------------
    lmf = cand_mask.reshape(m, l).astype(jnp.float32)
    cl_flat = cand_lines.reshape(m, l, 4)
    cm_flat = cand_mask.reshape(m, l)
    si_raw = slice_idx.reshape(m, l)
    endpoints = cand_lines.reshape(m, l, 2, 2)
    scene_of = jnp.repeat(jnp.arange(s, dtype=jnp.int32), c)
    si_flat = si_raw + (scene_of * d)[:, None]
    tr_flat = jnp.repeat(scene_tr, c, axis=0)[:, None, :]  # (M, 1, 2)
    rast_f = rast.reshape(m, 2)
    valid_f = valid.reshape(m)
    safe_rast = jnp.where(valid_f[:, None], rast_f, 0.0)
    t_pos = jnp.where(valid_f, jnp.trunc(jnp.where(valid_f, pos.reshape(m), 0.0)), 0.0)
    t_neg = jnp.where(valid_f, jnp.trunc(jnp.where(valid_f, -neg.reshape(m), 0.0)), 0.0)
    tc_f = tc.reshape(m).astype(jnp.float32)

    s0 = win.reshape(m, wk.K_LANES)[:, 0]
    pos_scores = win.reshape(m, wk.K_LANES)[:, 1:wk.K_POS]
    neg_scores = win.reshape(m, wk.K_LANES)[:, wk.K_POS:]

    dt3_flat = dt3.reshape(-1)

    def eval_at(sign, count, sel=None):
        si = si_flat if sel is None else si_flat[sel]
        ep = endpoints if sel is None else endpoints[sel]
        lmm = lmf if sel is None else lmf[sel]
        sr = safe_rast if sel is None else safe_rast[sel]
        tr = tr_flat if sel is None else tr_flat[sel]

        def f(t0):
            return opt._window_scores(dt3_flat, (q, q), si, ep, lmm, tr,
                                      sr, t0, sign, count)
        return f

    if mode == "batch":
        chain_cov = partial(_batch_chain_cov, batch=window)
        walk = opt._batch_walk
    else:
        chain_cov = _greedy_chain_cov
        walk = opt._greedy_walk

    ones = jnp.ones(m, jnp.float32)
    w = max(window, 1)

    def ext_eval(sel, active, sign, t0):
        vdir = jnp.float32(sign) * rast_f[sel]
        if kernel_version() == 4:
            return wk.window_scores_ext_v4(
                banks, cl_flat[sel], cm_flat[sel], vdir, active,
                si_raw[sel], scene_of[sel], scene_tr, t0)
        if kernel_version() == 3:
            return wk.window_scores_ext_v3(
                banks, cl_flat[sel], cm_flat[sel], vdir, active,
                si_raw[sel], scene_of[sel], scene_tr, t0)
        return wk.window_scores_ext(
            dt3, dt3t, cl_flat[sel], cm_flat[sel], vdir, active,
            si_raw[sel], scene_of[sel], scene_tr, t0)

    # positive direction
    state = (s0, s0, jnp.zeros(m, jnp.float32), t_pos < 1, ones)
    state = chain_cov(pos_scores, t_pos, tc_f, state, 1.0)
    if not skip_straggler:
        state = _straggler(state, 1.0, t_pos, chain_cov, walk, eval_at, w, m,
                           ext_eval)
    prev, best, mul, _, _ = state

    # negative direction
    neg_prev0 = s0 if mode == "indulgent" else prev
    nstate = (neg_prev0, best, mul, t_neg < 1, ones)
    nstate = chain_cov(neg_scores, t_neg, tc_f, nstate, -1.0)
    if not skip_straggler:
        nstate = _straggler(nstate, -1.0, t_neg, chain_cov, walk, eval_at, w,
                            m, ext_eval)
    _, best, mul, _, _ = nstate

    translation = (mul[:, None] * safe_rast).reshape(s, c, 2)
    return best.reshape(s, c), translation, valid


def cap_bucket(n_items: int) -> int:
    """Grid-size bucket for the kernel item stream: next multiple of
    1/8 of the value's power-of-two magnitude (>= 4096).

    Masked tail items cost the SAME as real items in the kernel (measured
    r3 — the ``pl.when`` branch does not save vector time), so padding is
    paid in full: pure power-of-two buckets put the pose bench's 1.59M
    real items in a 2.10M grid, wasting 24% of kernel time.  The 1/8
    quantum caps padding at ~12.5% while still letting
    similar-but-unequal chunks (objects, scene groups) share compiled
    executables (VERDICT r1 #5).  r5 note: coarsening to 1/4 was tried to
    cut warmup program-loads and cost ~8% steady-state kernel time — the
    headline metric wins; warmup on a tunneled chip is load-latency-bound
    (see ROADMAP "warmup anatomy")."""
    if n_items <= 4096:
        return 4096
    mag = 1 << (int(n_items - 1).bit_length() - 1)   # largest pow2 <= n-1
    q = max(4096, mag // 8)
    return -(-n_items // q) * q


def kernel_supported(dt3_shape, mode: str, mesh=None) -> bool:
    """Whether the Pallas path applies for this dispatch."""
    import os
    flag = os.environ.get("OPENFDCM_TPU_KERNEL", "auto")
    if flag == "0":
        return False
    if len(dt3_shape) != 4 or dt3_shape[-1] != dt3_shape[-2]:
        return False
    if dt3_shape[-1] < wk.PATCH_W or dt3_shape[-1] % 128:
        return False
    if mode not in ("default", "indulgent", "batch"):
        return False
    del mesh  # scene-sharded meshes run the kernel per device
    if flag == "1":
        return True
    return jax.default_backend() == "tpu"
