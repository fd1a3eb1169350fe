"""CPU tests of the Pallas window-kernel path (interpreter mode) and the
coverage-aware chain logic of :mod:`openfdcm_tpu.matching.optimize_kernel`.

The kernel itself is exercised on real TPU hardware by
``scripts/test_window_kernel_tpu.py``; here the Pallas interpreter checks
the same item/field machinery on CPU, and the chain decisions are pinned
against the uncovered-window chains of :mod:`openfdcm_tpu.matching.optimize`.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openfdcm_tpu.core import rasterize as ras
from openfdcm_tpu.matching import featuremap as fm
from openfdcm_tpu.matching import optimize as opt
from openfdcm_tpu.matching import optimize_kernel as ok
from openfdcm_tpu.ops import window_kernel as wk


# ---------------------------------------------------------------------------
# chain-with-coverage logic
# ---------------------------------------------------------------------------

def _rand_state(rng, m):
    prev = jnp.asarray(rng.uniform(5, 20, m).astype(np.float32))
    best = prev
    bmul = jnp.zeros(m, jnp.float32)
    done = jnp.asarray(rng.uniform(size=m) < 0.2)
    t0 = jnp.ones(m, jnp.float32)
    return prev, best, bmul, done, t0


def test_greedy_chain_cov_full_coverage_matches_plain():
    rng = np.random.default_rng(0)
    m, h = 64, 31
    scores = jnp.asarray(rng.uniform(0, 30, (m, h)).astype(np.float32))
    t_lim = jnp.asarray(rng.integers(0, 40, m).astype(np.float32))
    state = _rand_state(rng, m)
    tcov = jnp.full((m,), 1e9, jnp.float32)
    got = ok._greedy_chain_cov(scores, t_lim, tcov, state, 1.0)
    want = opt._greedy_chain(scores, t_lim, state, 1.0)
    # prev/best/bmul/done identical when everything is covered
    for g, w in zip(got[:4], want[:4]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_greedy_chain_cov_coverage_stop_not_done():
    # Descending scores, coverage cuts at step 3, limit far away:
    # candidate must NOT be done, resume at step 4, prev = score at step 3.
    scores = jnp.asarray([[9.0, 8.0, 7.0, 6.0, 5.0]], jnp.float32)
    t_lim = jnp.asarray([100.0])
    tcov = jnp.asarray([3.0])
    state = (jnp.asarray([10.0]), jnp.asarray([10.0]), jnp.zeros(1),
             jnp.asarray([False]), jnp.ones(1))
    prev, best, bmul, done, t_next = ok._greedy_chain_cov(
        scores, t_lim, tcov, state, 1.0)
    assert not bool(done[0])
    assert float(t_next[0]) == 4.0
    assert float(prev[0]) == 7.0
    assert float(best[0]) == 7.0 and float(bmul[0]) == 3.0


def test_greedy_chain_cov_ascent_within_coverage_is_done():
    scores = jnp.asarray([[9.0, 11.0, 1.0, 1.0, 1.0]], jnp.float32)
    t_lim = jnp.asarray([100.0])
    tcov = jnp.asarray([3.0])
    state = (jnp.asarray([10.0]), jnp.asarray([10.0]), jnp.zeros(1),
             jnp.asarray([False]), jnp.ones(1))
    prev, best, bmul, done, _ = ok._greedy_chain_cov(
        scores, t_lim, tcov, state, 1.0)
    assert bool(done[0])
    assert float(best[0]) == 9.0 and float(bmul[0]) == 1.0


def test_greedy_chain_cov_t_limit_stop_is_done():
    scores = jnp.asarray([[9.0, 8.0, 7.0, 6.0, 5.0]], jnp.float32)
    t_lim = jnp.asarray([2.0])
    tcov = jnp.asarray([100.0])
    state = (jnp.asarray([10.0]), jnp.asarray([10.0]), jnp.zeros(1),
             jnp.asarray([False]), jnp.ones(1))
    prev, best, bmul, done, _ = ok._greedy_chain_cov(
        scores, t_lim, tcov, state, 1.0)
    assert bool(done[0])
    assert float(best[0]) == 8.0 and float(bmul[0]) == 2.0


def test_batch_chain_cov_full_coverage_matches_plain():
    rng = np.random.default_rng(1)
    m, h, b = 48, 30, 10
    scores = jnp.asarray(rng.uniform(0, 30, (m, h)).astype(np.float32))
    t_lim = jnp.asarray(rng.integers(0, 40, m).astype(np.float32))
    state = _rand_state(rng, m)
    tcov = jnp.full((m,), 1e9, jnp.float32)
    got = ok._batch_chain_cov(scores, t_lim, tcov, state, 1.0, b)
    want = opt._batch_chain(scores, t_lim, state, 1.0, b)
    for g, w in zip(got[:4], want[:4]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_batch_chain_cov_freezes_uncovered_batches():
    # 2 batches of 5; coverage 7 -> only batch 1 decidable.
    scores = jnp.asarray([[9, 8, 7, 6, 5, 4, 3, 2, 1, 0.5]], jnp.float32)
    t_lim = jnp.asarray([100.0])
    tcov = jnp.asarray([7.0])
    state = (jnp.asarray([10.0]), jnp.asarray([10.0]), jnp.zeros(1),
             jnp.asarray([False]), jnp.ones(1))
    prev, best, bmul, done, t_next = ok._batch_chain_cov(
        scores, t_lim, tcov, state, 1.0, 5)
    assert not bool(done[0])
    assert float(t_next[0]) == 6.0          # resume at batch 2
    assert float(best[0]) == 5.0 and float(bmul[0]) == 5.0
    assert float(prev[0]) == 5.0


# ---------------------------------------------------------------------------
# full kernel path in the Pallas interpreter (small shapes)
# ---------------------------------------------------------------------------

@pytest.fixture
def interpret_kernel(monkeypatch):
    monkeypatch.setattr(wk, "INTERPRET", True)
    monkeypatch.setenv("OPENFDCM_TPU_KERNEL", "1")
    yield


@pytest.mark.parametrize("version", [2, 3, 4])
def test_window_scores_interpret_matches_xla(interpret_kernel, version):
    rng = np.random.default_rng(7)
    s, c, l, d, q = 2, 8, 4, 6, 256
    dt3 = jnp.asarray(rng.uniform(0, 100, (s, d, q, q)).astype(np.float32))
    scene_tr = jnp.asarray(rng.uniform(10, 30, (s, 2)).astype(np.float32))
    center = rng.uniform(q * 0.35, q * 0.65, (s, c, l, 2)).astype(np.float32)
    delta = rng.uniform(-8, 8, (s, c, l, 2)).astype(np.float32)
    cand_lines = jnp.asarray(
        np.concatenate([center - delta, center + delta], axis=-1)
        - np.concatenate([scene_tr, scene_tr], axis=-1)[:, None, None, :])
    cand_mask = jnp.asarray(rng.uniform(size=(s, c, l)) < 0.8)
    ang = rng.uniform(0, 2 * np.pi, (s, c)).astype(np.float32)
    align = jnp.asarray(np.stack([np.cos(ang), np.sin(ang)], -1))
    rast = ras.rasterize_vector(align)
    valid = jnp.asarray(rng.uniform(size=(s, c)) < 0.9)
    slice_idx = jnp.asarray(rng.integers(0, d, (s, c, l)).astype(np.int32))

    entry = {2: wk.window_scores, 3: wk.window_scores_v3,
             4: wk.window_scores_v4}[version]
    kout, tc = entry(dt3, scene_tr, cand_lines, cand_mask, rast,
                     valid, slice_idx)

    lane = jnp.arange(wk.K_LANES)
    mm = jnp.where(lane < wk.K_POS, lane, -(lane - (wk.K_POS - 1))) \
        .astype(jnp.float32)
    trans = scene_tr[:, None, None, :] + \
        mm[None, None, :, None] * rast[:, :, None, :]

    def one(dt3_s, si, ep, lm, tr):
        return fm.evaluate_batched(dt3_s.reshape(-1), (q, q), si, ep, lm, tr)
    xout = jax.vmap(one)(dt3, slice_idx,
                         cand_lines.reshape(s, c, l, 2, 2),
                         cand_mask.astype(jnp.float32), trans)

    m_abs = np.where(np.arange(wk.K_LANES) < wk.K_POS,
                     np.arange(wk.K_LANES),
                     np.arange(wk.K_LANES) - (wk.K_POS - 1))
    check = (m_abs[None, None, :] <= np.asarray(tc)[:, :, None]) \
        & np.asarray(valid)[:, :, None]
    kn, xn = np.asarray(kout), np.asarray(xout)
    rel = np.abs(kn - xn) / np.maximum(np.abs(xn), 1.0)
    assert check.sum() > 400
    assert (rel[check] < 1e-5).all(), rel[check].max()


@pytest.mark.parametrize("version", [2, 3, 4])
def test_window_scores_c_dim_not_multiple_of_8(interpret_kernel, version):
    """Regression (r3): a candidate count that is not a multiple of 8 must
    pad the kernel's accumulator c_dim — the slot write covers full
    8-sublane blocks, and an unpadded partial block is an out-of-bounds
    VMEM write that crashed the TPU runtime (the r2 bench wedge, reached
    via the genpairs straggler pass with b_ext=570)."""
    rng = np.random.default_rng(3)
    s, c, l, d, q = 1, 6, 3, 4, 256          # c = 6: partial slot block
    dt3 = jnp.asarray(rng.uniform(0, 100, (s, d, q, q)).astype(np.float32))
    scene_tr = jnp.asarray(rng.uniform(10, 30, (s, 2)).astype(np.float32))
    center = rng.uniform(q * 0.4, q * 0.6, (s, c, l, 2)).astype(np.float32)
    delta = rng.uniform(-8, 8, (s, c, l, 2)).astype(np.float32)
    cand_lines = jnp.asarray(
        np.concatenate([center - delta, center + delta], axis=-1)
        - np.concatenate([scene_tr, scene_tr], axis=-1)[:, None, None, :])
    cand_mask = jnp.ones((s, c, l), bool)
    ang = rng.uniform(0, 2 * np.pi, (s, c)).astype(np.float32)
    align = jnp.asarray(np.stack([np.cos(ang), np.sin(ang)], -1))
    rast = ras.rasterize_vector(align)
    valid = jnp.ones((s, c), bool)
    slice_idx = jnp.asarray(rng.integers(0, d, (s, c, l)).astype(np.int32))

    entry = {2: wk.window_scores, 3: wk.window_scores_v3,
             4: wk.window_scores_v4}[version]
    kout, tc = entry(dt3, scene_tr, cand_lines, cand_mask, rast,
                     valid, slice_idx)
    assert kout.shape == (s, c, wk.K_LANES)

    lane = jnp.arange(wk.K_LANES)
    mm = jnp.where(lane < wk.K_POS, lane, -(lane - (wk.K_POS - 1))) \
        .astype(jnp.float32)
    trans = scene_tr[:, None, None, :] + \
        mm[None, None, :, None] * rast[:, :, None, :]

    def one(dt3_s, si, ep, lm, tr):
        return fm.evaluate_batched(dt3_s.reshape(-1), (q, q), si, ep, lm, tr)
    xout = jax.vmap(one)(dt3, slice_idx,
                         cand_lines.reshape(s, c, l, 2, 2),
                         cand_mask.astype(jnp.float32), trans)
    m_abs = np.where(np.arange(wk.K_LANES) < wk.K_POS,
                     np.arange(wk.K_LANES),
                     np.arange(wk.K_LANES) - (wk.K_POS - 1))
    check = (m_abs[None, None, :] <= np.asarray(tc)[:, :, None])
    kn, xn = np.asarray(kout), np.asarray(xout)
    rel = np.abs(kn - xn) / np.maximum(np.abs(xn), 1.0)
    assert check.sum() > 100
    assert (rel[check] < 1e-5).all(), rel[check].max()


def test_match_many_scene_mesh_kernel(interpret_kernel):
    """Scene-sharded mesh + kernel path (per-device Pallas in shard_map,
    interpreter mode) matches the meshless XLA path."""
    import openfdcm_tpu as of
    from openfdcm_tpu.parallel import make_mesh
    from tests.utils import create_lines, make_rotation

    tmpl = create_lines(6, 110.0)
    rot = make_rotation(0.4)
    scene = (rot[:, :2] @ tmpl.reshape(-1, 2).T).T.reshape(-1, 4) + 45.0
    scenes = [scene, scene * 0.95]
    templates = [tmpl, tmpl * 0.8]
    params = of.Dt3Params(8, 5.0, 2.2, of.Distance.L2)
    mesh = make_mesh(shape=(2,), axis_names=("scene",))

    kwargs = dict(penalty=of.ExponentialPenalty(1.5), pad_to=256)
    with_mesh = of.match_many(scenes, templates, params,
                              of.DefaultSearch(3, 4), of.BatchOptimize(5),
                              mesh=mesh, **kwargs)
    import os
    os.environ["OPENFDCM_TPU_KERNEL"] = "0"
    plain = of.match_many(scenes, templates, params,
                          of.DefaultSearch(3, 4), of.BatchOptimize(5),
                          **kwargs)
    for ma, mb in zip(with_mesh, plain):
        assert len(ma) == len(mb)
        for x, y in zip(ma, mb):
            assert x.tmpl_idx == y.tmpl_idx
            assert abs(x.score - y.score) <= 1e-5 * max(abs(x.score), 1.0)
            np.testing.assert_allclose(x.transform, y.transform, atol=1e-4)


# ---------------------------------------------------------------------------
# identity-mapping deviance (v3)
# ---------------------------------------------------------------------------

def test_v3_identity_deviance_detected_and_quarantined():
    """The v3 kernel's column identity ``trunc(e+tr)+m`` can differ from the
    reference's double-rounded ``trunc(e+(tr+m))`` for rare f32 values
    (``dt3cpu.cpp:151-165`` op order).  Such items must be detected and the
    whole candidate handed to the straggler path (tc = 0, wt = 0)."""
    # Found by scan: trunc(ex + (trx+1)) == 513 but trunc(ex+trx) + 1 == 512.
    ex, trx = np.float32(478.9451599), np.float32(33.05481339)
    assert np.trunc(np.float32(ex + np.float32(trx + 1))) == 513.0
    assert np.trunc(np.float32(ex + trx)) + 1 == 512.0

    e_maj = jnp.asarray([[[[ex, ex - 3.0], [10.0, 12.0]]]])   # (1,1,2,2)
    dev = wk._identity_deviance(e_maj, jnp.asarray([[trx]]),
                                jnp.asarray([[1.0]]), jnp.asarray([[10.0]]))
    assert bool(dev[0, 0, 0]) and not bool(dev[0, 0, 1])

    # build_fields_v3 quarantines the candidate: tc == 0, every item wt == 0.
    s, c, l, q, d = 1, 1, 2, 256, 4
    cand_lines = jnp.asarray(
        [[[[ex, 40.0, ex + 5.0, 42.0],
           [30.0, 60.0, 44.0, 61.0]]]], jnp.float32)
    cand_mask = jnp.ones((s, c, l), bool)
    rast = jnp.asarray([[[1.0, 0.25]]], jnp.float32)
    valid = jnp.ones((s, c), bool)
    slice_idx = jnp.zeros((s, c, l), jnp.int32)
    scene_tr = jnp.asarray([[trx, 5.0]], jnp.float32)
    fields, tc = wk.build_fields_v3(cand_lines, cand_mask, rast, valid,
                                    slice_idx, scene_tr, depth=d, q=q)
    assert int(tc[0, 0]) == 0
    assert float(np.asarray(fields)[:, wk.G_WT].sum()) == 0.0

    # A clean candidate on the same shapes keeps its coverage.
    clean = jnp.asarray(
        [[[[100.0, 40.0, 105.0, 42.0], [30.0, 60.0, 44.0, 61.0]]]],
        jnp.float32)
    _, tc2 = wk.build_fields_v3(clean, cand_mask, rast, valid, slice_idx,
                                scene_tr, depth=d, q=q)
    assert int(tc2[0, 0]) > 0


def test_v4_forced_stragglers_512(monkeypatch):
    """VERDICT r5 #6: the straggler machinery (coverage hand-off, v4
    extension passes, tail walks) at a REAL shape — 512² canvas, depth 30 —
    with walks forced far beyond the covered window.

    The DT3 decreases monotonically along +x, so every x-major candidate's
    batch walk keeps descending to its translation limit (hundreds of
    steps: several ext passes + the lockstep tail).  Steep rays (|vy| near
    1) shrink tc to ~11, forcing the coverage hand-off immediately.  The
    kernel path (Pallas interpreter) must match the XLA dense-walk path."""
    import jax
    import jax.numpy as jnp
    from openfdcm_tpu.matching import optimize as opt
    from openfdcm_tpu.matching import optimize_kernel as ok
    from openfdcm_tpu.ops import window_kernel as wk

    monkeypatch.setattr(wk, "INTERPRET", True)
    monkeypatch.setenv("OPENFDCM_TPU_KERNEL", "1")

    depth, q = 30, 512
    rng = np.random.default_rng(11)
    # dt3: decreasing along +x => walks in +x never see an ascent
    base = (np.arange(q, dtype=np.float32)[::-1] * 3.0)[None, None, :]
    dt3 = np.broadcast_to(base, (depth, q, q)).copy()
    dt3 += rng.uniform(0, 0.5, (depth, q, q)).astype(np.float32)
    dt3 = np.cumsum(dt3, axis=2, dtype=np.float32)  # integral'd slices
    dt3 = dt3[None]                                  # (1, D, Q, Q)

    c, l = 24, 4
    p1 = rng.uniform(40, 120, (c, l, 2)).astype(np.float32)
    d = rng.uniform(-12, 12, (c, l, 2)).astype(np.float32)
    cand = np.concatenate([p1, p1 + d], axis=-1)[None]          # (1,C,L,4)
    mask = np.ones((1, c, l), bool)
    ang = np.concatenate([
        rng.uniform(-0.2, 0.2, c // 2),          # shallow: big tc
        rng.uniform(0.7, 0.78, c - c // 2),      # steep: tc ~ 11
    ]).astype(np.float32)
    align = np.stack([np.cos(ang), np.sin(ang)], axis=-1)[None]
    scene_tr = np.zeros((1, 2), np.float32)
    fs = np.asarray([[float(q), float(q)]], np.float32)

    from openfdcm_tpu.matching import featuremap as fm
    angles = jnp.asarray(fm.make_angles(depth))

    ks, kt, kv = ok.optimize_candidates_batch_kernel(
        jnp.asarray(dt3), angles, jnp.asarray(scene_tr), jnp.asarray(fs),
        jnp.asarray(cand), jnp.asarray(mask), jnp.asarray(align),
        mode="batch", window=10)
    xs, xt, xv = opt.optimize_candidates(
        jnp.asarray(dt3).reshape(-1), angles, jnp.asarray(scene_tr[0]),
        (q, q), jnp.asarray(fs[0]), jnp.asarray(cand[0]),
        jnp.asarray(mask[0]), jnp.asarray(align[0]),
        mode="batch", window=10, dense_steps=0)

    ks, kt, kv = np.asarray(ks)[0], np.asarray(kt)[0], np.asarray(kv)[0]
    xs, xt, xv = np.asarray(xs), np.asarray(xt), np.asarray(xv)
    np.testing.assert_array_equal(kv, xv)
    ok_m = kv
    # the walks must have actually left the covered window
    assert np.abs(xt[ok_m]).max() > 100, "test failed to force stragglers"
    np.testing.assert_allclose(ks[ok_m], xs[ok_m], rtol=1e-6)
    np.testing.assert_array_equal(kt[ok_m], xt[ok_m])
