"""Multi-device sharding tests on the 8-virtual-CPU-device mesh.

The invariant (SURVEY.md §7.3): sharded runs must produce *identical* scores,
translations, and rankings to the single-device path — per-candidate work is
embarrassingly parallel and reductions stay per-candidate.
"""
import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import openfdcm_tpu as of
from openfdcm_tpu.parallel import (
    make_mesh, optimize_candidates_sharded_batch, topk_candidates,
)
from tests.utils import create_lines, make_rotation


def _setup(ratio=1.0):
    tmpl = np.asarray(create_lines(10, 100 * ratio))
    rot = make_rotation(np.pi)
    scene = np.array(of.geometry.transform(jnp.asarray(tmpl), jnp.asarray(rot)))
    scene += np.float32(3.0)
    fm = of.build_featuremap(scene, of.Dt3Params(4, 5.0, 2.2, of.Distance.L2))
    return tmpl, scene, fm


def test_sharded_search_matches_single_device():
    tmpl, scene, fm = _setup()
    mesh = make_mesh(axis_names=("cand",))
    kwargs = dict(featuremap=fm, templates=[tmpl], scene=scene)
    single = of.search(of.DefaultMatch(), of.DefaultSearch(4, 10),
                       of.BatchOptimize(10), **kwargs)
    sharded = of.search(of.DefaultMatch(), of.DefaultSearch(4, 10),
                        of.BatchOptimize(10), mesh=mesh, **kwargs)
    assert len(single) == len(sharded) > 0
    for a, b in zip(single, sharded):
        assert a.tmpl_idx == b.tmpl_idx
        assert a.score == b.score
        # The combine arithmetic compiles into different programs (sharded vs
        # not), so FMA contraction may round the last ulp differently.
        np.testing.assert_allclose(a.transform, b.transform, rtol=1e-6, atol=1e-5)


def test_sharded_2d_scene_batch():
    tmpl, scene, fm = _setup()
    mesh = make_mesh(shape=(2, 4), axis_names=("scene", "cand"))

    # Two identical scenes -> identical per-scene results.
    s_batch = 2
    c, l = 8, 10
    lines = np.tile(np.asarray(tmpl, np.float32)[None, None], (s_batch, c, 1, 1))
    mask = np.ones((s_batch, c, l), bool)
    av = np.tile(np.asarray([1.0, 0.0], np.float32)[None, None], (s_batch, c, 1))

    d, ph, pw = fm.dt3.shape
    w, h = fm.feature_size
    dt3_flat = jnp.tile(fm.dt3.reshape(1, -1), (s_batch, 1))
    tr = jnp.tile(fm.scene_translation[None], (s_batch, 1))
    fs = jnp.tile(jnp.asarray([[float(w), float(h)]], jnp.float32), (s_batch, 1))

    scores, trans, valid = optimize_candidates_sharded_batch(
        mesh, dt3_flat, fm.angles, tr, (ph, pw), fs,
        jnp.asarray(lines), jnp.asarray(mask), jnp.asarray(av),
        mode="batch", window=10, dense_steps=1)
    scores = np.asarray(scores)
    assert scores.shape == (s_batch, c)
    np.testing.assert_array_equal(scores[0], scores[1])
    np.testing.assert_array_equal(np.asarray(valid)[0], np.asarray(valid)[1])


def test_topk_deterministic_ties():
    scores = jnp.asarray([3.0, 1.0, 1.0, 2.0, 0.5, 0.5])
    valid = jnp.asarray([True, True, True, True, False, True])
    vals, idx = topk_candidates(scores, valid, 4)
    np.testing.assert_array_equal(np.asarray(idx), [5, 1, 2, 3])
    np.testing.assert_allclose(np.asarray(vals), [0.5, 1.0, 1.0, 2.0])


def test_global_topk_across_shards():
    from openfdcm_tpu.parallel import global_topk
    mesh = make_mesh(axis_names=("cand",))
    n = mesh.shape["cand"]
    c = 16 * n
    rng = np.random.default_rng(0)
    scores = rng.uniform(0, 100, c).astype(np.float32)
    valid = rng.uniform(size=c) > 0.2
    scores[5] = scores[9] = 1.5  # tie
    valid[5] = valid[9] = True
    vals, idx = global_topk(mesh, jnp.asarray(scores), jnp.asarray(valid), 8)
    vals, idx = np.asarray(vals), np.asarray(idx)
    masked = np.where(valid, scores, np.inf)
    order = np.lexsort((np.arange(c), masked))[:8]
    np.testing.assert_array_equal(idx, order)
    np.testing.assert_allclose(vals, masked[order])


@pytest.mark.skipif(os.environ.get("OPENFDCM_SLOW_TESTS") != "1",
                    reason="slow integration lane (OPENFDCM_SLOW_TESTS=1); "
                           "core behavior covered by sibling tests")
def test_cand_mesh_topk_wider_than_shard():
    """match_many on a cand-only mesh with top_k > per-shard width must
    return min(top_k, total) matches (regression: per-device kk used to
    truncate the merged result)."""
    tmpl, scene, fm = _setup()
    mesh = make_mesh(shape=(8,), axis_names=("cand",))
    k = 30
    single = of.match_many([scene], [tmpl, tmpl], of.Dt3Params(4, 5.0, 2.2),
                           of.DefaultSearch(4, 10), of.BatchOptimize(10),
                           top_k=k)
    import os
    os.environ["OPENFDCM_TPU_DEVPAIRS"] = "0"   # force the host-pair path
    try:
        meshed = of.match_many([scene], [tmpl, tmpl],
                               of.Dt3Params(4, 5.0, 2.2),
                               of.DefaultSearch(4, 10), of.BatchOptimize(10),
                               top_k=k, mesh=mesh)
    finally:
        os.environ.pop("OPENFDCM_TPU_DEVPAIRS", None)
    assert len(meshed[0]) == len(single[0]) == k
    np.testing.assert_allclose(
        sorted(m.score for m in single[0]),
        sorted(m.score for m in meshed[0]), rtol=1e-5, atol=1e-7)


def test_cand_mesh_topk_wider_than_shard_small():
    """Default-lane variant of the cand-mesh top-k width regression test
    (ADVICE r3 #1): top_k wider than one shard's contribution on a
    2-device cand mesh."""
    tmpl, scene, fm = _setup()
    mesh = make_mesh(shape=(2,), axis_names=("cand",))
    k = 24
    single = of.match_many([scene], [tmpl], of.Dt3Params(3, 5.0, 2.2),
                           of.DefaultSearch(3, 6), of.BatchOptimize(5),
                           top_k=k)
    import os
    os.environ["OPENFDCM_TPU_DEVPAIRS"] = "0"   # force the host-pair path
    try:
        meshed = of.match_many([scene], [tmpl],
                               of.Dt3Params(3, 5.0, 2.2),
                               of.DefaultSearch(3, 6), of.BatchOptimize(5),
                               top_k=k, mesh=mesh)
    finally:
        os.environ.pop("OPENFDCM_TPU_DEVPAIRS", None)
    assert len(meshed[0]) == len(single[0]) > 0
    np.testing.assert_allclose(
        sorted(m.score for m in single[0]),
        sorted(m.score for m in meshed[0]), rtol=1e-5, atol=1e-7)
