"""Bank-axis sharding: the template tensor sharded along T must reproduce
the single-device ``match_many(..., top_k=k)`` results.

Each device owns a contiguous template shard and its candidates; one
all_gather over the ``"bank"`` axis re-ranks local top-k's.  Penalized
scores are computed from identical ops on identical values, so they are
bit-equal to the unsharded path (SURVEY.md §7.3 determinism invariant).
"""
import numpy as np
import pytest

import openfdcm_tpu as of
from openfdcm_tpu.parallel import make_mesh
from openfdcm_tpu.parallel.bank import match_many_bank_sharded, \
    prepare_bank_shards
from tests.utils import create_lines, make_rotation, apply_transform


def _bank_and_scenes(n_tmpl=10, n_scenes=4):
    templates = []
    for i in range(n_tmpl):
        t = np.asarray(create_lines(4 + (i % 5), 40.0 + 10.0 * (i % 3)))
        templates.append(t)
    scenes = []
    for j in range(n_scenes):
        mat = np.concatenate([make_rotation(0.3 * j),
                              np.full((2, 1), 5.0 + j, np.float32)], axis=1)
        scenes.append(apply_transform(templates[j % n_tmpl], mat))
    return templates, scenes


def _key(matches):
    return [(round(m.score, 6), m.tmpl_idx) for m in matches]


@pytest.mark.parametrize("mesh_shape,axes", [
    ((4,), ("bank",)),
    ((2, 4), ("scene", "bank")),
])
def test_bank_sharded_matches_single_device(mesh_shape, axes):
    templates, scenes = _bank_and_scenes()
    params = of.Dt3Params(4, 5.0, 2.2, of.Distance.L2)
    searcher = of.DefaultSearch(4, 10)
    optimizer = of.BatchOptimize(10)
    penalty = of.ExponentialPenalty(1.5)
    lengths = of.get_template_lengths(templates)
    k = 5

    single = of.match_many(scenes, templates, params, searcher, optimizer,
                           penalty=penalty, template_lengths=lengths, top_k=k)
    mesh = make_mesh(shape=mesh_shape, axis_names=axes)
    banked = match_many_bank_sharded(
        scenes, templates, params, searcher, optimizer, mesh=mesh,
        top_k=k, penalty=penalty, template_lengths=lengths)

    assert len(single) == len(banked) == len(scenes)
    for s, b in zip(single, banked):
        assert len(b) == len(s)
        # The sharded program compiles separately, so FMA contraction may
        # round the last ulp differently (same caveat as test_parallel);
        # tie order may differ between the emplace-order host rank and the
        # global-candidate-index device rank.
        np.testing.assert_allclose(
            np.asarray(sorted(m.score for m in s), np.float32),
            np.asarray(sorted(m.score for m in b), np.float32),
            rtol=1e-5, atol=1e-7)
        assert sorted(_key(s)) == sorted(_key(b))


def test_bank_sharded_no_penalty_and_chunking():
    templates, scenes = _bank_and_scenes(n_tmpl=9, n_scenes=5)
    params = of.Dt3Params(4, 5.0, 2.2, of.Distance.L2)
    searcher = of.DefaultSearch(4, 10)
    optimizer = of.BatchOptimize(10)
    k = 3

    single = of.match_many(scenes, templates, params, searcher, optimizer,
                           top_k=k)
    mesh = make_mesh(shape=(2, 2), axis_names=("scene", "bank"))
    # scene_chunk=2 forces multiple dispatches (5 scenes -> 3 chunks)
    banked = match_many_bank_sharded(
        scenes, templates, params, searcher, optimizer, mesh=mesh,
        top_k=k, scene_chunk=2)
    for s, b in zip(single, banked):
        np.testing.assert_allclose(
            np.asarray(sorted(m.score for m in s), np.float32),
            np.asarray(sorted(m.score for m in b), np.float32),
            rtol=1e-5, atol=1e-7)
        assert sorted(_key(s)) == sorted(_key(b))


def test_prepare_bank_shards_padding():
    templates, _ = _bank_and_scenes(n_tmpl=10)
    sh = prepare_bank_shards(templates, 4)
    assert sh["t_shard"] == 3 and sh["lines"].shape[0] == 12
    assert sh["counts"][10] == 0 and sh["counts"][11] == 0
    # real template rows preserved
    t0 = np.asarray(templates[0], np.float32)
    np.testing.assert_array_equal(sh["lines"][0, : t0.shape[0]], t0)


def test_bank_sharded_empty_scene():
    templates, scenes = _bank_and_scenes(n_tmpl=6, n_scenes=2)
    scenes = [np.zeros((0, 4), np.float32)] + scenes
    mesh = make_mesh(shape=(4,), axis_names=("bank",))
    res = match_many_bank_sharded(
        scenes, templates, of.Dt3Params(4, 5.0, 2.2, of.Distance.L2),
        of.DefaultSearch(4, 10), of.BatchOptimize(10), mesh=mesh, top_k=3)
    assert res[0] == [] and all(len(r) > 0 for r in res[1:])


def test_bank_sharded_topk_wider_than_shard():
    # top_k exceeding one shard's local candidate width must still return
    # min(top_k, total) matches after the all_gather re-rank.
    templates, scenes = _bank_and_scenes(n_tmpl=8, n_scenes=1)
    params = of.Dt3Params(4, 5.0, 2.2, of.Distance.L2)
    k = 60
    single = of.match_many(scenes, templates, params, of.DefaultSearch(4, 10),
                           of.BatchOptimize(10), top_k=k)
    mesh = make_mesh(shape=(4,), axis_names=("bank",))
    banked = match_many_bank_sharded(
        scenes, templates, params, of.DefaultSearch(4, 10),
        of.BatchOptimize(10), mesh=mesh, top_k=k)
    assert len(banked[0]) == len(single[0])
    np.testing.assert_allclose(
        np.asarray(sorted(m.score for m in single[0]), np.float32),
        np.asarray(sorted(m.score for m in banked[0]), np.float32),
        rtol=1e-5, atol=1e-7)
