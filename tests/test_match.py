"""End-to-end matching tests ported from reference
``tests/matching/src/matchstrategy.test.cpp`` and
``tests/python/test_matching.py``."""
import numpy as np
import pytest

import openfdcm_tpu as of
from tests.utils import create_lines, apply_transform


def _run_recovery(scene_ratio, optimizer, distance=of.Distance.L2,
                  number_of_lines=10, line_length=10,
                  max_tmpl_lines=3, max_scene_lines=3):
    searcher = of.DefaultSearch(max_tmpl_lines, max_scene_lines)
    matcher = of.DefaultMatch()
    tmpl = create_lines(number_of_lines, line_length)

    # rotation by pi about (L/2, L/2)
    scene_transform = np.array([[-1, 0, line_length], [0, -1, line_length]], np.float32)
    scene = apply_transform(tmpl, scene_transform)
    fm = of.build_featuremap(scene, of.Dt3Params(30, 5.0, 2.2, distance))
    matches = of.search(matcher, searcher, optimizer, fm, [tmpl], scene)
    matches = of.sort_matches(matches)

    expect_count = min(max_tmpl_lines, number_of_lines) * min(number_of_lines, max_scene_lines) * 2
    assert len(matches) == expect_count
    best = matches[0]
    assert best.tmpl_idx == 0
    assert np.allclose(best.transform[:2, :2], scene_transform[:2, :2], atol=1e-5)
    assert np.allclose(best.transform[:2, 2], scene_transform[:2, 2],
                       atol=1.0 / scene_ratio)

    # identity
    scene = tmpl.copy()
    fm = of.build_featuremap(scene, of.Dt3Params(30, 5.0, 2.2, distance))
    matches = of.sort_matches(of.search(matcher, searcher, optimizer, fm, [tmpl], scene))
    assert len(matches) == expect_count
    best = matches[0]
    assert np.allclose(best.transform[:2, :2], np.eye(2), atol=1e-5)
    # + 1e-5: the recovered translation is mul * rast with f32 rounding, so
    # a walk that stops exactly at the 1-pixel bound can overshoot it by
    # ulps (r5: the cross-backend numerics hardening shifted a near-tie
    # winner to a candidate at 1.0000005 px; the reference's own bound is
    # the same geometric 1/scene_ratio, matchstrategy.test.cpp:63-64)
    assert np.allclose(best.transform[:2, 2], [0, 0],
                       atol=1.0 / scene_ratio + 1e-5)


@pytest.mark.parametrize("optimizer", [
    of.DefaultOptimize(), of.BatchOptimize(10), of.DenseOptimize(),
], ids=lambda o: type(o).__name__)
def test_rotation_translation_recovery(optimizer):
    _run_recovery(1.0, optimizer)


@pytest.mark.parametrize("distance", [of.Distance.L1, of.Distance.L2_SQUARED])
def test_recovery_other_metrics(distance):
    _run_recovery(1.0, of.DefaultOptimize(), distance=distance)


def test_empty_scene():
    tmpl = create_lines(10, 10)
    fm = of.build_featuremap(np.zeros((0, 4), np.float32), of.Dt3Params())
    matches = of.search(of.DefaultMatch(), of.DefaultSearch(3, 3),
                        of.DefaultOptimize(), fm, [tmpl], np.zeros((0, 4), np.float32))
    assert matches == []


def test_empty_templates():
    tmpl = create_lines(10, 10)
    fm = of.build_featuremap(tmpl, of.Dt3Params())
    assert of.search(of.DefaultMatch(), of.DefaultSearch(3, 3),
                     of.DefaultOptimize(), fm, [], tmpl) == []
    assert of.search(of.DefaultMatch(), of.DefaultSearch(3, 3),
                     of.DefaultOptimize(), fm, [np.zeros((0, 4), np.float32)], tmpl) == []


def test_penalize_and_sort():
    tmpl = create_lines(10, 10)
    fm = of.build_featuremap(tmpl, of.Dt3Params(30, 5.0, 2.2))
    matches = of.search(of.DefaultMatch(), of.DefaultSearch(4, 10),
                        of.DefaultOptimize(), fm, [tmpl], tmpl)
    assert len(matches) == 4 * 10 * 2
    lengths = of.get_template_lengths([tmpl])
    pen = of.penalize(of.ExponentialPenalty(tau=1.5), matches, lengths)
    assert len(pen) == len(matches)
    factor = max(lengths[0], 1e-6) ** 1.5
    for a, b in zip(matches, pen):
        assert np.isclose(b.score, a.score / factor, rtol=1e-5)
    s = of.sort_matches(pen)
    assert all(s[i].score <= s[i + 1].score for i in range(len(s) - 1))


def test_penalize_inconsistent_lengths_raises():
    m = [of.Match(5, 1.0, np.zeros((2, 3), np.float32))]
    with pytest.raises(IndexError):
        of.penalize(of.DefaultPenalty(), m, [1.0])


def test_default_penalty_formula():
    m = [of.Match(0, 6.0, np.zeros((2, 3), np.float32)),
         of.Match(1, 6.0, np.zeros((2, 3), np.float32))]
    out = of.penalize(of.DefaultPenalty(), m, [2.0, 0.0])
    assert np.isclose(out[0].score, 3.0)
    assert np.isclose(out[1].score, 6.0 / 1e-6)
