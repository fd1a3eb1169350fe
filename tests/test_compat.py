"""Port of the reference Python integration test
(``/root/reference/tests/python/test_matching.py``) run against the drop-in
``openfdcm`` shim: synthetic rotation/translation recovery through the
reference-shaped API, over all three distance types, plus the write/read
round-trip.
"""
import os

import numpy as np
import pytest

import openfdcm


def make_rotation(line_angle):
    sin = np.sin(line_angle)
    cos = np.cos(line_angle)
    return np.array([[cos, -sin], [sin, cos]])


def create_lines(line_number, length):
    line_array = np.zeros((4, line_number))
    for i, line_angle in enumerate(
            np.logspace(np.log10(2 * np.pi), np.log10(4 * np.pi), line_number)):
        rotation_matrix = make_rotation(line_angle)
        endpoint = np.matmul(rotation_matrix, np.array([length, 0]))
        line_array[:, i] = np.array([0, 0, endpoint[0], endpoint[1]])
    return line_array


def all_close(a, b, atol=1e-5):
    return np.allclose(a, b, atol=atol)


def apply_transform(lines, transform):
    return (np.matmul(transform[:2, :2], lines.reshape(2, -1))
            + transform[:2, 2:3]).reshape(4, -1)


@pytest.mark.parametrize("scene_ratio", [1.0, 0.3])
@pytest.mark.parametrize("num_threads", [4])
def test_matching(scene_ratio, num_threads):
    max_tmpl_lines, max_scene_lines = 4, 10
    coeff = 5.0
    depth = 30

    threadpool = openfdcm.ThreadPool(num_threads)
    search_strategy = openfdcm.DefaultSearch(max_tmpl_lines, max_scene_lines)
    optimizer_strategy = openfdcm.DefaultOptimize(threadpool)
    matcher = openfdcm.DefaultMatch()
    penalizer = openfdcm.ExponentialPenalty(1.5)
    number_of_lines = 10
    line_length = 100
    tmpl = create_lines(number_of_lines, line_length)

    scene_transform = np.array([[-1, 0, line_length], [0, -1, line_length]])
    scene = apply_transform(tmpl, scene_transform)

    # NOTE: the reference test reassigns `scene`/`scene_transform` INSIDE the
    # distance loop (tests/python/test_matching.py:79-80), so only the first
    # iteration (L2) exercises the rotated scene — later iterations see the
    # identity scene.  Reproduced faithfully: the greedy walk on an L2²
    # landscape legitimately ranks a different candidate first for the
    # rotated scene (verified against an f32-faithful oracle of the
    # reference algorithm in tests/oracle.py).
    for distance in [openfdcm.distance.L2, openfdcm.distance.L1,
                     openfdcm.distance.L2_SQUARED]:
        featuremap_params = openfdcm.Dt3CpuParameters(
            depth=depth, dt3Coeff=coeff, padding=2.2, distance=distance)
        featuremap = openfdcm.build_cpu_featuremap(scene, featuremap_params, threadpool)
        raw_matches = openfdcm.search(matcher, search_strategy,
                                      optimizer_strategy, featuremap, [tmpl], scene)
        sorted_matches = openfdcm.sort_matches(raw_matches)

        best_match_transform = sorted_matches[0].transform
        assert len(sorted_matches) == (min(max_tmpl_lines, number_of_lines)
                                       * min(number_of_lines, max_scene_lines) * 2)
        assert all_close(scene_transform[:2, :2], best_match_transform[:2, :2])
        assert all_close(scene_transform[:2, 2], best_match_transform[:2, 2],
                         1e0 * 1 / scene_ratio)

        scene_transform = np.array([[1, 0, 0], [0, 1, 0]])
        scene = apply_transform(tmpl, scene_transform)
        featuremap = openfdcm.build_cpu_featuremap(scene, featuremap_params, threadpool)
        raw_matches = openfdcm.search(matcher, search_strategy,
                                      optimizer_strategy, featuremap, [tmpl], scene)
        penalized = openfdcm.penalize(penalizer, raw_matches,
                                      openfdcm.get_template_lengths([tmpl]))
        sorted_matches = openfdcm.sort_matches(penalized)

        assert len(raw_matches) == max_tmpl_lines * max_scene_lines * 2
        assert all_close(scene_transform[:2, :2], sorted_matches[0].transform[:2, :2])
        assert all_close(scene_transform[:2, 2], sorted_matches[0].transform[:2, 2],
                         1e0 * 1 / scene_ratio)

        empty_scene = np.zeros((4, 0))
        featuremap = openfdcm.build_cpu_featuremap(empty_scene, featuremap_params, threadpool)
        matches = openfdcm.search(matcher, search_strategy, optimizer_strategy,
                                  featuremap, [tmpl], empty_scene)
        assert len(matches) == 0

        featuremap = openfdcm.build_cpu_featuremap(tmpl, featuremap_params, threadpool)
        matches = openfdcm.search(matcher, search_strategy, optimizer_strategy,
                                  featuremap, [], tmpl)
        assert len(matches) == 0

        matches = openfdcm.search(matcher, search_strategy, optimizer_strategy,
                                  featuremap, [np.zeros((4, 0))], tmpl)
        assert len(matches) == 0


def test_write_read(tmp_path):
    lines = create_lines(100, 10)
    filepath = str(tmp_path / "test_write_array.lines")
    openfdcm.write(filepath, lines)
    read_lines = openfdcm.read(filepath)
    os.remove(filepath)
    assert read_lines.shape == lines.shape  # reference 4xN layout
    assert all_close(lines, read_lines)


def test_strategy_wrappers_and_introspection():
    pool = openfdcm.ThreadPool(4)
    assert pool.get_thread_count() == 4
    assert pool.get_tasks_total() == 0
    opt = openfdcm.BatchOptimize(10, pool)
    assert opt.get_batch_size() == 10
    assert opt.get_pool() is pool
    ind = openfdcm.IndulgentOptimize(2)
    assert ind.get_number_of_passthroughs() == 2
    s = openfdcm.DefaultSearch(4, 10)
    assert s.get_max_tmpl_lines() == 4 and s.get_max_scene_lines() == 10
    c = openfdcm.ConcentricRangeStrategy(4, 10, (5.0, 5.0), 0.0, 10.0)
    assert c.get_low_radius_boundary() == 0.0
    # Erased wrappers accept concretes like the reference's implicit casts.
    assert openfdcm.OptimizeStrategy(opt)._concrete is opt
    assert openfdcm.MatchStrategy(openfdcm.DefaultMatch()) is not None
    p = openfdcm.Dt3CpuParameters(30, 5.0, 2.2, openfdcm.distance.L2)
    assert p.depth == 30 and p.dt3_coeff == 5.0


def test_featuremap_introspection():
    tmpl = create_lines(5, 20)
    fm = openfdcm.build_cpu_featuremap(tmpl, openfdcm.Dt3CpuParameters(4))
    w, h = fm.get_feature_size()
    assert w > 0 and h > 0
    m = fm.get_dt3_map()
    assert len(m) == 4
    for angle, img in m.items():
        assert img.shape == (h, w)
    assert openfdcm.FeatureMap(fm) is not None
