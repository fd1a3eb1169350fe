"""Search strategy tests ported from reference
``tests/matching/src/searchstrategy.test.cpp``."""
import numpy as np

import openfdcm_tpu as of
from openfdcm_tpu.matching.search import get_centered_range, filter_in_range


def _combos_set(arr):
    return {(int(a), int(b)) for a, b in arr}


def test_default_search_pinned():
    scene = np.array([[0, 0, 1, 0], [0, 0, 2, 0], [0, 0, 3, 0],
                      [0, 0, 6, 0], [0, 0, 5, 0]], np.float32)
    tmpl = np.array([[0, 0, 2, 0], [0, 0, 3, 0], [0, 0, 1, 0],
                     [0, 0, 8, 0]], np.float32)
    combos = of.establish_search_strategy(of.DefaultSearch(2, 2), tmpl, scene)
    expected = {(3, 3), (3, 4), (1, 2), (1, 4)}
    assert _combos_set(combos) <= expected
    assert len(combos) == 4


def test_get_centered_range():
    assert get_centered_range(30, 60, 60) == (0, 60)
    assert get_centered_range(3, 6, 10) == (0, 6)
    assert get_centered_range(0, 6, 2) == (0, 2)
    assert get_centered_range(5, 6, 2) == (4, 6)


def test_filter_in_range():
    tmpl = np.array([
        [0, 0, 5, 5], [2, 2, 4, 4], [0, 0, 5, 0], [0, 0, 0, 5],
        [0, 0, 2, 2], [3, 3, 4, 4], [4, 0, 5, 5],
    ], np.float32)
    idx = filter_in_range(tmpl, (2.5, 2.5), 0.0, 2.0)
    assert list(idx) == [0, 1, 5]


def test_concentric_empty_cases():
    tmpl = np.array([[0, 0, 2, 0], [0, 0, 3, 0], [0, 0, 1, 0], [0, 0, 8, 0]], np.float32)
    strat = of.ConcentricRangeStrategy(2, 2, (0, 0), 5, 15)
    assert len(of.establish_search_strategy(strat, tmpl, np.zeros((0, 4), np.float32))) == 0
    assert len(of.establish_search_strategy(strat, np.zeros((0, 4), np.float32), tmpl)) == 0


def test_concentric_zero_centered():
    scene = np.array([[0, 0, 1, 0], [0, 0, 13, 0], [0, 0, 30, 0],
                      [0, 0, 20, 0], [0, 0, 5, 0]], np.float32)
    tmpl = np.array([[0, 0, 2, 0], [0, 0, 3, 0], [0, 0, 1, 0], [0, 0, 8, 0]], np.float32)
    strat = of.ConcentricRangeStrategy(2, 2, (0, 0), 5, 15)
    combos = of.establish_search_strategy(strat, tmpl, scene)
    expected = {(3, 1), (3, 3), (1, 1), (1, 3)}
    assert _combos_set(combos) <= expected
    assert len(combos) == 4


def test_concentric_offset_center():
    scene = np.array([[0, 0, 2, 0], [2, 0, 4, 0], [4, 0, 7, 0], [7, 0, 15, 0]], np.float32)
    tmpl = np.array([[0, 0, 2, 0]], np.float32)
    cases = [
        ((4, 0), 0, 2, (0, 1)),
        ((4, 0), 3, 15, (0, 3)),
        ((4, 0), 3, np.inf, (0, 3)),
        ((4, 0), 2, 4, (0, 0)),
    ]
    for center, lo, hi, expect in cases:
        strat = of.ConcentricRangeStrategy(1, 1, center, lo, hi)
        combos = of.establish_search_strategy(strat, tmpl, scene)
        assert (int(combos[0][0]), int(combos[0][1])) == expect, (center, lo, hi)


def test_concentric_range_end_to_end():
    """Annulus-restricted search through the full pipeline (reference
    ConcentricRangeStrategy, concentricrange.cpp:29-60)."""
    import openfdcm_tpu as of
    from tests.utils import create_lines

    tmpl = np.asarray(create_lines(8, 40))
    scene = tmpl + np.float32(5.0)
    fm = of.build_featuremap(scene, of.Dt3Params(4, 5.0, 2.0))
    center = tuple(np.asarray(scene).reshape(-1, 2).mean(axis=0))
    annulus = of.ConcentricRangeStrategy(3, 5, center, 0.0, 1000.0)
    m_all = of.search(of.DefaultMatch(), annulus, of.DefaultOptimize(),
                      fm, [tmpl], scene)
    assert len(m_all) > 0
    # A zero-width annulus excludes every scene line -> no candidates.
    empty = of.ConcentricRangeStrategy(3, 5, (1e6, 1e6), 0.0, 1.0)
    assert of.search(of.DefaultMatch(), empty, of.DefaultOptimize(),
                     fm, [tmpl], scene) == []
