"""Optimizer tests ported from reference
``tests/matching/src/optimizeStrategies/{default,batch,indulgent}optimize.test.cpp``
(the three reference suites are structurally identical)."""
import numpy as np
import pytest

import openfdcm_tpu as of
from openfdcm_tpu.matching import featuremap as fmap
from tests.utils import apply_transform

OPTIMIZERS = [
    of.DefaultOptimize(),
    of.BatchOptimize(10),
    of.IndulgentOptimize(1),
    of.DenseOptimize(),
]


@pytest.mark.parametrize("optimizer", OPTIMIZERS, ids=lambda o: type(o).__name__)
def test_perfect_optimization(optimizer):
    tmpl = np.array([[10, 0, 10, 10], [0, 0, 0, 0]], np.float32)
    scene = np.array([[15, 0, 15, 10], [5, 0, 5, 0]], np.float32)
    transf = np.array([[1, 0, 5], [0, 1, 0]], np.float32)
    fm = fmap.build_featuremap(scene, fmap.Dt3Params(4, 1.0, 1.0))
    aligned = apply_transform(tmpl, transf)
    res = of.optimize(optimizer, [aligned], [np.array([1.0, 0.0])], fm)[0]
    assert res is not None
    score, translation = res
    assert np.allclose(translation, [0, 0])
    assert score == 0


@pytest.mark.parametrize("optimizer", OPTIMIZERS, ids=lambda o: type(o).__name__)
def test_larger_template(optimizer):
    tmpl = np.array([[0, 0, 5, 0]], np.float32)
    scene = np.array([[3, 0, 6, 0], [0, 10, 7, 10]], np.float32)
    fm = fmap.build_featuremap(scene, fmap.Dt3Params(4, 1.0, 1.0))
    res = of.optimize(optimizer, [tmpl], [np.array([1.0, 0.0])], fm)[0]
    assert res is not None
    score, translation = res
    assert np.allclose(translation, [2, 0])
    assert np.isclose(score, 1.0, rtol=1e-5)


@pytest.mark.parametrize("optimizer", OPTIMIZERS, ids=lambda o: type(o).__name__)
def test_out_of_bounds(optimizer):
    tmpl = np.array([[0, 0, 10, 10]], np.float32)
    scene = np.array([[0, 0, 1, 0]], np.float32)
    fm = fmap.build_featuremap(scene, fmap.Dt3Params(4, 1.0, 1.0))
    res = of.optimize(optimizer, [tmpl], [np.array([1.0, 0.0])], fm)[0]
    assert res is None


@pytest.mark.parametrize("optimizer", OPTIMIZERS, ids=lambda o: type(o).__name__)
def test_null_align_vector(optimizer):
    tmpl = np.array([[0, 0, 1, 0]], np.float32)
    scene = np.array([[0, 0, 3, 0]], np.float32)
    fm = fmap.build_featuremap(scene, fmap.Dt3Params(4, 1.0, 2.0))
    res = of.optimize(optimizer, [tmpl], [np.array([0.0, 0.0])], fm)[0]
    assert res is None


def test_dense_not_worse_than_greedy():
    """DenseOptimize is a strict superset of the greedy walk: its score can
    only be <= the greedy score for the same candidate."""
    rng = np.random.default_rng(7)
    scene = rng.uniform(0, 30, size=(6, 4)).astype(np.float32)
    fm = fmap.build_featuremap(scene, fmap.Dt3Params(8, 1.0, 1.5))
    tmpl = rng.uniform(5, 20, size=(3, 4)).astype(np.float32)
    for align in ([1.0, 0.0], [0.0, 1.0], [0.7, 0.7]):
        g = of.optimize(of.DefaultOptimize(), [tmpl], [np.array(align)], fm)[0]
        d = of.optimize(of.DenseOptimize(), [tmpl], [np.array(align)], fm)[0]
        if g is None:
            assert d is None
        else:
            assert d is not None and d[0] <= g[0] + 1e-5


def test_greedy_matches_sequential_reference():
    """Cross-check the lockstep walk against a literal sequential port of
    DefaultOptimize (defaultoptimize.cpp:15-69)."""
    rng = np.random.default_rng(3)
    scene = rng.uniform(0, 40, size=(8, 4)).astype(np.float32)
    fm = fmap.build_featuremap(scene, fmap.Dt3Params(8, 5.0, 1.8))
    w, h = fm.feature_size

    def sequential(tmpl, align_vec):
        import jax.numpy as jnp
        from openfdcm_tpu.core import rasterize as ras
        rast = np.asarray(ras.rasterize_vector(jnp.asarray(align_vec, jnp.float32)))
        neg, pos = fmap.minmax_translation(fm, jnp.asarray(tmpl, jnp.float32),
                                           jnp.asarray(rast))
        neg, pos = float(np.asarray(neg)), float(np.asarray(pos))
        if not (np.isfinite(neg) and np.isfinite(pos)):
            return None
        def ev(t):
            return of.evaluate(fm, [tmpl], [[t]])[0][0]
        scores = [ev(np.zeros(2, np.float32))]
        muls = [0]
        for m in range(1, int(pos) + 1):
            s = ev((m * rast).astype(np.float32))
            if s > scores[-1]:
                break
            scores.append(s); muls.append(m)
        for m in range(-1, int(neg) - 1, -1):
            s = ev((m * rast).astype(np.float32))
            if s > scores[-1]:
                break
            scores.append(s); muls.append(m)
        k = int(np.argmin(scores))
        return scores[k], muls[k] * rast

    for trial in range(4):
        tmpl = rng.uniform(10, 30, size=(2, 4)).astype(np.float32)
        align = rng.normal(size=2).astype(np.float32)
        want = sequential(tmpl, align)
        got = of.optimize(of.DefaultOptimize(window=4), [tmpl], [align], fm)[0]
        if want is None:
            assert got is None
        else:
            assert got is not None
            assert np.isclose(got[0], want[0], atol=1e-4), trial
            assert np.allclose(got[1], want[1], atol=1e-4), trial
