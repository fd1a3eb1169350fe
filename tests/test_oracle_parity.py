"""Candidate-by-candidate parity between the device optimizer and the
f32-faithful numpy oracle of the reference algorithm (tests/oracle.py).

This is the strongest faithfulness check available without the reference
binary: every candidate's greedy-walk RESULT (score and translation) must
match the reference semantics exactly — including the L2² rotated-scene case
where score landscapes are noisy and a wrong walk would change rankings.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import openfdcm_tpu as of
import openfdcm_tpu.core.geometry as geo
from openfdcm_tpu.matching.search import establish_search_strategy
from tests import oracle
from tests.utils import create_lines, apply_transform


@pytest.mark.parametrize("distance", [of.Distance.L2, of.Distance.L2_SQUARED,
                                      of.Distance.L1])
def test_device_walks_match_reference_oracle(distance):
    _walk_parity(distance, of.DefaultOptimize(),
                 lambda *a: oracle.default_optimize(*a))


@pytest.mark.parametrize("distance", [of.Distance.L2, of.Distance.L1])
def test_device_batch_walks_match_reference_oracle(distance):
    """BatchOptimize chain decisions (batch argmin / break-before-keep /
    interior rise, ``batchoptimize.cpp:48-94``) vs the numpy oracle —
    candidate by candidate."""
    _walk_parity(distance, of.BatchOptimize(10),
                 lambda *a: oracle.batch_optimize(*a, 10))


def _walk_parity(distance, optimizer, oracle_fn):
    tmpl = np.asarray(create_lines(10, 60))
    st = np.array([[-1, 0, 60], [0, -1, 60]], np.float32)
    scene = apply_transform(tmpl, st)

    fm = of.build_featuremap(scene, of.Dt3Params(8, 5.0, 2.2, distance))
    w, h = fm.feature_size
    dt3 = np.asarray(fm.dt3)[:, :h, :w]
    angles = np.asarray(fm.angles)
    scene_tr = np.asarray(fm.scene_translation)

    matches = of.search(of.DefaultMatch(), of.DefaultSearch(4, 10),
                        optimizer, fm, [tmpl], scene)

    ta = geo.as_lines_np(tmpl)
    sa = geo.as_lines_np(scene)
    pairs = establish_search_strategy(of.DefaultSearch(4, 10), ta, sa)

    k = 0
    checked = 0
    for (tl, sl) in pairs:
        transforms = np.asarray(geo.align(jnp.asarray(ta[tl]), jnp.asarray(sa[sl])))
        for pol in range(2):
            aligned = np.asarray(geo.transform(jnp.asarray(ta),
                                               jnp.asarray(transforms[pol])))
            av = np.asarray(geo.normalize(jnp.asarray(sa[sl])))
            r = oracle_fn(dt3, angles, scene_tr, (float(w), float(h)),
                          aligned, av)
            if r is not None:
                assert np.isclose(r[0], matches[checked].score,
                                  rtol=1e-6, atol=1e-3), (k, r[0], matches[checked].score)
                checked += 1
            k += 1
    assert checked == len(matches) > 0


def test_device_evaluate_matches_oracle():
    tmpl = np.asarray(create_lines(6, 30))
    fm = of.build_featuremap(tmpl, of.Dt3Params(6, 5.0, 2.0, of.Distance.L2))
    w, h = fm.feature_size
    dt3 = np.asarray(fm.dt3)[:, :h, :w]
    translations = [np.asarray([2.0, 1.0], np.float32),
                    np.asarray([-3.0, 0.0], np.float32)]
    dev = of.evaluate(fm, [tmpl], [translations])[0]
    orc = oracle.evaluate(dt3, np.asarray(fm.angles),
                          np.asarray(fm.scene_translation), tmpl, translations)
    np.testing.assert_allclose(dev, orc, rtol=1e-6)
