"""Spatially sharded DT3 build (parallel/spatial.py) vs the unsharded build.

SURVEY §2.4 TP row: the ``[D, H, W]`` volume sharded along H must be
*bit-equal* on the logical region to ``build_featuremap`` — every pass is
either local, an associative-min combine, or a sequential wavefront carry.
"""
import numpy as np
import pytest

from openfdcm_tpu.core.types import Distance
from openfdcm_tpu.matching.featuremap import Dt3Params, build_featuremap
from openfdcm_tpu.parallel.sharded import make_mesh
from openfdcm_tpu.parallel.spatial import build_featuremap_spatial

from tests import utils


def _scene(n=24, length=90.0, seed=3):
    rng = np.random.default_rng(seed)
    lines = utils.create_lines(n, length)
    # scatter the lines around so every sweep direction sees structure
    offs = rng.uniform(0.0, 120.0, (n, 2)).astype(np.float32)
    lines = lines + np.concatenate([offs, offs], axis=1)
    return lines


@pytest.mark.parametrize("metric", [Distance.L2, Distance.L1, Distance.L2_SQUARED])
def test_spatial_build_bit_equal(metric):
    scene = _scene()
    params = Dt3Params(depth=8, dt3_coeff=5.0, padding=2.2, distance=metric)
    mesh = make_mesh(axis_names=("rows",))
    ref = build_featuremap(scene, params, pad_to=128)
    sp = build_featuremap_spatial(scene, params, mesh=mesh, pad_to=128)

    assert sp.feature_size == ref.feature_size
    np.testing.assert_array_equal(np.asarray(sp.scene_translation),
                                  np.asarray(ref.scene_translation))
    w, h = ref.feature_size
    a = np.asarray(ref.dt3)[:, :h, :w]
    b = np.asarray(sp.dt3)[:, :h, :w]
    np.testing.assert_array_equal(a, b)


def test_spatial_build_uneven_padding():
    # physical dims must round up to lcm(pad_to, n_devices); pad_to=64 with 8
    # devices still divides, pad_to=None exercises the pure-nblk rounding
    scene = _scene(n=10, length=40.0, seed=7)
    params = Dt3Params(depth=5, distance=Distance.L2)
    mesh = make_mesh(axis_names=("rows",))
    ref = build_featuremap(scene, params, pad_to=None)
    sp = build_featuremap_spatial(scene, params, mesh=mesh, pad_to=None)
    w, h = ref.feature_size
    assert sp.dt3.shape[1] % 8 == 0
    np.testing.assert_array_equal(np.asarray(ref.dt3)[:, :h, :w],
                                  np.asarray(sp.dt3)[:, :h, :w])


def test_search_spatial_matches_single_device():
    """search_spatial on an H-sharded DT3 must equal single-device search
    (the psum probe gather sums one value + zeros — exact)."""
    import openfdcm_tpu as of
    from openfdcm_tpu.parallel.spatial import search_spatial
    tmpl = np.asarray(utils.create_lines(8, 60.0))
    rot = utils.make_rotation(np.pi / 3)
    scene = np.concatenate([tmpl[:, 0:2] @ rot.T, tmpl[:, 2:4] @ rot.T],
                           axis=1).astype(np.float32) + np.float32(4.0)
    params = Dt3Params(4, 5.0, 2.2, Distance.L2)
    mesh = make_mesh(shape=(8,), axis_names=("rows",))

    fm_dense = build_featuremap(scene, params)
    fm_spatial = build_featuremap_spatial(scene, params, mesh=mesh, pad_to=16)

    for optimizer in (of.BatchOptimize(10), of.DefaultOptimize(),
                      of.DenseOptimize()):
        single = of.search(of.DefaultMatch(), of.DefaultSearch(4, 10),
                           optimizer, fm_dense, [tmpl], scene)
        sharded = search_spatial(of.DefaultSearch(4, 10), optimizer,
                                 fm_spatial, [tmpl], scene, mesh=mesh)
        assert len(single) == len(sharded) > 0
        for a, b in zip(single, sharded):
            assert a.tmpl_idx == b.tmpl_idx
            np.testing.assert_allclose(a.score, b.score, rtol=1e-6,
                                       atol=1e-7)
            np.testing.assert_allclose(a.transform, b.transform,
                                       rtol=1e-6, atol=1e-5)
