"""Multiview 6-DOF stage: geometry primitives + end-to-end recovery.

The end-to-end test renders a planar object into two calibrated
fronto-parallel cameras, runs the real FDCM pipeline per view (one batched
``match_many`` dispatch), votes across views, and checks the triangulated
position and composed pose against ground truth.  The reference documents
this stage but ships no implementation (README.md:84-98), so these tests
pin our design, not a port.
"""
import numpy as np
import jax.numpy as jnp
import pytest

import openfdcm_tpu as of
from openfdcm_tpu import pose
from tests.utils import create_lines, make_rotation


F = 500.0           # focal; object plane at depth 500 -> image scale 1.0
Z = 500.0


def _camera(cx_world: float) -> pose.Camera:
    k = np.asarray([[F, 0, 0], [0, F, 0], [0, 0, 1]], np.float32)
    r = np.eye(3, dtype=np.float32)
    t = np.asarray([-cx_world, 0.0, Z], np.float32)    # center (cx, 0, -Z)
    return pose.Camera(k, r, t)


def _lift(lines2d: np.ndarray) -> np.ndarray:
    """Place 2D lines on the world z=0 plane as 3D segments (N, 6)."""
    n = lines2d.shape[0]
    out = np.zeros((n, 6), np.float32)
    out[:, 0:2] = lines2d[:, 0:2]
    out[:, 3:5] = lines2d[:, 2:4]
    return out


def test_project_backproject_roundtrip():
    cam = _camera(30.0)
    pts = np.asarray([[10.0, 20.0, 0.0], [-5.0, 7.0, 0.0]], np.float32)
    k, r, t = (jnp.asarray(a) for a in (cam.k, cam.r, cam.t))
    pix = pose.project_points(jnp.asarray(pts), k, r, t)
    origin, dirs = pose.backproject_rays(pix, k, r, t)
    hit = pose.intersect_plane(origin, dirs,
                               jnp.asarray([0, 0, 1, 0], jnp.float32))
    np.testing.assert_allclose(np.asarray(hit), pts, atol=1e-3)


def test_triangulate_two_rays():
    p = jnp.asarray([3.0, -2.0, 5.0])
    o = jnp.asarray([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0]])
    d = jnp.stack([p - o[0], p - o[1]])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    x = pose.triangulate(o, d[:, None, :])
    np.testing.assert_allclose(np.asarray(x)[0], np.asarray(p), atol=1e-5)


def _render_views(theta=0.4, p_gt=(60.0, 50.0), baseline=20.0):
    tmpl = np.asarray(create_lines(8, 40.0))
    rot = make_rotation(theta)
    world2d = tmpl[:, :2] @ rot.T, tmpl[:, 2:] @ rot.T
    world2d = np.concatenate(world2d, axis=1) + np.asarray(
        [p_gt[0], p_gt[1], p_gt[0], p_gt[1]], np.float32)
    lines3d = _lift(world2d)
    cams = [_camera(0.0), _camera(baseline)]
    scenes = [pose.project_lines(lines3d, c) for c in cams]
    return tmpl, cams, scenes


def test_multiview_end_to_end():
    theta, p_gt = 0.4, (60.0, 50.0)
    tmpl, cams, scenes = _render_views(theta, p_gt)
    params = of.Dt3Params(8, 5.0, 2.2, of.Distance.L2)
    matches = of.match_many(scenes, [tmpl], params, of.DefaultSearch(4, 10),
                            of.BatchOptimize(10), top_k=6)
    assert all(len(m) > 0 for m in matches)
    dets = pose.multiview_detections(matches, [tmpl], cams, k=6, eps_px=6.0)
    assert dets, "no cross-view consensus found"
    best = dets[0]
    assert best.votes == 2
    # The voted point is the template CENTROID's world position.
    centroid = (tmpl[:, 0:2] + tmpl[:, 2:4]).sum(axis=0) / (2.0 * tmpl.shape[0])
    expect = make_rotation(theta) @ centroid + np.asarray(p_gt, np.float32)
    np.testing.assert_allclose(best.point[:2], expect, atol=2.5)
    assert abs(best.point[2]) < 2.5

    p = pose.six_dof_pose(best, matches, [np.eye(3)], cams)
    # in-plane rotation recovered up to the matcher's polarity ambiguity
    ang = np.arctan2(p[1, 0], p[0, 0])
    assert min(abs(ang - theta), abs(abs(ang - theta) - np.pi)) < 0.15
    np.testing.assert_allclose(p[:3, 3][:2], expect, atol=2.5)


def test_plane_pose_single_view():
    theta, p_gt = 0.4, (60.0, 50.0)
    tmpl, cams, scenes = _render_views(theta, p_gt)
    params = of.Dt3Params(8, 5.0, 2.2, of.Distance.L2)
    matches = of.match_many([scenes[0]], [tmpl], params,
                            of.DefaultSearch(4, 10), of.BatchOptimize(10),
                            top_k=1)
    p = pose.plane_pose(matches[0][0], [tmpl], [np.eye(3)], cams[0],
                        np.asarray([0, 0, 1, 0], np.float32))
    centroid = (tmpl[:, 0:2] + tmpl[:, 2:4]).sum(axis=0) / (2.0 * tmpl.shape[0])
    expect = make_rotation(theta) @ centroid + np.asarray(p_gt, np.float32)
    np.testing.assert_allclose(p[:3, 3][:2], expect, atol=2.5)
    assert abs(p[2, 3]) < 1e-3


def test_vote_rejects_inconsistent_candidates():
    # A candidate present in only one view must not reach min_votes=2.
    tmpl, cams, scenes = _render_views()
    centers = np.zeros((2, 2, 2), np.float32)
    centers[0, 0] = (60.0, 50.0)
    centers[1, 0] = (40.0, 50.0)     # view-1 center of the same world point
    centers[0, 1] = (200.0, 200.0)   # spurious, no counterpart in view 1
    centers[1, 1] = (0.0, 0.0)
    tidx = np.asarray([[0, 0], [0, -2]], np.int32)
    valid = np.asarray([[True, True], [True, False]])
    k, r, t = pose._cam_arrays(cams)
    pts, votes, rms, pidx = pose.multiview_vote(
        jnp.asarray(centers), jnp.asarray(tidx), jnp.asarray(valid),
        k, r, t, eps_px=6.0)
    votes = np.asarray(votes)
    pts = np.asarray(pts)
    good = (np.asarray(pidx)[:, 1] == 0) & (np.asarray(pidx)[:, 3] == 0)
    assert votes[good].max() == 2
    np.testing.assert_allclose(pts[good][votes[good] == 2][0][:2],
                               (60.0, 50.0), atol=1e-2)
    bad = np.asarray(pidx)[:, 1] == 1
    assert votes[bad].max() < 2
