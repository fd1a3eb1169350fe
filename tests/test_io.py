"""Line-file I/O tests: round-trip (reference ``serialize.test.cpp``,
``test_matching.py:111-120``) and bit-compat with the bundled assets."""
import os

import numpy as np
import pytest

import openfdcm_tpu as of
from tests.utils import create_lines

_ASSETS = "/root/reference/notebooks/assets"


def test_write_read_roundtrip(tmp_path):
    lines = create_lines(100, 10)
    p = str(tmp_path / "test_write_array.lines")
    of.write(p, lines)
    back = of.read(p)
    assert back.shape == (100, 4)
    assert np.allclose(lines, back, atol=1e-5)


def test_roundtrip_uncompressed(tmp_path):
    lines = create_lines(7, 3)
    p = str(tmp_path / "u.lines")
    of.io.write(p, lines, compress=False)
    assert np.allclose(of.read(p), lines)


def test_empty_roundtrip(tmp_path):
    p = str(tmp_path / "e.lines")
    of.write(p, np.zeros((0, 4), np.float32))
    assert of.read(p).shape == (0, 4)


@pytest.mark.skipif(not os.path.isdir(_ASSETS), reason="reference assets not mounted")
def test_read_bundled_assets():
    scene = of.read(os.path.join(_ASSETS, "obj_03/scene_0/camera_0.scene"))
    assert scene.shape == (661, 4)
    assert np.isclose(scene[0, 0], 187.61206, atol=1e-4)
    tmpl_dir = os.path.join(_ASSETS, "obj_01/templates")
    t0 = of.read(os.path.join(tmpl_dir, sorted(os.listdir(tmpl_dir))[0]))
    assert t0.shape[1] == 4 and t0.shape[0] > 0


@pytest.mark.skipif(not os.path.isdir(_ASSETS), reason="reference assets not mounted")
def test_reencode_bundled_asset_bitexact_body(tmp_path):
    """Re-encoding a bundled asset must preserve the line payload exactly."""
    src = os.path.join(_ASSETS, "obj_02/scene_3/camera_0.scene")
    lines = of.read(src)
    p = str(tmp_path / "re.scene")
    of.write(p, lines)
    again = of.read(p)
    assert np.array_equal(lines, again)
