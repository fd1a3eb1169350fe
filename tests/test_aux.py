"""Auxiliary subsystems: featuremap persistence, profiling stages, errors."""
import numpy as np

import openfdcm_tpu as of
from tests.utils import create_lines


def test_featuremap_save_load_roundtrip(tmp_path):
    tmpl = np.asarray(create_lines(6, 30))
    fm = of.build_featuremap(tmpl, of.Dt3Params(4, 5.0, 2.0, of.Distance.L1))
    path = str(tmp_path / "fm.npz")
    of.save_featuremap(path, fm)
    fm2 = of.load_featuremap(path)
    np.testing.assert_array_equal(np.asarray(fm.dt3), np.asarray(fm2.dt3))
    np.testing.assert_array_equal(np.asarray(fm.angles), np.asarray(fm2.angles))
    assert fm.feature_size == fm2.feature_size
    assert fm2.params == fm.params
    # The loaded map scores identically.
    tr = [np.zeros(2, np.float32)]
    a = of.evaluate(fm, [tmpl], [tr])
    b = of.evaluate(fm2, [tmpl], [tr])
    assert a == b


def test_profiling_stages():
    of.profiling.reset()
    with of.profiling.stage("unit-test-stage"):
        _ = np.arange(10).sum()
    rep = of.profiling.report()
    assert "unit-test-stage" in rep
    total, count = rep["unit-test-stage"]
    assert count == 1 and total >= 0.0
    of.profiling.reset()
    assert of.profiling.report() == {}


def test_error_types():
    assert issubclass(of.PointOutOfBound, of.OpenFDCMError)
    assert issubclass(of.ImgProcError, of.OpenFDCMError)
