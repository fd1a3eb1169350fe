"""Native (C++) runtime components vs the pure-Python fallbacks."""
import glob

import numpy as np
import pytest

from openfdcm_tpu.core import io
from openfdcm_tpu.matching import search as search_mod

native = pytest.importorskip("openfdcm_tpu._native")


def test_codec_matches_python_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    lines = rng.uniform(-50, 50, (37, 4)).astype(np.float32)
    # python dumps -> native loads
    blob_py = io.dumps(lines, compress=True)
    payload, n = native.loads(blob_py)
    np.testing.assert_array_equal(
        np.frombuffer(payload, "<f4").reshape(n, 4), lines)
    # native dumps -> python loads
    blob_nat = native.dumps(lines.tobytes(), True, 5, 126)
    np.testing.assert_array_equal(io.loads(blob_nat), lines)
    # uncompressed path
    payload, n = native.loads(native.dumps(lines.tobytes(), False, 0, 0))
    np.testing.assert_array_equal(
        np.frombuffer(payload, "<f4").reshape(n, 4), lines)


def test_native_reads_bundled_assets():
    paths = sorted(glob.glob(
        "/root/reference/notebooks/assets/obj_01/templates/*.tmpl"))[:5]
    if not paths:
        pytest.skip("bundled assets unavailable")
    for p in paths:
        payload, n = native.read_file(p)
        arr = np.frombuffer(payload, "<f4").reshape(n, 4)
        with open(p, "rb") as f:
            expected = io.loads(f.read())
        np.testing.assert_array_equal(arr, expected)
    batch = io.read_batch(paths, num_threads=4)
    for p, got in zip(paths, batch):
        with open(p, "rb") as f:
            np.testing.assert_array_equal(got, io.loads(f.read()))


def test_native_search_pairs_match_python(monkeypatch):
    rng = np.random.default_rng(1)
    for trial in range(20):
        nt = int(rng.integers(1, 30))
        ns = int(rng.integers(1, 60))
        tl = rng.uniform(0, 100, nt).astype(np.float32)
        sl = rng.uniform(0, 100, ns).astype(np.float32)
        # duplicate some lengths to exercise tie-breaking
        if ns > 3:
            sl[1] = sl[0]
            sl[3] = sl[2]
        ids = np.arange(ns)
        mt = int(rng.integers(1, 8))
        msc = int(rng.integers(1, 12))
        nat = search_mod._pair_by_length(tl, sl, ids, mt, msc)
        monkeypatch.setattr(search_mod, "_native", None)
        py = search_mod._pair_by_length(tl, sl, ids, mt, msc)
        monkeypatch.undo()
        np.testing.assert_array_equal(nat, py, err_msg=f"trial {trial}")
