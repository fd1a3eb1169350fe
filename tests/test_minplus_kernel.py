"""CPU (Pallas interpreter) test of the banded min-plus row-pass kernel
against the dense XLA path — must be bit-exact (same f32 ops, banding only
removes sources that provably cannot win)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openfdcm_tpu.core import dt as dtm
from openfdcm_tpu.core.types import Distance
from openfdcm_tpu.ops import minplus_kernel as mk


@pytest.fixture
def banded(monkeypatch):
    monkeypatch.setattr(mk, "INTERPRET", True)
    monkeypatch.setenv("OPENFDCM_TPU_BANDED", "1")
    yield
    dtm.dt_from_indicator.clear_cache()


def _indicator(rng, d, h, w, lines=6):
    ind = np.full((d, h, w), 3.4e38, np.float32)
    for k in range(d):
        for _ in range(lines):
            y, x = rng.integers(0, h), rng.integers(0, w)
            ln = rng.integers(3, 40)
            xs = np.clip(x + np.arange(ln), 0, w - 1)
            ys = np.clip(y + (np.arange(ln) * rng.uniform(-1, 1)).astype(int),
                         0, h - 1)
            ind[k, ys, xs] = 0.0
    return ind


@pytest.mark.parametrize("metric", [Distance.L2, Distance.L2_SQUARED])
def test_banded_rows_bit_exact(banded, metric, monkeypatch):
    rng = np.random.default_rng(3)
    ind = _indicator(rng, 4, 64, 256)
    ind[3] = 3.4e38                     # an empty slice (full-band path)
    ind_j = jnp.asarray(ind)

    monkeypatch.setenv("OPENFDCM_TPU_BANDED", "0")
    ref = np.asarray(dtm.dt_from_indicator(ind_j, metric=metric))
    dtm.dt_from_indicator.clear_cache()
    monkeypatch.setenv("OPENFDCM_TPU_BANDED", "1")
    got = np.asarray(dtm.dt_from_indicator(ind_j, metric=metric))
    assert np.array_equal(ref, got)


def test_banded_rows_sparse_slice_exact(banded, monkeypatch):
    """Sparse slices (few seed columns, huge L1 radii) must stay exact
    through the active-source compaction."""
    rng = np.random.default_rng(7)
    ind = np.full((2, 64, 512), 3.4e38, np.float32)
    ind[0, 10, 40] = 0.0                 # single far-field seed
    ind[1, 50, 500] = 0.0
    ind[1, 5, 3] = 0.0
    ind_j = jnp.asarray(ind)

    monkeypatch.setenv("OPENFDCM_TPU_BANDED", "0")
    ref = np.asarray(dtm.dt_from_indicator(ind_j, metric=Distance.L2_SQUARED))
    dtm.dt_from_indicator.clear_cache()
    monkeypatch.setenv("OPENFDCM_TPU_BANDED", "1")
    got = np.asarray(dtm.dt_from_indicator(ind_j, metric=Distance.L2_SQUARED))
    assert np.array_equal(ref, got)


def test_chunk_plan_compacts_sparse_sources():
    """A single seed column leaves exactly one active source chunk, so every
    tile scans one chunk instead of the full band (which the far-field L1
    radius would blow up to the whole row)."""
    w, n = 512, mk.RB
    g2 = np.full((n, w), np.inf, np.float32)
    g2[:, 200] = 1.0                     # one active column -> chunk 1
    l1 = np.full((n, w), 400.0, np.float32)   # far-field band: all chunks
    chunks, nch = jax.tree.map(np.asarray, mk._plan_chunks(
        jnp.asarray(g2), jnp.asarray(l1)))
    assert nch.shape == (1, w // mk.CB)
    assert np.all(nch == 1)
    assert np.all(chunks[0, :, 0] == 200 // mk.CB)

    # all-infinite rows: nothing to scan at all
    g2[:] = np.inf
    _, nch0 = jax.tree.map(np.asarray, mk._plan_chunks(
        jnp.asarray(g2), jnp.asarray(l1)))
    assert np.all(np.asarray(nch0) == 0)
