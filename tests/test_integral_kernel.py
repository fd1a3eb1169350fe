"""Bit-exactness of the Pallas sweep-scan kernel vs the XLA scan.

The kernel (``ops/integral_kernel.py``) must reproduce the reference's
sequential carry recurrence (``imgproc.h:38-84``) BIT-identically — the
line integral feeds ``evaluate``'s endpoint differences, and the CPU
goldens pin scores to 1e-4 relative, far tighter than a reassociated sum
would drift.  Runs the kernel in interpret mode on the CPU backend.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from openfdcm_tpu.core import integral
from openfdcm_tpu.ops import integral_kernel as ik


def _random_deltas(rng, g, w):
    # runs of same-sign deltas, like real angle tables
    sign = np.where(rng.random(g) < 0.5, -1, 1)
    d = rng.choice([0, 1], size=(g, w)).astype(np.int32) * sign[:, None]
    d[:, 0] = 0
    return d


@pytest.mark.parametrize("flip", [False, True])
@pytest.mark.parametrize("g", [3, 8, 11])
def test_sweep_kernel_bit_exact(flip, g):
    rng = np.random.default_rng(42 + g + flip)
    h, w = 128, 256
    imgs = rng.uniform(0.0, 50.0, (g, h, w)).astype(np.float32)
    dcol = _random_deltas(rng, g, w)

    ref = jax.vmap(lambda im, d: integral._sweep_scan(im, d, flip=flip))(
        jnp.asarray(imgs), jnp.asarray(dcol))
    got = ik.sweep_scan_tpu(jnp.asarray(imgs), jnp.asarray(dcol), flip,
                            interpret=True)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_full_stack_integral_kernel_bit_exact(monkeypatch):
    """End-to-end ``line_integral_stack`` with the kernel forced on equals
    the default scan path, padding and per-angle geometry included."""
    rng = np.random.default_rng(7)
    d, ph, pw = 6, 128, 128
    from openfdcm_tpu.matching.featuremap import make_angles
    angles = make_angles(d)
    imgs = rng.uniform(0.0, 30.0, (d, ph, pw)).astype(np.float32)
    imgs[:, 100:, :] = 0.0          # physical padding rows are zero
    imgs[:, :, 90:] = 0.0
    lhw = jnp.asarray([100, 90], jnp.int32)

    ref = integral.line_integral_stack(jnp.asarray(imgs), list(angles),
                                       logical_hw=lhw)
    monkeypatch.setenv("OPENFDCM_TPU_INTEGRAL", "1")
    jax.clear_caches()
    try:
        got = integral.line_integral_stack(jnp.asarray(imgs), list(angles),
                                           logical_hw=lhw)
    finally:
        monkeypatch.delenv("OPENFDCM_TPU_INTEGRAL")
        jax.clear_caches()
    assert np.array_equal(np.asarray(ref), np.asarray(got))
