"""Bit-equality of the Pallas orientation-propagation kernel vs the
unrolled XLA relaxation (both reproduce ``dt3cpu.cpp:77-107``)."""
import numpy as np
import jax.numpy as jnp
import pytest

from openfdcm_tpu.matching import featuremap as fm
from openfdcm_tpu.ops import prop_kernel


@pytest.mark.parametrize("depth", [4, 30])
def test_prop_kernel_bit_equal(depth):
    rng = np.random.default_rng(7)
    h, w = 32, 128
    x = rng.uniform(0.0, 50.0, size=(2, depth, h, w)).astype(np.float32)
    # sprinkle the build's F32_MAX background values
    x[0, 0, :4] = np.float32(3.4028235e38)
    steps = fm.propagation_steps(fm.make_angles(depth), 5.0)

    ref = np.asarray(fm.propagate_orientation_relax(jnp.asarray(x[0]), steps))
    out = np.asarray(prop_kernel.propagate_orientation_tpu(
        jnp.asarray(x[0]), steps, interpret=True))
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, ref)

    # leading batch dims reshape correctly
    ref_b = np.asarray(fm.propagate_orientation_relax(jnp.asarray(x), steps))
    out_b = np.asarray(prop_kernel.propagate_orientation_tpu(
        jnp.asarray(x), steps, interpret=True))
    np.testing.assert_array_equal(out_b, ref_b)


def test_supported_gate():
    assert prop_kernel.supported((30, 32, 128))
    assert not prop_kernel.supported((30, 33, 128))
    assert not prop_kernel.supported((30, 32, 130))
    assert not prop_kernel.supported((32, 128))
