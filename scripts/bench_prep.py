"""Hardware micro-bench: orientation propagation (XLA vs Pallas) and the
v3 bank prep (roll / transpose) on the pose-sized DT3 stack."""
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openfdcm_tpu as of
from openfdcm_tpu.matching import featuremap as fm
from openfdcm_tpu.ops import prop_kernel


def sync(x):
    # honest sync through the relay: tiny d2h (block_until_ready returns at
    # enqueue-ack, BEFORE remote execution)
    while isinstance(x, (tuple, list)):
        x = x[0]
    return float(jnp.sum(x.reshape(-1)[:1]))


def timeit(label, f, *args, reps=5):
    out = f(*args)
    sync(out)
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        sync(out)
        walls.append(time.perf_counter() - t0)
    med = sorted(walls)[len(walls) // 2]
    print(f"  {label}: {med*1e3:8.2f} ms (min {min(walls)*1e3:.1f}, "
          f"max {max(walls)*1e3:.1f})")
    return out


def main():
    of.enable_compilation_cache("/root/repo/.jax_cache")
    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(3)
    s, d, q = 10, 30, 640
    x = jnp.asarray(rng.uniform(0, 900, size=(s, d, q, q)).astype(np.float32))
    steps = fm.propagation_steps(fm.make_angles(d), 5.0)

    def prop_xla(v):
        sl = [v[..., i, :, :] for i in range(d)]
        for c1, c2, w in steps:
            sl[c2] = jnp.minimum(sl[c2], sl[c1] + jnp.float32(w))
        return jnp.stack(sl, axis=-3)

    a = timeit("propagation XLA unrolled", jax.jit(prop_xla), x)
    b = timeit("propagation Pallas kernel",
               jax.jit(partial(prop_kernel.propagate_orientation_tpu,
                               steps=steps)), x)
    eq = bool(jnp.all(a == b))
    print(f"  bit-equal: {eq}")

    timeit("roll -64 last axis", jax.jit(lambda v: jnp.roll(v, -64, -1)), x)
    timeit("transpose last two", jax.jit(lambda v: jnp.swapaxes(v, -1, -2)), x)
    from openfdcm_tpu.ops import window_kernel as wk
    timeit("prep_dt3_banks (all four)", jax.jit(wk.prep_dt3_banks), x)


if __name__ == "__main__":
    main()
