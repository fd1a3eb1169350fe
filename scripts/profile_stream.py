"""Isolate why the production v3 kernel runs ~157 ns/item on the real pose
stream vs ~110 ns/item on the synthetic profiler stream.

One factor varies per run of the PRODUCTION kernel: accumulator size
(c_dim), slice-switch count (sid groups / scenes), masked-tail fraction.
"""
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import openfdcm_tpu as of

of.ensure_backend()
of.enable_compilation_cache("/root/repo/.jax_cache")

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

from openfdcm_tpu.ops import window_kernel as wk  # noqa: E402


def sync(x):
    return float(jnp.sum(x.reshape(-1)[:2]))


def make(n_items, *, q=640, depth=30, c_dim=512, s_dim=1, masked_tail=0.0,
         seed=0):
    rng = np.random.default_rng(seed)
    n = -(-n_items // wk.IB) * wk.IB
    f = np.zeros((n, wk.NF3), np.float32)
    sid = np.sort(rng.integers(0, s_dim * 2 * depth, n))
    f[:, wk.G_SID] = sid
    f[:, wk.G_SLOT] = rng.integers(0, c_dim, n)
    f[:, wk.G_WT] = 1.0
    f[:, wk.G_TC] = wk.TC_MAX
    ang = rng.uniform(-0.4, 0.4, n)
    f[:, wk.G_VX] = np.sign(rng.uniform(-1, 1, n)) * 1.0
    f[:, wk.G_VY] = np.tan(ang)
    f[:, wk.G_TRM] = rng.uniform(100, q - 100, n)
    f[:, wk.G_TRN] = rng.uniform(100, q - 100, n)
    for em, en in ((wk.G_E0M, wk.G_E0N), (wk.G_E1M, wk.G_E1N)):
        f[:, em] = rng.uniform(-40, 40, n)
        f[:, en] = rng.uniform(-40, 40, n)
        f[:, em] = np.clip(f[:, em] + f[:, wk.G_TRM], 96, q - 96) - f[:, wk.G_TRM]
        f[:, en] = np.clip(f[:, en] + f[:, wk.G_TRN], 96, q - 96) - f[:, wk.G_TRN]
    if masked_tail > 0:
        k = int(n * masked_tail)
        f[-k:, wk.G_WT] = 0.0
        f[-k:, wk.G_SID] = s_dim * 2 * depth          # skip region
    dt3 = jnp.asarray(rng.uniform(0, 50, (s_dim, depth, q, q)
                                  ).astype(np.float32))
    banks = tuple(jax.block_until_ready(b) for b in wk.prep_dt3_banks(dt3))
    return banks, jnp.asarray(f)


def bench(label, banks, fields, *, c_dim, s_dim, depth=30, q=640, reps=5,
          n_real=None):
    fn = jax.jit(partial(wk.window_scores_device_v3, s_dim=s_dim,
                         c_dim=c_dim, depth=depth, q=q))
    sync(fn(banks, fields))
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(banks, fields))
        walls.append(time.perf_counter() - t0)
    med = sorted(walls)[len(walls) // 2]
    n = fields.shape[0] if n_real is None else n_real
    print(f"  {label:42s}: {med*1e3:8.2f} ms  {med/n*1e9:6.1f} ns/item "
          f"(min {min(walls)/n*1e9:.1f}, max {max(walls)/n*1e9:.1f})",
          flush=True)
    return med


def main():
    n_items = 1_572_864            # ~pose real-item count, IB multiple
    print(f"backend: {jax.default_backend()}", flush=True)

    # rtt floor
    tiny = jnp.ones((8, 128), jnp.float32)
    tf = jax.jit(lambda x: x + 1.0)
    sync(tf(tiny))
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(tf(tiny))
        rtts.append(time.perf_counter() - t0)
    print(f"rtt floor: {sorted(rtts)[2]*1e3:.2f} ms", flush=True)

    b, f = make(204800, c_dim=512, s_dim=1)
    bench("small: c512, 1 scene, 204k items", b, f, c_dim=512, s_dim=1)

    b, f = make(n_items, c_dim=512, s_dim=1)
    bench("base: c512, 1 scene (60 sids)", b, f, c_dim=512, s_dim=1)

    b, f = make(n_items, c_dim=9216, s_dim=1)
    bench("c_dim=9216, 1 scene", b, f, c_dim=9216, s_dim=1)

    b, f = make(n_items, c_dim=9216, s_dim=10)
    bench("c_dim=9216, 10 scenes (600 sids)", b, f, c_dim=9216, s_dim=10)

    b, f = make(int(n_items / 0.75), c_dim=9216, s_dim=10, masked_tail=0.25)
    bench("c9216, 10 scenes, +33% masked tail", b, f, c_dim=9216, s_dim=10,
          n_real=n_items)


if __name__ == "__main__":
    main()
