"""QRNN pooling: associative scan vs Pallas time-blocked kernel, on the
real TPU, at PASE+ training shapes and a long-sequence inference shape.

Timing protocol per CLAUDE.md: sustained loops synced with a
jax.device_get of a scalar (block_until_ready can return early on the
axon backend); first call compiles and is excluded.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")

from pase_tpu.ops.qrnn import qrnn_pool
from pase_tpu.ops.pallas_qrnn import qrnn_pool_pallas


def timeit(fn, *args, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.time() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    shapes = [
        ("PASE+ train (3x32 streams, 2s)", (96, 200, 512)),
        ("PASE+ train batch 8", (24, 200, 512)),
        ("long inference (100s utt)", (1, 10000, 512)),
        ("long batch", (8, 4000, 512)),
    ]
    results = {}
    for name, (b, t, h) in shapes:
        y = jnp.asarray(rng.randn(b, t, 3 * h).astype(np.float32))

        scan_fwd = jax.jit(lambda y: qrnn_pool(y)[0])
        pal_fwd = jax.jit(lambda y: qrnn_pool_pallas(y)[0])

        def loss_scan(y):
            return jnp.sum(qrnn_pool(y)[0] ** 2)

        def loss_pal(y):
            return jnp.sum(qrnn_pool_pallas(y)[0] ** 2)

        scan_bwd = jax.jit(jax.grad(loss_scan))
        pal_bwd = jax.jit(jax.grad(loss_pal))

        # numerical equality first
        np.testing.assert_allclose(np.asarray(scan_fwd(y)),
                                   np.asarray(pal_fwd(y)),
                                   atol=2e-5, rtol=1e-4)
        r = {
            "scan_fwd_ms": timeit(scan_fwd, y),
            "pallas_fwd_ms": timeit(pal_fwd, y),
            "scan_fwdbwd_ms": timeit(scan_bwd, y),
            "pallas_fwdbwd_ms": timeit(pal_bwd, y),
        }
        results[name] = r
        print(f"{name:34s} [{b}x{t}x{h}] "
              f"fwd scan {r['scan_fwd_ms']:.3f} ms vs pallas "
              f"{r['pallas_fwd_ms']:.3f} ms | fwd+bwd scan "
              f"{r['scan_fwdbwd_ms']:.3f} ms vs pallas "
              f"{r['pallas_fwdbwd_ms']:.3f} ms")
    return results


if __name__ == "__main__":
    main()
