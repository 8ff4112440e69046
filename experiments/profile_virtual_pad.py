"""Measure: materialized reflect-pad + VALID conv (current FeBlock path)
vs native zero-padded conv + tiny reflect edge-fixup ("virtual pad").

HLO attribution (benchmarks/hlo_attribution_r5.json) shows the trunk's
reflect pads materialize full activation copies: blocks_1 alone moves
~786 MB fwd (pad concat) + ~787 MB bwd (pad transpose slice+add) per
step, blocks_2-7 another ~160 MB each bwd — ~3 GB of the 31 GB
fusion-boundary step traffic. A conv only *reads* its input when the
padding is the conv op's own implicit zero padding, so: run the conv
with native (l, r) zero padding — every output whose window stays
inside [0, T) is identical — then recompute the few edge outputs whose
windows cross the boundary from a small reflect-padded edge slice, and
dynamic_update_slice them in.

This script measures both variants at the two trunk shapes that matter
and checks exact agreement. Sync follows CLAUDE.md: device_get a
scalar, sustained loops.

Usage: python experiments/profile_virtual_pad.py [--iters 50]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    return jax


def timed(fn, *args, iters=50):
    import jax
    fn(*args)  # compile + warm
    jax.device_get(jax.numpy.sum(fn(*args)))
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = fn(*args)
    jax.device_get(jax.numpy.sum(acc))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    jax = setup_jax()
    import jax.numpy as jnp
    from pase_tpu.nn import conv1d
    from pase_tpu.ops.pad import pad_1d
    from pase_tpu.ops.virtual_pad import conv1d_padded

    rng = np.random.RandomState(0)
    # (name, B, T, Cin, Cout, k, stride, pad)
    cases = [
        # real PASE+ trunk shapes (strides [1,10,2,1,2,1,2,2],
        # fmaps [64,64,128,128,256,256,512,512], B=3*32 streams)
        ("block1 k20 s10", 96, 32000, 64, 64, 20, 10, (9, 10)),
        ("block2 k11 s2", 96, 3200, 64, 128, 11, 2, (4, 6)),
        ("block3 k11 s1", 96, 1600, 128, 128, 11, 1, (5, 5)),
        ("block4 k11 s2", 96, 1600, 128, 256, 11, 2, (4, 6)),
        ("block6 k11 s2", 96, 800, 256, 512, 11, 2, (4, 6)),
    ]
    for name, b, t, ci, co, k, s, pad in cases:
        x = jnp.asarray(rng.randn(b, t, ci).astype(np.float32)
                        ).astype(jnp.bfloat16)
        w = jnp.asarray((rng.randn(k, ci, co) / np.sqrt(k * ci)
                         ).astype(np.float32)).astype(jnp.bfloat16)

        def f_pad(x, w):
            return conv1d(pad_1d(x, pad, "reflect"), w, s)

        def f_virt(x, w):
            return conv1d_padded(x, w, s, pad=pad, pad_mode="reflect")

        def g_pad(x, w):
            return jnp.sum(f_pad(x, w) ** 2)

        def g_virt(x, w):
            return jnp.sum(f_virt(x, w) ** 2)

        jf_pad = jax.jit(f_pad)
        jf_virt = jax.jit(f_virt)
        jg_pad = jax.jit(jax.grad(g_pad, argnums=(0, 1)))
        jg_virt = jax.jit(jax.grad(g_virt, argnums=(0, 1)))

        ya, yb = np.asarray(jf_pad(x, w), np.float32), \
            np.asarray(jf_virt(x, w), np.float32)
        err = np.abs(ya - yb).max()
        ga, gb = jg_pad(x, w), jg_virt(x, w)
        gerr = max(np.abs(np.asarray(ga[i], np.float32)
                          - np.asarray(gb[i], np.float32)).max()
                   for i in range(2))
        t_pad = timed(jf_pad, x, w, iters=args.iters)
        t_virt = timed(jf_virt, x, w, iters=args.iters)
        tb_pad = timed(lambda x, w: jg_pad(x, w)[0], x, w,
                       iters=args.iters)
        tb_virt = timed(lambda x, w: jg_virt(x, w)[0], x, w,
                        iters=args.iters)
        print(f"{name}: fwd {t_pad:.3f} -> {t_virt:.3f} ms  "
              f"bwd {tb_pad:.3f} -> {tb_virt:.3f} ms  "
              f"max|dy|={err:.2e} max|dg|={gerr:.2e}")


if __name__ == "__main__":
    main()
