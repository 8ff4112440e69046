"""Prototype: Pallas stride-1 1-D conv (NTC) vs lax.conv at trunk shapes.

Kernel: grid over batch rows; each cell holds one x row [T+K-1, C] in
VMEM, weights resident, K static-unrolled dots accumulate [T, O] f32.
Strided layers are fed through the exact s2d reform (stride-1, fatter C)
outside the kernel.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pase_tpu.precision import set_compute_dtype
from pase_tpu.nn import conv1d

set_compute_dtype(jnp.bfloat16)
B = 96
rng = np.random.RandomState(0)


def timeit(fn, *args, n_warm=3, n_meas=25):
    for _ in range(n_warm):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32)).reshape(())))
    t0 = time.time()
    for _ in range(n_meas):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32)).reshape(())))
    return (time.time() - t0) / n_meas * 1e3


def _kernel(x_ref, w_ref, o_ref, *, k, tout):
    acc = None
    for j in range(k):
        d = jax.lax.dot_general(
            x_ref[0, j:j + tout, :], w_ref[j],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    o_ref[0] = acc.astype(o_ref.dtype)


def conv_s1_pallas(x, w, out_dtype=None):
    """VALID stride-1 conv. x [B, Tin, C] (Tin >= Tout+K-1), w [K, C, O]."""
    b, tin, c = x.shape
    k, _, o = w.shape
    tout = tin - k + 1
    out_dtype = out_dtype or x.dtype
    return pl.pallas_call(
        functools.partial(_kernel, k=k, tout=tout),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, tin, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c, o), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tout, o), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, tout, o), out_dtype),
    )(x, w.astype(x.dtype))


def conv_pallas(x, w, stride=1):
    k, cin, cout = w.shape
    b, tin, _ = x.shape
    if stride == 1:
        return conv_s1_pallas(x, w)
    tout = (tin - k) // stride + 1
    kp = -(-k // stride)
    need = (tout - 1 + kp) * stride
    if need > tin:
        x = jnp.pad(x, ((0, 0), (0, need - tin), (0, 0)))
    xs = x[:, :need].reshape(b, need // stride, stride * cin)
    wp = jnp.pad(w, ((0, kp * stride - k), (0, 0), (0, 0)))
    w2 = wp.reshape(kp, stride * cin, cout)
    return conv_s1_pallas(xs, w2)[:, :tout]


LAYERS = [
    (32000, 20, 10, 64, 64),
    (3200, 11, 2, 64, 128),
    (1600, 11, 1, 128, 128),
    (1600, 11, 2, 128, 256),
    (800, 11, 1, 256, 256),
    (800, 11, 2, 256, 512),
    (400, 11, 2, 512, 512),
]

tot_lax = tot_pal = 0.0
for (t, k, s, cin, cout) in LAYERS:
    x = jnp.asarray(rng.randn(B, t + k - 1, cin).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * .05)
    ya = conv1d(x, w, stride=s)
    yb = conv_pallas(x, w, stride=s)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) -
                                yb.astype(jnp.float32))))
    fa = timeit(jax.jit(lambda x, w: conv1d(x, w, stride=s)), x, w)
    fb = timeit(jax.jit(lambda x, w: conv_pallas(x, w, stride=s)), x, w)
    gf = B * (t // s) * k * cin * cout * 2 / 1e9
    print(f"k={k} s={s:<3d} {cin:>3d}->{cout:<4d} T={t:<6d} "
          f"lax {fa:6.2f}  pallas {fb:6.2f} ms  "
          f"(util {gf/1e3/(fb/1e3)/197*100:4.1f}%)  err={err:.1e}")
    tot_lax += fa
    tot_pal += fb
print(f"TOTAL fwd: lax {tot_lax:.2f}  pallas {tot_pal:.2f} ms")
