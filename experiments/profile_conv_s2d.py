"""Strided trunk convs as space-to-depth stride-1 lax.convs.

out[t] = sum_j x[t*s + j] w[j]  ==  stride-1 conv of the s2d-reshaped
input xs[u] = x[u*s : u*s+s] (Cin' = s*Cin) with k' = ceil(k/s) taps of
phase-combined weights (zero-padded). Exact; tests whether XLA's conv
lowering likes the fatter-channel shape better.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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


def conv_s2d(x, w, s):
    """VALID strided conv via s2d + stride-1 conv. x [B, Tin, C],
    w [k, Cin, Cout]."""
    k, cin, cout = w.shape
    b, tin, _ = x.shape
    tout = (tin - k) // s + 1
    kp = -(-k // s)
    need = (tout - 1 + kp) * s            # frames tout-1+kp-1 ... +1
    if need > tin:
        x = jnp.pad(x, ((0, 0), (0, need - tin), (0, 0)))
    xs = x[:, :need].reshape(b, need // s, s * cin)
    wp = jnp.pad(w, ((0, kp * s - k), (0, 0), (0, 0)))
    w2 = wp.reshape(kp, s * cin, cout)
    return jax.lax.conv_general_dilated(
        xs, w2.astype(xs.dtype), window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))[:, :tout]


LAYERS = [
    (32000, 20, 10, 64, 64),
    (3200, 11, 2, 64, 128),
    (1600, 11, 2, 128, 256),
    (800, 11, 2, 256, 512),
    (400, 11, 2, 512, 512),
]

for (t, k, s, cin, cout) in LAYERS:
    x = jnp.asarray(rng.randn(B, t + k - 1, cin).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * .05)
    ya = conv1d(x, w, stride=s)
    yb = conv_s2d(x, w, s)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) -
                                yb.astype(jnp.float32))))
    fa = timeit(jax.jit(lambda x, w: conv1d(x, w, stride=s)), x, w)
    ga = timeit(jax.jit(jax.grad(lambda x, w: jnp.sum(
        conv1d(x, w, stride=s).astype(jnp.float32)), argnums=(0, 1))), x, w)
    fb = timeit(jax.jit(lambda x, w: conv_s2d(x, w, s)), x, w)
    gb = timeit(jax.jit(jax.grad(lambda x, w: jnp.sum(
        conv_s2d(x, w, s).astype(jnp.float32)), argnums=(0, 1))), x, w)
    print(f"k={k} s={s:<3d} {cin:>3d}->{cout:<4d} T={t:<6d} "
          f"lax {fa:6.2f}/{ga:6.2f}  s2d {fb:6.2f}/{gb:6.2f} ms "
          f"err={err:.1e}")
