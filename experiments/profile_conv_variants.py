"""Conv reformulation shootout at the PASE+ trunk shapes (bf16, B=96).

Variants per layer:
  a) lax.conv_general_dilated (current conv1d)
  b) im2col: space-to-depth by stride, gather ceil(k/s) s2d frames,
     one [M, ceil(k/s)*s*Cin] @ [., Cout] matmul (zero-padded taps)
  c) shifted-matmul sum: y = sum_j shift(x, j*s?) ... stride-1 only:
     sum_j x[:, j:j+T] @ W_j
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


def conv_im2col(x, w, stride):
    """x [B, T_in, Cin] VALID; w [k, Cin, Cout]."""
    k, cin, cout = w.shape
    b, tin, _ = x.shape
    tout = (tin - k) // stride + 1
    nf = -(-k // stride)                      # s2d frames per window
    kp = nf * stride
    # pad x so every gathered frame exists, pad w taps to kp with zeros
    need = (tout - 1) * stride + kp
    if need > tin:
        x = jnp.pad(x, ((0, 0), (0, need - tin), (0, 0)))
    nbins = need // stride + (1 if need % stride else 0)
    if nbins * stride > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, nbins * stride - x.shape[1]), (0, 0)))
    xs = x[:, :nbins * stride].reshape(b, nbins, stride * cin)
    idx = np.arange(tout)[:, None] + np.arange(nf)[None, :]   # [tout, nf]
    patches = xs[:, idx]                                      # [B,tout,nf,s*C]
    patches = patches.reshape(b, tout, nf * stride * cin)
    wp = jnp.pad(w, ((0, kp - k), (0, 0), (0, 0)))
    wm = wp.reshape(kp * cin, cout)
    return patches @ wm


def conv_shiftsum(x, w, stride):
    """stride-1 only: y = sum_j x[:, j:j+T] @ W_j."""
    k, cin, cout = w.shape
    b, tin, _ = x.shape
    tout = tin - k + 1
    y = None
    for j in range(k):
        yj = x[:, j:j + tout] @ w[j]
        y = yj if y is None else y + yj
    return y


LAYERS = [
    (32000, 20, 10, 64, 64),
    (3200, 11, 2, 64, 128),
    (1600, 11, 1, 128, 128),
    (1600, 11, 2, 128, 256),
    (800, 11, 1, 256, 256),
    (800, 11, 2, 256, 512),
    (400, 11, 2, 512, 512),
]

print(f"{'layer':<28s} {'lax':>7s} {'im2col':>7s} {'shift':>7s}   "
      f"(fwd / fwd+bwd ms)")
for (t, k, s, cin, cout) in LAYERS:
    x = jnp.asarray(rng.randn(B, t + k - 1, cin).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * .05)

    def mk(fn):
        jf = jax.jit(lambda x, w: fn(x, w, s))
        jg = jax.jit(jax.grad(
            lambda xx, ww: jnp.sum(fn(xx, ww, s).astype(jnp.float32)),
            argnums=(0, 1)))
        return timeit(jf, x, w), timeit(jg, x, w)

    # check numerics once
    ya = conv1d(x, w, stride=s)
    yb = conv_im2col(x, w, s)
    err_b = float(jnp.max(jnp.abs(ya.astype(jnp.float32) -
                                  yb.astype(jnp.float32))))
    errs = ""
    if s == 1:
        yc = conv_shiftsum(x, w, s)
        errs = f" errC={float(jnp.max(jnp.abs(ya.astype(jnp.float32) - yc.astype(jnp.float32)))):.1e}"
    fa, ba = mk(lambda x, w, s: conv1d(x, w, stride=s))
    fb, bb = mk(conv_im2col)
    if s == 1:
        fc, bc = mk(conv_shiftsum)
        cstr = f"{fc:6.2f}/{bc:6.2f}"
    else:
        cstr = "   -  "
    print(f"k={k:<3d} s={s:<2d} {cin:>3d}->{cout:<4d} T={t:<6d} "
          f"{fa:6.2f}/{ba:6.2f} {fb:6.2f}/{bb:6.2f} {cstr} "
          f"errB={err_b:.1e}{errs}")
