"""cchunk DecoderMinion cost: conv_transpose vs phase-decomposed matmuls.

Layers (B=32): [200,256] -k30 s4-> [800,512] -k30 s4-> [3200,256]
-k30 s10-> [32000,128]; ~470 GFLOP fwd.
Variants: a) lax.conv_transpose (current), b) same without the f32 cast
on the output (bf16 activation chain), c) phase decomposition — stride-s
deconv == s independent stride-1 convs (kernel ceil(k/s)) interleaved.
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

set_compute_dtype(jnp.bfloat16)
B = 32
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


def deconv_ct(x, w, s, pad):
    k = w.shape[0]
    return jax.lax.conv_transpose(
        x, w, strides=(s,), padding=[(k - 1 - pad, k - 1 - pad)],
        dimension_numbers=("NWC", "WIO", "NWC"), transpose_kernel=True)


def deconv_phase(x, w, s, pad):
    """Phase decomposition. w [K, Cout, Cin] (torch-layout per Deconv1D).

    torch ConvTranspose1d: out[o] = sum_i x[i] w[o - i*s] for
    0 <= o - i*s < K, then trim `pad` from both ends. Full (untrimmed)
    output index o = t*s + p: out[t*s+p] = sum_j x[t - j] w[p + j*s]
    => per phase p a stride-1 correlation of x with w[p::s] REVERSED in
    the tap axis (tap j multiplies x[t-j]).
    """
    k, cout, cin = w.shape
    b, tin, _ = x.shape
    kp = -(-k // s)                        # taps per phase (padded)
    full = (tin - 1) * s + k
    xp = jnp.pad(x, ((0, 0), (kp - 1, kp - 1), (0, 0)))
    outs = []
    for p in range(s):
        wp = w[p::s]                       # [kp_p, Cout, Cin]
        if wp.shape[0] < kp:
            wp = jnp.pad(wp, ((0, kp - wp.shape[0]), (0, 0), (0, 0)))
        # out_p[t] = sum_j x[t-j] wp[j] -> correlate with reversed taps
        wr = jnp.transpose(jnp.flip(wp, axis=0), (0, 2, 1))  # [kp,Cin,Cout]
        yp = jax.lax.conv_general_dilated(
            xp, wr.astype(x.dtype), window_strides=(1,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"))  # [B, tin+kp-1, Cout]
        outs.append(yp)
    y = jnp.stack(outs, axis=2).reshape(b, -1, cout)   # interleave phases
    y = y[:, :full]
    if pad:
        y = y[:, pad:-pad]
    return y


LAYERS = [  # (tin, k, s, cin, cout)
    (200, 30, 4, 256, 512),
    (800, 30, 4, 512, 256),
    (3200, 30, 10, 256, 128),
]

for (tin, k, s, cin, cout) in LAYERS:
    pad = max(0, (s - k) // -2)
    x = jnp.asarray(rng.randn(B, tin, cin).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, cout, cin).astype(np.float32) * .05)

    ya = deconv_ct(x, w.astype(jnp.bfloat16), s, pad)
    yb = deconv_phase(x, w.astype(jnp.bfloat16), s, pad)
    err = float(jnp.max(jnp.abs(ya.astype(jnp.float32) -
                                yb.astype(jnp.float32))))
    fa = timeit(jax.jit(lambda x, w: deconv_ct(x, w.astype(x.dtype), s, pad)), x, w)
    ga = timeit(jax.jit(jax.grad(lambda x, w: jnp.sum(
        deconv_ct(x, w.astype(x.dtype), s, pad).astype(jnp.float32)),
        argnums=(0, 1))), x, w)
    fb = timeit(jax.jit(lambda x, w: deconv_phase(x, w.astype(x.dtype), s, pad)), x, w)
    gb = timeit(jax.jit(jax.grad(lambda x, w: jnp.sum(
        deconv_phase(x, w.astype(x.dtype), s, pad).astype(jnp.float32)),
        argnums=(0, 1))), x, w)
    gflop = B * tin * k * cin * cout * 2 / 1e9
    print(f"k={k} s={s:<3d} {cin:>3d}->{cout:<4d} Tin={tin:<5d} "
          f"ct {fa:6.2f}/{ga:6.2f}  phase {fb:6.2f}/{gb:6.2f} ms "
          f"({gflop:5.0f} GF, err={err:.1e})")
