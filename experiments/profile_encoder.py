"""Per-layer cost of the PASE+ WaveFe encoder trunk on the real chip.

Times each FeBlock (conv / conv+norm+act) at the in-step shapes
(3 concatenated streams, batch 96) under the bf16 policy, plus the QRNN,
denseskip fuse, and the whole encoder — to find where the 56 ms
(fwd+bwd) actually goes. Also times candidate conv reformulations.
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


LAYERS = [  # (T_in, k, s, cin, cout)
    (32000, 20, 10, 64, 64),
    (3200, 11, 2, 64, 128),
    (1600, 11, 1, 128, 128),
    (1600, 11, 2, 128, 256),
    (800, 11, 1, 256, 256),
    (800, 11, 2, 256, 512),
    (400, 11, 2, 512, 512),
]

print(f"{'layer':<26s} {'conv fwd':>9s} {'fwd+bwd':>9s} {'GF':>7s} "
      f"{'util%':>6s}")
tot_f, tot_b = 0.0, 0.0
for (t, k, s, cin, cout) in LAYERS:
    x = jnp.asarray(rng.randn(B, t + k - 1, cin).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.randn(k, cin, cout).astype(np.float32) * .05)

    def f(x, w):
        return conv1d(x, w, stride=s)

    def g(x, w):
        return jnp.sum(conv1d(x, w, stride=s).astype(jnp.float32))

    jf = jax.jit(f)
    jg = jax.jit(jax.grad(g, argnums=(0, 1)))
    tf_ = timeit(jf, x, w)
    tb_ = timeit(jg, x, w)
    tout = t // s
    gf = B * tout * k * cin * cout * 2 / 1e9
    util = gf / 1e3 / (tf_ / 1e3) / 197 * 100 * 10  # bf16 peak ~197 TF
    print(f"k={k:<3d} s={s:<2d} {cin:>3d}->{cout:<4d} T={t:<6d} "
          f"{tf_:9.2f} {tb_:9.2f} {gf:7.1f} {gf/1e3/(tf_/1e3)/197*100:6.1f}")
    tot_f += tf_
    tot_b += tb_
print(f"{'sum of conv layers':<26s} {tot_f:9.2f} {tot_b:9.2f}")

# whole encoder via the model
import json
from pase_tpu.frontend import build_frontend_module
fe_cfg = json.load(open(os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "cfg/frontend/PASE+.cfg")))
mod = build_frontend_module(fe_cfg)
wav = jnp.asarray(rng.randn(B, 32000).astype(np.float32))
variables = mod.init({"params": jax.random.PRNGKey(0)}, wav, train=False)


def enc_fwd(v, wav):
    y, _ = mod.apply(v, wav, train=True, mutable=["batch_stats"])
    return y


def enc_loss(params, wav):
    y, _ = mod.apply({"params": params,
                      "batch_stats": variables.get("batch_stats", {})},
                     wav, train=True, mutable=["batch_stats"])
    return jnp.sum(y.astype(jnp.float32))


ef = jax.jit(enc_fwd)
eg = jax.jit(jax.grad(enc_loss))
print(f"{'WaveFe fwd':<26s} {timeit(ef, variables, wav):9.2f}")
print(f"{'WaveFe fwd+bwd':<26s} "
      f"{timeit(eg, variables['params'], wav):9.2f}")

# sinc layer alone (s2d path inside SincConv)
from pase_tpu.frontend import WaveFe  # noqa
from pase_tpu.nn import SincConv
sc = SincConv(64, 251)
sv = sc.init(jax.random.PRNGKey(0), jnp.zeros((2, 32000, 1)))
xs = wav[..., None]
sf = jax.jit(lambda v, x: sc.apply(v, x))
sg = jax.jit(jax.grad(lambda p, x: jnp.sum(
    sc.apply({"params": p}, x).astype(jnp.float32))))
print(f"{'sinc k=251 fwd':<26s} {timeit(sf, sv, xs):9.2f}")
print(f"{'sinc k=251 fwd+bwd':<26s} {timeit(sg, sv['params'], xs):9.2f}")
