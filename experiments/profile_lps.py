"""Profile the lps/lps_long worker path on the real TPU chip.

VERDICT round-1 #6: the lps+lps_long heads cost ~26 ms of the 114 ms
step. This script decomposes that cost (target extraction vs head
fwd/bwd vs the r-framed loss) and times candidate restructurings, using
sustained loops synced with jax.device_get (axon block_until_ready can
return early).
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
from pase_tpu.ops.features import lps
from pase_tpu.losses import make_loss, contextualize_r
from pase_tpu.minions import MLPMinion

B, T, HOP = 32, 32000, 160
F = T // HOP          # 200 frames
H = 256               # encoder emb dim
D = 3075              # lps dim (1025 * 3 w/ deltas)
R = 7

set_compute_dtype(jnp.bfloat16)


def timeit(fn, *args, n_warm=3, n_meas=30):
    for _ in range(n_warm):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32)).reshape(())) )
    t0 = time.time()
    for _ in range(n_meas):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32)).reshape(())))
    return (time.time() - t0) / n_meas * 1e3


rng = np.random.RandomState(0)
wav = jnp.asarray(rng.randn(B, T).astype(np.float32))
x = jnp.asarray(rng.randn(B, F, H).astype(np.float32)).astype(jnp.bfloat16)
tgt = jnp.asarray(rng.randn(B, F, D).astype(np.float32)).astype(jnp.bfloat16)

# --- 1. target extraction ---------------------------------------------------


@jax.jit
def targets(wav):
    a = lps(wav).astype(jnp.bfloat16)
    b = lps(wav, win=512).astype(jnp.bfloat16)
    return a, b


print(f"lps+lps_long target extraction: {timeit(targets, wav):7.2f} ms")

# --- 2. head fwd + loss + bwd (the current gather-framed path) --------------

head = MLPMinion(num_outputs=D, hidden_size=256, hidden_layers=1, r=R)
params1 = head.init(jax.random.PRNGKey(0), x)
params2 = head.init(jax.random.PRNGKey(1), x)
loss_gather = make_loss("MSELoss", r=R)
loss_stream = make_loss("MSELoss", r=R, streaming=True)


def mk(lossfn):
    def f(ps, x, tgt):
        l1 = lossfn(head.apply(ps[0], x), tgt)
        l2 = lossfn(head.apply(ps[1], x), tgt)
        return l1 + l2
    return jax.jit(jax.value_and_grad(f))


print(f"2 heads fwd+bwd, gather loss:   "
      f"{timeit(mk(loss_gather), (params1, params2), x, tgt):7.2f} ms")
print(f"2 heads fwd+bwd, stream loss:   "
      f"{timeit(mk(loss_stream), (params1, params2), x, tgt):7.2f} ms")


# --- 3. fwd only / loss only decomposition ----------------------------------

@jax.jit
def fwd_only(ps, x):
    return jnp.sum(head.apply(ps[0], x).astype(jnp.float32)) + \
        jnp.sum(head.apply(ps[1], x).astype(jnp.float32))


print(f"2 heads fwd only:               {timeit(fwd_only, (params1, params2), x):7.2f} ms")

pred = head.apply(params1, x)


@jax.jit
def loss_only(pred, tgt):
    return loss_gather(pred, tgt) + loss_gather(pred, tgt)


@jax.jit
def loss_only_grad(pred, tgt):
    return jax.grad(lambda p: loss_gather(p, tgt) * 2.0)(pred)


print(f"2x gather loss fwd (pred mat.): {timeit(loss_only, pred, tgt):7.2f} ms")
print(f"2x gather loss fwd+bwd:         {timeit(loss_only_grad, pred, tgt):7.2f} ms")


# --- 4. candidate: per-offset loss without materializing framed target ------

def offset_loss(pred, tgt):
    # pred [B,T,D*R] channel order d*R+j; view [B,T,D,R]
    b, t, dr = pred.shape
    p = pred.reshape(b, t, D, R).astype(jnp.float32)
    pad = jnp.pad(tgt.astype(jnp.float32), ((0, 0), (R // 2, R // 2), (0, 0)))
    tot = 0.0
    for j in range(R):
        d = p[..., j] - pad[:, j:j + t]
        tot = tot + jnp.mean(jnp.square(d))
    return tot / R


def mk_off():
    def f(ps, x, tgt):
        l1 = offset_loss(head.apply(ps[0], x), tgt)
        l2 = offset_loss(head.apply(ps[1], x), tgt)
        return l1 + l2
    return jax.jit(jax.value_and_grad(f))


print(f"2 heads fwd+bwd, offset loss:   "
      f"{timeit(mk_off(), (params1, params2), x, tgt):7.2f} ms")


# --- 5. candidate: r-major channel order (j*D+d) => framed target is a
#        contiguous slice-concat, no transpose ------------------------------

def rmajor_loss(pred, tgt):
    b, t, dr = pred.shape
    p = pred.reshape(b, t, R, D).astype(jnp.float32)
    pad = jnp.pad(tgt.astype(jnp.float32), ((0, 0), (R // 2, R // 2), (0, 0)))
    win = jax.lax.conv_general_dilated_patches  # unused; simple slices:
    tot = 0.0
    for j in range(R):
        d = p[:, :, j] - pad[:, j:j + t]
        tot = tot + jnp.mean(jnp.square(d))
    return tot / R


def mk_rmajor():
    def f(ps, x, tgt):
        l1 = rmajor_loss(head.apply(ps[0], x), tgt)
        l2 = rmajor_loss(head.apply(ps[1], x), tgt)
        return l1 + l2
    return jax.jit(jax.value_and_grad(f))


print(f"2 heads fwd+bwd, r-major loss:  "
      f"{timeit(mk_rmajor(), (params1, params2), x, tgt):7.2f} ms")
