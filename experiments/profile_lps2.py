"""Round 2 of the lps-head loss profiling: candidate restructurings.

A. r-major single-gather loss: frame target once into [B,T,r,D] (one
   gather, no transpose) and view pred as [B,T,R,D].
B. bf16 subtraction (cast to f32 only at the square/accumulate).
C. expansion loss: ||p - T_f||^2 = ||p||^2 - 2<p,T_f> + ||T_f||^2 where
   p = X@W+b is NEVER materialized: ||p||^2 via the [H,H] Gram of X and
   the Sum_j W_j W_j^T Gram of W; <p,T_f> via 7 shifted [H,D] matmuls
   (output [B,T,D] only); ||T_f||^2 via per-frame window counts.
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
from pase_tpu.losses import make_loss
from pase_tpu.minions import MLPMinion

B, T, HOP = 32, 32000, 160
F, H, D, R = 200, 256, 3075, 7

set_compute_dtype(jnp.bfloat16)


def timeit(fn, *args, n_warm=3, n_meas=30):
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


rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, F, H).astype(np.float32)).astype(jnp.bfloat16)
tgt = jnp.asarray(rng.randn(B, F, D).astype(np.float32)).astype(jnp.bfloat16)

head = MLPMinion(num_outputs=D, hidden_size=256, hidden_layers=1, r=R)
params1 = head.init(jax.random.PRNGKey(0), x)
params2 = head.init(jax.random.PRNGKey(1), x)
loss_gather = make_loss("MSELoss", r=R)

IDX = np.arange(F)[:, None] + np.arange(R)[None, :]     # [T, r]
PAD = R // 2


def frame_rmajor(tgt):
    pad = jnp.pad(tgt, ((0, 0), (PAD, PAD), (0, 0)))
    return pad[:, IDX]                                   # [B, T, r, D]


def loss_rmajor_bf16(pred, tgt):
    b, t, dr = pred.shape
    p = pred.reshape(b, t, R, D)
    tf = frame_rmajor(tgt)
    d = (p - tf).astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def loss_dmajor_bf16(pred, tgt):
    """Current channel order (d-major) but subtract in bf16."""
    b, t, dr = pred.shape
    pad = jnp.pad(tgt, ((0, 0), (PAD, PAD), (0, 0)))
    tf = pad[:, IDX]                                     # [B,T,r,D]
    tf = jnp.transpose(tf, (0, 1, 3, 2)).reshape(b, t, dr)
    d = (pred - tf).astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def mk2(lossfn):
    def f(ps, x, tgt):
        return lossfn(head.apply(ps[0], x), tgt) + \
            lossfn(head.apply(ps[1], x), tgt)
    return jax.jit(jax.value_and_grad(f))


print(f"A r-major bf16-sub gather loss: "
      f"{timeit(mk2(loss_rmajor_bf16), (params1, params2), x, tgt):7.2f} ms")
print(f"B d-major bf16-sub gather loss: "
      f"{timeit(mk2(loss_dmajor_bf16), (params1, params2), x, tgt):7.2f} ms")


# --- C. expansion loss ------------------------------------------------------

# per-frame window counts: target frame tau participates in windows
# (t, j) with t + j - PAD == tau, t in [0,F), j in [0,R) => count in [4..7]
cnt = np.zeros(F, np.float32)
for j in range(R):
    # window t covers tau = t + j - PAD, t in [0,F) -> tau in [j-PAD, F+j-PAD)
    lo, hi = max(0, j - PAD), min(F, F + j - PAD)
    cnt[lo:hi] += 1.0
CNT = jnp.asarray(cnt)[None, :, None]
N_ELEMS = float(B * F * D * R)


def loss_expansion(wkern, bias, x, tgt, cd=jnp.bfloat16):
    """wkern [H, D*R] d-major; x [B,T,H] bf16; tgt [B,T,D] bf16."""
    w = wkern.reshape(H, D, R)
    xf = x.astype(cd)
    # ||p||^2: Gram of x over (B,T) and of W over D, both f32-accumulated
    g = jnp.einsum("bth,btk->hk", xf, xf)                       # [H,H] f32
    wg = jnp.einsum("hdj,kdj->hk", w.astype(cd), w.astype(cd))  # [H,H]
    p2 = jnp.sum(g.astype(jnp.float32) * wg.astype(jnp.float32))
    # bias cross/2: 2 * sum_bt (x@W)·b + N_bt * ||b||^2 over windows
    bsum = bias.reshape(D, R)
    xsum = jnp.sum(xf.astype(jnp.float32), axis=(0, 1))         # [H]
    xwb = jnp.dot(jnp.dot(xsum, wkern.astype(jnp.float32)),
                  bias.astype(jnp.float32))
    p2 = p2 + 2.0 * xwb + B * F * jnp.sum(jnp.square(bias))
    # cross <p, T_f> = sum_tau T[tau] · q[tau],
    # q[b,tau,d] = sum_j (x[b, tau+PAD-j] @ W_j)[d] + count-weighted bias
    tot_cross = 0.0
    for j in range(R):
        # window t contributes at tau = t + j - PAD, i.e. t = tau + sh
        # with sh = PAD - j; q_j[tau] = x[tau + sh] @ W_j for
        # 0 <= tau + sh < F (shift LEFT by sh when sh > 0)
        sh = PAD - j
        xs = jnp.roll(xf, -sh, axis=1)
        if sh > 0:
            xs = xs.at[:, F - sh:].set(0)
        elif sh < 0:
            xs = xs.at[:, :-sh].set(0)
        qj = xs @ w[:, :, j].astype(cd)                         # [B,T,D]
        tot_cross = tot_cross + jnp.sum(qj.astype(jnp.float32) *
                                        tgt.astype(jnp.float32))
        # bias part of p for this j: contributes b[d,j] at every valid tau
        lo, hi = max(0, j - PAD), min(F, F + j - PAD)
        tcnt = jnp.sum(tgt[:, lo:hi].astype(jnp.float32), axis=(0, 1))  # [D]
        tot_cross = tot_cross + jnp.dot(tcnt, bsum[:, j].astype(jnp.float32))
    # ||T_f||^2 via counts
    t2 = jnp.sum(CNT * jnp.square(tgt.astype(jnp.float32)))
    return (p2 - 2.0 * tot_cross + t2) / N_ELEMS


def mk_exp():
    def f(ps, x, tgt):
        tot = 0.0
        for p in ps:
            leaf = p["params"]
            wk = leaf["W"]["kernel"][0]        # [H, D*R]
            bi = leaf["W"]["bias"]
            # hidden layer first
            h = head.bind(p)                    # not applicable; do manual
            raise SystemExit("placeholder")
        return tot
    return f


# simpler: single-linear head (hidden handled outside) to isolate the loss
W1 = jnp.asarray(rng.randn(H, D * R).astype(np.float32) * 0.02)
B1 = jnp.asarray(rng.randn(D * R).astype(np.float32) * 0.01)
W2 = jnp.asarray(rng.randn(H, D * R).astype(np.float32) * 0.02)
B2 = jnp.asarray(rng.randn(D * R).astype(np.float32) * 0.01)


def f_expansion(wb, x, tgt):
    (w1, b1), (w2, b2) = wb
    return loss_expansion(w1, b1, x, tgt) + loss_expansion(w2, b2, x, tgt)


def f_materialize(wb, x, tgt):
    (w1, b1), (w2, b2) = wb
    p1 = x @ w1.astype(x.dtype) + b1.astype(x.dtype)
    p2 = x @ w2.astype(x.dtype) + b2.astype(x.dtype)
    return loss_gather(p1, tgt) + loss_gather(p2, tgt)


# f32 exactness check (no bf16 rounding in either path)
from pase_tpu.precision import compute_dtype as _cd_ctx


def f_expansion32(wb, x, tgt):
    (w1, b1), (w2, b2) = wb
    x = x.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)
    return loss_expansion(w1, b1, x, tgt, cd=jnp.float32) + \
        loss_expansion(w2, b2, x, tgt, cd=jnp.float32)


def f_materialize32(wb, x, tgt):
    (w1, b1), (w2, b2) = wb
    x = x.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)
    p1 = x @ w1 + b1
    p2 = x @ w2 + b2
    return loss_gather(p1, tgt) + loss_gather(p2, tgt)


ve32, g_e32 = jax.jit(jax.value_and_grad(f_expansion32))(
    ((W1, B1), (W2, B2)), x, tgt)
vm32, g_m32 = jax.jit(jax.value_and_grad(f_materialize32))(
    ((W1, B1), (W2, B2)), x, tgt)
print(f"f32 check: expansion={float(ve32):.8f} materialized={float(vm32):.8f}")
for a, b, nm in zip(jax.tree_util.tree_leaves(g_e32),
                    jax.tree_util.tree_leaves(g_m32),
                    ["W1", "B1", "W2", "B2"]):
    rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-12))
    print(f"  f32 grad rel diff {nm}: {rel:.2e}")

ge = jax.jit(jax.value_and_grad(f_expansion))
gm = jax.jit(jax.value_and_grad(f_materialize))
ve, grads_e = ge(((W1, B1), (W2, B2)), x, tgt)
vm, grads_m = gm(((W1, B1), (W2, B2)), x, tgt)
print(f"C expansion loss value={float(ve):.6f} vs materialized={float(vm):.6f}")
gdiff = max(float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
            for a, b in zip(jax.tree_util.tree_leaves(grads_e),
                            jax.tree_util.tree_leaves(grads_m)))
print(f"  max rel grad diff: {gdiff:.2e}")
print(f"C 2x W-linear+loss grad, expansion:    "
      f"{timeit(ge, ((W1, B1), (W2, B2)), x, tgt):7.2f} ms")
print(f"C 2x W-linear+loss grad, materialized: "
      f"{timeit(gm, ((W1, B1), (W2, B2)), x, tgt):7.2f} ms")
