"""Losses: elementwise criteria + r-frame contextualized targets.

ContextualizedLoss (/root/reference/pase/losses.py:6-37) frames the ground
truth into r consecutive frames per step so a worker predicts a context
window at once (r=7 in workers+.cfg). The reference builds it with a
python loop; here it is a static gather (B, T, r, D) -> (B, T, D*r),
flattened dim-major to match the reference channel ordering
(pad_[:, :, t:t+r].view(B, -1) flattens (D, r) row-major).
"""

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def contextualize_r(gtruth, r: Optional[int]):
    """[B, T, D] -> [B, T, D*r] framed targets (zero-padded edges)."""
    if r is None or r <= 1:
        return gtruth
    b, t, d = gtruth.shape
    pad = jnp.pad(gtruth, ((0, 0), (r // 2, r // 2), (0, 0)))
    idx = np.arange(t)[:, None] + np.arange(r)[None, :]       # [T, r]
    win = pad[:, idx]                                          # [B, T, r, D]
    win = jnp.transpose(win, (0, 1, 3, 2))                     # [B, T, D, r]
    return win.reshape(b, t, d * r)


def framed_mse_linear(kernel, bias, h, target, r: Optional[int],
                      precision=None):
    """r-framed MSE of a linear head WITHOUT materializing the prediction.

    Computes mean((h @ W + b - frame_r(target))^2) — exactly the
    composition of a kwidth-1 Conv1D head with ``make_loss('MSELoss', r)``
    — via the algebraic expansion ||p||^2 - 2<p, T_f> + ||T_f||^2:

      * ||p||^2  through the [H, H] Gram of h and the summed per-offset
        Gram of W (two small matmuls instead of a [B, T, D*r] tensor),
      * <p, T_f> through r shifted [H, D] matmuls whose outputs are only
        [B, T, D],
      * ||T_f||^2 from per-frame window counts on the raw target.

    For the PASE+ lps/lps_long heads (D*r = 21525 channels) the giant
    [B, T, 21525] prediction never hits HBM: measured 2.8 ms vs 12.7 ms
    per step for the two heads fwd+bwd on a v5e chip
    (experiments/profile_lps2.py). Numerics: identical to the
    materialized path up to accumulation order (f32 rel diff ~1e-6 on
    values; gradient differences are at matmul-precision level).

    Args:
      kernel: [1, H, D*r] (Conv1D layout) or [H, D*r], d-major channel
        order (c = d*r + j, the reference ContextualizedLoss ordering).
      bias:   [D*r] or None.
      h:      [B, T, H] head input (the last hidden activation).
      target: [B, T, D] unframed ground truth.
      precision: matmul precision for the Gram/cross contractions.
        The expanded form's absolute rounding error scales with the term
        magnitudes (||p||^2, <p,T>, ||T||^2) rather than the residual, so
        under the TPU default (one bf16 pass) the reported loss VALUE
        carries a relative error of roughly (term magnitude / loss) x
        2^-9. With ZNorm'd targets (||T||^2/n ~= 1) and realistic lps
        residuals that is <~1% — harmless where losses are only summed
        into the objective, but visible to policies that consume loss
        values in-graph. Precision.HIGH (3-pass bf16) removes it at a
        measured 4.3 ms/step fwd+bwd for the two PASE+ lps heads (the
        whole r3 bench regression, 13.84 -> 13.03 steps/s;
        experiments/fused_head_precision.py quantifies the value error).
        The Trainer therefore passes HIGH only for value-consuming
        policies (softmax/adaptive/hyper_volume/MGD) and for eval steps,
        and leaves the default None (= backend default) on the hot
        base-policy path where every other head's matmuls are bf16 too.
    """
    if kernel.ndim == 3:
        kernel = kernel[0]
    rr = int(r) if r else 1
    b, t, hdim = h.shape
    d = kernel.shape[1] // rr
    pad_l = rr // 2
    w = kernel.reshape(hdim, d, rr)
    cd = h.dtype if h.dtype != jnp.float32 else jnp.float32
    f32 = jnp.float32
    wc = w.astype(cd)
    n_elems = b * t * d * rr

    # ||p||^2 = tr(Gram(h) . sum_j W_j W_j^T) + 2 sum(h)Wb + B*T*||b||^2
    g = jnp.einsum("bth,btk->hk", h, h, preferred_element_type=f32,
                   precision=precision)
    wg = jnp.einsum("hdj,kdj->hk", wc, wc, preferred_element_type=f32,
                    precision=precision)
    p2 = jnp.sum(g * wg)
    if bias is not None:
        hsum = jnp.sum(h.astype(f32), axis=(0, 1))                  # [H]
        p2 = p2 + 2.0 * jnp.dot(jnp.dot(hsum, kernel.astype(f32)),
                                bias.astype(f32))
        p2 = p2 + b * t * jnp.sum(jnp.square(bias.astype(f32)))

    # <p, T_f>: window t, offset j lands on target frame tau = t + j - pad_l
    # (zero outside [0, T), matching contextualize_r's zero padding), so
    # q_j[tau] = h[tau + sh] @ W_j with sh = pad_l - j.
    tgt32 = target.astype(f32)
    cross = 0.0
    if bias is not None:
        bmat = bias.reshape(d, rr).astype(f32)
    for j in range(rr):
        sh = pad_l - j
        hs = jnp.roll(h, -sh, axis=1)
        if sh > 0:
            hs = hs.at[:, t - sh:].set(0)
        elif sh < 0:
            hs = hs.at[:, :-sh].set(0)
        qj = jnp.matmul(hs, wc[:, :, j], precision=precision)       # [B,T,D]
        cross = cross + jnp.sum(qj.astype(f32) * tgt32)
        lo, hi = max(0, j - pad_l), min(t, t + j - pad_l)
        if bias is not None:
            tsum = jnp.sum(tgt32[:, lo:hi], axis=(0, 1))            # [D]
            cross = cross + jnp.dot(tsum, bmat[:, j])

    # ||T_f||^2: target frame tau appears in cnt[tau] windows
    cnt = np.zeros(t, np.float32)
    for j in range(rr):
        cnt[max(0, j - pad_l):min(t, t + j - pad_l)] += 1.0
    t2 = jnp.sum(jnp.asarray(cnt)[None, :, None] * jnp.square(tgt32))

    return (p2 - 2.0 * cross + t2) / n_elems


def mse_loss(pred, target):
    return jnp.mean(jnp.square(pred - target))


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def bce_with_logits(pred, target):
    return jnp.mean(
        jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred))))


def cross_entropy(pred, target):
    """pred [..., C] logits, target int labels."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, target[..., None], axis=-1))


_LOSSES = {
    "MSELoss": mse_loss,
    "L1Loss": l1_loss,
    "BCEWithLogitsLoss": bce_with_logits,
    "CrossEntropyLoss": cross_entropy,
    "SmoothL1Loss": lambda p, t: jnp.mean(
        jnp.where(jnp.abs(p - t) < 1, 0.5 * jnp.square(p - t),
                  jnp.abs(p - t) - 0.5)),
}


def make_loss(name: str, r: Optional[int] = None,
              streaming: bool = False) -> Callable:
    """Loss factory replicating worker_parser's ContextualizedLoss wrapping
    (/root/reference/pase/utils.py:53-90).

    The r-frame target framing is a gather that XLA fuses into the loss
    (measured faster than an explicit streaming-over-offsets variant,
    which is kept behind ``streaming=True``)."""
    base = _LOSSES[name]

    def loss_fn(pred, target):
        # frame in the native (possibly bf16) dtype, cast to f32 at the
        # elementwise criterion (the cast fuses into the subtraction, so
        # the r-framed tensor is never materialized in f32); reductions
        # always f32 for precision
        if r is not None and r > 1 and not streaming:
            target = contextualize_r(target, r)
        if pred.dtype != jnp.float32:
            pred = pred.astype(jnp.float32)
        if hasattr(target, "dtype") and target.dtype != jnp.float32 and \
                jnp.issubdtype(target.dtype, jnp.floating):
            target = target.astype(jnp.float32)
        if r is None or r <= 1 or not streaming:
            return base(pred, target)
        b, t, dr = pred.shape
        d = dr // r
        p = pred.reshape(b, t, d, r)
        pad = jnp.pad(target, ((0, 0), (r // 2, r // 2), (0, 0)))
        tot = 0.0
        for j in range(r):
            tot = tot + base(p[..., j], pad[:, j:j + t])
        return tot / r

    return loss_fn
