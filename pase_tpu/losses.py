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
