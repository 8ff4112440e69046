"""Worker / minion heads (self-supervised prediction tasks).

Reproduces the head zoo of /root/reference/pase/models/Minions/minions.py
and cls_minions.py as flax modules in NTC layout:

* ``MLPMinion``       — 1x1(/context)-conv MLP head, r-frame multi-output
                        (minions.py:452-528)
* ``DecoderMinion``   — deconv stack x160 upsample back to waveform
                        (minions.py:365-449)
* ``GRUMinion``       — GRU head (minions.py:531-572)
* ``SPCMinion``       — sequence predictive coding: pos=future / neg=past
                        windows vs a current frame (minions.py:575-649)
* ``GapMinion``       — temporal-distance regression (minions.py:651-705)
* LIM / GIM wrappers  — local/global mutual-info sample synthesis
                        (cls_minions.py:29-99)

Gradient scaling into the frontend (ScaleGrad, pase/utils.py:213-225) is
``scale_grad`` — identity forward, grad * alpha backward.
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pase_tpu.nn import MLPBlock, GDeconv1DBlock, Conv1D, PReLU


@jax.custom_vjp
def scale_grad(x, alpha):
    return x


def _scale_grad_fwd(x, alpha):
    return x, alpha


def _scale_grad_bwd(alpha, g):
    return (g * alpha, None)


scale_grad.defvjp(_scale_grad_fwd, _scale_grad_bwd)


class _LinearTap(nn.Module):
    """Creates the SAME params as ``Conv1D(features, kwidth, name=...)``
    (identical names, shapes, and init draws) but returns them instead of
    applying the conv — lets a fused head+loss path (losses.py
    framed_mse_linear) consume W directly while staying checkpoint-
    compatible with the materializing path."""
    features: int
    kwidth: int = 1

    @nn.compact
    def __call__(self, cin: int):
        bound = 1.0 / np.sqrt(cin * self.kwidth)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.kwidth, cin, self.features))
        bias = self.param(
            "bias",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.features,))
        return kernel, bias


class MLPMinion(nn.Module):
    """Conv-MLP head: [B, T, C] -> [B, T, num_outputs * r].

    With ``return_linear=True`` (requires a kwidth-1 final conv, i.e.
    context==1 or >=1 hidden layer) the final W matmul is NOT applied;
    the call returns ``("linear", h, kernel, bias)`` for a fused
    head+loss consumer. Parameters are identical either way."""
    num_outputs: int
    hidden_size: int = 256
    hidden_layers: int = 2
    context: int = 1
    tie_context_weights: bool = False
    dropout: float = 0.0
    dropout_time: float = 0.0
    dropin: float = 0.0
    dropin_mode: str = "std"
    ratio_fixed: Any = None
    range_fixed: Any = None
    drop_channels: bool = False
    r: int = 1
    skip: bool = True

    @nn.compact
    def __call__(self, x, alpha=1.0, train: bool = False,
                 return_linear: bool = False):
        x = scale_grad(x, alpha)
        if self.dropout_time > 0 and self.context > 1 and train:
            key = self.make_rng("dropout")
            mask = (jax.random.uniform(key, (x.shape[0], x.shape[1], 1))
                    > self.dropout_time).astype(x.dtype)
            x = x * mask
        h = x
        ctx = self.context
        for i in range(self.hidden_layers):
            h = MLPBlock(self.hidden_size, context=ctx,
                         tie_context_weights=self.tie_context_weights,
                         din=self.dropin, dout=self.dropout,
                         dropin_mode=self.dropin_mode,
                         ratio_fixed=self.ratio_fixed,
                         range_fixed=self.range_fixed,
                         drop_channels=self.drop_channels,
                         name=f"blocks_{i}")(h, train=train)
            ctx = 1
        if return_linear:
            if ctx != 1:
                raise ValueError("return_linear requires a kwidth-1 final "
                                 "conv (context==1 or hidden_layers>=1)")
            kernel, bias = _LinearTap(self.num_outputs * self.r, ctx,
                                      name="W")(h.shape[-1])
            return ("linear", h, kernel, bias)
        pad = ctx // 2
        if pad:
            h_in = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
        else:
            h_in = h
        y = Conv1D(self.num_outputs * self.r, ctx, name="W")(h_in)
        return y


class DecoderMinion(nn.Module):
    """Waveform decoder head: [B, T, C] -> [B, T*prod(strides), num_outputs].

    workers+.cfg cchunk worker: fmaps [512,256,128], strides [4,4,10],
    kwidths [30,30,30], one hidden MLP (64), L1 loss.
    """
    num_outputs: int
    fmaps: Sequence[int] = (256, 256, 128, 128, 128, 64, 64)
    strides: Sequence[int] = (2, 2, 2, 2, 2, 5)
    kwidths: Sequence[int] = (2, 2, 2, 2, 2, 5)
    hidden_size: int = 256
    hidden_layers: int = 2
    dropout: float = 0.0
    dropout_time: float = 0.0
    norm_type: Optional[str] = None
    skip: bool = False

    @nn.compact
    def __call__(self, x, alpha=1.0, train: bool = False):
        x = scale_grad(x, alpha)
        if self.dropout_time > 0 and train:
            key = self.make_rng("dropout")
            mask = (jax.random.uniform(key, (x.shape[0], x.shape[1], 1))
                    > self.dropout_time).astype(x.dtype)
            x = x * mask
        h = x
        bi = 0
        for fm, kw, st in zip(self.fmaps, self.kwidths, self.strides):
            h = GDeconv1DBlock(fm, kw, st, norm_type=self.norm_type,
                               name=f"blocks_{bi}")(h, train=train)
            bi += 1
        for _ in range(self.hidden_layers):
            h = MLPBlock(self.hidden_size, dout=self.dropout,
                         name=f"blocks_{bi}")(h, train=train)
            bi += 1
        y = Conv1D(self.num_outputs, 1, name="W")(h)
        return y


class GRUMinion(nn.Module):
    """GRU head (rare variant; sequential scan)."""
    num_outputs: int
    hidden_size: int = 256
    hidden_layers: int = 2
    dropout: float = 0.0
    skip: bool = True

    @nn.compact
    def __call__(self, x, alpha=1.0, train: bool = False):
        x = scale_grad(x, alpha)
        h = x
        for i in range(self.hidden_layers):
            cell = nn.GRUCell(features=self.hidden_size, name=f"gru_{i}")
            rnn = nn.RNN(cell, name=f"rnn_{i}")
            h = rnn(h)
        y = Conv1D(self.num_outputs, 1, name="W")(h)
        return y


class SPCMinion(nn.Module):
    """Sequence predictive coding head (minions.py:575-649).

    Samples a current frame t, a future window [ft, ft+N) with gap
    >= seq_pad, and a past window; scores (current, future) as positive
    and (current, past) as negative. Index sampling uses jax.random
    (single draw per batch, matching the reference's python random).
    """
    num_outputs: int
    hidden_size: int = 256
    hidden_layers: int = 2
    ctxt_frames: int = 5
    seq_pad: int = 16
    dropout: float = 0.0
    skip: bool = True

    @nn.compact
    def __call__(self, x, alpha=1.0, train: bool = False, idx=None):
        x = scale_grad(x, alpha)
        b, t, c = x.shape
        n = self.ctxt_frames
        m = self.seq_pad + n
        if idx is not None:
            # injected (t, future_t, past_t) — deterministic parity mode
            # (the reference samples these with python random,
            # minions.py:619-628; injecting identical indices on both
            # sides makes the stochastic head oracle-comparable)
            idx = jnp.asarray(idx)
            tt, ft, pt = idx[0], idx[1], idx[2]
        else:
            key = self.make_rng("sample")
            k1, k2, k3 = jax.random.split(key, 3)
            tt = jax.random.randint(k1, (), m + 1, t - m)
            # future_t in [tt + seq_pad, t - n); past_t in [n, tt - seq_pad)
            u2 = jax.random.uniform(k2, ())
            u3 = jax.random.uniform(k3, ())
            ft = (tt + self.seq_pad +
                  (u2 * ((t - n) - (tt + self.seq_pad))).astype(jnp.int32))
            pt = n + (u3 * ((tt - self.seq_pad) - n)).astype(jnp.int32)

        fut = jax.lax.dynamic_slice_in_dim(x, ft, n, axis=1)      # [B,N,C]
        past = jax.lax.dynamic_slice_in_dim(x, pt - n, n, axis=1)
        cur = jax.lax.dynamic_slice_in_dim(x, tt, 1, axis=1)[:, 0]  # [B,C]
        # reference flattens (C, N) row-major (x[:,:,i:i+N].view(B,-1))
        fut = jnp.transpose(fut, (0, 2, 1)).reshape(b, c * n)
        past = jnp.transpose(past, (0, 2, 1)).reshape(b, c * n)
        pos = jnp.concatenate([cur, fut], axis=1)
        neg = jnp.concatenate([cur, past], axis=1)
        xf = jnp.concatenate([pos, neg], axis=0)[:, None, :]       # [2B,1,C*]
        h = xf
        for i in range(self.hidden_layers):
            h = MLPBlock(self.hidden_size, dout=self.dropout,
                         name=f"blocks_{i}")(h, train=train)
        y = Conv1D(self.num_outputs, 1, name="W")(h)               # [2B,1,1]
        return y


class GapMinion(nn.Module):
    """Temporal gap regression (minions.py:651-705): per-sample random
    frame pair, predict normalized |a-b|/(T-1)."""
    num_outputs: int
    hidden_size: int = 256
    hidden_layers: int = 2
    dropout: float = 0.0
    skip: bool = True

    @nn.compact
    def __call__(self, x, alpha=1.0, train: bool = False, idx=None):
        x = scale_grad(x, alpha)
        b, t, c = x.shape
        if idx is not None:
            # injected ([aidx], [bidx]) pairs — deterministic parity mode
            # (reference samples with np.random.randint, minions.py:681)
            idx = jnp.asarray(idx)
            aidx, bidx = idx[0], idx[1]
        else:
            key = self.make_rng("sample")
            ka, kb = jax.random.split(key)
            aidx = jax.random.randint(ka, (b,), 0, t)
            bidx = jax.random.randint(kb, (b,), 0, t)
        xa = jnp.take_along_axis(x, aidx[:, None, None], axis=1)[:, 0]
        xb = jnp.take_along_axis(x, bidx[:, None, None], axis=1)[:, 0]
        dists = (jnp.abs(aidx - bidx) / (t - 1)).astype(jnp.float32)
        xf = jnp.concatenate([xa, xb], axis=1)[:, None, :]
        h = xf
        for i in range(self.hidden_layers):
            h = MLPBlock(self.hidden_size, dout=self.dropout,
                         name=f"blocks_{i}")(h, train=train)
        y = Conv1D(self.num_outputs, 1, name="W")(h)
        return y, dists.reshape(b, 1, 1)


def make_mi_samples(h_chunk, h_ctxt, h_rand, augment: bool = False):
    """LIM/GIM positive/negative pair synthesis (cls_minions.py:29-43),
    NTC channel concat."""
    pos = jnp.concatenate([h_chunk, h_ctxt], axis=-1)
    neg = jnp.concatenate([h_chunk, h_rand], axis=-1)
    if augment:
        pos2 = jnp.concatenate([h_ctxt, h_chunk], axis=-1)
        neg2 = jnp.concatenate([h_ctxt, h_rand], axis=-1)
        pos = jnp.concatenate([pos, pos2], axis=0)
        neg = jnp.concatenate([neg, neg2], axis=0)
    return pos, neg


def make_mi_labels(y):
    """Ones for the first half (positives), zeros for the second
    (cls_minions.py:47-51); y is [2B', T, 1]."""
    bsz = y.shape[0] // 2
    return jnp.concatenate([jnp.ones((bsz,) + y.shape[1:]),
                            jnp.zeros((bsz,) + y.shape[1:])], axis=0)
