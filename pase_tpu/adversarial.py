"""Adversarial (GAN) workers: waveform discriminator + GAN losses.

Reproduces the reference GAN machinery functionally:
* ``WaveDiscriminator`` (/root/reference/pase/models/discriminator.py:
  15-65): strided conv waveform decimator with spectral norm and an
  optional conditional bilinear projection head.
* ``WaveAdversarialLoss`` (/root/reference/pase/losses.py:137-213):
  L2 (LSGAN) / BCE / Hinge objectives. The reference mutates an internal
  D optimizer inside loss.forward; here D params + optimizer state live
  in the TrainState and both D and G updates happen inside the single
  jitted train step (alternating updates expressed as two grads in one
  graph — no Python-side choreography).

Spectral normalization is one power-iteration step per forward with the
u-vector carried in 'batch_stats' (the standard Miyato et al. recipe the
torch spectral_norm hook implements).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pase_tpu.nn import PReLU, SNConv1D, conv1d
from pase_tpu.ops.pad import pad_1d


class WaveDiscriminator(nn.Module):
    """Strided conv waveform discriminator (discriminator.py:15-65):
    GConv1DBlock stack (pad reflect -> sn-conv -> PReLU) + 1x1 out,
    optional conditional bilinear projection on the mean embedding."""
    fmaps: Sequence[int] = (128, 128, 256, 256, 512, 100)
    strides: Sequence[int] = (10, 4, 4, 1, 1, 1)
    kwidths: Sequence[int] = (30, 30, 30, 3, 3, 3)

    @nn.compact
    def __call__(self, x, cond=None, train: bool = False):
        # x: [B, T] or [B, T, 1] waveform
        h = x[..., None] if x.ndim == 2 else x
        for i, (fm, kw, st) in enumerate(zip(self.fmaps, self.kwidths,
                                             self.strides)):
            if st > 1 or kw % 2 == 0:
                p = (kw // 2 - 1, kw // 2)
            else:
                p = (kw // 2, kw // 2)
            h = pad_1d(h, p, "reflect")
            h = SNConv1D(fm, kw, st, name=f"dec_{i}")(h, train=train)
            h = PReLU(fm, init=0.25, name=f"act_{i}")(h)
        if cond is not None:
            # cond: [B, F, D] hidden; bilinear projection head
            cmean = jnp.mean(cond, axis=1)               # [B, D]
            proj = nn.Dense(cmean.shape[-1], use_bias=False,
                            name="proj_W")(cmean)
            hmean = jnp.mean(h, axis=1)                  # [B, F]
            cls = jnp.sum(hmean * proj, axis=-1, keepdims=True)
        else:
            cls = 0.0
        hmean = jnp.mean(h, axis=1, keepdims=True)       # [B, 1, F]
        y = SNConv1D(1, 1, name="out_fc")(hmean, train=train)[:, 0]
        return y + cls                                    # [B, 1]


class ZDiscriminator(nn.Module):
    """Latent discriminator for the z-adversarial prior regularizer
    (ZAdversarialLoss, /root/reference/pase/losses.py:40-135): a small
    frame-wise MLP judging encoder embeddings vs N(0,1) samples."""
    hidden: Sequence[int] = (256, 256)

    @nn.compact
    def __call__(self, h, train: bool = False):
        # h: [B, F, D] -> [B, F, 1] logits
        x = h
        for i, hd in enumerate(self.hidden):
            x = nn.Dense(hd, name=f"fc_{i}")(x)
            x = PReLU(hd, init=0.25, name=f"act_{i}")(x)
        return nn.Dense(1, name="out")(x)


def gan_labels(loss_type: str):
    """(real, fake, gen) target labels (losses.py:144-152)."""
    if loss_type in ("L2", "LSGAN"):
        return 1.0, -1.0, 0.0
    if loss_type in ("BCE", "GAN"):
        return 1.0, 0.0, 1.0
    raise ValueError(loss_type)


def d_loss_fn(d_real, d_fake, loss_type: str):
    """Discriminator objective (losses.py:165-196)."""
    if loss_type == "Hinge":
        return (jnp.mean(jax.nn.relu(1.0 - d_real)) +
                jnp.mean(jax.nn.relu(1.0 + d_fake)))
    rl, fk, _ = gan_labels(loss_type)
    if loss_type in ("L2", "LSGAN"):
        return (jnp.mean(jnp.square(d_real - rl)) +
                jnp.mean(jnp.square(d_fake - fk)))
    # BCE with logits
    from pase_tpu.losses import bce_with_logits
    return (bce_with_logits(d_real, jnp.full_like(d_real, rl)) +
            bce_with_logits(d_fake, jnp.full_like(d_fake, fk)))


def g_loss_fn(d_on_fake, loss_type: str):
    """Generator objective (losses.py:202-207)."""
    if loss_type == "Hinge":
        return -jnp.mean(d_on_fake)
    _, _, gl = gan_labels(loss_type)
    if loss_type in ("L2", "LSGAN"):
        return jnp.mean(jnp.square(d_on_fake - gl))
    from pase_tpu.losses import bce_with_logits
    return bce_with_logits(d_on_fake, jnp.full_like(d_on_fake, gl))
