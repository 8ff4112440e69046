"""WaveRNN vocoder worker (RAW / MOL modes).

Reproduces the reference WaveRNN minion
(/root/reference/pase/models/Minions/minions.py:58-362 and the
UpsampleNetwork/MelResNet/Stretch2d stack in modules.py:1149-1241;
fatchord's WaveRNN): an upsampling conditioning network brings PASE
features to sample rate, a two-GRU sample-level autoregressive net
predicts either 2^bits softmax classes (RAW) or a discretized mixture of
logistics (MOL). Training is teacher-forced (fully parallel over time);
generation is a lax.scan over samples.

MoL loss/sampling per the reference's utils (pase/utils.py:236-346,
PixelCNN++ style).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pase_tpu.nn import Conv1D, BatchNorm1d


class MelResNet(nn.Module):
    """1x1 residual conditioning trunk (modules.py:1171-1192)."""
    compute_dims: int = 128
    res_out_dims: int = 128
    res_blocks: int = 10
    pad: int = 2

    @nn.compact
    def __call__(self, m, train: bool = False):
        k = self.pad * 2 + 1
        h = Conv1D(self.compute_dims, k, use_bias=False, name="conv_in")(m)
        h = BatchNorm1d(self.compute_dims, name="bn_in")(h, train=train)
        h = nn.relu(h)
        for i in range(self.res_blocks):
            res = h
            y = Conv1D(self.compute_dims, 1, use_bias=False,
                       name=f"res_{i}_conv1")(h)
            y = BatchNorm1d(self.compute_dims, name=f"res_{i}_bn1")(
                y, train=train)
            y = nn.relu(y)
            y = Conv1D(self.compute_dims, 1, use_bias=False,
                       name=f"res_{i}_conv2")(y)
            y = BatchNorm1d(self.compute_dims, name=f"res_{i}_bn2")(
                y, train=train)
            h = y + res
        return Conv1D(self.res_out_dims, 1, name="conv_out")(h)


def stretch_time(x, scale: int):
    """Repeat along time (Stretch2d with y_scale=1, modules.py:1194-1209)."""
    return jnp.repeat(x, scale, axis=1)


class UpsampleNetwork(nn.Module):
    """Feature upsampling to sample rate (modules.py:1211-1241):
    stretch+smoothing-conv chain for the mels, MelResNet+stretch for aux."""
    upsample_scales: Sequence[int] = (4, 4, 10)
    compute_dims: int = 128
    res_blocks: int = 10
    res_out_dims: int = 128
    pad: int = 2

    @nn.compact
    def __call__(self, m, train: bool = False):
        # m: [B, T_frames, D]
        total = int(np.prod(self.upsample_scales))
        indent = self.pad * total
        aux = MelResNet(self.compute_dims, self.res_out_dims,
                        self.res_blocks, self.pad, name="resnet")(
            m, train=train)
        aux = stretch_time(aux, total)
        h = m
        for i, scale in enumerate(self.upsample_scales):
            h = stretch_time(h, scale)
            k = scale * 2 + 1
            # depthwise smoothing conv, weights fixed 1/k in the reference
            kern = self.param(f"up_{i}_kernel",
                              lambda key, s: jnp.full(s, 1.0 / k),
                              (k, 1, 1))
            hp = jnp.pad(h, ((0, 0), (scale, scale), (0, 0)))
            b, t, d = hp.shape
            hp2 = hp.transpose(0, 2, 1).reshape(b * d, t, 1)
            sm = jax.lax.conv_general_dilated(
                hp2, kern, (1,), "VALID",
                dimension_numbers=("NWC", "WIO", "NWC"))
            h = sm.reshape(b, d, -1).transpose(0, 2, 1)
        h = h[:, indent:-indent] if indent else h
        return h, aux


class WaveRNNMinion(nn.Module):
    """Sample-level vocoder head (minions.py:58-146)."""
    num_inputs: int = 256
    rnn_dims: int = 512
    fc_dims: int = 512
    bits: int = 9
    hop_length: int = 160
    mode: str = "RAW"            # 'RAW' | 'MOL'
    pad: int = 2
    upsample_scales: Sequence[int] = (4, 4, 10)
    res_out_dims: int = 128

    @property
    def n_classes(self):
        return 2 ** self.bits if self.mode == "RAW" else 30

    @property
    def aux_dims(self):
        return self.res_out_dims // 4

    @nn.compact
    def __call__(self, x, mels, train: bool = False):
        """Teacher-forced forward: x [B, T_samples] previous samples,
        mels [B, T_frames(+2*pad), D] -> logits [B, T_samples, n_classes].
        """
        mels_up, aux = UpsampleNetwork(
            self.upsample_scales, res_out_dims=self.res_out_dims,
            pad=self.pad, name="upsample")(mels, train=train)
        d = self.aux_dims
        a1, a2, a3, a4 = (aux[..., i * d:(i + 1) * d] for i in range(4))
        h = jnp.concatenate([x[..., None], mels_up, a1], axis=-1)
        h = nn.Dense(self.rnn_dims, name="I")(h)
        res = h
        h = nn.RNN(nn.GRUCell(self.rnn_dims, name="rnn1_cell"),
                   name="rnn1")(h)
        h = h + res
        res = h
        h2 = jnp.concatenate([h, a2], axis=-1)
        h = nn.RNN(nn.GRUCell(self.rnn_dims, name="rnn2_cell"),
                   name="rnn2")(h2)
        h = h + res
        h = jnp.concatenate([h, a3], axis=-1)
        h = nn.relu(nn.Dense(self.fc_dims, name="fc1")(h))
        h = jnp.concatenate([h, a4], axis=-1)
        h = nn.relu(nn.Dense(self.fc_dims, name="fc2")(h))
        return nn.Dense(self.n_classes, name="fc3")(h)


# ---------------------------------------------------------------------------
# losses / codecs (pase/utils.py:236-346)
# ---------------------------------------------------------------------------


def encode_mu_law(x, mu):
    mu = mu - 1
    fx = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / np.log1p(mu)
    return jnp.floor((fx + 1) / 2 * mu + 0.5).astype(jnp.int32)


def decode_mu_law(y, mu, from_labels=True):
    mu = mu - 1
    if from_labels:
        y = 2.0 * y / mu - 1.0
    return jnp.sign(y) / mu * ((1 + mu) ** jnp.abs(y) - 1)


def raw_loss(logits, target_wav, bits=9):
    """Cross entropy on mu-law classes (RAW mode)."""
    labels = encode_mu_law(target_wav, 2 ** bits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[..., None],
                                         axis=-1))


def discretized_mix_logistic_loss(logits, target, num_classes=65536):
    """MoL negative log-likelihood (utils.py:236-300, PixelCNN++)."""
    nr_mix = logits.shape[-1] // 3
    logit_probs = logits[..., :nr_mix]
    means = logits[..., nr_mix:2 * nr_mix]
    log_scales = jnp.maximum(logits[..., 2 * nr_mix:], -7.0)
    y = target[..., None]
    centered = y - means
    inv = jnp.exp(-log_scales)
    plus = jax.nn.sigmoid(inv * (centered + 1.0 / (num_classes - 1)))
    minus = jax.nn.sigmoid(inv * (centered - 1.0 / (num_classes - 1)))
    cdf_delta = plus - minus
    mid = inv * centered
    log_pdf_mid = mid - log_scales - 2.0 * jax.nn.softplus(mid)
    log_cdf_plus = jnp.log(jnp.maximum(plus, 1e-12))
    log_one_minus = jnp.log(jnp.maximum(1.0 - minus, 1e-12))
    inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - np.log((num_classes - 1) / 2.0))
    log_probs = jnp.where(y < -0.999, log_cdf_plus,
                          jnp.where(y > 0.999, log_one_minus, inner))
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    return -jnp.mean(jax.nn.logsumexp(log_probs, axis=-1))


def sample_from_discretized_mix_logistic(logits, key):
    nr_mix = logits.shape[-1] // 3
    logit_probs = logits[..., :nr_mix]
    k1, k2 = jax.random.split(key)
    comp = jax.random.categorical(k1, logit_probs, axis=-1)
    means = jnp.take_along_axis(logits[..., nr_mix:2 * nr_mix],
                                comp[..., None], axis=-1)[..., 0]
    log_scales = jnp.maximum(
        jnp.take_along_axis(logits[..., 2 * nr_mix:], comp[..., None],
                            axis=-1)[..., 0], -7.0)
    u = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log1p(-u))
    return jnp.clip(x, -1.0, 1.0)


def generate(module, variables, mels, key, mode="RAW", bits=9):
    """Autoregressive sampling via lax.scan (minions.py:148-242; batched
    fold/xfade generation is in fold_with_overlap/xfade_and_unfold)."""
    # Precompute conditioning once
    mels_up, aux = UpsampleNetwork(
        module.upsample_scales, res_out_dims=module.res_out_dims,
        pad=module.pad).apply(
        {"params": variables["params"]["upsample"],
         "batch_stats": variables.get("batch_stats", {}).get("upsample",
                                                             {})},
        mels, train=False)
    d = module.aux_dims
    auxs = [aux[..., i * d:(i + 1) * d] for i in range(4)]
    p = variables["params"]
    b, t, _ = mels_up.shape

    def dense(name, x):
        w = p[name]["kernel"]
        return x @ w + p[name]["bias"]

    cell1 = nn.GRUCell(module.rnn_dims)
    cell2 = nn.GRUCell(module.rnn_dims)

    def step(carry, inputs):
        x_prev, h1, h2, key = carry
        m_t, a1, a2, a3, a4 = inputs
        xin = jnp.concatenate([x_prev[:, None], m_t, a1], axis=-1)
        xi = dense("I", xin)
        h1, o1 = cell1.apply({"params": p["rnn1_cell"]}, h1, xi)
        x1 = xi + o1
        h2, o2 = cell2.apply({"params": p["rnn2_cell"]}, h2,
                             jnp.concatenate([x1, a2], axis=-1))
        x2 = x1 + o2
        f1 = jax.nn.relu(dense("fc1", jnp.concatenate([x2, a3], axis=-1)))
        f2 = jax.nn.relu(dense("fc2", jnp.concatenate([f1, a4], axis=-1)))
        logits = dense("fc3", f2)
        key, sub = jax.random.split(key)
        if mode == "RAW":
            cls = jax.random.categorical(sub, logits, axis=-1)
            sample = 2.0 * cls.astype(jnp.float32) / (2 ** bits - 1) - 1.0
        else:
            sample = sample_from_discretized_mix_logistic(logits, sub)
        return (sample, h1, h2, key), sample

    init = (jnp.zeros((b,)), jnp.zeros((b, module.rnn_dims)),
            jnp.zeros((b, module.rnn_dims)), key)
    seq = (jnp.moveaxis(mels_up, 1, 0),) + tuple(
        jnp.moveaxis(a, 1, 0) for a in auxs)
    _, samples = jax.lax.scan(step, init, seq)
    wav = jnp.moveaxis(samples, 0, 1)
    if mode == "RAW":
        wav = decode_mu_law(wav, 2 ** bits, from_labels=False)
    return wav


def fold_with_overlap(x: np.ndarray, target: int, overlap: int):
    """[T, D] -> [folds, target+2*overlap, D] batched-generation folding
    (minions.py:265-306)."""
    total, feats = x.shape
    num_folds = (total - overlap) // (target + overlap)
    extended = num_folds * (overlap + target) + overlap
    remaining = total - extended
    if remaining != 0:
        num_folds += 1
        pad = target + 2 * overlap - remaining
        x = np.concatenate([x, np.zeros((pad, feats), x.dtype)])
    out = np.zeros((num_folds, target + 2 * overlap, feats), x.dtype)
    for i in range(num_folds):
        start = i * (target + overlap)
        out[i] = x[start:start + target + 2 * overlap]
    return out


def xfade_and_unfold(y: np.ndarray, overlap: int):
    """[folds, T] -> [total] equal-power crossfaded unfold
    (minions.py:308-362)."""
    num_folds, length = y.shape
    target = length - 2 * overlap
    total = num_folds * (target + overlap) + overlap
    silence_len = overlap // 2
    fade_len = overlap - silence_len
    t = np.linspace(-1, 1, fade_len, dtype=np.float64)
    fade_in = np.concatenate([np.zeros(silence_len), np.sqrt(0.5 * (1 + t))])
    fade_out = np.concatenate([np.sqrt(0.5 * (1 - t)), np.zeros(silence_len)])
    y = y.astype(np.float64).copy()
    y[:, :overlap] *= fade_in
    y[:, -overlap:] *= fade_out
    out = np.zeros(total)
    for i in range(num_folds):
        start = i * (target + overlap)
        out[start:start + length] += y[i]
    return out
