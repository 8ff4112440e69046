"""Common neural blocks (flax.linen), NTC layout.

These reproduce the behavioral contracts of the reference blocks in
/root/reference/pase/models/modules.py, re-expressed as functional JAX:

* ``BatchNorm1d``  — torch-semantics batch norm (biased batch var for the
  normalization, unbiased var for the running update, momentum 0.1).
* ``PReLU``        — per-channel parametric ReLU.
* ``FeBlock``      — pad(reflect) -> conv/sinc -> norm -> activation
                     (modules.py:1014-1077).
* ``QRNN``         — window-2 quasi-recurrent layer (modules.py:45-60 +
                     torchqrnn semantics), scan in pase_tpu.ops.qrnn.
* ``GDeconv1DBlock`` / ``MLPBlock`` — worker-head building blocks
                     (modules.py:558-589, 527-556).

All time-domain tensors are [B, T, C]; channels sit on the TPU lane dim.
"""

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pase_tpu.ops.pad import pad_1d, feblock_pad, sinc_same_pad
from pase_tpu.ops.sinc import mel_init_hz, sinc_time_axes, build_sinc_filters
from pase_tpu.ops.qrnn import qrnn_pool, shift_right


def conv1d(x, kernel, stride=1, dilation=1):
    """1-D convolution, NTC x [K, Cin, Cout] kernel, VALID padding.

    Under a bf16 compute policy (pase_tpu.precision) the MXU passes run
    in bfloat16 (f32 accumulation inside the MXU) and the OUTPUT is in
    the compute dtype — the activation chain stays bf16 end to end.
    """
    from pase_tpu.precision import get_compute_dtype
    cd = get_compute_dtype()
    if cd is not None and x.dtype == jnp.float32:
        # keep the activation chain in the compute dtype end-to-end:
        # halves HBM traffic through the 16 kHz layers
        x = x.astype(cd)
    # NOTE: no preferred_element_type here — TPU bf16 convs accumulate in
    # f32 inside the MXU already, and a widened output dtype breaks the
    # autodiff transpose rule's dtype matching.
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )


class PReLU(nn.Module):
    """Per-channel PReLU; init matches the reference (0 inside FeBlocks —
    modules.py:111-113 — and 0.25 for torch-default MLP blocks)."""
    features: int
    init: float = 0.0

    @nn.compact
    def __call__(self, x):
        a = self.param("weight", lambda k: jnp.full((self.features,), self.init,
                                                    dtype=jnp.float32))
        return jnp.maximum(x, 0) + a.astype(x.dtype) * jnp.minimum(x, 0)


class BatchNorm1d(nn.Module):
    """Torch-semantics BatchNorm over the channel axis of [B, T, C].

    Stats are computed over (B, T). Running update uses unbiased variance
    and momentum 0.1 like torch.nn.BatchNorm1d; normalization uses biased
    batch variance in training and the running stats in eval.
    """
    features: int
    affine: bool = True
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool = False):
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if train:
            # stats always in f32 (bf16 means over B*T lose precision);
            # single-pass E[x^2]-E[x]^2 so the (large, 16 kHz) activation
            # is read once
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1))
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            n = x.shape[0] * x.shape[1]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.eps)
        y = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
        if self.affine:
            scale = self.param("weight", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
        return y


class InstanceNorm1d(nn.Module):
    """torch InstanceNorm1d (affine optional, no running stats): per-sample
    per-channel normalization over time."""
    features: int
    affine: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("weight", nn.initializers.ones, (self.features,))
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y * scale + bias
        return y


class LayerNorm1d(nn.Module):
    """torch LayerNorm over the channel dim (reference transposes to apply
    it channel-last — modules.py:100-107; we are channel-last natively)."""
    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y * scale + bias


def build_norm(norm_type: Optional[str], features: int, name: str = "norm"):
    """Post-conv norm layer factory mirroring build_norm_layer
    (modules.py:77-98). The weight reparameterizations ('snorm'/'wnorm'/
    'bsnorm') are handled by the conv itself — callers split a norm_type
    with ``split_norm`` first; passing one here raises.
    """
    if norm_type == "bnorm":
        return BatchNorm1d(features, affine=True, name=name)
    if norm_type == "lnorm":
        return LayerNorm1d(features, name=name)
    if norm_type == "inorm":
        return InstanceNorm1d(features, affine=False, name=name)
    if norm_type == "affinorm":
        return InstanceNorm1d(features, affine=True, name=name)
    if norm_type is None:
        return None
    raise TypeError(f"Unrecognized norm type: {norm_type}")


def split_norm(norm_type: Optional[str]):
    """Split a reference norm_type into (conv weight reparameterization,
    post-conv norm layer type) — build_norm_layer semantics
    (modules.py:77-98): 'snorm'/'wnorm' reparameterize the conv weights
    and add NO norm layer; 'bsnorm' is spectral norm + BatchNorm."""
    if norm_type == "snorm":
        return "snorm", None
    if norm_type == "wnorm":
        return "wnorm", None
    if norm_type == "bsnorm":
        return "snorm", "bnorm"
    return None, norm_type


class Conv1D(nn.Module):
    """Thin Conv1d with torch-compatible parameter shapes semantics.

    Kernel is stored flax-style [K, Cin, Cout]; torch weights [Cout, Cin, K]
    convert via transpose(2, 1, 0) (see pase_tpu.checkpoint).
    Torch-default uniform(-1/sqrt(fan_in*k), +) init.
    """
    features: int
    kwidth: int
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    # (left, right) VIRTUAL padding: applied inside the conv op
    # (ops/virtual_pad.py) so the padded activation is never
    # materialized in HBM — exactly equal to pad_1d + conv
    pad: tuple = (0, 0)
    pad_mode: str = "constant"

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        bound = 1.0 / np.sqrt(cin * self.kwidth)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.kwidth, cin, self.features))
        if self.pad != (0, 0):
            from pase_tpu.ops.virtual_pad import conv1d_padded
            y = conv1d_padded(x, kernel, self.stride, self.dilation,
                              pad=self.pad, pad_mode=self.pad_mode)
        else:
            y = conv1d(x, kernel, self.stride, self.dilation)
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.features,))
            y = y + bias
        return y


class WNConv1D(nn.Module):
    """Conv1d with weight normalization (torch weight_norm, dim=0):
    w = g * v / ||v|| with the norm per output channel over (Cin, K).
    Initial g = ||v|| so the initial function equals the plain conv."""
    features: int
    kwidth: int
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        bound = 1.0 / np.sqrt(cin * self.kwidth)

        def v_init(key):
            return jax.random.uniform(key, (self.kwidth, cin, self.features),
                                      jnp.float32, -bound, bound)

        v = self.param("v", v_init)
        g = self.param(
            "g", lambda k: jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1))))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1),
                                keepdims=True)) + 1e-12
        kernel = v / norm * g[None, None, :]
        y = conv1d(x, kernel, self.stride, self.dilation)
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound,
                                                bound),
                (self.features,))
            y = y + bias
        return y


class SNConv1D(nn.Module):
    """Conv1d with spectral weight normalization (one power-iteration
    step per training forward, u-vector in 'batch_stats' — the Miyato et
    al. recipe torch's spectral_norm hook implements)."""
    features: int
    kwidth: int
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        bound = 1.0 / np.sqrt(cin * self.kwidth)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.kwidth, cin, self.features))
        u = self.variable("batch_stats", "u",
                          lambda: jax.random.normal(jax.random.PRNGKey(0),
                                                    (self.features,)))
        w = kernel.reshape(-1, self.features)            # [K*Cin, F]
        v = w @ u.value
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = w.T @ v
        u_norm = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        sigma = jnp.dot(v, w @ u_norm)
        if train and not self.is_initializing():
            u.value = jax.lax.stop_gradient(u_norm)
        kernel = kernel / jnp.maximum(sigma, 1e-12)
        y = conv1d(x, kernel, self.stride, self.dilation)
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound,
                                                bound),
                (self.features,))
            y = y + bias
        return y


def _s2d_indices(k, r, k2):
    """Static gather map for the space-to-depth conv kernel:
    W2[q, c, p, o] = w[o, q*r + c - p]."""
    q = np.arange(k2)[:, None, None]
    c = np.arange(r)[None, :, None]
    p = np.arange(r)[None, None, :]
    idx = q * r + c - p                          # [K2, r, r]
    mask = (idx >= 0) & (idx < k)
    return np.clip(idx, 0, k - 1), mask.astype(np.float32)


def _s2d_bank_conv(x, filters, r=8):
    """Stride-1 single-channel filterbank conv as a space-to-depth conv.

    A [B, T, 1] (+) [K, 1, C] conv has contraction size K with Cin=1 —
    MXU-hostile. Folding time by r makes it a [K2, r, r*C] conv
    (contraction r*K2 ~ K, output lanes r*C), which XLA tiles onto the
    MXU at full width. Exactly equal to conv1d(x, filters.T[:,None,:], 1).

    Args: x [B, T, 1] (pre-padded), filters [C, K]. Returns [B, T-K+1, C].
    """
    b, t, _ = x.shape
    c_out, k = filters.shape
    k2 = (k - 1) // r + 2
    t_out = t - k + 1
    # pad time so the folded view covers every needed output
    n_blocks_out = (t_out + r - 1) // r
    need = (n_blocks_out + k2 - 1) * r
    if need > t:
        x = jnp.pad(x, ((0, 0), (0, need - t), (0, 0)))
    x2 = x[:, :need, 0].reshape(b, need // r, r)          # [B, T2, r]
    idx, mask = _s2d_indices(k, r, k2)
    w2 = filters[:, idx] * mask                            # [C, K2, r, r]
    w2 = jnp.transpose(w2, (1, 2, 3, 0)).reshape(k2, r, r * c_out)
    y2 = conv1d(x2, w2)                                    # [B, T2-K2+1, r*C]
    y = y2.reshape(b, -1, c_out)                           # [B, (..)*r, C]
    return y[:, :t_out]


def _fft_bank_conv(x, filters):
    """Valid cross-correlation of [B, T] with a [C, K] filterbank via
    rFFT: returns [B, T-K+1, C] equal to conv1d(x[..., None],
    filters.T[:, None, :], stride=1)."""
    b, t = x.shape
    c, k = filters.shape
    n = t
    nfft = int(2 ** np.ceil(np.log2(n)))
    X = jnp.fft.rfft(x, n=nfft)                        # [B, F]
    # conv (torch cross-correlation): correlate = conv with reversed kernel
    H = jnp.fft.rfft(filters[:, ::-1], n=nfft)         # [C, F]
    Y = X[:, None, :] * H[None, :, :]                  # [B, C, F]
    y = jnp.fft.irfft(Y, n=nfft)[..., k - 1:t]         # [B, C, T-K+1]
    return jnp.transpose(y, (0, 2, 1))


class SincConv(nn.Module):
    """SincNet band-pass conv layer (modules.py:788-934). Input must be
    single-channel [B, T, 1]."""
    features: int
    kwidth: int
    stride: int = 1
    sample_rate: int = 16000
    padding: str = "SAME"
    pad_mode: str = "reflect"
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0
    use_fft: bool = False

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == 1, "SincConv only supports one input channel"
        k = self.kwidth + 1 if self.kwidth % 2 == 0 else self.kwidth
        low0, band0 = mel_init_hz(self.features, self.sample_rate,
                                  self.min_low_hz, self.min_band_hz)
        low_hz = self.param("low_hz", lambda _: jnp.asarray(low0))
        band_hz = self.param("band_hz", lambda _: jnp.asarray(band0))
        n_, window_ = sinc_time_axes(k, self.sample_rate)
        filters = build_sinc_filters(low_hz, band_hz, jnp.asarray(n_),
                                     jnp.asarray(window_), self.sample_rate,
                                     self.min_low_hz, self.min_band_hz)
        if self.padding == "SAME":
            x = pad_1d(x, sinc_same_pad(k, self.stride), self.pad_mode)
        if self.stride == 1 and self.use_fft:
            # rFFT evaluation: ~100x fewer FLOPs at K=251, but TPU has no
            # FFT hardware — measured SLOWER than the direct conv. Kept
            # for CPU/long-K use.
            return _fft_bank_conv(x[..., 0], filters)
        if self.stride == 1:
            # space-to-depth reformulation: 43ms -> MXU-shaped matmul
            return _s2d_bank_conv(x, filters, r=8)
        # [C, K] -> [K, 1, C]
        kernel = filters.T[:, None, :]
        return conv1d(x, kernel, self.stride)


def apply_activation(act, module_out):
    """GLU is a functional split (modules.py:119-126)."""
    return module_out


class FeBlock(nn.Module):
    """pad -> conv/sinc -> norm -> activation (modules.py:1014-1077).

    ``do_pad=False`` skips the internal SAME padding (the conv runs VALID)
    so a caller can manage time context explicitly — used by the streaming
    inference path (pase_tpu.streaming), which feeds pre-buffered context.
    The parameter tree is identical either way (flax fields are static).
    """
    fmaps: int
    kwidth: int
    stride: int
    dilation: int = 1
    pad_mode: str = "reflect"
    act: Optional[str] = None          # None -> PReLU(init=0); 'glu' supported
    norm_type: Optional[str] = "bnorm"
    sincnet: bool = False
    sr: int = 16000
    do_pad: bool = True
    # virtualize the plain-conv reflect pad into the conv op
    # (ops/virtual_pad.py, ~3 GB/step HBM saved in training).
    # 'auto' (default) = TPU only, exactly like nn.QRNN's impl='auto':
    # in fused graphs the splice shifts XLA:CPU conv rounding by ~1 ulp
    # PER STEP, which chaos-amplifies past the CPU trajectory gates
    # (tests/test_training_regression.py, test_trajectory_parity.py)
    # and makes CPU conv tiling batch-dependent, breaking the sharded ==
    # single and the exported batched == single bitwise contracts. AOT
    # serving exports additionally pin False (pase_tpu/serving.py).
    virtual_pads: Any = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        wfmaps = 2 * self.fmaps if self.act == "glu" else self.fmaps
        reparam, post_norm = split_norm(self.norm_type)
        if self.sincnet:
            if reparam is not None:
                raise TypeError(
                    f"norm_type={self.norm_type!r} reparameterizes conv "
                    "weights; the sinc layer has no weight tensor (the "
                    "reference's spectral_norm would crash on SincConv "
                    "too, modules.py:80-90)")
            h = SincConv(wfmaps, self.kwidth, self.stride,
                         sample_rate=self.sr,
                         padding="SAME" if self.do_pad else "VALID",
                         pad_mode=self.pad_mode, name="conv")(x)
        else:
            fpad = (feblock_pad(self.kwidth, self.stride, self.dilation)
                    if self.kwidth > 1 and self.do_pad else (0, 0))
            if reparam == "snorm":
                if fpad != (0, 0):
                    x = pad_1d(x, fpad, self.pad_mode)
                h = SNConv1D(wfmaps, self.kwidth, self.stride, self.dilation,
                             name="conv")(x, train=train)
            elif reparam == "wnorm":
                if fpad != (0, 0):
                    x = pad_1d(x, fpad, self.pad_mode)
                h = WNConv1D(wfmaps, self.kwidth, self.stride, self.dilation,
                             name="conv")(x)
            else:
                # plain conv: virtualize the pad into the conv op — the
                # reflect-padded activation copy never hits HBM
                # (ops/virtual_pad.py; ~3 GB/step saved at PASE+ shapes)
                if isinstance(self.virtual_pads, bool):
                    use_vpad = self.virtual_pads
                else:                       # 'auto' -> TPU backends only
                    from pase_tpu.ops.pallas_qrnn import pallas_available
                    use_vpad = pallas_available()
                if fpad != (0, 0) and not use_vpad:
                    x = pad_1d(x, fpad, self.pad_mode)
                    fpad = (0, 0)
                h = Conv1D(wfmaps, self.kwidth, self.stride, self.dilation,
                           pad=fpad, pad_mode=self.pad_mode,
                           name="conv")(x)
        norm = build_norm(post_norm, wfmaps)
        if norm is not None:
            h = norm(h, train=train)
        if self.act == "glu":
            z, g = jnp.split(h, 2, axis=-1)
            h = z * jax.nn.sigmoid(g)
        elif self.act is None or self.act == "prelu":
            h = PReLU(self.fmaps, init=0.0, name="act")(h)
        else:
            h = getattr(jax.nn, self.act.lower())(h)
        return h


class FeResBlock(nn.Module):
    """Two-conv residual encoder block (modules.py:936-1012).

    Exact reference semantics: nearest-neighbor time downsampling by
    ``downsample`` BEFORE conv1 (F.interpolate scale=1/downsample),
    symmetric ZERO padding of (kwidth//2)*dilation per side (the
    reference ignores its pad_mode here — torch conv 'zeros'), then
    conv1 -> norm1 -> act1 -> conv2 -> act2 -> (+ 1x1-projected,
    downsampled identity) -> norm2. Note even kwidths grow the length by
    ``dilation`` samples per conv, exactly as torch does.

    glu is not supported: the reference's build_activation('glu', ...)
    raises AttributeError (no torch.nn.glu), so no reference config can
    reach it either.
    """
    fmaps: int
    kwidth: int
    dilations: Sequence[int] = (1, 2)
    downsample: int = 1
    act: Optional[str] = None
    norm_type: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.act == "glu":
            raise TypeError("FeResBlock does not support glu "
                            "(broken in the reference as well)")
        reparam, post_norm = split_norm(self.norm_type)

        def conv(feat, kw, dil, name):
            if reparam == "snorm":
                return lambda h: SNConv1D(feat, kw, 1, dil, name=name)(
                    h, train=train)
            if reparam == "wnorm":
                return lambda h: WNConv1D(feat, kw, 1, dil, name=name)(h)
            return lambda h: Conv1D(feat, kw, 1, dil, name=name)(h)

        def interp_down(h):
            # F.interpolate(scale_factor=1/downsample, mode='nearest'):
            # out[i] = in[i*downsample], length floor(T/downsample)
            t_out = h.shape[1] // self.downsample
            return h[:, :t_out * self.downsample:self.downsample]

        identity = x
        if self.downsample > 1:
            x = interp_down(x)
        d1, d2 = self.dilations[0], self.dilations[1]
        p1 = (self.kwidth // 2) * d1
        h = jnp.pad(x, ((0, 0), (p1, p1), (0, 0)))
        h = conv(self.fmaps, self.kwidth, d1, "conv1")(h)
        norm1 = build_norm(post_norm, self.fmaps, name="norm1")
        if norm1 is not None:
            h = norm1(h, train=train)
        h = PReLU(self.fmaps, init=0.0, name="act1")(h) \
            if self.act in (None, "prelu") \
            else getattr(jax.nn, self.act.lower())(h)
        p2 = (self.kwidth // 2) * d2
        h = jnp.pad(h, ((0, 0), (p2, p2), (0, 0)))
        h = conv(self.fmaps, self.kwidth, d2, "conv2")(h)
        h = PReLU(self.fmaps, init=0.0, name="act2")(h) \
            if self.act in (None, "prelu") \
            else getattr(jax.nn, self.act.lower())(h)
        if identity.shape[-1] != self.fmaps:
            identity = Conv1D(self.fmaps, 1, name="resproj")(identity)
        if self.downsample > 1:
            identity = interp_down(identity)
        # even kwidth grows h by `dilation` relative to identity (torch
        # length formula); the reference then broadcasts-adds only when
        # shapes match — configs use odd kwidths here, enforce it
        if h.shape[1] != identity.shape[1]:
            raise ValueError(
                f"FeResBlock kwidth={self.kwidth} (even) yields length "
                f"{h.shape[1]} vs identity {identity.shape[1]} — the "
                "reference torch add would fail identically; use odd "
                "kwidths with resblocks")
        h = h + identity
        norm2 = build_norm(post_norm, self.fmaps, name="norm2")
        if norm2 is not None:
            h = norm2(h, train=train)
        return h


class QRNN(nn.Module):
    """Window-2 QRNN stack (torchqrnn semantics; modules.py:45-60).

    NTC in/out. ``hidden`` is the per-layer hidden size (already doubled by
    the reference's bidirectional quirk upstream in WaveFe).

    ``impl`` selects the ForgetMult evaluation: 'scan' = log-depth
    associative scan (ops/qrnn.py); 'pallas' = the VMEM-carry time-blocked
    kernel (ops/pallas_qrnn.py); 'auto' (default) = pallas on TPU, scan
    elsewhere. Measured on a v5e chip (benchmarks/bench_qrnn.py): pallas
    wins at every PASE shape — 5.8 -> 3.1 ms fwd+bwd at the PASE+
    training shape [96, 200, 512], 14.0 -> 5.7 ms at [8, 4000, 512].
    """
    hidden: int
    layers: int = 1
    impl: str = "auto"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        from pase_tpu.precision import get_compute_dtype
        from pase_tpu.ops.pallas_qrnn import qrnn_pool_pallas, \
            pallas_available
        cd = get_compute_dtype()
        if self.impl == "pallas" or (self.impl == "auto"
                                     and pallas_available()):
            pool = qrnn_pool_pallas
        else:
            pool = qrnn_pool
        h = x
        for li in range(self.layers):
            src = jnp.concatenate([h, shift_right(h)], axis=-1)
            y = nn.Dense(3 * self.hidden, dtype=cd,
                         name=f"layers_{li}_linear")(src)
            h, _ = pool(y.astype(jnp.float32))
            if self.dropout > 0 and li < self.layers - 1:
                # torchqrnn QRNN.forward: F.dropout BETWEEN stacked
                # layers only (the reference's rnn_dropout plumbs into
                # this `dropout=` arg — NOT QRNNLayer zoneout)
                h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return h


class BiRNN(nn.Module):
    """Bidirectional multi-layer LSTM/GRU context block, numerically
    matching ``torch.nn.LSTM/GRU(in, hidden, layers, dropout=...,
    bidirectional=True)`` with zero initial state — the reference's
    non-QRNN ``build_rnn_block`` branch (modules.py:45-60), selected by
    ``WaveFe(rnn_type='lstm'|'gru')`` (frontend.py:55-60,257-262).

    NTC in/out; output features = 2*hidden (fw ++ bw). Parameters use
    torch's layout per direction/layer — w_ih [G*H, in], w_hh [G*H, H],
    b_ih/b_hh [G*H] with torch gate order (LSTM: i,f,g,o; GRU: r,z,n)
    — so torch checkpoints convert by direct copy (checkpoint.py).
    Inter-layer dropout on all but the last layer, like torch.

    TPU shape: the input projection for ALL timesteps is one [B*T, in]
    x [in, G*H] matmul (MXU); only the recurrent half runs in the
    lax.scan."""
    hidden: int
    layers: int = 1
    cell: str = "lstm"        # 'lstm' | 'gru'
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.cell not in ("lstm", "gru"):
            raise TypeError(f"Unrecognized rnn type: {self.cell}")
        gates = 4 if self.cell == "lstm" else 3
        h = x.astype(jnp.float32)
        for li in range(self.layers):
            outs = []
            for d, rev in (("fw", False), ("bw", True)):
                nin = h.shape[-1]
                bound = 1.0 / np.sqrt(self.hidden)
                uni = lambda k, s: jax.random.uniform(
                    k, s, jnp.float32, -bound, bound)
                pfx = f"l{li}_{d}"
                w_ih = self.param(f"{pfx}_w_ih", uni,
                                  (gates * self.hidden, nin))
                w_hh = self.param(f"{pfx}_w_hh", uni,
                                  (gates * self.hidden, self.hidden))
                b_ih = self.param(f"{pfx}_b_ih", uni, (gates * self.hidden,))
                b_hh = self.param(f"{pfx}_b_hh", uni, (gates * self.hidden,))
                seq = jnp.flip(h, axis=1) if rev else h
                # input half for every t at once: [B, T, G*H] (MXU)
                pre = seq @ w_ih.T + b_ih
                y = self._scan(pre, w_hh, b_hh)
                outs.append(jnp.flip(y, axis=1) if rev else y)
            h = jnp.concatenate(outs, axis=-1)
            if self.dropout > 0 and li < self.layers - 1:
                h = nn.Dropout(self.dropout)(h, deterministic=not train)
        return h

    def _scan(self, pre, w_hh, b_hh):
        """Recurrent half over time. pre: [B, T, G*H] -> y [B, T, H]."""
        b = pre.shape[0]
        hid = self.hidden
        h0 = jnp.zeros((b, hid), jnp.float32)

        if self.cell == "lstm":
            c0 = jnp.zeros((b, hid), jnp.float32)

            def step(carry, p_t):
                hprev, cprev = carry
                g = p_t + hprev @ w_hh.T + b_hh
                i, f, gg, o = jnp.split(g, 4, axis=-1)
                c = jax.nn.sigmoid(f) * cprev + \
                    jax.nn.sigmoid(i) * jnp.tanh(gg)
                hh = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (hh, c), hh

            (_, _), ys = jax.lax.scan(step, (h0, c0),
                                      jnp.swapaxes(pre, 0, 1))
        else:
            # torch GRU: n = tanh(W_in x + b_in + r*(W_hn h + b_hn));
            # note b_hn sits INSIDE the r-gate product
            def step(hprev, p_t):
                hh = hprev @ w_hh.T + b_hh
                pr, pz, pn = jnp.split(p_t, 3, axis=-1)
                hr, hz, hn = jnp.split(hh, 3, axis=-1)
                r = jax.nn.sigmoid(pr + hr)
                z = jax.nn.sigmoid(pz + hz)
                n = jnp.tanh(pn + r * hn)
                hcur = (1.0 - z) * n + z * hprev
                return hcur, hcur

            _, ys = jax.lax.scan(step, h0, jnp.swapaxes(pre, 0, 1))
        return jnp.swapaxes(ys, 0, 1)


class Deconv1D(nn.Module):
    """Transposed conv matching torch ConvTranspose1d(stride, padding=pad):
    out = (L-1)*stride - 2*pad + kwidth. Kernel layout [K, Cout, Cin] with
    transpose_kernel=True == torch weights [Cin, Cout, K].transpose(2,1,0)."""
    features: int
    kwidth: int
    stride: int
    pad: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        bound = 1.0 / np.sqrt(self.features * self.kwidth)
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.kwidth, self.features, cin))
        from pase_tpu.precision import get_compute_dtype
        cd = get_compute_dtype()
        xin = x
        if cd is not None and x.dtype == jnp.float32:
            xin = x.astype(cd)
        kin = kernel.astype(xin.dtype)
        # stays in the compute dtype (like conv1d): the decoder chain's
        # 16 kHz activations are the traffic, not the matmuls
        y = jax.lax.conv_transpose(
            xin, kin, strides=(self.stride,),
            padding=[(self.kwidth - 1 - self.pad, self.kwidth - 1 - self.pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            transpose_kernel=True)
        if self.use_bias:
            bias = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class GDeconv1DBlock(nn.Module):
    """Transposed-conv upsampling block (modules.py:558-589)."""
    fmaps: int
    kwidth: int
    stride: int = 4
    norm_type: Optional[str] = None
    act: Optional[str] = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        wfmaps = 2 * self.fmaps if self.act == "glu" else self.fmaps
        pad = max(0, (self.stride - self.kwidth) // -2)
        y = Deconv1D(wfmaps, self.kwidth, self.stride, pad,
                     use_bias=self.use_bias, name="deconv")(x)
        if (self.stride % 2 != 0 and self.kwidth % 2 == 0) or \
           (self.stride % 2 == 0 and self.kwidth % 2 != 0):
            y = y[:, :-1]
        norm = build_norm(self.norm_type, wfmaps)
        if norm is not None:
            y = norm(y, train=train)
        if self.act == "glu":
            z, g = jnp.split(y, 2, axis=-1)
            y = z * jax.nn.sigmoid(g)
        elif self.act is None or self.act == "prelu":
            y = PReLU(self.fmaps, init=0.0, name="act")(y)
        else:
            y = getattr(jax.nn, self.act.lower())(y)
        return y


class VQEMA(nn.Module):
    """VQ-VAE quantizer with EMA codebook updates (modules.py:1080-1147;
    van den Oord et al. 2017 A.1). Codebook/EMA state lives in the
    'batch_stats' collection (updated in training, not by gradients);
    straight-through estimator on the output. Returns
    (loss, quantized, perplexity, encodings)."""
    emb_K: int
    emb_dim: int
    beta: float = 0.25
    gamma: float = 0.99
    eps: float = 1e-5

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        # inputs [B, T, D]
        emb = self.variable("batch_stats", "emb",
                            lambda: jax.random.normal(
                                jax.random.PRNGKey(0),
                                (self.emb_K, self.emb_dim)))
        ema_size = self.variable("batch_stats", "ema_cluster_size",
                                 lambda: jnp.zeros((self.emb_K,)))
        ema_w = self.variable("batch_stats", "ema_w",
                              lambda: jax.random.normal(
                                  jax.random.PRNGKey(1),
                                  (self.emb_K, self.emb_dim)))
        b, t, d = inputs.shape
        flat = inputs.reshape(-1, d)
        e = emb.value
        dist = (jnp.sum(flat ** 2, axis=1, keepdims=True)
                + jnp.sum(e ** 2, axis=1) - 2.0 * flat @ e.T)
        idx = jnp.argmin(dist, axis=1)
        enc = jax.nn.one_hot(idx, self.emb_K)
        if train and not self.is_initializing():
            g = self.gamma
            size = ema_size.value * g + (1 - g) * jnp.sum(enc, axis=0)
            n = jnp.sum(size)
            size = (size + self.eps) / (n + self.emb_K * self.eps) * n
            dw = enc.T @ flat
            new_w = ema_w.value * g + (1 - g) * dw
            ema_size.value = size
            ema_w.value = new_w
            emb.value = new_w / size[:, None]
        q = (enc @ emb.value).reshape(b, t, d)
        e_latent = jnp.mean(jnp.square(jax.lax.stop_gradient(q) - inputs))
        loss = self.beta * e_latent
        q = inputs + jax.lax.stop_gradient(q - inputs)
        avg_probs = jnp.mean(enc, axis=0)
        pp = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
        return loss, q, pp, enc


class PatternedDropout(nn.Module):
    """Dropout restricted to a fixed channel subset for the whole training
    session (modules.py:407-525): 'fixed_rand' drops only a random-at-init
    subset of ratio_fixed*emb channels; 'fixed_given' a beg:end range;
    'std' is plain dropout. drop_whole_channels zeroes whole channels per
    sample instead of per (sample, time)."""
    emb_size: int
    p: float = 0.5
    dropout_mode: str = "fixed_rand"
    ratio_fixed: Optional[float] = None
    range_fixed: Optional[str] = None
    drop_whole_channels: bool = False
    seed: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.p <= 0 or not train:
            return x
        if self.dropout_mode == "std":
            return nn.Dropout(self.p, deterministic=False)(x)
        if self.dropout_mode == "fixed_rand":
            assert self.ratio_fixed is not None
            n_drop = int(self.emb_size - self.emb_size * self.ratio_fixed)
            rng = np.random.RandomState(self.seed)
            sel = np.sort(rng.choice(self.emb_size, size=n_drop,
                                     replace=False))
        elif self.dropout_mode == "fixed_given":
            beg, end = (int(v) for v in self.range_fixed.split(":")[:2])
            sel = np.setdiff1d(np.arange(self.emb_size),
                               np.arange(beg, end))
        else:
            raise ValueError(self.dropout_mode)
        chan_mask = np.zeros((self.emb_size,), np.float32)
        chan_mask[sel] = 1.0
        chan_mask = jnp.asarray(chan_mask)           # 1 = droppable
        key = self.make_rng("dropout")
        scale = 1.0 / (1.0 - self.p)
        if self.drop_whole_channels:
            keep = jax.random.bernoulli(
                key, 1.0 - self.p, (x.shape[0], 1, self.emb_size))
        else:
            keep = jax.random.bernoulli(
                key, 1.0 - self.p,
                (x.shape[0], x.shape[1], self.emb_size))
        factor = jnp.where(chan_mask > 0,
                           keep.astype(x.dtype) * scale, 1.0)
        return x * factor


class MLPBlock(nn.Module):
    """1x1(/context) conv + PReLU + dropout head block (modules.py:527-556)."""
    fmaps: int
    context: int = 1
    tie_context_weights: bool = False
    dout: float = 0.0
    din: float = 0.0
    dropin_mode: str = "std"
    ratio_fixed: Optional[float] = None
    range_fixed: Optional[str] = None
    drop_channels: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.context % 2 != 0, self.context
        if self.din > 0 and train:
            x = PatternedDropout(emb_size=x.shape[-1], p=self.din,
                                 dropout_mode=self.dropin_mode,
                                 ratio_fixed=self.ratio_fixed,
                                 range_fixed=self.range_fixed,
                                 drop_whole_channels=self.drop_channels,
                                 name="din")(x, train=train)
        if self.tie_context_weights:
            h = Conv1D(self.fmaps, 1, name="W")(x)
            # avg-pool over context, stride 1, count_include_pad=False
            c = self.context
            p = c // 2
            ones = jnp.ones_like(h[..., :1])
            hp = jnp.pad(h, ((0, 0), (p, p), (0, 0)))
            cnt = jnp.pad(ones, ((0, 0), (p, p), (0, 0)))
            num = sum(hp[:, i:i + h.shape[1]] for i in range(c))
            den = sum(cnt[:, i:i + h.shape[1]] for i in range(c))
            h = num / den
        else:
            if self.context > 1:
                x = jnp.pad(x, ((0, 0), (self.context // 2, self.context // 2),
                                (0, 0)))
            h = Conv1D(self.fmaps, self.context, name="W")(x)
        h = PReLU(self.fmaps, init=0.25, name="act")(h)
        if self.dout > 0 and train:
            h = nn.Dropout(self.dout, deterministic=False)(h)
        return h
