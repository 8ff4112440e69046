"""Batched signal primitives: framing, FFT convolution, resampling.

All functions operate on [B, T] waveforms (or [B, T, C] feature maps) with
static shapes — jit/vmap friendly, no data-dependent control flow.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def frame_signal(x, frame_len: int, hop: int, n_frames: int = None,
                 pad_end: bool = False):
    """Frame [B, T] -> [B, n_frames, frame_len] (stride trick via gather).

    Frames start at t*hop. If n_frames is None it is the max number of
    complete frames; with pad_end the signal is zero-padded to fit.
    """
    b, t = x.shape
    if n_frames is None:
        if pad_end:
            n_frames = int(np.ceil(max(t - frame_len, 0) / hop)) + 1
        else:
            n_frames = (t - frame_len) // hop + 1
    need = (n_frames - 1) * hop + frame_len
    if need > t:
        x = jnp.pad(x, ((0, 0), (0, need - t)))
    idx = (np.arange(n_frames)[:, None] * hop +
           np.arange(frame_len)[None, :])                 # [F, L]
    return x[:, idx]                                       # [B, F, L]


def framed_box_mean(x, win: int, hop: int, n_frames: int):
    """Mean over sliding windows: out[b, t] = mean(x[b, t*hop : t*hop+win])
    for t in [0, n_frames), zero-padding past the end.

    Equivalent to ``frame_signal(x, win, hop, n_frames).mean(-1)`` but
    WITHOUT materializing the [B, F, win] frame tensor (for overlapping
    windows, e.g. the gammatone win=2048/hop=160 energy pooling, that
    tensor is win/hop times the input — gigabytes). Hierarchical exact
    summation: per-hop bin sums, a cumulative sum over bins, plus a
    partial-head bin for win % hop != 0. One pass over the data.
    """
    return framed_box_mean_ntc(x[:, :, None], win, hop, n_frames)[..., 0]


def framed_box_mean_ntc(x, win: int, hop: int, n_frames: int):
    """framed_box_mean over axis 1 of an NTC tensor [B, T, C].

    Same hierarchical box-sum as :func:`framed_box_mean` but with channels
    kept on the trailing (lane) axis, so callers with NTC-layout inputs
    (e.g. the gammatone filterbank output) need NO layout transpose around
    the pooling — on TPU the [B, T, C] -> [B, C, T] copy is a full extra
    pass of the tensor through HBM.
    """
    assert win >= hop, "framed_box_mean requires win >= hop"
    b, t, c = x.shape
    nbins_full = win // hop
    rem = win - nbins_full * hop
    # cover the last window: start (n_frames-1)*hop, end + win
    need = (n_frames - 1) * hop + win
    nbins = -(-need // hop)                     # ceil
    if nbins * hop > t:
        x = jnp.pad(x, ((0, 0), (0, nbins * hop - t), (0, 0)))
    xb = x[:, :nbins * hop].reshape(b, nbins, hop, c)
    bins = jnp.sum(xb, axis=2)                               # [B, nbins, C]
    heads = jnp.sum(xb[:, :, :rem], axis=2) if rem else None  # [B, nbins, C]
    cs = jnp.cumsum(bins, axis=1)
    cs = jnp.concatenate([jnp.zeros((b, 1, c), x.dtype), cs], axis=1)
    idx = np.arange(n_frames)
    # window t = bins [t, t+nbins_full) + first `rem` samples of bin
    # t + nbins_full
    out = cs[:, idx + nbins_full] - cs[:, idx]
    if rem:
        out = out + heads[:, idx + nbins_full]
    return out / win


@functools.lru_cache(maxsize=16)
def _dft_mats(win: int, n_fft: int):
    """Real-DFT cos/sin matrices [win, n_fft//2+1] (frames are zero-padded
    to n_fft, so only the first `win` rows matter). TPU has no FFT unit —
    evaluating small DFTs as two MXU matmuls is faster than jnp.fft."""
    n = np.arange(win)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    return np.cos(ang).astype(np.float32), -np.sin(ang).astype(np.float32)


def stft_mag(wav, n_fft: int, hop: int, win: int, window=None,
             center: bool = True, pad_mode: str = "reflect",
             n_frames: int = None, use_matmul: bool = None):
    """Magnitude STFT matching torch.stft / librosa.stft conventions.

    torch.stft zero-pads the length-``win`` window symmetrically to
    ``n_fft`` before multiplying the n_fft-long frame; because only the
    magnitude is used, this equals an rFFT(n=n_fft) of the length-``win``
    frame centered at t*hop (a pure phase shift). We exploit that to frame
    only ``win`` samples (/root/reference/pase/transforms.py:467-469).

    Args:
      wav: [B, T].
      window: None (rectangular, torch default) or [win] window array.
    Returns: [B, F, n_fft//2+1] magnitudes with F = T//hop (+1 if exact).
    """
    b, t = wav.shape
    if n_frames is None:
        n_frames = t // hop
    if center:
        half = win // 2
        wav = jnp.pad(wav, ((0, 0), (half, half)), mode=pad_mode)
    frames = frame_signal(wav, win, hop, n_frames=n_frames)
    if window is not None:
        frames = frames * jnp.asarray(window)
    if use_matmul is None:
        use_matmul = n_fft <= 4096
    if use_matmul:
        # HIGH (3-pass bf16, ~f32-equivalent for these dynamic ranges):
        # the TPU DEFAULT single-pass bf16 put ~8-bit mantissa noise into
        # log-power targets, diverging production values from the f32
        # ones the tests verify; HIGHEST costs ~2x more for no measured
        # target difference
        c, s = _dft_mats(win, n_fft)
        re = jnp.matmul(frames, jnp.asarray(c),
                        precision=jax.lax.Precision.HIGH)
        im = jnp.matmul(frames, jnp.asarray(s),
                        precision=jax.lax.Precision.HIGH)
        return jnp.sqrt(re * re + im * im + 1e-30)
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    return jnp.abs(spec)


def fft_convolve_full(x, h):
    """'full' 1-D convolution of [B, T] with [B, K] (or [K]) via rFFT."""
    if h.ndim == 1:
        h = h[None]
    t, k = x.shape[-1], h.shape[-1]
    n = t + k - 1
    nfft = int(2 ** np.ceil(np.log2(n)))
    X = jnp.fft.rfft(x, n=nfft)
    H = jnp.fft.rfft(h, n=nfft)
    y = jnp.fft.irfft(X * H, n=nfft)
    return y[..., :n]


def shift_signal(x, n):
    """Shift along last axis filling with zeros (transforms.py:1053-1061).
    Positive n shifts right; negative shifts left. Static n."""
    if n == 0:
        return x
    if n > 0:
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(n, 0)])[..., :-n]
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, -n)])[..., -n:]


def dynamic_shift(x, n):
    """Per-sample dynamic right-shift of [B, T] by n [B] >= 0, zero fill."""
    t = x.shape[-1]
    idx = jnp.arange(t)[None, :] - n[:, None]
    valid = idx >= 0
    idx = jnp.clip(idx, 0, t - 1)
    return jnp.where(valid, jnp.take_along_axis(x, idx, axis=-1), 0.0)


def linear_resample(x, scale, out_len: int):
    """Linear-interpolation resample of [B, T] to out_len with per-sample
    scale [B] (output[i] = x[i * (T-1)/(out_len-1) * scale-ish]).

    Used for speed-perturbation-style distortions; matches
    F.interpolate(mode='linear', align_corners=True) when scale==1 ratio.
    """
    t = x.shape[-1]
    pos = jnp.arange(out_len)[None, :] * scale[:, None]
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    w = pos - lo
    xlo = jnp.take_along_axis(x, lo, axis=-1)
    xhi = jnp.take_along_axis(x, hi, axis=-1)
    return xlo * (1 - w) + xhi * w


def levinson(r, order: int):
    """Levinson-Durbin recursion, statically unrolled over the order.

    r [..., order+1] autocorrelation (caller regularizes r[0]) ->
    (a [..., order+1] with a[0]=1, e [...] final prediction error).
    Shared by ops.features.lpc and ops.kaldi_feats.kaldi_plp.
    """
    a = jnp.zeros(r.shape[:-1] + (order + 1,)).at[..., 0].set(1.0)
    e = r[..., 0]
    for i in range(1, order + 1):
        acc = r[..., i]
        for j in range(1, i):
            acc = acc + a[..., j] * r[..., i - j]
        k = -acc / e
        new_a = a
        for j in range(1, i):
            new_a = new_a.at[..., j].add(k * a[..., i - j])
        a = new_a.at[..., i].set(k)
        e = e * (1.0 - k * k)
    return a, e
