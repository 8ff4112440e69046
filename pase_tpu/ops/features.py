"""On-device worker-target feature extraction (batched JAX ops).

Replaces the reference's per-sample CPU transform stack
(/root/reference/pase/transforms.py:439-999) with fused XLA ops running on
the accelerator inside (or alongside) the train step. Each extractor maps
``wav [B, T] -> [B, T//hop, dim]`` (NTC; the reference is [dim, T//hop]
per-sample). Feature parity notes per extractor below.

Delta features: librosa.feature.delta is a Savitzky-Golay filter with
``mode='interp'`` edge handling. That is a *linear* map of the frame axis,
so we materialize it once (host-side, scipy) as an exact [T, T] operator
and apply it as a single matmul — exact librosa parity including edges,
MXU-friendly.
"""

import functools
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pase_tpu.ops.signal import frame_signal, stft_mag, fft_convolve_full

# ---------------------------------------------------------------------------
# delta operator (librosa.feature.delta parity)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _delta_matrix(n_frames: int, order: int, width: int = 9) -> np.ndarray:
    """Exact [T, T] operator equal to librosa.feature.delta(eye(T))."""
    from scipy.signal import savgol_filter
    eye = np.eye(n_frames, dtype=np.float64)
    d = savgol_filter(eye, width, polyorder=order, deriv=order,
                      axis=0, mode="interp")
    # column j of d is the response to an impulse at frame j, so the
    # operator is applied as delta = d @ feats_frames
    return d.astype(np.float32)


def add_deltas(feats, der_order: int = 2):
    """[B, T, D] -> [B, T, D*(1+der_order)] (librosa delta semantics,
    transforms.py:471-475 concat order: [x, d1, d2])."""
    if der_order <= 0:
        return feats
    t = feats.shape[1]
    outs = [feats]
    for n in range(1, der_order + 1):
        dmat = jnp.asarray(_delta_matrix(t, n))
        outs.append(jnp.einsum("st,btd->bsd", dmat, feats,
                               precision=jax.lax.Precision.HIGHEST))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# mel / dct helpers (host-side constant construction)
# ---------------------------------------------------------------------------


def hz_to_mel(f, htk=False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = f >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(f, 1e-10) /
                                                min_log_hz) / logstep, mels)
    return mels


def mel_to_hz(m, htk=False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = m >= min_log_mel
    return np.where(log_t, min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=32)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: Optional[float] = None, htk: bool = False,
                   norm: Optional[str] = "slaney") -> np.ndarray:
    """[n_mels, n_fft//2+1] triangular filterbank (librosa.filters.mel
    construction for htk=False/norm='slaney'; python_speech_features for
    htk=True/norm=None)."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = n_fft // 2 + 1
    fftfreqs = np.linspace(0, sr / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk),
                          n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)
    weights = np.zeros((n_mels, n_bins))
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix [n_out, n_in] (scipy.fft.dct norm='ortho')."""
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    mat = np.cos(np.pi * k * (2 * n + 1) / (2 * n_in)) * np.sqrt(2.0 / n_in)
    mat[0] *= 1.0 / np.sqrt(2.0)
    return mat.astype(np.float32)


@functools.lru_cache(maxsize=8)
def hann_window(n: int) -> np.ndarray:
    """Periodic Hann (scipy get_window('hann', n, fftbins=True))."""
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)).astype(np.float32)


# ---------------------------------------------------------------------------
# extractors
# ---------------------------------------------------------------------------


def lps(wav, n_fft=2048, hop=160, win=400, der_order=2, **_):
    """Log power spectrum, torch.stft conventions (transforms.py:439-487):
    rectangular length-``win`` window, centered reflect pad,
    10*log10(mag^2 + 1e-19), + deltas."""
    n_frames = wav.shape[-1] // hop
    mag = stft_mag(wav, n_fft, hop, win, window=None, center=True,
                   pad_mode="reflect", n_frames=n_frames)
    x = 10.0 * jnp.log10(jnp.square(mag) + 10e-20)
    return add_deltas(x, der_order)


def mfcc(wav, hop=160, order=13, sr=16000, win=400, der_order=2,
         n_mels=128, htk=False, **_):
    """librosa.feature.mfcc defaults (transforms.py:671-722): n_fft = win,
    hann window, centered reflect pad, power mel spectrogram (n_mels=128,
    slaney), power_to_db with per-sample top_db=80, ortho DCT-II."""
    n_fft = win
    n_frames = wav.shape[-1] // hop
    mag = stft_mag(wav, n_fft, hop, n_fft, window=hann_window(n_fft),
                   center=True, pad_mode="reflect", n_frames=n_frames)
    power = jnp.square(mag)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, 0.0, sr / 2.0,
                                    htk=htk, norm="slaney"))
    mels = jnp.einsum("mf,btf->btm", fb, power,
                      precision=jax.lax.Precision.HIGHEST)
    db = 10.0 * jnp.log10(jnp.maximum(mels, 1e-10))
    # librosa power_to_db top_db: clamp below (max - 80); the reference
    # computes it per chunk (per sample here)
    mx = jnp.max(db, axis=(1, 2), keepdims=True)
    db = jnp.maximum(db, mx - 80.0)
    dct = jnp.asarray(dct_matrix(order, n_mels))
    cc = jnp.einsum("om,btm->bto", dct, db,
                    precision=jax.lax.Precision.HIGHEST)
    return add_deltas(cc, der_order)


@functools.lru_cache(maxsize=8)
def psf_mel_filterbank(rate: int, n_fft: int, n_filters: int) -> np.ndarray:
    """python_speech_features.get_filterbanks EXACTLY: HTK mel points,
    triangles built on floor-quantized FFT bin indices (not continuous
    frequency ramps)."""
    def hz2mel(hz):
        return 2595.0 * np.log10(1.0 + hz / 700.0)

    def mel2hz(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    melpts = np.linspace(hz2mel(0.0), hz2mel(rate / 2.0), n_filters + 2)
    bin = np.floor((n_fft + 1) * mel2hz(melpts) / rate)
    fb = np.zeros((n_filters, n_fft // 2 + 1), np.float32)
    for j in range(n_filters):
        for i in range(int(bin[j]), int(bin[j + 1])):
            fb[j, i] = (i - bin[j]) / (bin[j + 1] - bin[j])
        for i in range(int(bin[j + 1]), int(bin[j + 2])):
            fb[j, i] = (bin[j + 2] - i) / (bin[j + 2] - bin[j + 1])
    return fb


def fbanks(wav, n_filters=40, n_fft=512, hop=160, win=400, rate=16000,
           der_order=2, preemph=0.97, **_):
    """python_speech_features.logfbank (transforms.py:489-548): signal
    preemphasis (psf default 0.97), rectangular window, NOT centered
    (frames start at 0, zero pad at end), power spectrum /n_fft,
    floor-quantized HTK-mel triangles (psf get_filterbanks), log with
    eps floor; deltas computed on the psf frame count, THEN
    replicate-padded to T//hop frames (the reference's order)."""
    t = wav.shape[-1]
    expected = t // hop
    if preemph:
        wav = jnp.concatenate([wav[..., :1],
                               wav[..., 1:] - preemph * wav[..., :-1]],
                              axis=-1)
    psf_frames = 1 if t <= win else 1 + int(np.ceil((t - win) / hop))
    frames = frame_signal(wav, win, hop, n_frames=psf_frames, pad_end=True)
    mag = jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=-1))
    power = jnp.square(mag) / n_fft
    fb = jnp.asarray(psf_mel_filterbank(rate, n_fft, n_filters))
    feat = jnp.einsum("mf,btf->btm", fb, power,
                      precision=jax.lax.Precision.HIGHEST)
    feat = jnp.log(jnp.maximum(feat, np.finfo(np.float32).eps))
    feat = add_deltas(feat, der_order)
    if psf_frames < expected:
        last = feat[:, -1:]
        feat = jnp.concatenate([feat] +
                               [last] * (expected - psf_frames), axis=1)
    else:
        feat = feat[:, :expected]
    return feat


# -- gammatone ---------------------------------------------------------------


def erb_centre_freqs(fs: int, n_channels: int, f_min: float) -> np.ndarray:
    """Slaney/Glasberg-Moore ERB-spaced centre freqs, descending from fs/2
    (gammatone package centre_freqs semantics)."""
    ear_q, min_bw = 9.26449, 24.7
    i = np.arange(1, n_channels + 1)
    hi, lo = fs / 2.0, f_min
    cf = -(ear_q * min_bw) + np.exp(
        i * (-np.log(hi + ear_q * min_bw) + np.log(lo + ear_q * min_bw))
        / n_channels) * (hi + ear_q * min_bw)
    return cf


@functools.lru_cache(maxsize=8)
def gammatone_fir_bank(fs: int, n_channels: int, f_min: float,
                       n_taps: int = 512) -> np.ndarray:
    """[n_channels, n_taps] FIR truncation of the 4th-order gammatone
    impulse response g(t) = t^3 exp(-2 pi b t) cos(2 pi f t), b = 1.019*ERB.

    TPU-native replacement for the reference's IIR cascade (gammatone
    package, transforms.py:550-613): FIR -> one batched FFT conv. Peak
    filter gain normalized to 1 to match the cascade's unity passband.
    """
    cf = erb_centre_freqs(fs, n_channels, f_min)
    t = np.arange(n_taps) / fs
    erb = 24.7 * (4.37 * cf / 1000.0 + 1.0)
    b = 1.019 * erb
    ir = (t[None, :] ** 3) * np.exp(-2 * np.pi * b[:, None] * t[None, :]) \
        * np.cos(2 * np.pi * cf[:, None] * t[None, :])
    # normalize to unit peak magnitude response at centre frequency
    nfft = 4 * n_taps
    H = np.abs(np.fft.rfft(ir, n=nfft, axis=1))
    peak = H.max(axis=1, keepdims=True)
    ir = ir / np.maximum(peak, 1e-12)
    return ir.astype(np.float32)


def gammatone(wav, f_min=500, n_channels=40, hop=160, win=400, rate=16000,
              der_order=2, **_):
    """gtgram-style log gammatone energies (transforms.py:550-613):
    filterbank -> windowed RMS of power -> log(+1e-10), replicate pad to
    T//hop frames."""
    t = wav.shape[-1]
    expected = t // hop
    bank = jnp.asarray(gammatone_fir_bank(rate, n_channels, float(f_min)))
    # causal FIR: pad left K-1, valid s2d conv (MXU path; FFT conv is
    # slow on TPU) -> [B, T, C]
    k = bank.shape[1]
    xp = jnp.pad(wav, ((0, 0), (k - 1, 0)))[..., None]
    from pase_tpu.nn import _s2d_bank_conv
    # conv1d is cross-correlation; reverse the IRs for true causal conv
    filtered = _s2d_bank_conv(xp, bank[:, ::-1], r=8)   # [B, T, C]
    power = jnp.square(filtered)                         # [B, T, C]
    ncols = (t - win) // hop + 1
    # windowed mean WITHOUT materializing [B, F, win, C] frames (2 GB for
    # win=2048): hierarchical box sum, one pass, channels kept on the lane
    # axis so no layout transpose is needed (ops/signal.py)
    from pase_tpu.ops.signal import framed_box_mean_ntc
    y = jnp.sqrt(framed_box_mean_ntc(power, win, hop, n_frames=ncols))
    y = jnp.log(y + 1e-10)                         # [B, F, C]
    # deltas on the gtgram frame count, then replicate-pad (the
    # reference computes librosa deltas BEFORE padding,
    # transforms.py:586-600)
    y = add_deltas(y, der_order)
    if ncols < expected:
        y = jnp.concatenate([y] + [y[:, -1:]] * (expected - ncols), axis=1)
    else:
        y = y[:, :expected]
    return y


# -- prosody -----------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _iacf_mat_np(nfft: int, lag_max: int) -> np.ndarray:
    """[nfft//2+1, lag_max+1] inverse-rFFT cosine matrix restricted to the
    first lag_max+1 lags (exact irfft rows for a real even spectrum)."""
    k = np.arange(nfft // 2 + 1)[:, None]
    l = np.arange(lag_max + 1)[None, :]
    m = np.cos(2 * np.pi * k * l / nfft) * 2.0 / nfft
    m[0] *= 0.5
    m[-1] *= 0.5
    return m.astype(np.float32)


def _iacf_mat(nfft, lag_max):
    return jnp.asarray(_iacf_mat_np(nfft, lag_max))


def _dft_mats_cached(win, n_fft):
    # signal._dft_mats is already lru_cache'd — no second cache layer
    from pase_tpu.ops.signal import _dft_mats
    c, s = _dft_mats(win, n_fft)
    return jnp.asarray(c), jnp.asarray(s)


def _autocorr_f0(wav, sr, hop, n_frames, f0_min, f0_max, frame_len=1024,
                 voicing_thresh=0.35):
    """Batched normalized-autocorrelation F0 with voicing decision.

    TPU-native replacement for pysptk SWIPE' (transforms.py:950-954):
    centered frames, FFT autocorrelation, peak lag in [sr/f0_max,
    sr/f0_min], voiced iff normalized ACF peak > threshold and frame has
    energy. Returns (f0 [B, F], uv [B, F]).
    """
    half = frame_len // 2
    x = jnp.pad(wav, ((0, 0), (half, half)), mode="reflect")
    frames = frame_signal(x, frame_len, hop, n_frames=n_frames)  # [B,F,L]
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    w = jnp.asarray(hann_window(frame_len))
    fw = frames * w
    nfft = 2 * frame_len
    lag_min = int(np.floor(sr / f0_max))
    lag_max = int(np.ceil(sr / f0_min))
    lag_max = min(lag_max, frame_len - 1)
    # Wiener-Khinchin ACF, but only lags [0, lag_max] are ever used: the
    # power spectrum comes from the matmul-DFT (no FFT unit on TPU) and
    # the inverse transform is a small [n_bins, lag_max+1] cosine matmul
    # (acf[l] = (P[0] + 2*sum_k P[k] cos(2 pi k l / nfft) + (-1)^l P[N/2])
    #           / nfft for real-even spectra).
    c, s = _dft_mats_cached(frame_len, nfft)
    # HIGHEST: the voicing decision thresholds the normalized ACF peak —
    # TPU-default bf16 matmuls flip frames near the threshold vs the
    # f32 values the tests pin
    hp = jax.lax.Precision.HIGHEST
    re = jnp.matmul(fw, c, precision=hp)
    im = jnp.matmul(fw, s, precision=hp)
    power = re * re + im * im                       # [B, F, nfft//2+1]
    icos = _iacf_mat(nfft, lag_max)
    acf = jnp.matmul(power, icos, precision=hp)     # [B, F, lag_max+1]
    acf0 = jnp.maximum(acf[..., :1], 1e-10)
    nacf = acf / acf0
    lags = np.arange(lag_min, lag_max + 1)
    window = nacf[..., lag_min:lag_max + 1]
    best = jnp.argmax(window, axis=-1)
    peak = jnp.take_along_axis(window, best[..., None], axis=-1)[..., 0]
    f0 = sr / (best + lag_min).astype(jnp.float32)
    energy = acf[..., 0] / frame_len
    voiced = (peak > voicing_thresh) & (energy > 1e-7)
    return jnp.where(voiced, f0, 0.0), voiced.astype(jnp.float32)


def _interpolate_unvoiced(lf0, uv):
    """Linear interpolation of log-F0 across unvoiced gaps with edge hold
    (ahoproc_tools.interpolate.interpolation semantics,
    transforms.py:961). [B, F] static-shape implementation via cummax-style
    gather of previous/next voiced frames."""
    b, f = lf0.shape
    idx = jnp.arange(f)[None, :]
    big = f + 1
    # index of previous voiced frame (or -1)
    prev = jnp.where(uv > 0, idx, -1)
    prev = jax.lax.associative_scan(jnp.maximum, prev, axis=1)
    # index of next voiced frame (or f)
    nxt = jnp.where(uv > 0, idx, big)
    nxt = jnp.flip(jax.lax.associative_scan(
        jnp.minimum, jnp.flip(nxt, axis=1), axis=1), axis=1)
    prev_c = jnp.clip(prev, 0, f - 1)
    nxt_c = jnp.clip(nxt, 0, f - 1)
    v_prev = jnp.take_along_axis(lf0, prev_c, axis=1)
    v_next = jnp.take_along_axis(lf0, nxt_c, axis=1)
    has_prev = prev >= 0
    has_next = nxt < big
    denom = jnp.maximum(nxt - prev, 1)
    wgt = (idx - prev) / denom
    interp = v_prev * (1 - wgt) + v_next * wgt
    out = jnp.where(has_prev & has_next, interp,
                    jnp.where(has_prev, v_prev,
                              jnp.where(has_next, v_next, lf0)))
    return jnp.where(uv > 0, lf0, out)


def prosody(wav, hop=160, win=320, f0_min=60, f0_max=300, sr=16000,
            der_order=2, **_):
    """4-dim prosody targets (transforms.py:919-999): [interp logF0, uv,
    rms energy, zcr] + deltas.

    * logF0: autocorrelation tracker (SWIPE' replacement), log(f0+1e-10),
      unvoiced frames linearly interpolated; all-unvoiced chunks fall back
      to log(f0_min) (transforms.py:964-966).
    * energy: librosa.feature.rmse (centered, constant pad).
    * zcr: librosa.feature.zero_crossing_rate (centered, edge pad).
    """
    t = wav.shape[-1]
    n_frames = t // hop
    f0, uv = _autocorr_f0(wav, sr, hop, n_frames, f0_min, f0_max)
    lf0 = jnp.log(f0 + 1e-10)
    lf0 = _interpolate_unvoiced(lf0, uv)
    all_unvoiced = jnp.sum(uv, axis=1, keepdims=True) == 0
    lf0 = jnp.where(all_unvoiced, np.log(f0_min), lf0)

    half = win // 2
    xp = jnp.pad(wav, ((0, 0), (half, half)), mode="constant")
    frames = frame_signal(xp, win, hop, n_frames=n_frames)
    egy = jnp.sqrt(jnp.mean(jnp.square(frames), axis=-1))

    xe = jnp.pad(wav, ((0, 0), (half, half)), mode="edge")
    fz = frame_signal(xe, win, hop, n_frames=n_frames)
    sign = fz >= 0
    crossings = jnp.sum(sign[..., 1:] != sign[..., :-1], axis=-1)
    zcr = crossings.astype(jnp.float32) / win

    feats = jnp.stack([lf0, uv, egy, zcr], axis=-1)   # [B, F, 4]
    return add_deltas(feats, der_order)


# -- LPC ----------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _sptk_hamming(n: int) -> np.ndarray:
    """SPTK hamming (pysptk.hamming): standard symmetric Hamming."""
    return (0.54 - 0.46 * np.cos(2 * np.pi * np.arange(n) / (n - 1))
            ).astype(np.float32)


def lpc(wav, order=25, hop=160, win=320, **_):
    """Linear prediction coefficients per frame via Levinson-Durbin
    (pysptk.sptk.lpc replacement, transforms.py:615-669): frames windowed
    with Hamming, autocorrelation from the power spectrum, [gain,
    a_1..a_order] per frame. [B, T] -> [B, T//hop, order+1]."""
    b, t = wav.shape
    n_frames = t // hop
    # reference framing: frames start at beg_i = k*hop, length win,
    # zero-padded at the end (transforms.py:626-639 + range step hop)
    frames = frame_signal(wav, win, hop, n_frames=n_frames, pad_end=True)
    frames = frames * jnp.asarray(_sptk_hamming(win))
    nfft = int(2 ** np.ceil(np.log2(2 * win)))
    spec = jnp.abs(jnp.fft.rfft(frames, n=nfft)) ** 2
    r = jnp.fft.irfft(spec, n=nfft)[..., :order + 1]     # [B, F, order+1]
    r = r + 1e-9 * r[..., :1] + 1e-12                    # regularize
    from pase_tpu.ops.signal import levinson
    a, e = levinson(r, order)
    gain = jnp.sqrt(jnp.maximum(e, 1e-20))
    return jnp.concatenate([gain[..., None], a[..., 1:]], axis=-1)


# ---------------------------------------------------------------------------
# registry / worker-name dispatch (mirrors train.py:37-136)
# ---------------------------------------------------------------------------

def _kaldimfcc(*a, **k):
    from pase_tpu.ops.kaldi_feats import kaldi_mfcc
    return kaldi_mfcc(*a, **k)


def _kaldiplp(*a, **k):
    from pase_tpu.ops.kaldi_feats import kaldi_plp
    return kaldi_plp(*a, **k)


# NOTE: dict order matters for substring dispatch (kaldimfcc before mfcc)
_FEATURE_BUILDERS = {
    "lps": lps,
    "fbank": fbanks,
    "gtn": gammatone,
    "kaldimfcc": _kaldimfcc,   # featbin reimplementation (SURVEY §2.9)
    "kaldiplp": _kaldiplp,
    "mfcc": mfcc,
    "prosody": prosody,
    "lpc": lpc,
}


def feature_fn_for_worker(name: str, transform_cfg: Optional[dict] = None,
                          hop: int = 160) -> Optional[Callable]:
    """Resolve a worker name to its target extractor, replicating the
    substring dispatch of the reference's make_transforms. Returns None for
    workers without a signal-feature target (mi/cmi/spc/gap/overlap/chunk/
    cchunk/regularizers)."""
    skip = ("mi", "cmi", "spc", "gap", "overlap", "chunk", "cchunk")
    if name in skip or "regu" in name or "wavernn" in name:
        # wavernn's target is the clean waveform itself (batch cchunk)
        return None
    cfg = dict(transform_cfg or {})
    cfg["hop"] = hop
    for key, fn in _FEATURE_BUILDERS.items():
        if key in name:
            return functools.partial(fn, **cfg)
    raise TypeError(f"Unrecognized worker feature '{name}'")


def feature_dim_for_worker(name: str, transform_cfg: Optional[dict] = None,
                           der_order: int = 2) -> Optional[int]:
    """Static output dim of a worker's target features."""
    cfg = dict(transform_cfg or {})
    mult = 1 + cfg.get("der_order", der_order)
    if "lps" in name:
        return (cfg.get("n_fft", 2048) // 2 + 1) * mult
    if "fbank" in name:
        return cfg.get("n_filters", 40) * mult
    if "gtn" in name:
        return cfg.get("n_channels", 40) * mult
    if "kaldimfcc" in name:
        return cfg.get("num_ceps", 13) * mult
    if "kaldiplp" in name:
        return cfg.get("num_ceps", 20) * mult
    if "mfcc" in name:
        return cfg.get("order", 13) * mult
    if "prosody" in name:
        return 4 * mult
    if "lpc" in name:
        return cfg.get("order", 25) + 1
    return None
