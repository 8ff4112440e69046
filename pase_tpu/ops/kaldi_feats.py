"""Kaldi-style MFCC / PLP worker targets, on-device.

JAX reimplementation of the compute-mfcc-feats / compute-plp-feats
pipelines that the reference shells out to
(/root/reference/pase/transforms.py:781-917 via kaldi_io; SURVEY §2.9
says: "featbin: reimplement MFCC/PLP in JAX"). Defaults mirror the
reference's KaldiMFCC flags: --use-energy=false --snip-edges=false,
frame 25 ms / shift 10 ms, dither off (determinism on device).

MFCC: DC removal -> preemphasis 0.97 -> povey window -> power spectrum
-> kaldi-mel filterbank -> log -> DCT-II(ortho) -> cepstral lifter 22.
PLP: bark-ish trapezoid bins via the same mel bank (documented
approximation), equal-loudness + intensity^(1/3) compression -> IDFT
autocorrelation -> Levinson-Durbin -> cepstral recursion -> lifter.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pase_tpu.ops.signal import frame_signal
from pase_tpu.ops.features import mel_filterbank, dct_matrix


@functools.lru_cache(maxsize=4)
def _povey_window(n: int) -> np.ndarray:
    return ((0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1)))
            ** 0.85).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _lifter(num_ceps: int, q: float = 22.0) -> np.ndarray:
    i = np.arange(num_ceps)
    return (1.0 + 0.5 * q * np.sin(np.pi * i / q)).astype(np.float32)


def _kaldi_frames(wav, win: int, hop: int):
    """snip-edges=false framing: frame t centered at t*hop + hop/2,
    reflected edges; n_frames = T//hop (cropped to match the worker
    grid, matching the reference's [:, :max_frames])."""
    b, t = wav.shape
    n_frames = t // hop
    left = (win - hop) // 2
    x = jnp.pad(wav, ((0, 0), (left, win)), mode="reflect")
    return frame_signal(x, win, hop, n_frames=n_frames)


def _preemphasized_windowed(frames, preemph=0.97, window=None):
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)  # remove DC
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - preemph * prev
    if window is not None:
        frames = frames * window
    return frames


def kaldi_mfcc(wav, hop=160, win=400, sr=16000, num_mel_bins=40,
               num_ceps=13, der_order=2, cepstral_lifter=22.0, **_):
    """[B, T] -> [B, T//hop, num_ceps*(1+der_order)]."""
    from pase_tpu.ops.features import add_deltas
    frames = _kaldi_frames(wav, win, hop)
    frames = _preemphasized_windowed(frames,
                                     window=jnp.asarray(_povey_window(win)))
    n_fft = int(2 ** np.ceil(np.log2(win)))
    spec = jnp.abs(jnp.fft.rfft(frames, n=n_fft)) ** 2
    fb = jnp.asarray(mel_filterbank(sr, n_fft, num_mel_bins,
                                    fmin=20.0, fmax=sr / 2.0 - 400.0,
                                    htk=True, norm=None))
    mels = jnp.einsum("mf,btf->btm", fb, spec,
                      precision=jax.lax.Precision.HIGHEST)
    logm = jnp.log(jnp.maximum(mels, np.finfo(np.float32).eps))
    dct = jnp.asarray(dct_matrix(num_ceps, num_mel_bins))
    cc = jnp.einsum("om,btm->bto", dct, logm,
                    precision=jax.lax.Precision.HIGHEST)
    if cepstral_lifter > 0:
        cc = cc * jnp.asarray(_lifter(num_ceps, cepstral_lifter))
    return add_deltas(cc, der_order)


def kaldi_plp(wav, hop=160, win=400, sr=16000, num_mel_bins=20,
              num_ceps=20, lpc_order=20, der_order=0,
              cepstral_lifter=22.0, **_):
    """[B, T] -> [B, T//hop, num_ceps] perceptual linear prediction
    cepstra (compute-plp-feats semantics; trapezoid bark bins
    approximated by the HTK mel bank — documented deviation)."""
    frames = _kaldi_frames(wav, win, hop)
    frames = _preemphasized_windowed(frames,
                                     window=jnp.asarray(_povey_window(win)))
    n_fft = int(2 ** np.ceil(np.log2(win)))
    spec = jnp.abs(jnp.fft.rfft(frames, n=n_fft)) ** 2
    fb_np = mel_filterbank(sr, n_fft, num_mel_bins, fmin=20.0,
                           fmax=sr / 2.0 - 400.0, htk=True, norm=None)
    # equal-loudness preemphasis evaluated at the ACTUAL (HTK-mel-spaced)
    # filterbank centre frequencies — linear spacing attenuated the
    # lowest bin ~770x
    def _mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def _hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mel_edges = np.linspace(_mel(20.0), _mel(sr / 2.0 - 400.0),
                            num_mel_bins + 2)
    centre_hz = _hz(mel_edges[1:-1])
    w2 = centre_hz ** 2
    eql = ((w2 / (w2 + 1.6e5)) ** 2 * ((w2 + 1.44e6) / (w2 + 9.61e6)))
    bins = jnp.einsum("mf,btf->btm", jnp.asarray(fb_np), spec,
                      precision=jax.lax.Precision.HIGHEST)
    bins = bins * jnp.asarray(eql.astype(np.float32))
    bins = jnp.power(jnp.maximum(bins, 1e-10), 1.0 / 3.0)  # intensity-loudness
    # duplicate edge bins (kaldi does) then IDFT -> autocorrelation
    ext = jnp.concatenate([bins[..., :1], bins, bins[..., -1:]], axis=-1)
    m = num_mel_bins + 2
    k = np.arange(lpc_order + 1)[:, None]
    n = np.arange(m)[None, :]
    idft = np.cos(np.pi * k * n / (m - 1)).astype(np.float32)
    idft[:, 1:-1] *= 2.0
    idft /= (2.0 * (m - 1))
    r = jnp.einsum("km,btm->btk", jnp.asarray(idft), ext,
                   precision=jax.lax.Precision.HIGHEST)
    # Levinson-Durbin to LPC (shared ops.signal.levinson), then cepstra
    order = lpc_order
    from pase_tpu.ops.signal import levinson
    r = r.at[..., 0].add(1e-10)
    a, e = levinson(r, order)
    # cepstral recursion c_n from LPC (c0 = ln(gain^2))
    ceps = [jnp.log(jnp.maximum(e, 1e-10))]
    for nn_ in range(1, num_ceps):
        acc = -a[..., nn_] if nn_ <= order else 0.0
        for kk in range(1, nn_):
            if nn_ - kk <= order:
                acc = acc - (1.0 - kk / nn_) * a[..., nn_ - kk] * ceps[kk]
        ceps.append(acc)
    cc = jnp.stack(ceps, axis=-1)
    if cepstral_lifter > 0:
        cc = cc * jnp.asarray(_lifter(num_ceps, cepstral_lifter))
    from pase_tpu.ops.features import add_deltas
    return add_deltas(cc, der_order)
