"""On-device waveform distortion engine (PASE+).

The reference applies an ordered, per-sample-probabilistic stack of CPU
distortions in DataLoader workers (/root/reference/pase/transforms.py:
38-146 config_distortions + PCompose:208-250). Here the whole stack is a
single batched JAX function running on the accelerator:

  * every distortion is computed for every sample and selected by a
    per-sample Bernoulli mask (compute-always / select — branch-free, XLA
    friendly; identical marginal distribution to PCompose),
  * asset banks (impulse responses, noise wavs, overlap speech, FIR
    filters) live as device-resident [n, L] arrays in HBM,
  * randomness is jax.random, keyed per (step, sample).

Distortion semantics follow the reference transforms:
  Reverb          transforms.py:1001-1110 (full conv, delay compensation,
                  energy match)
  SimpleAdditiveShift (overlap + mask label) transforms.py:1684-1780
  SimpleAdditive  transforms.py:1576-1681 (SNR-scaled noise, energy norm)
  Clipping        transforms.py:1514-1542
  Chopper         transforms.py:1379-1511 (VAD-driven zeroing; the WebRTC
                  VAD is replaced by a frame-energy VAD — see EnergyVAD)
  BandDrop/Downsample transforms.py:1113-1304 (FIR, group-delay shift,
                  energy match)
  SpeedChange     transforms.py:2327-2367 (linear-interp resample)
"""

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pase_tpu.ops.signal import (fft_convolve_full, dynamic_shift,
                                 linear_resample, frame_signal)


class DistortionAssets(NamedTuple):
    """Device-resident asset banks. Any field may be None (stage disabled)."""
    ir_bank: Optional[jnp.ndarray] = None        # [n_ir, L_ir], zero-padded
    ir_pmax: Optional[jnp.ndarray] = None        # [n_ir] argmax(|ir|)
    noise_bank: Optional[jnp.ndarray] = None     # [n_noise, L_n]
    overlap_bank: Optional[jnp.ndarray] = None   # [n_ov, L_o]
    bandrop_bank: Optional[jnp.ndarray] = None   # [n_f, L_f], zero-padded
    bandrop_lens: Optional[jnp.ndarray] = None   # [n_f] true filter lens
    downsample_bank: Optional[jnp.ndarray] = None
    downsample_lens: Optional[jnp.ndarray] = None
    resample_filters: Optional[jnp.ndarray] = None  # [n_q, K] zero-phase
    # anti-alias kernels (center at (K-1)//2), one per resample factor


class DistortionConfig(NamedTuple):
    reverb_p: float = 0.0
    overlap_p: float = 0.0
    overlap_snrs: Tuple[float, ...] = (0.0, 5.0, 10.0)
    overlap_reverb: bool = False
    noises_p: float = 0.0
    noises_snrs: Tuple[float, ...] = (0.0, 5.0, 10.0)
    speed_p: float = 0.0
    speed_range: Optional[Tuple[float, float]] = None
    clip_p: float = 0.0
    clip_factors: Tuple[float, ...] = (0.1, 0.3, 0.5)
    chop_p: float = 0.0
    chop_factors: Tuple[Tuple[float, float], ...] = ((0.05, 0.025),
                                                     (0.1, 0.05))
    max_chops: int = 2
    bandrop_p: float = 0.0
    downsample_p: float = 0.0
    resample_p: float = 0.0
    resample_factors: Tuple[int, ...] = ()
    sr: int = 16000


# Every kwarg of the reference config_distortions signature
# (transforms.py:38-77). config_from_json maps the policy keys to
# DistortionConfig; the asset/path keys are consumed by the asset
# builders (train.build_distortions) and codec2 by the host stage
# (host_distortions.build_host_stage). Anything NOT in this set is
# rejected loudly — a typo'd key must not silently disable a stage.
_REFERENCE_KEYS = frozenset({
    "reverb_irfiles", "reverb_fmt", "reverb_data_root", "reverb_p",
    "reverb_cache", "overlap_dir", "overlap_list", "overlap_snrs",
    "overlap_reverb", "overlap_p", "noises_dir", "noises_snrs",
    "noises_p", "noises_cache", "speed_range", "speed_p",
    "resample_factors", "resample_p", "bandrop_irfiles", "bandrop_fmt",
    "bandrop_data_root", "bandrop_p", "downsample_irfiles",
    "downsample_fmt", "downsample_data_root", "downsample_p",
    "clip_factors", "clip_p", "chop_factors", "max_chops", "chop_p",
    "codec2_p", "codec2_kbps", "codec2_cachedir", "codec2_cache",
    "report",
})
# extensions beyond the reference schema, documented in README:
# whisperize host stage + annotation keys in the shipped cfg copies
_EXTENSION_KEYS = frozenset({"whisper_p", "whisper_cachedir", "sr"})


def config_from_json(cfg: dict) -> DistortionConfig:
    """Map a reference distortion cfg JSON (cfg/distortions/*.cfg) to a
    DistortionConfig. Asset paths are handled by the asset builders.

    Every key must be a reference config_distortions kwarg
    (transforms.py:38-77), a documented extension, or a '_'-prefixed
    annotation; unknown keys raise instead of silently dropping a stage.
    """
    unknown = [k for k in cfg
               if k not in _REFERENCE_KEYS and k not in _EXTENSION_KEYS
               and not k.startswith("_")]
    if unknown:
        raise ValueError(
            f"unknown distortion cfg keys {unknown}; expected reference "
            "config_distortions kwargs (transforms.py:38-77) or "
            f"extensions {sorted(_EXTENSION_KEYS)}")
    return DistortionConfig(
        reverb_p=cfg.get("reverb_p", 0.0),
        overlap_p=cfg.get("overlap_p", 0.0),
        overlap_snrs=tuple(cfg.get("overlap_snrs", (0, 5, 10))),
        overlap_reverb=bool(cfg.get("overlap_reverb", False)),
        noises_p=cfg.get("noises_p", 0.0),
        noises_snrs=tuple(cfg.get("noises_snrs", (0, 5, 10))),
        speed_p=cfg.get("speed_p", 0.0) if cfg.get("speed_range") else 0.0,
        speed_range=tuple(cfg["speed_range"]) if cfg.get("speed_range")
        else None,
        clip_p=cfg.get("clip_p", 0.0) if cfg.get("clip_factors") else 0.0,
        clip_factors=tuple(cfg.get("clip_factors", ())) or (0.1, 0.3, 0.5),
        chop_p=cfg.get("chop_p", 0.0) if cfg.get("chop_factors") else 0.0,
        chop_factors=tuple(tuple(c) for c in cfg.get("chop_factors", ())) or
        ((0.05, 0.025), (0.1, 0.05)),
        max_chops=cfg.get("max_chops", 2),
        bandrop_p=cfg.get("bandrop_p", 0.0),
        downsample_p=cfg.get("downsample_p", 0.0),
        resample_p=(cfg.get("resample_p", 0.0)
                    if cfg.get("resample_factors") else 0.0),
        resample_factors=tuple(int(q) for q in
                               cfg.get("resample_factors", ())),
    )


# ---------------------------------------------------------------------------
# individual distortions, single sample [T] -> [T]
# ---------------------------------------------------------------------------


def _energy(x):
    return jnp.dot(x, x)


def _norm_energy(out, in_energy, eps=1e-14):
    return jnp.sqrt(in_energy / (_energy(out) + eps)) * out


def reverb_one(wav, key, ir_bank, ir_pmax):
    """Convolve with a random IR, compensate its delay, match energy."""
    t = wav.shape[0]
    idx = jax.random.randint(key, (), 0, ir_bank.shape[0])
    ir = ir_bank[idx]
    pmax = ir_pmax[idx]
    ex = _energy(wav)
    rev = fft_convolve_full(wav[None], ir[None])[0]
    er = _energy(rev)
    # delay compensation: shift left by pmax, then trim to t
    rev = jax.lax.dynamic_slice(rev, (pmax,), (t,))
    eratio = jnp.where(er > 0, jnp.sqrt(ex / jnp.maximum(er, 1e-20)), 1.0)
    return eratio * rev


def additive_one(wav, key, noise_bank, snrs):
    """SNR-scaled additive noise with input-energy renormalization."""
    t = wav.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jax.random.randint(k1, (), 0, noise_bank.shape[0])
    nlen = noise_bank.shape[1]
    beg = jax.random.randint(k2, (), 0, max(nlen - t, 1))
    noise = jax.lax.dynamic_slice(noise_bank[idx], (beg,), (t,))
    snr = jnp.asarray(snrs)[jax.random.randint(k3, (), 0, len(snrs))]
    ex = _energy(wav)
    en = _energy(noise)
    k = jnp.sqrt(ex / ((10.0 ** (snr / 10.0)) * jnp.maximum(en, 1e-20)))
    k = jnp.where(en > 0, k, 1.0)
    noisy = wav + k * noise
    noisy = jnp.where(en > 0, _norm_energy(noisy, ex), wav)
    return noisy


def overlap_one(wav, key, overlap_bank, snrs, dec_res, reverb_assets=None):
    """Overlap-speech additive with random onset shift; returns the noisy
    wav and the frame-level overlap mask label (transforms.py:1713-1766)."""
    t = wav.shape[0]
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    shift = jax.random.randint(k1, (), 0, int(0.75 * t))
    idx = jax.random.randint(k2, (), 0, overlap_bank.shape[0])
    nlen = overlap_bank.shape[1]
    beg = jax.random.randint(k3, (), 0, max(nlen - t, 1))
    noise_full = jax.lax.dynamic_slice(overlap_bank[idx], (beg,), (t,))
    if reverb_assets is not None:
        ir_bank, ir_pmax = reverb_assets
        noise_full = reverb_one(noise_full, k5, ir_bank, ir_pmax)
    # active noise occupies [shift, T): zero the first `shift` samples of a
    # right-aligned copy == reference's left-pad of a length T-shift noise
    pos = jnp.arange(t)
    active = pos >= shift
    noise = jnp.where(active, noise_full, 0.0)
    snr = jnp.asarray(snrs)[jax.random.randint(k4, (), 0, len(snrs))]
    ex = _energy(wav)
    en = _energy(noise)
    k = jnp.sqrt(ex / ((10.0 ** (snr / 10.0)) * jnp.maximum(en, 1e-20)))
    k = jnp.where(en > 0, k, 1.0)
    noisy = _norm_energy(wav + k * noise, ex)
    # frame-mean of the sample-level mask
    mask = active.astype(jnp.float32).reshape(-1, dec_res).mean(axis=1)
    return noisy, mask


def clipping_one(wav, key, clip_factors):
    cf = jnp.asarray(clip_factors)[
        jax.random.randint(key, (), 0, len(clip_factors))]
    clip = jnp.maximum(wav, cf * jnp.min(wav))
    return jnp.minimum(clip, cf * jnp.max(wav))


def chopper_one(wav, key, chop_factors, max_chops, sr=16000,
                vad_win=160, vad_thresh_db=-40.0):
    """Zero Gaussian-sized windows centered in speech regions.

    EnergyVAD replacement for WebRTC VAD: frames of vad_win samples are
    'speech' when their energy exceeds max_energy + vad_thresh_db. Chop
    centers are sampled uniformly among speech frames (Gumbel top-k on the
    mask); window durations ~ N(mean, std) of a random chop factor.
    """
    t = wav.shape[0]
    n_frames = t // vad_win
    frames = wav[: n_frames * vad_win].reshape(n_frames, vad_win)
    fe = jnp.log10(jnp.mean(jnp.square(frames), axis=1) + 1e-12) * 10
    # relative threshold + absolute floor (silence has no speech regions,
    # matching WebRTC VAD behavior on silent input)
    thresh = jnp.maximum(jnp.max(fe) + vad_thresh_db, -55.0)
    speech = fe > thresh                                 # [F]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n_chops = jax.random.randint(k1, (), 1, max_chops + 1)
    # gumbel top-k over speech frames -> distinct random speech centers
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(k2, (n_frames,), minval=1e-6, maxval=1 - 1e-6)))
    scores = jnp.where(speech, gumbel, -jnp.inf)
    order = jnp.argsort(-scores)                         # best first
    factors = jnp.asarray(chop_factors)                  # [n_cf, 2]
    cf_idx = jax.random.randint(k3, (max_chops,), 0, factors.shape[0])
    mean = factors[cf_idx, 0]
    std = factors[cf_idx, 1]
    durs = (mean + jax.random.normal(k4, (max_chops,)) * std) * sr  # samples
    pos = jnp.arange(t)
    keep = jnp.ones((t,), dtype=bool)
    any_speech = jnp.any(speech)
    for i in range(int(max_chops)):
        center = (order[i] * vad_win + vad_win // 2).astype(jnp.float32)
        half = durs[i] / 2.0
        inside = (pos >= center - half) & (pos <= center + half)
        active = (i < n_chops) & any_speech & (scores[order[i]] > -jnp.inf)
        keep = keep & ~(inside & active)
    return jnp.where(keep, wav, 0.0)


def fir_filter_one(wav, key, filt_bank, filt_lens=None):
    """FIR filtering with group-delay compensation + energy match
    (BandDrop / Downsample, transforms.py:1113-1304).

    filt_lens: per-filter TRUE lengths — the bank is zero-padded to the
    longest filter, but the reference shifts by round(len(filt)/2) of
    each filter's own length; using the padded width would misalign
    shorter filters by (Lmax - Lown)/2 samples."""
    t = wav.shape[0]
    idx = jax.random.randint(key, (), 0, filt_bank.shape[0])
    h = filt_bank[idx]
    ex = _energy(wav)
    y = fft_convolve_full(wav[None], h[None])[0]
    y = jnp.pad(y, (0, filt_bank.shape[1]))   # room for any shift + t
    if filt_lens is None:
        shift = round(filt_bank.shape[1] / 2)
        y = y[shift:shift + t]
    else:
        # python round() half-to-even, matching the reference's
        # round(len(filt)/2); jnp.round also rounds half to even
        shift = jnp.round(filt_lens[idx].astype(jnp.float32)
                          / 2.0).astype(jnp.int32)
        y = jax.lax.dynamic_slice(y, (shift,), (t,))
    ef = _energy(y)
    eratio = jnp.where(ef > 0, jnp.sqrt(ex / jnp.maximum(ef, 1e-20)), 1.0)
    return jnp.where(ef > 0, eratio * y, wav)


def resample_one(wav, key, aa_bank, factors):
    """Resample distortion (transforms.py:1545-1574): decimate by a
    random integer factor and linearly interpolate back to T.

    The reference uses scipy.signal.decimate (zero-phase order-8
    Chebyshev-I anti-alias via filtfilt) then F.interpolate(linear,
    align_corners=True). Here the zero-phase IIR is applied as its
    truncated symmetric impulse response (build_resample_filters) so the
    whole stage is one batched conv + gather — exact away from the chunk
    edges (filtfilt's odd-extension edge handling has no local form).
    The reference emits ceil(T/q)*q samples (> T when q∤T); we keep the
    first T (static shapes) — identical when q | T, as in all shipped
    chunk sizes."""
    t = wav.shape[0]
    idx = jax.random.randint(key, (), 0, len(factors))

    def variant(i):
        q = int(factors[i])
        h = aa_bank[i]
        c = (aa_bank.shape[1] - 1) // 2
        y = fft_convolve_full(wav[None], h[None])[0]
        y = jax.lax.dynamic_slice(y, (c,), (t,))          # 'same' conv
        lr = y[::q]                                       # decimate
        n = lr.shape[0]
        # F.interpolate(scale_factor=q, mode='linear', align_corners=True)
        pos = jnp.arange(n * q) * ((n - 1) / max(n * q - 1, 1))
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        frac = (pos - lo).astype(wav.dtype)
        out = lr[lo] * (1 - frac) + lr[hi] * frac
        return out[:t]

    return jax.lax.switch(idx, [lambda i=i: variant(i)
                                for i in range(len(factors))])


def speed_one(wav, key, factor_range):
    """Speed perturbation (SpeedChange, transforms.py:2327-2367): the
    signal is resampled to T*(1+w) samples (w>0 slows playback) and
    center-cropped back to T. Linear-interp instead of FFT resample
    (documented deviation: no FFT unit on TPU). For w<0 the reference's
    own code zero-pads the UNWARPED wav (an upstream bug yielding a
    length != T signal); here the evident intent is implemented: the
    sped-up signal centered in zero padding."""
    t = wav.shape[0]
    lo, hi = factor_range
    warp = jax.random.uniform(key, (), minval=lo, maxval=hi)
    tw = (t + jnp.floor(warp * t)).astype(jnp.float32)   # warped length
    scale = t / tw                                        # read-pos step
    # w>0: center-crop offset mid = Tw//2 - T//2 (in warped samples);
    # w<0: output starts after P = (T-Tw)//2 zeros
    mid = jnp.floor(tw / 2.0) - t // 2
    pad = jnp.floor((t - tw) / 2.0)
    i = jnp.arange(t).astype(jnp.float32)
    j = jnp.where(warp >= 0, i + mid, i - pad)            # warped index
    valid = (j >= 0) & (j < tw)
    src = jnp.clip(j * scale, 0.0, t - 1.0)
    lo_i = jnp.floor(src).astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, t - 1)
    frac = src - lo_i
    out = wav[lo_i] * (1 - frac) + wav[hi_i] * frac
    return jnp.where(valid, out, 0.0)


# ---------------------------------------------------------------------------
# full stack
# ---------------------------------------------------------------------------


def apply_distortions(wav_batch, key, cfg: DistortionConfig,
                      assets: DistortionAssets, dec_res: int = 160):
    """[B, T] clean chunks -> (distorted [B, T], overlap mask [B, T//dec]).

    Stage order matches config_distortions (transforms.py:75-146):
    reverb -> overlap -> additive noise -> speed -> resample -> clip ->
    chop -> bandrop -> downsample, each applied with independent
    per-sample prob.
    """
    b, t = wav_batch.shape
    n_stages = 9
    keys = jax.random.split(key, b * (n_stages + 1)).reshape(b, n_stages + 1,
                                                             2)

    def one(wav, ks):
        overlap_mask = jnp.zeros((t // dec_res,))
        si = 0

        def gate(p, kk):
            return jax.random.uniform(jax.random.fold_in(kk, 7)) < p

        if cfg.reverb_p > 0 and assets.ir_bank is not None:
            y = reverb_one(wav, ks[si], assets.ir_bank, assets.ir_pmax)
            wav = jnp.where(gate(cfg.reverb_p, ks[si]), y, wav)
        si += 1
        if cfg.overlap_p > 0 and assets.overlap_bank is not None:
            rev_assets = (assets.ir_bank, assets.ir_pmax) \
                if (cfg.overlap_reverb and assets.ir_bank is not None) else None
            y, mask = overlap_one(wav, ks[si], assets.overlap_bank,
                                  cfg.overlap_snrs, dec_res, rev_assets)
            on = gate(cfg.overlap_p, ks[si])
            wav = jnp.where(on, y, wav)
            overlap_mask = jnp.where(on, mask, overlap_mask)
        si += 1
        if cfg.noises_p > 0 and assets.noise_bank is not None:
            y = additive_one(wav, ks[si], assets.noise_bank, cfg.noises_snrs)
            wav = jnp.where(gate(cfg.noises_p, ks[si]), y, wav)
        si += 1
        if cfg.speed_p > 0 and cfg.speed_range is not None:
            y = speed_one(wav, ks[si], cfg.speed_range)
            wav = jnp.where(gate(cfg.speed_p, ks[si]), y, wav)
        si += 1
        if cfg.resample_p > 0 and cfg.resample_factors \
                and assets.resample_filters is not None:
            y = resample_one(wav, ks[si], assets.resample_filters,
                             cfg.resample_factors)
            wav = jnp.where(gate(cfg.resample_p, ks[si]), y, wav)
        si += 1
        if cfg.clip_p > 0:
            y = clipping_one(wav, ks[si], cfg.clip_factors)
            wav = jnp.where(gate(cfg.clip_p, ks[si]), y, wav)
        si += 1
        if cfg.chop_p > 0:
            y = chopper_one(wav, ks[si], cfg.chop_factors, cfg.max_chops,
                            cfg.sr)
            wav = jnp.where(gate(cfg.chop_p, ks[si]), y, wav)
        si += 1
        if cfg.bandrop_p > 0 and assets.bandrop_bank is not None:
            y = fir_filter_one(wav, ks[si], assets.bandrop_bank,
                               assets.bandrop_lens)
            wav = jnp.where(gate(cfg.bandrop_p, ks[si]), y, wav)
        si += 1
        if cfg.downsample_p > 0 and assets.downsample_bank is not None:
            y = fir_filter_one(wav, ks[si], assets.downsample_bank,
                               assets.downsample_lens)
            wav = jnp.where(gate(cfg.downsample_p, ks[si]), y, wav)
        return wav, overlap_mask

    return jax.vmap(one)(wav_batch, keys[:, :n_stages])


# ---------------------------------------------------------------------------
# asset loading (host side)
# ---------------------------------------------------------------------------


def load_ir_bank(files, data_root=".", fmt="npy", max_len=24000):
    """Load impulse responses into a padded [n, max_len] bank + pmax
    (transforms.py:1028-1051)."""
    import os
    irs = []
    for f in files:
        path = os.path.join(data_root, f)
        if fmt == "npy":
            ir = np.load(path)
        elif fmt in ("imp", "txt"):
            ir = np.loadtxt(path)
        elif fmt == "wav":
            from pase_tpu.data.io import read_wav
            ir, _ = read_wav(path)
        else:
            raise TypeError(f"Unrecognized IR format: {fmt}")
        ir = np.asarray(ir, dtype=np.float32)[:max_len]
        if np.max(ir) > 0:
            ir = ir / np.abs(np.max(ir))
        irs.append(ir)
    n = max(len(i) for i in irs)
    bank = np.zeros((len(irs), n), dtype=np.float32)
    pmax = np.zeros((len(irs),), dtype=np.int32)
    lens = np.zeros((len(irs),), dtype=np.int32)
    for i, ir in enumerate(irs):
        bank[i, :len(ir)] = ir
        pmax[i] = int(np.argmax(np.abs(ir)))
        lens[i] = len(ir)
    return jnp.asarray(bank), jnp.asarray(pmax), jnp.asarray(lens)


def build_resample_filters(factors, max_taps: int = 4096, tol: float = 1e-7):
    """Zero-phase anti-alias kernels for the Resample distortion, one per
    integer factor q: the impulse response of scipy.signal.decimate's
    default filter (order-8 Chebyshev-I, rp=0.05 dB, Wn=0.8/q) applied
    forward-backward (filtfilt), truncated where the one-pass response
    decays below tol. Built once on the host at config time; returns a
    center-aligned [n_q, K] bank (K odd)."""
    from scipy.signal import cheby1, lfilter
    kers = []
    for q in factors:
        b, a = cheby1(8, 0.05, 0.8 / int(q))
        delta = np.zeros(max_taps, np.float64)
        delta[0] = 1.0
        h1 = lfilter(b, a, delta)
        mag = np.abs(h1)
        keep = np.where(mag > tol * mag.max())[0]
        h1 = h1[: int(keep[-1]) + 1]
        kers.append(np.convolve(h1, h1[::-1]).astype(np.float32))
    k = max(len(h) for h in kers)
    bank = np.zeros((len(kers), k), np.float32)
    for i, h in enumerate(kers):
        off = (k - len(h)) // 2                 # both odd: stays centered
        bank[i, off:off + len(h)] = h
    return jnp.asarray(bank)


def load_wav_bank(files, target_len: int):
    """Load noise/overlap wavs into a [n, target_len] bank (crop/tile)."""
    from pase_tpu.data.io import read_wav
    bank = np.zeros((len(files), target_len), dtype=np.float32)
    for i, f in enumerate(files):
        w, _ = read_wav(f)
        if len(w) < target_len:
            reps = int(np.ceil(target_len / max(len(w), 1)))
            w = np.tile(w, reps)
        bank[i] = w[:target_len]
    return jnp.asarray(bank)
