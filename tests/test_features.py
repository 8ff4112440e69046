"""Feature extractor tests: exact parity where an oracle exists in-image
(torch.stft for LPS framing, scipy savgol for deltas), invariant/sanity
tests elsewhere (no librosa/psf/gammatone/pysptk in this image)."""

import numpy as np
import pytest
import jax.numpy as jnp

from pase_tpu.ops import features as F
from pase_tpu.ops.signal import stft_mag


SR = 16000


def _tone(freq, t=32000, sr=SR, b=2):
    n = np.arange(t)
    x = np.sin(2 * np.pi * freq * n / sr).astype(np.float32)
    return np.stack([x] * b)


def test_stft_mag_matches_torch():
    import torch
    rng = np.random.RandomState(0)
    x = rng.randn(2, 16000).astype(np.float32)
    n_fft, hop, win = 2048, 160, 400
    mag = np.asarray(stft_mag(jnp.asarray(x), n_fft, hop, win,
                              n_frames=16000 // hop))
    yt = torch.stft(torch.tensor(x), n_fft, hop, win,
                    return_complex=True, center=True, pad_mode="reflect")
    yt = yt.abs().numpy()[:, :, :16000 // hop]     # [B, F_bins, T]
    np.testing.assert_allclose(mag.transpose(0, 2, 1), yt, atol=2e-3,
                               rtol=1e-3)


def test_delta_matrix_matches_savgol():
    from scipy.signal import savgol_filter
    rng = np.random.RandomState(1)
    x = rng.randn(3, 50, 7).astype(np.float32)
    out = np.asarray(F.add_deltas(jnp.asarray(x), der_order=2))
    d1 = savgol_filter(x, 9, polyorder=1, deriv=1, axis=1, mode="interp")
    d2 = savgol_filter(x, 9, polyorder=2, deriv=2, axis=1, mode="interp")
    ref = np.concatenate([x, d1, d2], axis=-1)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_lps_shape_and_tone_peak():
    x = _tone(1000)
    y = np.asarray(F.lps(jnp.asarray(x), n_fft=2048, hop=160, win=400))
    assert y.shape == (2, 200, 3075)
    base = y[0, 100, :1025]
    peak_bin = base.argmax()
    expect = round(1000 / (SR / 2048))
    assert abs(int(peak_bin) - expect) <= 1


def test_mfcc_shape():
    x = _tone(440)
    y = np.asarray(F.mfcc(jnp.asarray(x), hop=160, order=13, win=400))
    assert y.shape == (2, 200, 39)
    y2 = np.asarray(F.mfcc(jnp.asarray(x), hop=160, order=20, win=2048))
    assert y2.shape == (2, 200, 60)


def test_fbanks_shape_and_tone():
    x = _tone(2000)
    y = np.asarray(F.fbanks(jnp.asarray(x), n_filters=40, n_fft=512, win=400))
    assert y.shape == (2, 200, 120)
    # energy concentrated in one mel band for a pure tone
    base = y[0, 50, :40]
    assert base.argmax() > 10  # 2 kHz is in the upper half of the mel bands


def test_gammatone_shape_and_tuning():
    x = _tone(1000)
    y = np.asarray(F.gammatone(jnp.asarray(x), f_min=500, n_channels=40,
                               win=400))
    assert y.shape == (2, 200, 120)
    base = y[0, 100, :40]
    cf = F.erb_centre_freqs(SR, 40, 500)
    assert abs(cf[base.argmax()] - 1000) < 200


def test_framed_box_mean_ntc_equals_rows():
    """The transpose-free NTC box mean (gammatone's pooling path) equals
    the per-row form and the explicit framed mean, channel by channel."""
    from pase_tpu.ops.signal import (framed_box_mean, framed_box_mean_ntc,
                                     frame_signal)
    rng = np.random.RandomState(3)
    x = rng.randn(2, 1000, 5).astype(np.float32)
    for win, hop, nf in [(400, 160, 4), (320, 160, 6), (160, 160, 6)]:
        got = np.asarray(framed_box_mean_ntc(jnp.asarray(x), win, hop, nf))
        assert got.shape == (2, nf, 5)
        for c in range(5):
            rows = np.asarray(framed_box_mean(jnp.asarray(x[:, :, c]),
                                              win, hop, nf))
            np.testing.assert_allclose(got[:, :, c], rows, atol=1e-6)
            xp = np.pad(x[:, :, c], ((0, 0), (0, win)))
            want = np.asarray(frame_signal(jnp.asarray(xp), win, hop,
                                           nf)).mean(-1)
            np.testing.assert_allclose(got[:, :, c], want,
                                       atol=2e-5, rtol=1e-5)


def test_prosody_f0_tracking():
    # 110 Hz sawtooth-ish (harmonic-rich) signal
    n = np.arange(32000)
    x = sum(np.sin(2 * np.pi * 110 * k * n / SR) / k
            for k in range(1, 8)).astype(np.float32)
    x = np.stack([x, x])
    y = np.asarray(F.prosody(jnp.asarray(x), hop=160, win=320))
    assert y.shape == (2, 200, 12)
    lf0, uv = y[0, :, 0], y[0, :, 1]
    assert uv.mean() > 0.8, f"voiced ratio {uv.mean()}"
    f0 = np.exp(lf0[uv > 0])
    assert abs(np.median(f0) - 110) < 12, np.median(f0)


def test_prosody_unvoiced_silence():
    x = np.zeros((1, 16000), dtype=np.float32)
    y = np.asarray(F.prosody(jnp.asarray(x)))
    lf0, uv = y[0, :, 0], y[0, :, 1]
    assert uv.sum() == 0
    np.testing.assert_allclose(lf0, np.log(60), atol=1e-4)


def test_interpolate_unvoiced():
    lf0 = jnp.asarray([[1.0, 0.0, 0.0, 4.0, 0.0]])
    uv = jnp.asarray([[1.0, 0.0, 0.0, 1.0, 0.0]])
    out = np.asarray(F._interpolate_unvoiced(lf0, uv))[0]
    np.testing.assert_allclose(out, [1.0, 2.0, 3.0, 4.0, 4.0], atol=1e-5)


def test_worker_dispatch_matches_reference_cfg():
    import json
    with open("/root/reference/cfg/workers/workers+.cfg") as f:
        cfg = json.load(f)
    dims = {"cchunk": None, "lps": 3075, "lps_long": 3075, "fbank": 120,
            "fbank_long": 120, "gtn": 120, "gtn_long": 120, "mfcc": 39,
            "mfcc_long": 60, "prosody": 12}
    for w in cfg["regr"]:
        name = w["name"]
        d = F.feature_dim_for_worker(name, w.get("transform"))
        assert d == dims[name], (name, d)
        if name != "cchunk":
            fn = F.feature_fn_for_worker(name, w.get("transform"))
            y = fn(jnp.zeros((1, 4800)))
            assert y.shape == (1, 30, dims[name]), (name, y.shape)
    for w in cfg["cls"]:
        assert F.feature_fn_for_worker(w["name"]) is None


def test_lpc_recovers_ar_coefficients():
    """LPC on an AR(2) process recovers the generating coefficients."""
    rng = np.random.RandomState(0)
    a1, a2 = 1.3, -0.6   # stable AR(2): x_t = a1 x_{t-1} + a2 x_{t-2} + e
    n = 16000
    e = rng.randn(n).astype(np.float64)
    x = np.zeros(n)
    for t in range(2, n):
        x[t] = a1 * x[t - 1] + a2 * x[t - 2] + e[t]
    x = (x / np.abs(x).max()).astype(np.float32)
    y = np.asarray(F.lpc(jnp.asarray(x[None]), order=8, win=2048, hop=2048))
    # predictor coeffs of A(z): a_hat ~ [-a1, -a2, 0, ...]
    coefs = y[0, 2:-2, 1:3].mean(axis=0)   # skip edge frames
    np.testing.assert_allclose(coefs, [-a1, -a2], atol=0.08)
    assert y.shape[-1] == 9


def test_lpc_dispatch():
    fn = F.feature_fn_for_worker("lpc", {"order": 10, "win": 320})
    y = fn(jnp.zeros((1, 4800)))
    assert y.shape == (1, 30, 11)
    assert F.feature_dim_for_worker("lpc", {"order": 10}) == 11


def test_kaldi_mfcc():
    x = _tone(440, t=16000)
    from pase_tpu.ops.kaldi_feats import kaldi_mfcc
    y = np.asarray(kaldi_mfcc(jnp.asarray(x), der_order=2))
    assert y.shape == (2, 100, 39)
    assert np.all(np.isfinite(y))
    y2 = np.asarray(kaldi_mfcc(jnp.asarray(_tone(2000, t=16000)),
                               der_order=2))
    # different tones -> clearly different cepstra
    assert np.abs(y[0, 50, :13] - y2[0, 50, :13]).max() > 1.0


def test_kaldi_plp():
    x = _tone(300, t=16000)
    from pase_tpu.ops.kaldi_feats import kaldi_plp
    y = np.asarray(kaldi_plp(jnp.asarray(x)))
    assert y.shape == (2, 100, 20)
    assert np.all(np.isfinite(y))


def test_kaldi_dispatch():
    fn = F.feature_fn_for_worker("kaldimfcc", {"num_ceps": 13})
    y = fn(jnp.zeros((1, 4800)))
    assert y.shape == (1, 30, 39)
    assert F.feature_dim_for_worker("kaldimfcc", {"num_ceps": 13}) == 39
    fnp = F.feature_fn_for_worker("kaldiplp", {"num_ceps": 20,
                                               "der_order": 0})
    yp = fnp(jnp.zeros((1, 4800)))
    assert yp.shape == (1, 30, 20)
    assert F.feature_dim_for_worker("kaldiplp",
                                    {"num_ceps": 20, "der_order": 0}) == 20


# ---------------------------------------------------------------------------
# golden regression fixtures + scipy oracles (round-2 parity evidence)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_golden_feature_regression():
    """Every worker-target feature matches its frozen golden output
    (tests/fixtures/features_golden.npz, regenerate via
    tests/make_golden_features.py) — refactors cannot silently drift."""
    import os
    from pase_tpu.ops import kaldi_feats as KF
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "features_golden.npz")
    data = np.load(path)
    x = jnp.asarray(data["input"])
    fns = {"lps": F.lps, "mfcc": F.mfcc, "fbanks": F.fbanks,
           "gammatone": F.gammatone, "prosody": F.prosody, "lpc": F.lpc,
           "kaldimfcc": KF.kaldi_mfcc, "kaldiplp": KF.kaldi_plp}
    for name, fn in fns.items():
        got = np.asarray(fn(x))
        want = data[name]
        assert got.shape == want.shape, (name, got.shape, want.shape)
        np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4,
                                   err_msg=name)


def test_fft_convolve_full_scipy_oracle():
    """Distortion-engine convolution == scipy.signal.fftconvolve."""
    from scipy import signal as ss
    from pase_tpu.ops.signal import fft_convolve_full
    rng = np.random.RandomState(0)
    x = rng.randn(2, 500).astype(np.float32)
    h = rng.randn(2, 64).astype(np.float32)
    got = np.asarray(fft_convolve_full(jnp.asarray(x), jnp.asarray(h)))
    for i in range(2):
        want = ss.fftconvolve(x[i], h[i], mode="full")
        np.testing.assert_allclose(got[i][:len(want)], want,
                                   atol=1e-3, rtol=1e-3)


def test_linear_resample_scipy_oracle():
    """Speed-change resampler == np.interp at positions i*scale clipped
    to the source grid (reference transforms.py:2327-2367 semantics)."""
    from pase_tpu.ops.signal import linear_resample
    rng = np.random.RandomState(1)
    x = rng.randn(1, 400).astype(np.float32)
    for scale in (0.8, 1.0, 1.17):
        t_out = 400
        got = np.asarray(linear_resample(
            jnp.asarray(x), jnp.asarray([scale], jnp.float32), t_out))[0]
        pos = np.clip(np.arange(t_out) * scale, 0.0, 399.0)
        want = np.interp(pos, np.arange(400), x[0])
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_gammatone_fir_scipy_oracle():
    """Gammatone FIR taps == the closed-form 4th-order gammatone impulse
    response evaluated with scipy/numpy double precision."""
    from pase_tpu.ops.features import gammatone_fir_bank, erb_centre_freqs
    fs, n_ch, f_min = 16000, 8, 500
    taps = np.asarray(gammatone_fir_bank(fs, n_ch, f_min, n_taps=512))
    cfs = erb_centre_freqs(fs, n_ch, f_min)
    t = np.arange(512, dtype=np.float64) / fs
    for i, cf in enumerate(cfs):
        erb = 24.7 + cf / 9.265          # Glasberg & Moore
        b = 1.019 * 2 * np.pi * erb
        ir = t ** 3 * np.exp(-b * t) * np.cos(2 * np.pi * cf * t)
        # compare normalized shapes (the bank normalizes gain internally)
        a, bb = taps[i] / np.linalg.norm(taps[i]), ir / np.linalg.norm(ir)
        corr = abs(np.dot(a, bb))
        assert corr > 0.99, (i, cf, corr)
