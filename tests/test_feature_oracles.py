"""INDEPENDENT oracles for the feature-constant constructions.

The golden-fixture tests (test_features.py) pin ops/features.py against
fixtures generated from this repo's own scipy/numpy implementations —
a self-referential link while librosa / python_speech_features /
gammatone are absent from the image (README 'Parity-evidence caveats').
These tests break that loop: every check here derives its expectation
from a source that shares NO code with ops/features.py's implementation
path — scipy library calls, published formula constants, or analytic
properties (orthonormality, equal-area normalization, measured filter
bandwidths) of the transforms the reference consumes
(/root/reference/pase/transforms.py:439-999).
"""

import numpy as np
import pytest

from pase_tpu.ops.features import (dct_matrix, erb_centre_freqs,
                                   gammatone_fir_bank, hann_window,
                                   hz_to_mel, mel_filterbank, mel_to_hz,
                                   psf_mel_filterbank)


# ---------------------------------------------------------------------------
# DCT-II (librosa.feature.mfcc's dct stage)
# ---------------------------------------------------------------------------


def test_dct_matrix_matches_scipy_dct():
    """scipy.fft.dct is an independent implementation (FFT-based inside
    scipy) of the same orthonormal DCT-II our matrix encodes."""
    from scipy.fft import dct as scipy_dct
    n_in, n_out = 128, 13
    ours = dct_matrix(n_out, n_in)
    # scipy: dct of the identity's columns gives the full transform
    full = scipy_dct(np.eye(n_in), type=2, norm="ortho", axis=0)
    np.testing.assert_allclose(ours, full[:n_out], rtol=0, atol=1e-6)


def test_dct_matrix_orthonormal_rows():
    d = dct_matrix(40, 40).astype(np.float64)
    np.testing.assert_allclose(d @ d.T, np.eye(40), atol=1e-6)


# ---------------------------------------------------------------------------
# window (librosa stft default window)
# ---------------------------------------------------------------------------


def test_hann_window_matches_scipy():
    from scipy.signal import get_window
    for n in (400, 512, 1024):
        np.testing.assert_allclose(hann_window(n),
                                   get_window("hann", n, fftbins=True),
                                   rtol=0, atol=1e-7)


# ---------------------------------------------------------------------------
# mel scales — published formula constants, not our code
# ---------------------------------------------------------------------------


def test_htk_mel_published_values():
    """HTK mel m = 2595 log10(1 + f/700) (O'Shaughnessy 1987; the HTK
    Book eq. 5.13; python_speech_features.base.hz2mel)."""
    # the defining constant: 700 Hz sits at 2595*log10(2) mel
    np.testing.assert_allclose(hz_to_mel(700.0, htk=True),
                               2595.0 * np.log10(2.0), rtol=1e-12)
    # the scale's calibration point: 1000 Hz ~ 1000 mel
    assert abs(hz_to_mel(1000.0, htk=True) - 999.98553) < 1e-3
    # exact inverse
    f = np.array([50.0, 300.0, 1000.0, 4000.0, 7999.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, htk=True), htk=True),
                               f, rtol=1e-10)


def test_slaney_mel_piecewise_constants():
    """Slaney's Auditory Toolbox scale (librosa htk=False): linear at
    3/200 mel/Hz below 1 kHz, then log with step log(6.4)/27 per mel."""
    np.testing.assert_allclose(hz_to_mel(200.0), 3.0, rtol=1e-12)
    np.testing.assert_allclose(hz_to_mel(1000.0), 15.0, rtol=1e-12)
    # one full log-span: 6.4x above 1 kHz is 27 mel steps
    np.testing.assert_allclose(hz_to_mel(6400.0), 15.0 + 27.0, rtol=1e-10)
    f = np.array([100.0, 999.0, 1001.0, 6400.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)


def test_slaney_filterbank_equal_area():
    """norm='slaney' scales each triangle by 2/bandwidth, i.e. every
    filter has unit area over continuous frequency — an analytic
    property of the normalization, independent of the construction."""
    sr, n_fft, n_mels = 16000, 8192, 40   # fine grid: bin ~ 2 Hz
    fb = mel_filterbank(sr, n_fft, n_mels).astype(np.float64)
    df = (sr / 2.0) / (n_fft // 2)
    areas = fb.sum(axis=1) * df
    np.testing.assert_allclose(areas, np.ones(n_mels), rtol=0.02)


def test_psf_filterbank_quantized_triangles():
    """python_speech_features.get_filterbanks semantics from its
    documented construction: triangles on floor-quantized bin indices,
    peak exactly 1 at the centre bin, support strictly inside
    [bin_left, bin_right]."""
    rate, n_fft, n_filters = 16000, 512, 40
    fb = psf_mel_filterbank(rate, n_fft, n_filters)

    def hz2mel(hz):                      # psf docstring formula
        return 2595.0 * np.log10(1.0 + hz / 700.0)

    def mel2hz(mel):
        return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)

    melpts = np.linspace(hz2mel(0), hz2mel(rate / 2.0), n_filters + 2)
    bins = np.floor((n_fft + 1) * mel2hz(melpts) / rate).astype(int)
    for j in range(n_filters):
        row = fb[j]
        lo, mid, hi = bins[j], bins[j + 1], bins[j + 2]
        # peak 1 at the centre bin (when the quantized triangle is
        # non-degenerate), zero outside the support
        if mid > lo and hi > mid:
            assert row.max() == pytest.approx(1.0, abs=1e-6), j
            assert row[mid] == pytest.approx(1.0, abs=1e-6), j
        assert np.all(row[:lo] == 0), j
        assert np.all(row[hi + 1:] == 0), j
        # ramps are linear: second difference vanishes inside each side
        if mid - lo >= 3:
            seg = row[lo:mid + 1]
            np.testing.assert_allclose(np.diff(seg, 2), 0, atol=1e-5)


# ---------------------------------------------------------------------------
# gammatone bank — auditory-filter physics, not our construction
# ---------------------------------------------------------------------------


def test_erb_centre_freqs_uniform_on_erb_rate_scale():
    """Centre frequencies must be equally spaced on the ERB-rate scale
    E(f) = 21.4 log10(0.00437 f + 1) (Glasberg & Moore 1990, eq. 4 —
    a different parametrization from the EarQ/minBW exponential form
    the implementation uses), spanning (f_min, fs/2]."""
    fs, n, fmin = 16000, 40, 500.0
    cf = erb_centre_freqs(fs, n, fmin)

    def erb_rate(f):
        return 21.4 * np.log10(4.37 * f / 1000.0 + 1.0)

    e = erb_rate(cf)
    steps = np.diff(e)
    # uniform spacing, descending from fs/2 toward f_min
    np.testing.assert_allclose(steps, steps[0], rtol=1e-3)
    np.testing.assert_allclose(cf[-1], fmin, rtol=1e-6)
    expected_step = (erb_rate(fs / 2.0) - erb_rate(fmin)) / n
    np.testing.assert_allclose(-steps[0], expected_step, rtol=1e-3)


def test_gammatone_filters_have_glasberg_moore_bandwidths():
    """The 1.019 factor in b = 1.019*ERB is Patterson's calibration
    making a 4th-order gammatone's equivalent rectangular bandwidth
    equal the auditory ERB = 24.7(4.37 f/1000 + 1). Measure each FIR
    filter's ERB from its magnitude response and check it lands on the
    published curve — physics the construction never states."""
    fs, n, fmin = 16000, 40, 500.0
    bank = gammatone_fir_bank(fs, n, fmin).astype(np.float64)
    cf = erb_centre_freqs(fs, n, fmin)
    nfft = 8192
    H = np.abs(np.fft.rfft(bank, n=nfft, axis=1)) ** 2
    df = fs / nfft
    measured = H.sum(axis=1) * df / H.max(axis=1)
    expected = 24.7 * (4.37 * cf / 1000.0 + 1.0)
    # middle channels (FIR truncation blurs the extremes slightly)
    sel = (cf > 600) & (cf < 6000)
    assert sel.sum() >= 20
    np.testing.assert_allclose(measured[sel], expected[sel], rtol=0.05)


def test_gammatone_peaks_at_centre_frequency():
    fs, n, fmin = 16000, 40, 500.0
    bank = gammatone_fir_bank(fs, n, fmin).astype(np.float64)
    cf = erb_centre_freqs(fs, n, fmin)
    nfft = 16384
    H = np.abs(np.fft.rfft(bank, n=nfft, axis=1))
    peak_f = np.argmax(H, axis=1) * fs / nfft
    # unit peak gain (the cascade's unity passband) at ~the centre freq;
    # the gammatone peak sits slightly below cf by the envelope skew,
    # within an ERB/4 for these orders
    np.testing.assert_allclose(H.max(axis=1), 1.0, rtol=5e-3)
    erb = 24.7 * (4.37 * cf / 1000.0 + 1.0)
    assert np.all(np.abs(peak_f - cf) < np.maximum(erb / 4, 2 * fs / nfft))


def test_delta_operator_matches_scipy_savgol():
    """librosa.feature.delta is savgol(width=9, mode='interp'); the
    operator matrix must reproduce scipy.signal.savgol_filter applied
    to arbitrary data (scipy's filter code path is independent of the
    matrix materialization in add_deltas)."""
    from scipy.signal import savgol_filter
    from pase_tpu.ops.features import _delta_matrix
    rng = np.random.RandomState(0)
    x = rng.randn(50, 7)
    d1 = _delta_matrix(50, 1) @ x.astype(np.float32)
    expect = savgol_filter(x, 9, polyorder=1, deriv=1, axis=0,
                           mode="interp")
    np.testing.assert_allclose(d1, expect, atol=1e-5)
