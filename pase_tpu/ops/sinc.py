"""SincNet parametric band-pass filterbank construction.

Reproduces the math of the reference SincConv_fast
(/root/reference/pase/models/modules.py:788-934; SincNet,
arXiv:1808.00158): mel-spaced (low, band) Hz parameters; per-step filter
synthesis from half-window symmetry. The synthesis is a handful of
[C, K/2]-shaped VPU ops and fuses into the following conv under jit, so we
keep the reference's rebuild-filters-each-forward semantics for free.
"""

import numpy as np
import jax.numpy as jnp


def to_mel(hz):
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def to_hz(mel):
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def mel_init_hz(out_channels, sample_rate=16000, min_low_hz=50, min_band_hz=50):
    """Initial (low_hz, band_hz) filter parameters, mel-spaced.

    Matches modules.py:852-866: low_hz=30 .. sr/2-(min_low+min_band),
    out_channels+1 mel points; low = hz[:-1], band = diff(hz).
    Returns float32 arrays of shape [C, 1].
    """
    low_hz = 30.0
    high_hz = sample_rate / 2.0 - (min_low_hz + min_band_hz)
    mel = np.linspace(to_mel(low_hz), to_mel(high_hz), out_channels + 1)
    hz = to_hz(mel)
    low = hz[:-1].reshape(-1, 1).astype(np.float32)
    band = np.diff(hz).reshape(-1, 1).astype(np.float32)
    return low, band


def sinc_time_axes(kernel_size, sample_rate=16000):
    """Static (n_, window_) halves used by the filter synthesis.

    n_:      [1, (K-1)//2] = 2*pi*arange(-(K-1)/2, 0)/sr  (modules.py:876)
    window_: [(K)//2]      half Hamming window            (modules.py:870-871)
    """
    if kernel_size % 2 == 0:
        kernel_size += 1
    n = (kernel_size - 1) / 2.0
    n_ = 2.0 * np.pi * np.arange(-n, 0.0) / sample_rate
    n_lin = np.linspace(0, (kernel_size / 2) - 1, int(kernel_size / 2))
    window = 0.54 - 0.46 * np.cos(2.0 * np.pi * n_lin / kernel_size)
    return (n_.reshape(1, -1).astype(np.float32),
            window.astype(np.float32))


def build_sinc_filters(low_hz_, band_hz_, n_, window_, sample_rate=16000,
                       min_low_hz=50.0, min_band_hz=50.0):
    """Synthesize the filterbank from the (low, band) parameters.

    Matches modules.py:897-918. Returns [C, K] filters (K odd).
    """
    low = min_low_hz + jnp.abs(low_hz_)                      # [C,1]
    high = jnp.clip(low + min_band_hz + jnp.abs(band_hz_),
                    min_low_hz, sample_rate / 2.0)           # [C,1]
    band = (high - low)[:, 0]                                # [C]

    f_t_low = low @ n_                                       # [C, K/2]
    f_t_high = high @ n_
    bp_left = ((jnp.sin(f_t_high) - jnp.sin(f_t_low)) / (n_ / 2.0)) * window_
    bp_center = 2.0 * band.reshape(-1, 1)                    # [C,1]
    bp_right = jnp.flip(bp_left, axis=1)
    band_pass = jnp.concatenate([bp_left, bp_center, bp_right], axis=1)
    band_pass = band_pass / (2.0 * band[:, None])
    return band_pass
