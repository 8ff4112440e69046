"""Distortion engine tests: SNR/energy semantics vs the reference
formulas, mask labels, probabilistic gating distribution."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pase_tpu.data import distortions as D


SR = 16000
T = 8000


def _wav(seed=0, b=1):
    rng = np.random.RandomState(seed)
    n = np.arange(T)
    x = (np.sin(2 * np.pi * 220 * n / SR) * 0.3 +
         rng.randn(T) * 0.01).astype(np.float32)
    return jnp.asarray(np.stack([x] * b))


def test_additive_snr_energy_preserved():
    """Reference norm_energy keeps output energy == input energy
    (transforms.py:1628-1666)."""
    wav = _wav()[0]
    bank = jnp.asarray(np.random.RandomState(1).randn(3, 2 * T)
                       .astype(np.float32))
    y = D.additive_one(wav, jax.random.PRNGKey(0), bank, (0.0,))
    ex = float(jnp.dot(wav, wav))
    ey = float(jnp.dot(y, y))
    np.testing.assert_allclose(ey, ex, rtol=1e-3)
    assert float(jnp.abs(y - wav).max()) > 1e-3  # actually changed


def test_reverb_energy_match_and_identity_ir():
    wav = _wav()[0]
    ir = np.zeros((1, 100), np.float32)
    ir[0, 0] = 1.0
    y = D.reverb_one(wav, jax.random.PRNGKey(0), jnp.asarray(ir),
                     jnp.asarray([0]))
    np.testing.assert_allclose(np.asarray(y), np.asarray(wav), atol=1e-4)


def test_reverb_delay_compensation():
    wav = _wav()[0]
    ir = np.zeros((1, 200), np.float32)
    ir[0, 50] = 1.0      # pure 50-sample delay, pmax=50
    y = D.reverb_one(wav, jax.random.PRNGKey(0), jnp.asarray(ir),
                     jnp.asarray([50]))
    np.testing.assert_allclose(np.asarray(y), np.asarray(wav), atol=1e-4)


def test_clipping():
    wav = _wav()[0]
    y = D.clipping_one(wav, jax.random.PRNGKey(0), (0.5,))
    assert float(jnp.max(y)) <= 0.5 * float(jnp.max(wav)) + 1e-6
    assert float(jnp.min(y)) >= 0.5 * float(jnp.min(wav)) - 1e-6


def test_overlap_mask_and_energy():
    wav = _wav()[0]
    bank = jnp.asarray(np.random.RandomState(2).randn(2, 2 * T)
                       .astype(np.float32) * 0.2)
    y, mask = D.overlap_one(wav, jax.random.PRNGKey(3), bank, (5.0,), 160)
    assert mask.shape == (T // 160,)
    m = np.asarray(mask)
    # mask is 0 before the shift and 1 after: nondecreasing, ends at 1
    assert m[-1] == 1.0
    assert np.all(np.diff(m) >= -1e-6)
    ex = float(jnp.dot(wav, wav))
    np.testing.assert_allclose(float(jnp.dot(y, y)), ex, rtol=1e-3)


def test_chopper_zeroes_speech():
    wav = _wav()[0]
    y = D.chopper_one(wav, jax.random.PRNGKey(1),
                      ((0.1, 0.0),), max_chops=1)
    ynp = np.asarray(y)
    wnp = np.asarray(wav)
    zeroed = np.isclose(ynp, 0).sum() - np.isclose(wnp, 0).sum()
    # ~0.1 s = 1600 samples zeroed
    assert 800 < zeroed < 2400, zeroed
    # outside the chop the signal is untouched
    changed = ~np.isclose(ynp, wnp)
    assert np.allclose(ynp[changed], 0)


def test_chopper_skips_silence():
    """No speech regions -> unchanged (transforms.py:1442-1444)."""
    wav = jnp.zeros((T,)) + 1e-6
    y = D.chopper_one(wav, jax.random.PRNGKey(1), ((0.1, 0.0),), 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(wav), atol=1e-8)


def test_fir_filter_energy():
    wav = _wav()[0]
    h = np.zeros((1, 65), np.float32)
    h[0, 32] = 1.0   # delta at center: output == input after shift
    y = D.fir_filter_one(wav, jax.random.PRNGKey(0), jnp.asarray(h))
    ex = float(jnp.dot(wav, wav))
    np.testing.assert_allclose(float(jnp.dot(y, y)), ex, rtol=1e-3)


def test_stack_gating_probability():
    """Each stage fires with its configured probability per sample."""
    b = 512
    wav = _wav(b=b)
    cfg = D.DistortionConfig(clip_p=0.25, clip_factors=(0.1,))
    assets = D.DistortionAssets()
    y, mask = D.apply_distortions(wav, jax.random.PRNGKey(0), cfg, assets,
                                  dec_res=160)
    changed = np.any(np.abs(np.asarray(y) - np.asarray(wav)) > 1e-6, axis=1)
    rate = changed.mean()
    assert 0.17 < rate < 0.33, rate


def test_stack_all_on_finite():
    rng = np.random.RandomState(0)
    b = 16
    wav = _wav(b=b)
    ir = np.zeros((2, 500), np.float32)
    ir[:, 0] = 1
    ir[0, 100] = 0.5
    assets = D.DistortionAssets(
        ir_bank=jnp.asarray(ir), ir_pmax=jnp.asarray([0, 0]),
        noise_bank=jnp.asarray(rng.randn(3, 2 * T).astype(np.float32) * .1),
        overlap_bank=jnp.asarray(rng.randn(2, 2 * T).astype(np.float32) * .1),
        bandrop_bank=jnp.asarray(rng.randn(1, 65).astype(np.float32)),
        downsample_bank=jnp.asarray(rng.randn(1, 65).astype(np.float32)))
    cfg = D.DistortionConfig(reverb_p=.5, overlap_p=.5, noises_p=.5,
                             clip_p=.5, chop_p=.5, bandrop_p=.5,
                             downsample_p=.5, speed_p=.5,
                             speed_range=(-0.1, 0.1))
    y, mask = D.apply_distortions(wav, jax.random.PRNGKey(7), cfg, assets)
    assert np.all(np.isfinite(np.asarray(y)))
    assert y.shape == wav.shape
    assert mask.shape == (b, T // 160)


def test_config_from_reference_json():
    import json
    with open("/root/reference/cfg/distortions/pase+.cfg") as f:
        cfg = D.config_from_json(json.load(f))
    assert cfg.reverb_p == 0.5
    assert cfg.overlap_p == 0.1
    assert cfg.noises_p == 0.4
    assert cfg.clip_p == 0.2
    assert cfg.chop_p == 0.2
    assert cfg.overlap_snrs == (5, 7.5, 10)
    assert cfg.overlap_reverb is True


def test_speed_one_warp_direction():
    """SpeedChange semantics (transforms.py:2327-2367): w>0 means SLOWED
    playback — a pure tone's frequency scales by 1/(1+w)."""
    from pase_tpu.data.distortions import speed_one
    t = 16000
    tone = np.sin(2 * np.pi * 400 * np.arange(t) / 16000).astype(np.float32)

    def dominant_zc(x):
        x = np.asarray(x)
        core = x[t // 4: 3 * t // 4]          # avoid pad/crop edges
        return np.sum(np.abs(np.diff(np.sign(core)))) / 2

    base = dominant_zc(tone)
    slow = jax.device_get(speed_one(jnp.asarray(tone),
                                    jax.random.PRNGKey(0), (0.14, 0.15)))
    fast = jax.device_get(speed_one(jnp.asarray(tone),
                                    jax.random.PRNGKey(0), (-0.15, -0.14)))
    assert dominant_zc(slow) < base * 0.93      # ~1/1.15 lower pitch
    assert dominant_zc(fast) > base * 1.07      # ~1/0.85 higher pitch
    # w<0 output sits centered in zero padding
    assert np.allclose(np.asarray(fast)[:t // 20], 0)


def test_fir_filter_per_filter_group_delay():
    """fir_filter_one must shift by each filter's OWN length/2, not the
    zero-padded bank width (reference BandDrop per-filter round(len/2))."""
    from pase_tpu.data.distortions import fir_filter_one
    rng = np.random.RandomState(0)
    t = 4000
    wav = jnp.asarray(rng.randn(t).astype(np.float32) * 0.3)
    # a SHORT identity filter (delta at its center) padded into a much
    # wider bank: correct per-filter compensation returns wav unchanged
    short_len = 33
    filt = np.zeros((1, 257), np.float32)
    filt[0, short_len // 2] = 1.0               # delta at center of len 33
    lens = jnp.asarray([short_len], jnp.int32)
    y = jax.device_get(fir_filter_one(wav, jax.random.PRNGKey(1),
                                      jnp.asarray(filt), lens))
    np.testing.assert_allclose(y, np.asarray(wav), atol=1e-4)
    # padded-width compensation (filt_lens=None) would misalign by
    # (257-33)/2 = 112 samples
    y_bad = jax.device_get(fir_filter_one(wav, jax.random.PRNGKey(1),
                                          jnp.asarray(filt)))
    assert not np.allclose(y_bad, np.asarray(wav), atol=1e-2)
