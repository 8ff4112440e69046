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


def test_resample_matches_scipy_torch_oracle():
    """Resample distortion vs the reference's exact op chain
    (transforms.py:1545-1574): scipy.signal.decimate (zero-phase
    cheby1) + torch F.interpolate(linear, align_corners=True). The
    truncated-FIR zero-phase form is exact away from chunk edges
    (filtfilt's odd-extension has no local equivalent)."""
    import torch
    import torch.nn.functional as F
    from scipy.signal import decimate
    t = 16000
    rng = np.random.RandomState(0)
    n = np.arange(t)
    wav = (np.sin(2 * np.pi * 220 * n / SR) * 0.3 +
           np.sin(2 * np.pi * 1333 * n / SR) * 0.2 +
           rng.randn(t) * 0.02).astype(np.float32)
    for q in (2, 4):
        x_lr = decimate(wav.astype(np.float64), q).copy()
        ref = F.interpolate(torch.tensor(x_lr, dtype=torch.float32)
                            .view(1, 1, -1), scale_factor=q,
                            align_corners=True, mode="linear")
        ref = ref.view(-1).numpy()[:t]

        bank = D.build_resample_filters((q,))
        got = np.asarray(D.resample_one(jnp.asarray(wav),
                                        jax.random.PRNGKey(0), bank, (q,)))
        # interior comparison: edges differ by filtfilt's padding scheme
        m = 1000
        err = np.abs(got[m:-m] - ref[m:-m]).max()
        assert err < 5e-4, (q, err)
        # and the edges are still bounded (no blow-up; filtfilt's odd
        # extension vs implicit zero-pad differ by O(signal) at the rim)
        assert np.abs(got - ref).max() < 0.2


def test_resample_random_factor_and_gating():
    """Per-sample factor choice + probabilistic gating inside the full
    stack: resample_p=1 changes every sample; p=0 leaves them alone."""
    bank = D.build_resample_filters((2, 4))
    wavs = np.asarray(_wav(seed=3, b=8))
    cfg_on = D.DistortionConfig(resample_p=1.0, resample_factors=(2, 4))
    cfg_off = D.DistortionConfig(resample_p=0.0, resample_factors=(2, 4))
    assets = D.DistortionAssets(resample_filters=bank)
    y_on, _ = D.apply_distortions(jnp.asarray(wavs), jax.random.PRNGKey(1),
                                  cfg_on, assets)
    y_off, _ = D.apply_distortions(jnp.asarray(wavs), jax.random.PRNGKey(1),
                                   cfg_off, assets)
    assert np.abs(np.asarray(y_on) - wavs).max() > 1e-3
    np.testing.assert_array_equal(np.asarray(y_off), wavs)


def test_config_from_json_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unknown distortion cfg keys"):
        D.config_from_json({"reverb_p": 0.5, "chop_factros": [[0.05, 0.025]]})


def test_config_schema_covers_reference_signature(ref):
    """Every kwarg of the reference config_distortions signature
    (transforms.py:38-77) is either mapped or explicitly rejected —
    no silent drops (VERDICT r3 #4)."""
    import inspect
    from pase import transforms as rtr
    sig = inspect.signature(rtr.config_distortions)
    for name in sig.parameters:
        assert name in D._REFERENCE_KEYS, (
            f"reference config_distortions kwarg {name!r} missing from "
            "the schema map")
    # resample keys actually round-trip into the config
    cfg = D.config_from_json({"resample_factors": [4], "resample_p": 0.7})
    assert cfg.resample_p == 0.7 and cfg.resample_factors == (4,)


def test_asl_p56_additive_matches_reference(ref):
    """AdditiveP56 (host_distortions) vs the reference Additive's own
    asl_P56 / addnoise_asl methods (transforms.py:1783-2025), driven
    directly (the ctor needs librosa+noise dirs; the math doesn't)."""
    from pase import transforms as rtr
    from pase_tpu.data.host_distortions import asl_p56
    rng = np.random.RandomState(0)
    t = 16000
    n = np.arange(t)
    # speech-like: tone bursts with silences
    env = (np.sin(2 * np.pi * 1.5 * n / SR) > 0).astype(np.float32)
    wav = (env * np.sin(2 * np.pi * 220 * n / SR) * 0.3 +
           rng.randn(t).astype(np.float32) * 1e-3)
    ref_add = rtr.Additive.__new__(rtr.Additive)
    ref_add.eps = 1e-22
    px_r, asl_r, c0_r = ref_add.asl_P56(wav.astype(np.float64), SR, 16)
    px, asl, c0 = asl_p56(wav, SR, 16)
    np.testing.assert_allclose(px, px_r, rtol=1e-10)
    np.testing.assert_allclose(asl, asl_r, rtol=1e-10)
    np.testing.assert_allclose(c0, c0_r, rtol=1e-10)

    # full addnoise path at SNR 5 vs reference (same noise segment)
    noise = rng.randn(3 * t).astype(np.float32) * 0.1
    np.random.seed(7)
    noisy_r, bounds = ref_add.addnoise_asl(wav.astype(np.float64),
                                           noise.astype(np.float64),
                                           SR, 16, snr=5.0)
    seg = noise[bounds[0]:bounds[1]].astype(np.float64)
    pn = np.dot(seg, seg) / t
    sf = np.sqrt(px / pn / (10 ** (5.0 / 10)))
    np.testing.assert_allclose(wav + sf * seg, noisy_r, rtol=1e-8)

    # the class front door: silence raises no activity, scales nothing
    from pase_tpu.data.host_distortions import AdditiveP56
    add = AdditiveP56([noise], snr_levels=[5], seed=0)
    out = add(wav)
    assert out.shape == wav.shape and np.isfinite(out).all()
    assert np.abs(out - wav).max() > 1e-4          # noise was added
    assert out.max() < 1.0 and out.min() >= -1.0   # clipping-normalized
    silent = np.zeros(t, np.float32)
    out_s = add(silent)
    np.testing.assert_array_equal(out_s, silent)   # px=0 -> sf=0
