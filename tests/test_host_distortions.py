"""Host-side distortion stage tests (codec2/whisperize gate to identity
when their binaries are absent, which is the case in this image)."""

import numpy as np

from pase_tpu.data.host_distortions import (Codec2RoundTrip, Whisperize,
                                            HostDistortionStage)


def _speechlike(t_samples, f0=150.0, sr=16000, seed=0):
    t = np.arange(t_samples) / sr
    x = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 8)) * 0.15
    x += np.random.RandomState(seed).randn(t_samples) * 0.005
    return x.astype(np.float32)


def test_codec2_roundtrip_available_and_degrades():
    """With the vendored codec2-style vocoder (native/codec2_lite.cc),
    the distortion works in this image: not identity, same shape."""
    c = Codec2RoundTrip()
    assert c.available, "native/libpase_codec2lite.so missing — " \
        "run `make -C native`"
    x = _speechlike(16000)
    y = c(x)
    assert y.shape == x.shape
    assert not np.allclose(y, x)


def test_codec2_roundtrip_semantics():
    """Codec2Buffer semantics (transforms.py:2150-2181): output energy
    matched to input (norm_energy, transforms.py:154-157), band-limited
    to the 8 kHz codec rate's Nyquist, pitch preserved by the vocoder
    model, deterministic."""
    c = Codec2RoundTrip(kbps=1600)
    if c.lite is None:
        import pytest
        pytest.skip("real codec2 present; semantics differ per backend")
    sr = 16000
    x = _speechlike(32000, f0=150.0, sr=sr)
    y = c(x)
    # norm_energy: exact energy match
    np.testing.assert_allclose(np.dot(y, y), np.dot(x, x), rtol=1e-4)
    # the 16k->8k->16k path leaves (numerically) nothing above 4 kHz
    spec = np.abs(np.fft.rfft(y.astype(np.float64))) ** 2
    f = np.fft.rfftfreq(len(y), 1 / sr)
    assert spec[f > 4200].sum() / spec.sum() < 1e-6
    # vocoder preserves the pitch track (autocorrelation peak ~ f0)
    ac = np.correlate(y, y, "full")[len(y) - 1:]
    lo, hi = sr // 400, sr // 60
    lag = lo + int(np.argmax(ac[lo:hi]))
    assert abs(sr / lag - 150.0) < 15.0
    # deterministic: same input -> same output
    np.testing.assert_allclose(c(x), y)


def test_codec2_mode_bit_budget_orders_distortion():
    """Lower-rate modes quantize the envelope more coarsely: the
    spectral-envelope error at 1300 bps should not be smaller than at
    3200 bps (mode semantics of the reference's kbps knob)."""
    x = _speechlike(32000)

    def env_err(kbps):
        c = Codec2RoundTrip(kbps=kbps)
        y = c(x)
        fx = np.abs(np.fft.rfft(x.astype(np.float64))) ** 2
        fy = np.abs(np.fft.rfft(y.astype(np.float64))) ** 2
        # smoothed log-spectra up to 4 kHz
        k = np.ones(32) / 32
        lx = np.convolve(np.log10(fx[:4000] + 1e-12), k, "same")
        ly = np.convolve(np.log10(fy[:4000] + 1e-12), k, "same")
        return float(np.mean((lx - ly) ** 2))

    c = Codec2RoundTrip()
    if c.lite is None:
        import pytest
        pytest.skip("real codec2 present")
    assert env_err(1300) >= env_err(3200) * 0.8


def test_pase_plus_distortion_cfg_with_codec2_runs():
    """The pase+ distortion cfg path runs end-to-end with codec2_p > 0
    through the host stage (transforms.py:38-146 codec2 wiring)."""
    from pase_tpu.data.host_distortions import (build_host_stage,
                                                StagedBatcher)
    from pase_tpu.data.dataset import SyntheticChunkBatcher

    stage = build_host_stage({"codec2_p": 1.0, "codec2_kbps": 1600},
                             seed=0)
    assert stage is not None
    src = SyntheticChunkBatcher(4, 8000, seed=0, bpe=2)
    b0 = next(iter(SyntheticChunkBatcher(4, 8000, seed=0, bpe=2)))
    b = next(iter(StagedBatcher(src, stage)))
    assert b["chunk"].shape == (4, 8000)
    # codec applied at p=1: every row degraded, clean streams untouched
    assert not np.allclose(b["chunk"], b0["chunk"])
    np.testing.assert_allclose(b["chunk_ctxt"], b0["chunk_ctxt"])


def test_whisperize_cache_dir(tmp_path):
    from pase_tpu.data.io import write_wav
    w = Whisperize(cache_dir=str(tmp_path))
    cached = np.random.RandomState(1).randn(16000).astype(np.float32) * 0.1
    write_wav(str(tmp_path / "utt1.wav"), cached)
    x = np.zeros(8000, dtype=np.float32)
    y = w(x, uttname="utt1.wav", chunk_beg=1000, chunk_end=9000)
    assert y.shape == (8000,)
    assert np.abs(y).max() > 0.01   # came from the cache, not identity


def test_host_stage_probability():
    calls = []

    def fake(x):
        calls.append(1)
        return x * 0.5

    stage = HostDistortionStage([fake], [0.5], seed=0)
    batch = {"chunk": np.ones((100, 10), np.float32)}
    out = stage(batch)
    rate = (out["chunk"][:, 0] == 0.5).mean()
    assert 0.3 < rate < 0.7
    assert batch["chunk"][0, 0] == 1.0  # input not mutated


def test_host_stage_skips_zero_speech_rows():
    """ZERO_SPEECH rows skip the entire distortion stack (reference
    dataset.py:499) — the host stage must honor zs_mask so the device's
    zs restore never sees a host-distorted chunk."""
    stage = HostDistortionStage([lambda x: x * 0.5], [1.0], seed=0)
    zs = np.zeros((6, 1), np.float32)
    zs[[1, 4]] = 1.0
    batch = {"chunk": np.ones((6, 10), np.float32), "zs_mask": zs}
    out = stage(batch)
    assert (out["chunk"][[1, 4]] == 1.0).all()      # zs rows untouched
    assert (out["chunk"][[0, 2, 3, 5]] == 0.5).all()


def test_build_host_stage_and_fire_rate():
    """The distortion-cfg keys construct a host stage that fires at the
    configured per-sample probability inside the batcher chain
    (reference transforms.py:38-146 codec2_p wiring)."""
    from pase_tpu.data.host_distortions import (build_host_stage,
                                                StagedBatcher)
    from pase_tpu.data.dataset import SyntheticChunkBatcher

    assert build_host_stage({}) is None
    stage = build_host_stage({"codec2_p": 0.5, "codec2_kbps": 1600},
                             seed=3)
    assert stage is not None and stage.probs == [0.5]
    fired = [0, 0]   # [fires, samples]

    def marker(w):
        fired[0] += 1
        return w + 1000.0

    stage.transforms = [marker]
    src = SyntheticChunkBatcher(16, 1600, seed=0, bpe=40)
    wrapped = StagedBatcher(src, stage)
    assert wrapped.bpe == src.bpe
    it = iter(wrapped)
    for _ in range(40):
        b = next(it)
        fired[1] += b["chunk"].shape[0]
        # only 'chunk' is degraded, the clean/context streams are not
        assert not (b["chunk_ctxt"] > 500).any()
    rate = fired[0] / fired[1]
    assert abs(rate - 0.5) < 0.06, rate   # 640 draws, 3 sigma ~ 0.06


def test_train_cli_builds_host_stage(tmp_path):
    """train.py's build_distortions returns the host stage when the
    distortion cfg declares codec2/whisper keys."""
    import json as _json
    import types
    import train as train_mod

    dcfg = {"codec2_p": 0.3, "codec2_kbps": 1600, "whisper_p": 0.2}
    p = tmp_path / "dist.cfg"
    p.write_text(_json.dumps(dcfg))
    opts = types.SimpleNamespace(dtrans_cfg=[str(p)], seed=0)
    cfg, assets, host_stage = train_mod.build_distortions(opts, 1600)
    assert host_stage is not None
    assert len(host_stage.transforms) == 2
    assert host_stage.probs == [0.3, 0.2]
