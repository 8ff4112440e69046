"""Host-side distortion stage tests (codec2/whisperize gate to identity
when their binaries are absent, which is the case in this image)."""

import numpy as np

from pase_tpu.data.host_distortions import (Codec2RoundTrip, Whisperize,
                                            HostDistortionStage)


def test_codec2_identity_fallback():
    c = Codec2RoundTrip()
    x = np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1
    y = c(x)
    if not c.available:
        np.testing.assert_allclose(y, x)
    assert y.shape == x.shape


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
