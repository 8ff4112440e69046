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
