"""Long-utterance story (SURVEY §5.7): the encoder is linear-time
conv/scan, so arbitrary-length inference works; chunk-length scaling is
the long-context axis."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pase_tpu.frontend import build_wavefe


@pytest.mark.parametrize("t", [16000, 64000])
def test_encoder_scales_with_length(t):
    cfg = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
           "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True,
           "rnn_pool": True, "rnn_dim": 32}
    m = build_wavefe(cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)), train=False)
    y = m.apply(v, jnp.zeros((1, t)), train=False)
    assert y.shape == (1, t // 160, 32)


@pytest.mark.slow
def test_pallas_scan_long_sequence():
    """Time-blocked kernel handles sequences far beyond one block."""
    from pase_tpu.ops import pallas_qrnn as mod
    import jax.experimental.pallas.tpu as pltpu
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.rand(1, 1000, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 1000, 8).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        c = np.asarray(mod._linear_scan_pallas_raw(a, b, time_block=128))
    from pase_tpu.ops.qrnn import _fm_combine
    _, ref = jax.lax.associative_scan(_fm_combine, (a, b), axis=1)
    np.testing.assert_allclose(c, np.asarray(ref), atol=2e-4)


def test_forward_chunk_streaming(tmp_path):
    """util_scripts forward-chunk handles arbitrary-length wavs."""
    import util_scripts
    import argparse
    from pase_tpu.data.io import write_wav
    wav = (np.random.RandomState(0).randn(50000) * 0.1).astype(np.float32)
    write_wav(str(tmp_path / "long.wav"), wav)
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    import json
    with open(tmp_path / "fe.cfg", "w") as f:
        json.dump(fe, f)
    opts = argparse.Namespace(fe_cfg=str(tmp_path / "fe.cfg"), fe_ckpt=None,
                              in_wav=str(tmp_path / "long.wav"),
                              out_file=str(tmp_path / "feats.npy"),
                              chunk_size=16000)
    util_scripts.forward_chunk(opts)
    feats = np.load(tmp_path / "feats.npy")
    assert feats.shape == (32, 50000 // 160)


def test_forward_chunk_wav_list(tmp_path):
    """Batch mode (reference forward_chunk consumes file lists): one
    .npy per wav under --out_dir, identical to single-file output."""
    import util_scripts
    import argparse
    import json
    from pase_tpu.data.io import write_wav
    rng = np.random.RandomState(1)
    # same basename under two dirs: outputs must NOT clobber
    lens = {"spk1/a": 20000, "spk2/a": 33000}
    for name, n in lens.items():
        (tmp_path / name).parent.mkdir(exist_ok=True)
        write_wav(str(tmp_path / f"{name}.wav"),
                  (rng.randn(n) * 0.1).astype(np.float32))
    (tmp_path / "list.txt").write_text("spk1/a.wav\nspk2/a.wav\n")
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    with open(tmp_path / "fe.cfg", "w") as f:
        json.dump(fe, f)
    common = dict(fe_cfg=str(tmp_path / "fe.cfg"), fe_ckpt=None,
                  chunk_size=16000)
    util_scripts.forward_chunk(argparse.Namespace(
        in_wav=None, out_file=None, wav_list=str(tmp_path / "list.txt"),
        files_root=str(tmp_path), out_dir=str(tmp_path / "out"), **common))
    for name, n in lens.items():
        got = np.load(tmp_path / "out" / f"{name}.npy")
        assert got.shape == (32, n // 160)
        util_scripts.forward_chunk(argparse.Namespace(
            in_wav=str(tmp_path / f"{name}.wav"),
            out_file=str(tmp_path / f"{name}_single.npy"), **common))
        single = np.load(tmp_path / f"{name}_single.npy")
        np.testing.assert_array_equal(got, single)
