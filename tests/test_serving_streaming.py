"""Streaming serving artifacts (serving.export_streaming_encoder): the
exact online encoder (pase_tpu/streaming.py) exported as prime/step/
flush StableHLO graphs with explicit FIFO/carry state. The reference has
no streaming deployment story at all (util_scripts/forward_chunk.py
re-forwards overlapping windows in-process); these tests pin the
artifact to the offline forward frame for frame."""

import argparse
import json
import os

import numpy as np
import pytest

from pase_tpu.frontend import wf_builder
from pase_tpu.serving import (export_streaming_encoder,
                              ServingStreamingEncoder)
from pase_tpu.streaming import StreamingEncoder

CFG = {"kwidths": [65, 10, 4, 4], "strides": [1, 10, 4, 4],
       "fmaps": [16, 16, 24, 24], "emb_dim": 24, "norm_out": True,
       "rnn_pool": True, "rnn_dim": 24, "qrnn_impl": "scan",
       "denseskips": True}
CHUNK = 3200


def _enc(tmp_path, cfg=CFG):
    p = tmp_path / "fe.cfg"
    p.write_text(json.dumps(cfg))
    enc = wf_builder(str(p))
    enc.init()
    return enc


def _stream_all(srv, wav):
    """Push a [B, n*chunk] wav chunk by chunk, concat all emissions."""
    srv.reset()
    c = srv.chunk
    ys = [srv.push(wav[:, i:i + c]) for i in range(0, wav.shape[1], c)]
    ys.append(srv.flush())
    return np.concatenate(ys, axis=2)


def test_streaming_artifact_matches_offline(tmp_path):
    enc = _enc(tmp_path)
    out = str(tmp_path / "artifact")
    export_streaming_encoder(enc, out, chunk=CHUNK, platforms=("cpu",))
    srv = ServingStreamingEncoder(out)
    meta = srv.meta
    assert meta["chunk"] == CHUNK and meta["hop"] == 160
    assert meta["step_frames"] == CHUNK // 160

    rng = np.random.RandomState(0)
    wav = (rng.randn(2, 4 * CHUNK) * 0.2).astype(np.float32)
    got = _stream_all(srv, wav)
    off = np.asarray(enc(wav[:, None, :]))
    # frame accounting: prime + 3*step + flush == offline total
    assert got.shape == off.shape == (2, 24, 4 * CHUNK // 160)
    assert (meta["prime_frames"] + 3 * meta["step_frames"]
            + meta["flush_frames"]) == got.shape[2]
    np.testing.assert_allclose(got, off, atol=2e-5, rtol=2e-5)

    # and equal to the in-process StreamingEncoder to AOT-codegen noise
    # (same trace; the deserialized artifact is AOT-compiled, whose
    # instruction selection differs from jit at the last ulp)
    se = StreamingEncoder(enc, qrnn_impl="scan")
    ys = [se.push(wav[:, i:i + CHUNK])
          for i in range(0, wav.shape[1], CHUNK)] + [se.flush()]
    ref = np.concatenate([np.asarray(y) for y in ys if y is not None],
                         axis=2)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=0)


def test_streaming_symbolic_batch(tmp_path):
    """One artifact serves any (per-stream constant) batch size."""
    enc = _enc(tmp_path)
    out = str(tmp_path / "artifact")
    export_streaming_encoder(enc, out, chunk=CHUNK, platforms=("cpu",))
    srv = ServingStreamingEncoder(out)
    rng = np.random.RandomState(1)
    wav = (rng.randn(3, 2 * CHUNK) * 0.2).astype(np.float32)
    got3 = _stream_all(srv, wav)
    got1 = _stream_all(srv, wav[1:2])
    assert got3.shape[0] == 3
    np.testing.assert_allclose(got1[0], got3[1], atol=1e-6, rtol=1e-6)
    # 1-D convenience input
    srv.reset()
    y = srv.push(wav[0, :CHUNK])
    assert y.shape == (1, 24, srv.meta["prime_frames"])


def test_streaming_chunk_too_small(tmp_path):
    enc = _enc(tmp_path)
    with pytest.raises(ValueError, match="too small"):
        export_streaming_encoder(enc, str(tmp_path / "a"), chunk=160,
                                 platforms=("cpu",))
    with pytest.raises(ValueError, match="divide"):
        export_streaming_encoder(enc, str(tmp_path / "a"), chunk=3201,
                                 platforms=("cpu",))


def test_streaming_consumer_contract(tmp_path):
    srv_dir = str(tmp_path / "artifact")
    enc = _enc(tmp_path)
    export_streaming_encoder(enc, srv_dir, chunk=CHUNK,
                             platforms=("cpu",))
    srv = ServingStreamingEncoder(srv_dir)
    with pytest.raises(RuntimeError, match="nothing pushed"):
        srv.flush()
    with pytest.raises(ValueError, match=str(CHUNK)):
        srv.push(np.zeros(100, np.float32))
    srv.push(np.zeros(CHUNK, np.float32))
    srv.flush()
    with pytest.raises(RuntimeError, match="flushed"):
        srv.push(np.zeros(CHUNK, np.float32))
    srv.reset()
    assert srv.push(np.zeros(CHUNK, np.float32)).shape[0] == 1


def test_streaming_bf16_weights(tmp_path):
    """weights_dtype='bfloat16' streams too: graphs upcast in-graph,
    outputs stay within bf16 weight-rounding of the f32 artifact."""
    enc = _enc(tmp_path)
    a32, a16 = str(tmp_path / "a32"), str(tmp_path / "a16")
    export_streaming_encoder(enc, a32, chunk=CHUNK, platforms=("cpu",))
    export_streaming_encoder(enc, a16, chunk=CHUNK, platforms=("cpu",),
                             weights_dtype="bfloat16")
    s32, s16 = (ServingStreamingEncoder(a32),
                ServingStreamingEncoder(a16))
    assert s16.meta["weights_dtype"] == "bfloat16"
    wav = (np.random.RandomState(4).randn(1, 2 * CHUNK) * 0.2
           ).astype(np.float32)
    y32, y16 = _stream_all(s32, wav), _stream_all(s16, wav)
    assert y16.shape == y32.shape
    assert not np.array_equal(y16, y32)
    assert np.abs(y16 - y32).max() < 0.15


def test_streaming_artifact_resblocks_vq(tmp_path):
    """The residual-trunk + VQ family exports too: _ResBlockStream's
    get/set_state must round-trip through the prime/step/flush graphs
    (decimator + two constant-pad conv FIFOs + identity/h FIFOs), and
    the VQ codebook lookup is part of the exported forward."""
    cfg = dict(CFG, resblocks=True, vq_K=16,
               kwidths=[65, 11, 5, 5])     # resblocks need odd kwidths
    enc = _enc(tmp_path, cfg=cfg)
    out = str(tmp_path / "artifact_rbvq")
    export_streaming_encoder(enc, out, chunk=CHUNK, platforms=("cpu",))
    srv = ServingStreamingEncoder(out)
    rng = np.random.RandomState(5)
    wav = (rng.randn(2, 3 * CHUNK) * 0.2).astype(np.float32)
    got = _stream_all(srv, wav)
    off = np.asarray(enc(wav[:, None, :]))
    assert got.shape == off.shape
    np.testing.assert_allclose(got, off, atol=2e-5, rtol=2e-5)


def test_streaming_cli_roundtrip(tmp_path):
    """export-jax --streaming_chunk + serve-encode --streaming: the CLI
    online path equals the offline pad-and-trim window contract."""
    import util_scripts
    from pase_tpu.data.io import write_wav
    enc = _enc(tmp_path)
    cfg_path = str(tmp_path / "fe.cfg")
    art = str(tmp_path / "art")
    util_scripts.export_jax(argparse.Namespace(
        fe_cfg=cfg_path, fe_ckpt=None, out_dir=art,
        chunk_sizes=str(CHUNK), platforms="cpu", precision="highest",
        weights_dtype=None, streaming_chunk=CHUNK))
    assert os.path.exists(os.path.join(art, "meta_streaming.json"))
    assert os.path.exists(os.path.join(art,
                                       f"streaming_step_C{CHUNK}.jaxexp"))

    rng = np.random.RandomState(3)
    n = CHUNK + 2000                      # ragged tail
    wav = (rng.randn(n) * 0.2).astype(np.float32)
    write_wav(str(tmp_path / "x.wav"), wav)
    util_scripts.serve_encode(argparse.Namespace(
        export_dir=art, in_wav=str(tmp_path / "x.wav"),
        out_file=str(tmp_path / "y.npy"), wav_list=None,
        streaming=True))
    got = np.load(tmp_path / "y.npy")
    # contract: offline forward of the zero-padded stream, trimmed
    # (read the wav back: PCM16 quantization is part of the pipeline)
    from pase_tpu.data.io import read_wav
    wav_q, _ = read_wav(str(tmp_path / "x.wav"))
    padded = np.pad(wav_q.astype(np.float32), (0, (-n) % CHUNK))
    ref = np.asarray(enc(padded[None, None, :]))[0][:, :n // 160]
    assert got.shape == ref.shape == (24, n // 160)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)
