"""AOT serving artifacts (pase_tpu/serving.py): export the frozen
encoder with jax.export, reload it with no model code, and get the
exact forward-chunk features back — the TPU-native replacement for the
reference's torch-checkpoint + in-process deployment
(util_scripts/forward_chunk.py)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from pase_tpu.frontend import wf_builder
from pase_tpu.serving import export_encoder, ServingEncoder

CFG = {"kwidths": [65, 10, 4, 4], "strides": [1, 10, 4, 4],
       "fmaps": [16, 16, 24, 24], "emb_dim": 24, "norm_out": True,
       "rnn_pool": True, "rnn_dim": 24, "qrnn_impl": "scan",
       "denseskips": True}


def _enc(tmp_path):
    p = tmp_path / "fe.cfg"
    p.write_text(json.dumps(CFG))
    enc = wf_builder(str(p))
    enc.init()
    return enc


def _offline_windowed(enc, wav, big):
    """forward_chunk window semantics: windows of the largest bucket,
    zero-padded tail, frames trimmed to len//160."""
    outs = []
    for beg in range(0, wav.shape[-1], big):
        piece = wav[beg:beg + big]
        pad = big - len(piece)
        if pad:
            piece = np.pad(piece, (0, pad))
        y = np.asarray(enc(piece[None, None, :]))[0]     # [emb, F]
        outs.append(y[:, :(big - pad) // 160])
    return np.concatenate(outs, axis=1)


def test_export_reload_matches_offline(tmp_path):
    enc = _enc(tmp_path)
    out = str(tmp_path / "artifact")
    export_encoder(enc, out, chunk_sizes=(1600, 3200), platforms=("cpu",))
    srv = ServingEncoder(out)
    assert srv.buckets == [1600, 3200]
    assert srv.meta["emb_dim"] == 24
    assert srv.meta["hop"] == 160
    # trunk receptive halo recorded for exact tail-bucket routing
    assert srv.halo is not None and srv.halo % 160 == 0

    rng = np.random.RandomState(0)
    # exact bucket, sub-bucket (padded tail), multi-window + ragged tail
    for T in (3200, 2000, 7000):
        wav = (rng.randn(T) * 0.2).astype(np.float32)
        got = srv.encode(wav)
        ref = _offline_windowed(enc, wav, 3200)
        assert got.shape == ref.shape == (24, T // 160)
        np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_export_pins_scan_qrnn(tmp_path):
    """A forced-Pallas QRNN cfg (what 'auto' resolves to on a TPU host)
    must still export: the Pallas block-size arithmetic cannot trace a
    symbolic batch dim, so export_encoder rebuilds with qrnn_impl=scan
    (the recipes/rehearsal.sh export-jax crash)."""
    from pase_tpu.frontend import build_frontend_module
    enc = _enc(tmp_path)    # init under scan (pallas can't run on CPU)
    enc.cfg = {**CFG, "qrnn_impl": "pallas"}
    enc.module = build_frontend_module(enc.cfg)
    out = str(tmp_path / "artifact")
    export_encoder(enc, out, chunk_sizes=(1600,), platforms=("cpu",))
    srv = ServingEncoder(out)
    wav = (np.random.RandomState(0).randn(1600) * 0.2).astype(np.float32)
    got = srv.encode(wav)
    assert got.shape == (24, 10) and np.isfinite(got).all()


def test_concat_densemerge_meta_dim(tmp_path):
    """meta emb_dim must be the REALIZED output dim (concat widens it
    beyond cfg emb_dim — WaveFe.output_dim is a property)."""
    cfg = dict(CFG, densemerge="concat")
    p = tmp_path / "fe.cfg"
    p.write_text(json.dumps(cfg))
    enc = wf_builder(str(p))
    enc.init()
    out = str(tmp_path / "artifact")
    export_encoder(enc, out, chunk_sizes=(1600,), platforms=("cpu",))
    srv = ServingEncoder(out)
    y = srv.encode(np.zeros(1600, np.float32))
    assert y.shape[0] == srv.meta["emb_dim"] > 24


def test_export_symbolic_batch(tmp_path):
    enc = _enc(tmp_path)
    out = str(tmp_path / "artifact")
    export_encoder(enc, out, chunk_sizes=(1600,), platforms=("cpu",))
    srv = ServingEncoder(out)
    wav = (np.random.RandomState(1).randn(3, 1600) * 0.2).astype(np.float32)
    got = srv.encode(wav)                                # [3, emb, F]
    assert got.shape == (3, 24, 10)
    for i in range(3):
        np.testing.assert_allclose(got[i], srv.encode(wav[i]),
                                   atol=1e-6, rtol=1e-6)


def test_resblocks_tail_routing(tmp_path):
    """Resblocks exports record a real halo (time_shard_halo covers the
    residual chain): a tail routed to a smaller covering bucket must
    still equal the largest-bucket (forward-chunk) semantics."""
    cfg = {"kwidths": [65, 21, 11, 11], "strides": [1, 10, 4, 4],
           "fmaps": [16, 16, 24, 24], "emb_dim": 24, "norm_out": True,
           "rnn_pool": True, "rnn_dim": 24, "qrnn_impl": "scan",
           "resblocks": True}
    p = tmp_path / "fe.cfg"
    p.write_text(json.dumps(cfg))
    enc = wf_builder(str(p))
    enc.init()
    out = str(tmp_path / "artifact")
    export_encoder(enc, out, chunk_sizes=(8000, 16000), platforms=("cpu",))
    srv = ServingEncoder(out)
    assert srv.halo is not None
    # tail of 800: 800 + halo fits the 8000 bucket -> smaller-bucket path
    assert 800 + srv.halo <= 8000 < 16000
    T = 16000 + 800
    wav = (np.random.RandomState(6).randn(T) * 0.2).astype(np.float32)
    got = srv.encode(wav)
    ref = _offline_windowed(enc, wav, 16000)
    assert got.shape == ref.shape == (24, T // 160)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_export_bf16_weights(tmp_path):
    """weights_dtype='bfloat16': features stay within bf16 weight
    rounding of the f32 artifact; meta records the quantization."""
    enc = _enc(tmp_path)
    out32 = str(tmp_path / "a32")
    out16 = str(tmp_path / "a16")
    export_encoder(enc, out32, chunk_sizes=(1600,), platforms=("cpu",))
    export_encoder(enc, out16, chunk_sizes=(1600,), platforms=("cpu",),
                   weights_dtype="bfloat16")
    s32, s16 = ServingEncoder(out32), ServingEncoder(out16)
    assert s16.meta["weights_dtype"] == "bfloat16"
    wav = (np.random.RandomState(5).randn(1600) * 0.2).astype(np.float32)
    y32, y16 = s32.encode(wav), s16.encode(wav)
    assert y16.shape == y32.shape
    assert not np.array_equal(y16, y32)          # quantization is real
    # bnorm'd features are O(1); bf16 weights perturb them mildly
    assert np.abs(y16 - y32).max() < 0.15
    # the quantization is recorded exactly: re-export == reload
    np.testing.assert_array_equal(
        np.asarray(ServingEncoder(out16).encode(wav)), y16)


def test_encode_batch_matches_single(tmp_path):
    """Server-side batching: variable-length wavs grouped by bucket and
    run through one exported call must equal per-wav encode exactly;
    over-length wavs fall back to the windowed path."""
    enc = _enc(tmp_path)
    out = str(tmp_path / "artifact")
    export_encoder(enc, out, chunk_sizes=(1600, 3200), platforms=("cpu",))
    srv = ServingEncoder(out)
    rng = np.random.RandomState(8)
    lens = [800, 960, 3200, 2000, 7000]       # mixed buckets + windowed
    wavs = [(rng.randn(n) * 0.2).astype(np.float32) for n in lens]
    outs = srv.encode_batch(wavs)
    for w, o, n in zip(wavs, outs, lens):
        assert o.shape == (24, n // 160)
        np.testing.assert_array_equal(o, srv.encode(w))
    with pytest.raises(ValueError, match="wav 0"):
        srv.encode_batch([np.zeros((2, 1600), np.float32)])


def test_export_tdnn_family(tmp_path):
    """The factory's alternate encoder families export too (TDNN here):
    no recorded halo -> largest-bucket routing, exact vs module apply."""
    enc = wf_builder("cfg/frontend/TDNN.cfg")
    enc.init()
    out = str(tmp_path / "artifact")
    export_encoder(enc, out, chunk_sizes=(3200,), platforms=("cpu",))
    srv = ServingEncoder(out)
    assert srv.halo is None
    wav = (np.random.RandomState(7).randn(3200) * 0.1).astype(np.float32)
    got = srv.encode(wav)
    ref = np.asarray(jax.device_get(
        enc.module.apply(enc.variables, wav[None], train=False)))[0].T
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)


def test_serving_guards(tmp_path):
    enc = _enc(tmp_path)
    out = str(tmp_path / "artifact")
    export_encoder(enc, out, chunk_sizes=(1600,), platforms=("cpu",))
    srv = ServingEncoder(out)
    with pytest.raises(ValueError, match="T >="):
        srv.encode(np.zeros((1, 100), np.float32))
    with pytest.raises(ValueError):
        export_encoder(enc, out, chunk_sizes=(1601,), platforms=("cpu",))
    (tmp_path / "bogus").mkdir()
    (tmp_path / "bogus" / "meta.json").write_text("{}")
    with pytest.raises(ValueError, match="artifact"):
        ServingEncoder(str(tmp_path / "bogus"))


def test_export_serve_cli(tmp_path):
    """util_scripts export-jax + serve-encode round trip, incl. the
    --wav_list batch mode."""
    import argparse
    import util_scripts
    from pase_tpu.data.io import write_wav
    p = tmp_path / "fe.cfg"
    p.write_text(json.dumps(CFG))
    rng = np.random.RandomState(4)
    for name, n in (("a", 1600), ("b", 2500)):
        write_wav(str(tmp_path / f"{name}.wav"),
                  (rng.randn(n) * 0.1).astype(np.float32))
    (tmp_path / "list.txt").write_text("a.wav\nb.wav\n")
    util_scripts.export_jax(argparse.Namespace(
        fe_cfg=str(p), fe_ckpt=None, out_dir=str(tmp_path / "art"),
        chunk_sizes="1600,3200", platforms="cpu", precision="highest",
        weights_dtype=None))
    util_scripts.serve_encode(argparse.Namespace(
        export_dir=str(tmp_path / "art"), in_wav=str(tmp_path / "a.wav"),
        out_file=str(tmp_path / "a.npy"), wav_list=None))
    assert np.load(tmp_path / "a.npy").shape == (24, 10)
    util_scripts.serve_encode(argparse.Namespace(
        export_dir=str(tmp_path / "art"), in_wav=None, out_file=None,
        wav_list=str(tmp_path / "list.txt"), files_root=str(tmp_path),
        out_dir=str(tmp_path / "srv")))
    np.testing.assert_array_equal(np.load(tmp_path / "srv" / "a.npy"),
                                  np.load(tmp_path / "a.npy"))
    assert np.load(tmp_path / "srv" / "b.npy").shape == (24, 2500 // 160)


def test_serving_needs_no_model_code(tmp_path):
    """The consumer contract: a fresh process that never imports
    pase_tpu model code runs the artifact (jax + numpy + the tiny
    loader only)."""
    enc = _enc(tmp_path)
    out = str(tmp_path / "artifact")
    export_encoder(enc, out, chunk_sizes=(1600,), platforms=("cpu",))
    wav = (np.random.RandomState(2).randn(1600) * 0.2).astype(np.float32)
    ref = srv_ref = ServingEncoder(out).encode(wav)
    np.save(tmp_path / "wav.npy", wav)
    code = (
        "import sys, json, numpy as np\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from jax import export as jexport\n"
        "out, wavp = sys.argv[1], sys.argv[2]\n"
        "import os\n"
        "meta = json.load(open(os.path.join(out, 'meta.json')))\n"
        "T = meta['buckets'][0]\n"
        "data = np.load(os.path.join(out, 'params.npz'))\n"
        "tree = {}\n"
        "for k in data.files:\n"
        "    if k == '__meta__': continue\n"
        "    cur = tree\n"
        "    parts = k.split('/')\n"
        "    for p_ in parts[:-1]: cur = cur.setdefault(p_, {})\n"
        "    cur[parts[-1]] = data[k]\n"
        "fn = jexport.deserialize(\n"
        "    open(os.path.join(out, f'encoder_T{T}.jaxexp'), 'rb').read())\n"
        "wav = np.load(wavp)[None]\n"
        "y = np.asarray(fn.call(tree, wav))\n"
        "np.save(sys.argv[3], np.transpose(y[0]))\n"
    )
    script = tmp_path / "consumer.py"
    script.write_text(code)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    subprocess.run([sys.executable, str(script), out,
                    str(tmp_path / "wav.npy"), str(tmp_path / "y.npy")],
                   check=True, env=env, timeout=300)
    got = np.load(tmp_path / "y.npy")
    np.testing.assert_allclose(got, srv_ref, atol=1e-6, rtol=1e-6)
