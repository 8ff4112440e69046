"""Streaming encoder == offline encoder, for arbitrary chunkings.

The reference has no streaming path (it re-forwards whole windows,
util_scripts/forward_chunk.py); here we assert our stateful online form
(pase_tpu/streaming.py) is numerically equivalent to the offline
Encoder.__call__ — same frames out regardless of how the waveform is cut.
"""

import numpy as np
import pytest

from pase_tpu.frontend import wf_builder
from pase_tpu.streaming import StreamingEncoder


def _stream(enc, wav, sizes):
    s = StreamingEncoder(enc)
    outs = []
    i = 0
    for n in sizes:
        y = s.push(wav[:, i:i + n])
        if y is not None:
            outs.append(np.asarray(y))
        i += n
    assert i == wav.shape[1]
    y = s.flush()
    if y is not None:
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=2)


def _check(cfg, sizes, T=32000, batch=2, seed=0):
    enc = wf_builder(cfg)
    enc.init()
    rng = np.random.RandomState(seed)
    wav = rng.randn(batch, T).astype(np.float32) * 0.1
    ref = np.asarray(enc(wav))
    got = _stream(enc, wav, sizes)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_streaming_pase_plus_matches_offline():
    # PASE+ trunk: sinc + denseskips + QRNN + norm_out
    _check("cfg/frontend/PASE+.cfg", [5000, 160, 12840, 14000])


@pytest.mark.slow
def test_streaming_uneven_chunks():
    # chunk sizes with no relation to strides or the 160-sample frame
    _check("cfg/frontend/PASE+.cfg", [1000, 777, 13, 20210, 10000])


def test_streaming_pase_v0():
    # PASE v0 trunk: no rnn_pool, no denseskips, emb 100
    _check("cfg/frontend/PASE.cfg", [7000, 9000, 16000], T=32000)


def test_streaming_single_push_equals_offline():
    _check("cfg/frontend/PASE+.cfg", [32000])


def test_streaming_latency_bounded():
    # frames must come out incrementally, not all at flush
    enc = wf_builder("cfg/frontend/PASE+.cfg")
    enc.init()
    rng = np.random.RandomState(1)
    wav = rng.randn(1, 32000).astype(np.float32)
    s = StreamingEncoder(enc)
    n_early = 0
    for i in range(0, 32000, 4000):
        y = s.push(wav[:, i:i + 4000])
        if y is not None and i < 28000:
            n_early += y.shape[2]
    s.flush()
    assert n_early >= 100   # most of the 200 frames emitted before EOS


@pytest.mark.slow
def test_streaming_nondivisible_total_length():
    """Pin the boundary behavior for totals NOT divisible by the stride
    product 160 (streaming.py exactness caveat).

    Parity holds whenever the offline fuse_skip's realized ratio
    ``skip_len // y_len`` still equals the static stride product (e.g.
    T=32073: 32073//200=160) — the leftover samples only shrink the last
    pooling group identically in both forms."""
    # 32073 = 200 frames * 160 + 73 leftover samples
    _check("cfg/frontend/PASE+.cfg", [16000, 16000, 73], T=32073)


@pytest.mark.slow
def test_streaming_nondivisible_dfactor_deviation():
    """When the offline realized ratio DEVIATES from the stride product
    (T=31991: skip0 31991//200 = 159 != 160), offline fuse_skip pools
    159-sample groups — a reference quirk (frontend.py:213-232) that no
    online form can reproduce without knowing the total length. Pin the
    divergence: streaming emits floor(T/160) frames; truncating the
    input to a frame multiple restores exact parity."""
    enc = wf_builder("cfg/frontend/PASE+.cfg")
    enc.init()
    rng = np.random.RandomState(0)
    wav = rng.randn(2, 31991).astype(np.float32) * 0.1
    ref = np.asarray(enc(wav))
    got = _stream(enc, wav, [31991])
    assert ref.shape[2] == 200          # offline: deviant dfactor 159
    assert got.shape[2] == 199          # streaming: floor(31991/160)
    # exact parity returns on the frame-aligned truncation
    t_aligned = (31991 // 160) * 160
    ref2 = np.asarray(enc(wav[:, :t_aligned]))
    got2 = _stream(enc, wav[:, :t_aligned], [t_aligned])
    np.testing.assert_allclose(got2, ref2, rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_streaming_resblocks_vq():
    # residual trunk + VQ8192 + denseskips + QRNN (the shipped
    # PASE+_resblocks_VQ8192.cfg): _ResBlockStream path
    _check("cfg/frontend/PASE+_resblocks_VQ8192.cfg",
           [5000, 160, 12840, 14000])


@pytest.mark.slow
def test_streaming_resblocks_uneven_chunks():
    _check("cfg/frontend/PASE+_resblocks_VQ8192.cfg",
           [1000, 777, 13, 20210, 10000])


@pytest.mark.slow
def test_snapshot_restore_pre_prime():
    """get_state/set_state round-trip taken BEFORE a layer received its
    l+1 priming frames: the snapshot must carry 'started' so the restore
    still injects the left reflect pad (previously set_state hard-coded
    started=True and the restored stream mis-encoded with shifted
    output — ADVICE r3)."""
    enc = wf_builder("cfg/frontend/PASE+.cfg")
    enc.init()
    rng = np.random.RandomState(7)
    wav = rng.randn(2, 32000).astype(np.float32) * 0.1
    ref = np.asarray(enc(wav))

    s1 = StreamingEncoder(enc)
    outs = []
    y = s1.push(wav[:, :60])         # < sinc left pad (125): pre-prime
    if y is not None:
        outs.append(np.asarray(y))
    snap = s1.get_state()
    assert snap["convs"][0]["started"] is False

    s2 = StreamingEncoder(enc)       # fresh object, restore the snapshot
    s2.set_state(snap)
    for i in range(60, 32000, 9000):
        y = s2.push(wav[:, i:i + 9000])
        if y is not None:
            outs.append(np.asarray(y))
    y = s2.flush()
    if y is not None:
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=2)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


@pytest.mark.slow
def test_snapshot_restore_post_prime():
    """Mid-stream (post-prime) snapshot/restore stays exact, and legacy
    snapshots without 'started' (exported artifacts) restore as primed."""
    enc = wf_builder("cfg/frontend/PASE+.cfg")
    enc.init()
    rng = np.random.RandomState(8)
    wav = rng.randn(2, 32000).astype(np.float32) * 0.1
    ref = np.asarray(enc(wav))

    s1 = StreamingEncoder(enc)
    outs = []
    y = s1.push(wav[:, :9000])
    if y is not None:
        outs.append(np.asarray(y))
    snap = s1.get_state()

    # legacy form: strip the 'started' keys; set_state must default True
    def strip(st):
        if isinstance(st, dict):
            return {k: strip(v) for k, v in st.items() if k != "started"}
        if isinstance(st, list):
            return [strip(v) for v in st]
        return st

    s2 = StreamingEncoder(enc)
    s2.set_state(strip(snap))
    for i in range(9000, 32000, 9000):
        y = s2.push(wav[:, i:i + 9000])
        if y is not None:
            outs.append(np.asarray(y))
    y = s2.flush()
    if y is not None:
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=2)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)
