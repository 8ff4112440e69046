"""Sequence-parallel (time-sharded) encoder forward: the full PASE+
frontend with the TIME axis sharded over the 8-device mesh must equal
the offline whole-utterance forward (pase_tpu/parallel/sp.py — the
SURVEY §5.7 long-context lever; the conv trunk shards with halos, the
QRNN carry composes across devices as a two-level scan)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pase_tpu.frontend import wf_builder
from pase_tpu.parallel.mesh import get_mesh
from pase_tpu.parallel.sp import (encode_time_sharded, time_sharded_apply,
                                  time_shard_halo)


def _forward_offline(enc, wav):
    return np.asarray(jax.device_get(
        enc.module.apply(enc.variables, wav, train=False)))


@pytest.mark.slow
def test_time_sharded_equals_offline_pase_plus():
    enc = wf_builder("cfg/frontend/PASE+.cfg")
    enc.init()
    mesh = get_mesh()
    D = mesh.shape["data"]
    H = time_shard_halo(enc.module)
    assert H % 160 == 0
    T = D * 4800                       # 2.4 s, Tl=4800 > 2H/(D-1)
    rng = np.random.RandomState(0)
    wav = rng.randn(2, T).astype(np.float32) * 0.2

    ref = _forward_offline(enc, wav)
    got = np.asarray(jax.device_get(
        encode_time_sharded(enc, wav, mesh)))
    assert got.shape == ref.shape == (2, T // 160, 256)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_time_sharded_multi_layer_qrnn(tmp_path):
    """rnn_layers=2 exercises the cross-shard boundary-frame ppermute
    for deeper QRNN layers."""
    cfg = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
           "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True,
           "rnn_pool": True, "rnn_dim": 32, "rnn_layers": 2,
           "qrnn_impl": "scan", "denseskips": True}
    p = tmp_path / "fe.cfg"
    p.write_text(json.dumps(cfg))
    enc = wf_builder(str(p))
    enc.init()
    mesh = get_mesh()
    D = mesh.shape["data"]
    T = D * 3200
    rng = np.random.RandomState(1)
    wav = rng.randn(1, T).astype(np.float32) * 0.2

    ref = _forward_offline(enc, wav)
    got = np.asarray(jax.device_get(
        encode_time_sharded(enc, wav, mesh)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_time_sharded_gradients_equal_offline(tmp_path):
    """Context-parallel TRAINING: grads of a loss on the time-sharded
    forward (shard_map transposes the halo slices / carry collectives)
    must equal offline grads — long-sequence training shards activation
    memory 1/D without changing the training signal."""
    cfg = {"kwidths": [65, 10, 4, 4], "strides": [1, 10, 4, 4],
           "fmaps": [16, 16, 24, 24], "emb_dim": 24, "norm_out": True,
           "rnn_pool": True, "rnn_dim": 24, "qrnn_impl": "scan",
           "denseskips": True}
    p = tmp_path / "fe.cfg"
    p.write_text(json.dumps(cfg))
    enc = wf_builder(str(p))
    enc.init()
    mesh = get_mesh()
    D = mesh.shape["data"]
    T = D * 3200
    rng = np.random.RandomState(2)
    wav = rng.randn(1, T).astype(np.float32) * 0.2
    w = rng.randn(1, T // 160, 24).astype(np.float32)

    def loss_sp(variables):
        y = time_sharded_apply(enc.module, variables, wav, mesh)
        return jnp.mean(y * w)

    def loss_off(variables):
        y = enc.module.apply(variables, wav, train=False)
        return jnp.mean(y * w)

    g_sp = jax.grad(loss_sp)(enc.variables)["params"]
    g_off = jax.grad(loss_off)(enc.variables)["params"]
    flat_sp, _ = jax.tree_util.tree_flatten_with_path(g_sp)
    flat_off = dict(jax.tree_util.tree_flatten_with_path(g_off)[0])
    assert flat_sp
    for path, leaf in flat_sp:
        ref = flat_off[path]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(ref),
                                   atol=1e-5, rtol=1e-4,
                                   err_msg=str(path))


@pytest.mark.slow
def test_time_sharded_resblocks(tmp_path):
    """The residual trunk (shipped PASE+_resblocks_VQ8192.cfg topology,
    shrunk): decimation + zero-padded stride-1 convs shard with the
    same halo scheme; offline equality holds."""
    cfg = {"kwidths": [65, 21, 11, 11], "strides": [1, 10, 4, 4],
           "fmaps": [16, 16, 24, 24], "emb_dim": 24, "norm_out": True,
           "rnn_pool": True, "rnn_dim": 24, "qrnn_impl": "scan",
           "denseskips": True, "resblocks": True, "vq_K": 16}
    p = tmp_path / "fe.cfg"
    p.write_text(json.dumps(cfg))
    enc = wf_builder(str(p))
    enc.init()
    mesh = get_mesh()
    D = mesh.shape["data"]
    H = time_shard_halo(enc.module)
    assert H % 160 == 0
    T = D * max(3200, 2 * H // max(D - 1, 1) + 320)
    T = (T // (D * 160)) * (D * 160)
    rng = np.random.RandomState(4)
    wav = rng.randn(1, T).astype(np.float32) * 0.2

    ref = _forward_offline(enc, wav)
    got = np.asarray(jax.device_get(encode_time_sharded(enc, wav, mesh)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_time_sharded_vq_straight_through(tmp_path):
    """VQ cfgs: forward emits the quantized codes; grads pass straight
    through to the encoder params (identity STE), matching the offline
    quantizer semantics instead of silently zeroing encoder grads."""
    cfg = {"kwidths": [65, 10, 4, 4], "strides": [1, 10, 4, 4],
           "fmaps": [16, 16, 24, 24], "emb_dim": 24, "rnn_pool": True,
           "rnn_dim": 24, "qrnn_impl": "scan", "vq_K": 16}
    p = tmp_path / "fe.cfg"
    p.write_text(json.dumps(cfg))
    enc = wf_builder(str(p))
    enc.init()
    mesh = get_mesh()
    D = mesh.shape["data"]
    T = D * 3200
    rng = np.random.RandomState(3)
    wav = rng.randn(1, T).astype(np.float32) * 0.2

    ref = _forward_offline(enc, wav)
    got = np.asarray(jax.device_get(encode_time_sharded(enc, wav, mesh)))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)

    def loss(variables):
        y = time_sharded_apply(enc.module, variables, wav, mesh)
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(enc.variables)["params"]
    gnorm = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0.0


def test_time_sharded_guards(tmp_path):
    enc = wf_builder("cfg/frontend/PASE+.cfg")
    enc.init()
    mesh = get_mesh()
    D = mesh.shape["data"]
    with pytest.raises(ValueError, match="divide"):
        encode_time_sharded(
            enc, np.zeros((1, D * 160 + 1), np.float32), mesh)
    with pytest.raises(ValueError, match="too short"):
        encode_time_sharded(
            enc, np.zeros((1, D * 160), np.float32), mesh)
    cfg = {"kwidths": [65, 10, 4, 4], "strides": [1, 10, 4, 4],
           "fmaps": [16, 16, 24, 24], "emb_dim": 24, "norm_type": "inorm"}
    p = tmp_path / "fe_inorm.cfg"
    p.write_text(json.dumps(cfg))
    enc2 = wf_builder(str(p))
    enc2.init()
    with pytest.raises(NotImplementedError, match="InstanceNorm"):
        encode_time_sharded(
            enc2, np.zeros((1, D * 3200), np.float32), mesh)
    cfg = {"kwidths": [65, 20, 11, 11], "strides": [1, 10, 4, 4],
           "fmaps": [16, 16, 24, 24], "emb_dim": 24, "resblocks": True}
    p2 = tmp_path / "fe_even.cfg"
    p2.write_text(json.dumps(cfg))
    enc3 = wf_builder(str(p2))
    with pytest.raises(ValueError, match="even resblock"):
        time_shard_halo(enc3.module)
