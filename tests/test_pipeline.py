"""On-device batch preparation semantics (the reference transform-order
contract): targets computed from the CLEAN chunk, encoder input
distorted, ZNorm applied, cchunk = clean copy."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pase_tpu.model import parse_workers_cfg
from pase_tpu.data.pipeline import make_prepare_fn, norm_and_scale
from pase_tpu.data.distortions import DistortionConfig, DistortionAssets

WORKERS = {
    "regr": [{"num_outputs": 39, "hidden_size": 32, "hidden_layers": 1,
              "name": "mfcc", "r": 1, "loss": "MSELoss", "dropout": 0}],
    "cls": [{"num_outputs": 1, "hidden_size": 32, "hidden_layers": 1,
             "name": "overlap", "loss": "BCEWithLogitsLoss", "dropout": 0}],
}


def _batch(b=4, t=4800, seed=0):
    rng = np.random.RandomState(seed)
    return {k: jnp.asarray(rng.randn(b, t).astype(np.float32) * 0.3)
            for k in ("chunk", "chunk_ctxt", "chunk_rand")}


def test_targets_from_clean_input_distorted():
    meta = parse_workers_cfg(WORKERS)
    dcfg = DistortionConfig(clip_p=1.0, clip_factors=(0.3,))
    prep = make_prepare_fn(meta, dist_cfg=dcfg, assets=DistortionAssets())
    raw = _batch()
    out = prep(raw, jax.random.PRNGKey(0))
    # cchunk is the clean chunk
    np.testing.assert_allclose(np.asarray(out["cchunk"]),
                               np.asarray(raw["chunk"]))
    # encoder input is distorted (clipped)
    assert np.abs(np.asarray(out["chunk"]) -
                  np.asarray(raw["chunk"])).max() > 1e-3
    # mfcc targets match features of the CLEAN chunk
    from pase_tpu.ops.features import mfcc
    clean_feats = np.asarray(mfcc(raw["chunk"]))
    np.testing.assert_allclose(np.asarray(out["mfcc"]), clean_feats,
                               atol=1e-4)
    assert out["overlap"].shape == (4, 30)


def test_znorm_applied():
    meta = parse_workers_cfg(WORKERS)
    stats = {"mfcc": {"mean": np.full(39, 5.0, np.float32),
                      "std": np.full(39, 2.0, np.float32)}}
    prep_raw = make_prepare_fn(meta)
    prep_norm = make_prepare_fn(meta, stats=stats)
    raw = _batch()
    a = np.asarray(prep_raw(raw, jax.random.PRNGKey(0))["mfcc"])
    b = np.asarray(prep_norm(raw, jax.random.PRNGKey(0))["mfcc"])
    np.testing.assert_allclose(b, (a - 5.0) / 2.0, atol=1e-5)


def test_norm_and_scale():
    raw = _batch()["chunk"]
    y = np.asarray(norm_and_scale(raw, jax.random.PRNGKey(1)))
    mx = np.abs(y).max(axis=1)
    assert np.all(mx <= 1.0 + 1e-5)  # peak-normalized then gain in [0,1)


def test_bf16_policy_train_step():
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.parallel.mesh import get_mesh, shard_batch
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    cfg = dict(backprop_mode="base", hop=160, bpe=1, epoch=1, batch_size=8,
               chunk_size=4800, log_freq=1, save_path="/tmp/pase_bf16",
               compute_dtype="bfloat16")
    tr = Trainer(fe, WORKERS, cfg, mesh=get_mesh())
    state = tr.init_state(0)
    step = tr._make_train_step()
    b = iter(SyntheticChunkBatcher(8, 4800, seed=0))
    for _ in range(2):
        raw = shard_batch({k: jnp.asarray(v) for k, v in next(b).items()},
                          tr.mesh)
        state, losses = step(state, raw)
    assert np.isfinite(float(losses["total"]))
    # params remain f32 (mixed precision keeps master weights)
    for leaf in jax.tree.leaves(jax.device_get(state.params)):
        assert leaf.dtype == np.float32


def test_int16_wire_format_lossless():
    """wire_dtype='int16': PCM-grid waveforms shipped as int16 and
    dequantized in prepare (pipeline.py) must produce EXACTLY the f32
    pipeline's outputs — the grid roundtrip v -> v*32768 -> int16 ->
    /32768 is the identity for PCM-sourced audio."""
    meta = parse_workers_cfg({
        "regr": [{"num_outputs": 39, "hidden_size": 32, "hidden_layers": 1,
                  "name": "mfcc", "r": 1, "loss": "MSELoss"}],
        "cls": []})
    prep = make_prepare_fn(meta)
    rng = np.random.RandomState(0)
    pcm = rng.randint(-32768, 32768, size=(4, 4800)).astype(np.int16)
    f32 = pcm.astype(np.float32) / 32768.0
    batch_f = {k: jnp.asarray(f32) for k in
               ("chunk", "chunk_ctxt", "chunk_rand")}
    batch_i = {k: jnp.asarray(pcm) for k in
               ("chunk", "chunk_ctxt", "chunk_rand")}
    key = jax.random.PRNGKey(3)
    out_f = prep(batch_f, key)
    out_i = prep(batch_i, key)
    assert set(out_f) == set(out_i)
    for k in out_f:
        np.testing.assert_array_equal(np.asarray(out_f[k]),
                                      np.asarray(out_i[k]), err_msg=k)
