"""WaveRNN vocoder worker tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pase_tpu import wavernn as W


def _module(mode="RAW"):
    return W.WaveRNNMinion(num_inputs=16, rnn_dims=32, fc_dims=32, bits=8,
                           mode=mode, pad=2, upsample_scales=(4, 4, 10),
                           res_out_dims=32)


def test_upsample_network():
    m = W.UpsampleNetwork(upsample_scales=(4, 4, 10), compute_dims=32,
                          res_blocks=2, res_out_dims=32, pad=2)
    x = jnp.zeros((2, 14, 16))  # 10 frames + 2*pad
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    mels, aux = m.apply(v, x, train=False)
    # both streams end at (frames - 2*pad) * prod(scales) samples
    assert mels.shape == (2, 10 * 160, 16)
    assert aux.shape[1] == 10 * 160


def test_wavernn_forward_raw():
    m = _module("RAW")
    frames = 6
    t = frames * 160
    mels = jnp.zeros((2, frames + 4, 16))
    x = jnp.zeros((2, t))
    v = m.init(jax.random.PRNGKey(0), x, mels, train=False)
    y = m.apply(v, x, mels, train=False)
    assert y.shape == (2, t, 256)
    wav = jax.random.uniform(jax.random.PRNGKey(1), (2, t), minval=-1,
                             maxval=1)
    loss = W.raw_loss(y, wav, bits=8)
    assert np.isfinite(float(loss))


def test_wavernn_forward_mol():
    m = _module("MOL")
    frames = 4
    t = frames * 160
    mels = jnp.zeros((2, frames + 4, 16))
    x = jnp.zeros((2, t))
    v = m.init(jax.random.PRNGKey(0), x, mels, train=False)
    y = m.apply(v, x, mels, train=False)
    assert y.shape == (2, t, 30)
    wav = jax.random.uniform(jax.random.PRNGKey(1), (2, t), minval=-1,
                             maxval=1)
    loss = W.discretized_mix_logistic_loss(y, wav)
    assert np.isfinite(float(loss))


def test_mu_law_roundtrip():
    x = jnp.linspace(-0.99, 0.99, 101)
    enc = W.encode_mu_law(x, 256)
    dec = W.decode_mu_law(enc.astype(jnp.float32), 256, from_labels=True)
    assert float(jnp.abs(dec - x).max()) < 0.03


def test_mol_sampling():
    logits = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 30))
    s = W.sample_from_discretized_mix_logistic(logits,
                                               jax.random.PRNGKey(1))
    assert s.shape == (2, 5)
    assert float(jnp.abs(s).max()) <= 1.0


def test_fold_xfade_roundtrip():
    rng = np.random.RandomState(0)
    x = rng.randn(1000, 3).astype(np.float32)
    folded = W.fold_with_overlap(x, target=200, overlap=50)
    assert folded.shape[1] == 300
    # equal-power crossfade: amplitude stays within [0, sqrt(2)] on a
    # constant signal and is exactly 1 outside overlap regions
    y = np.ones((folded.shape[0], 300))
    out = W.xfade_and_unfold(y, overlap=50)
    assert out[100:190].max() <= 1.0 + 1e-6        # pure target region
    np.testing.assert_allclose(out[100:190], 1.0, atol=1e-6)
    assert out.max() <= np.sqrt(2) + 1e-6


def test_generate():
    m = _module("RAW")
    frames = 4
    mels = jnp.zeros((1, frames + 4, 16))
    x = jnp.zeros((1, frames * 160))
    v = m.init(jax.random.PRNGKey(0), x, mels, train=False)
    wav = W.generate(m, v, mels, jax.random.PRNGKey(2), mode="RAW", bits=8)
    assert wav.shape == (1, frames * 160)
    assert float(jnp.abs(wav).max()) <= 1.0 + 1e-5  # mu-law decode rounding


@pytest.mark.slow
def test_wavernn_worker_in_train_step():
    """The wavernn minion type is wired into the worker bank (unlike the
    reference, whose pase.py:336 wiring is broken): one jitted step with
    a wavernn regr worker runs, loss is finite, and encoder params move."""
    import numpy as np
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.parallel.mesh import get_mesh, shard_batch

    workers = {
        "regr": [
            {"num_outputs": 39, "dropout": 0, "hidden_size": 32,
             "hidden_layers": 1, "name": "mfcc", "r": 1,
             "loss": "MSELoss", "skip": False},
            {"name": "wavernn", "type": "wavernn", "loss": "WaveRNNLoss",
             "num_inputs": 32, "rnn_dims": 16, "fc_dims": 16,
             "bits": 4, "mode": "RAW", "pad": 2, "res_out_dims": 8,
             "upsample_scales": [4, 4, 10], "loss_weight": 0.5},
        ],
        "cls": [],
    }
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    cfg = dict(backprop_mode="base", hop=160, bpe=1, epoch=1,
               batch_size=8, chunk_size=1600, log_freq=1,
               save_path="/tmp/wavernn_step")
    tr = Trainer(fe, workers, cfg, mesh=get_mesh())
    state = tr.init_state(0)
    step = tr._make_train_step()
    raw = shard_batch({k: jnp.asarray(v) for k, v in
                       next(iter(SyntheticChunkBatcher(8, 1600))).items()},
                      tr.mesh)
    p0 = jax.device_get(
        jax.tree_util.tree_leaves(state.params["frontend"])[0])
    state, losses = step(state, raw)
    l = jax.device_get(losses)
    assert np.isfinite(l["wavernn"]) and l["wavernn"] > 0
    # RAW CE at bits=4 starts near log(16)
    assert l["wavernn"] < 2 * np.log(2 ** 4)
    p1 = jax.device_get(
        jax.tree_util.tree_leaves(state.params["frontend"])[0])
    assert not np.allclose(p0, p1), "no gradient reached the encoder"
