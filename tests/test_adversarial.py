"""GAN worker tests: discriminator shapes/conditioning, spectral norm,
loss objectives, and the full adversarial train step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pase_tpu.adversarial import (WaveDiscriminator, SNConv1D, d_loss_fn,
                                  g_loss_fn, gan_labels)


def test_discriminator_shapes():
    d = WaveDiscriminator(fmaps=(32, 32, 16), strides=(10, 4, 4),
                          kwidths=(30, 30, 30))
    x = jnp.zeros((2, 8000))
    v = d.init(jax.random.PRNGKey(0), x, train=False)
    y = d.apply(v, x, train=False)
    assert y.shape == (2, 1)


def test_discriminator_conditioned():
    d = WaveDiscriminator(fmaps=(32, 16), strides=(10, 4), kwidths=(30, 30))
    x = jnp.zeros((2, 4000))
    cond = jnp.zeros((2, 25, 16))
    v = d.init(jax.random.PRNGKey(0), x, cond, train=False)
    y = d.apply(v, x, cond, train=False)
    assert y.shape == (2, 1)


def test_spectral_norm_bounds_gain():
    """After normalization the weight's top singular value ~ 1."""
    m = SNConv1D(8, 3)
    x = jnp.zeros((1, 16, 4))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    # run a few power iterations
    for _ in range(20):
        _, ups = m.apply(v, x, train=True, mutable=["batch_stats"])
        v = {"params": v["params"], "batch_stats": ups["batch_stats"]}
    k = np.asarray(v["params"]["kernel"]).reshape(-1, 8)
    u = np.asarray(v["batch_stats"]["u"])
    sigma = np.linalg.svd(k, compute_uv=False)[0]
    # kernel/sigma has top singular value 1 by construction once u converges
    v_vec = k @ u / np.linalg.norm(k @ u)
    est = v_vec @ k @ (k.T @ v_vec / np.linalg.norm(k.T @ v_vec))
    assert abs(est - sigma) / sigma < 0.05


@pytest.mark.parametrize("loss_type", ["L2", "BCE", "Hinge"])
def test_gan_objectives(loss_type):
    dr = jnp.asarray([[2.0], [1.5]])
    df = jnp.asarray([[-2.0], [-1.0]])
    dl = float(d_loss_fn(dr, df, loss_type))
    gl = float(g_loss_fn(df, loss_type))
    assert np.isfinite(dl) and np.isfinite(gl)
    # well-separated scores -> small hinge D loss
    if loss_type == "Hinge":
        assert dl < 0.5


@pytest.mark.slow
def test_adversarial_train_step():
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.parallel.mesh import get_mesh, shard_batch
    workers = {
        "regr": [
            {"num_outputs": 1, "dropout": 0, "hidden_size": 32,
             "hidden_layers": 1, "name": "cchunk", "type": "decoder",
             "fmaps": [32, 16, 8], "strides": [4, 4, 10],
             "kwidths": [30, 30, 30], "loss": "L1Loss"},
        ],
        "cls": [
            {"num_outputs": 1, "dropout": 0, "hidden_size": 32,
             "hidden_layers": 1, "name": "mi",
             "loss": "BCEWithLogitsLoss", "skip": False},
        ],
    }
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    cfg = dict(backprop_mode="base", hop=160, bpe=2, epoch=1, batch_size=8,
               chunk_size=4800, log_freq=1, save_path="/tmp/pase_gan_test")
    tr = Trainer(fe, workers, cfg, mesh=get_mesh(),
                 gan_cfg={"worker": "cchunk", "loss": "LSGAN", "lr": 5e-4})
    state = tr.init_state(0)
    step = tr._make_train_step()
    b = iter(SyntheticChunkBatcher(8, 4800, seed=0))
    d0 = jax.device_get(jax.tree.leaves(state.d_params)[0]).copy()
    for _ in range(3):
        raw = shard_batch({k: jnp.asarray(v) for k, v in next(b).items()},
                          tr.mesh)
        state, losses = step(state, raw)
    l = jax.device_get(losses)
    assert np.isfinite(float(l["total"]))
    assert "d_loss" in l and np.isfinite(float(l["d_loss"]))
    assert "cchunk_g" in l
    d1 = jax.device_get(jax.tree.leaves(state.d_params)[0])
    assert np.abs(d1 - d0).max() > 0  # D actually updated


def test_gan_loss_autodetect():
    """Worker cfg with loss=LSGAN routes to the GAN path (reference
    worker_parser semantics)."""
    from pase_tpu.trainer import Trainer
    from pase_tpu.parallel.mesh import get_mesh
    workers = {
        "regr": [
            {"num_outputs": 1, "dropout": 0, "hidden_size": 32,
             "hidden_layers": 1, "name": "cchunk", "type": "decoder",
             "fmaps": [16, 8], "strides": [16, 10],
             "kwidths": [32, 30], "loss": "LSGAN"},
        ],
        "cls": [],
    }
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    cfg = dict(backprop_mode="base", hop=160, bpe=1, epoch=1, batch_size=4,
               chunk_size=4800, log_freq=1, save_path="/tmp/pase_gan_auto")
    tr = Trainer(fe, workers, cfg, mesh=get_mesh())
    assert tr.gan_cfg is not None
    assert tr.gan_cfg["worker"] == "cchunk"
    assert tr.gan_cfg["loss"] == "LSGAN"
    assert tr.meta["regr"][0]["loss_weight"] == 0.0
    state = tr.init_state(0)
    assert state.d_params is not None


def test_z_adversarial_step():
    """Latent prior regularizer (ZAdversarialLoss semantics): D on
    embeddings vs N(0,1); G pushes PASE(chunk) toward the prior."""
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.parallel.mesh import get_mesh, shard_batch
    workers = {
        "regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                  "hidden_layers": 1, "name": "mfcc", "r": 1,
                  "loss": "MSELoss", "skip": False}],
        "cls": [],
    }
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    cfg = dict(backprop_mode="base", hop=160, bpe=1, epoch=1, batch_size=8,
               chunk_size=4800, log_freq=1, save_path="/tmp/pase_zgan")
    tr = Trainer(fe, workers, cfg, mesh=get_mesh(),
                 gan_cfg={"type": "z", "loss": "BCE", "lr": 5e-4,
                          "weight": 0.1})
    state = tr.init_state(0)
    step = tr._make_train_step()
    b = iter(SyntheticChunkBatcher(8, 4800, seed=0))
    for _ in range(2):
        raw = shard_batch({k: jnp.asarray(v) for k, v in next(b).items()},
                          tr.mesh)
        state, losses = step(state, raw)
    l = jax.device_get(losses)
    assert "z_g" in l and "d_loss" in l
    for k, v in l.items():
        assert np.isfinite(float(v)), k


def test_z_adversarial_warmup_ramp():
    """Legacy Waveminionet z warm-up (core.py:179-182,302-303,378-397):
    before `warmup` steps neither G nor D trains on the adversarial
    objective; after it the ramped weight kicks in."""
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.parallel.mesh import get_mesh, shard_batch
    workers = {
        "regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                  "hidden_layers": 1, "name": "mfcc", "r": 1,
                  "loss": "MSELoss", "skip": False}],
        "cls": [],
    }
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    cfg = dict(backprop_mode="base", hop=160, bpe=1, epoch=1, batch_size=8,
               chunk_size=4800, log_freq=1, save_path="/tmp/pase_zwarm")
    tr = Trainer(fe, workers, cfg, mesh=get_mesh(),
                 gan_cfg={"type": "z", "loss": "BCE", "lr": 5e-4,
                          "weight": 0.1, "warmup": 1,
                          "zinit_weight": 0.5, "zinc": 0.25})
    state = tr.init_state(0)
    step = tr._make_train_step()
    b = iter(SyntheticChunkBatcher(8, 4800, seed=0))

    def dp0():
        return jax.device_get(
            jax.tree_util.tree_leaves(state.d_params)[0]).copy()

    d_before = dp0()
    raw = shard_batch({k: jnp.asarray(v) for k, v in next(b).items()},
                      tr.mesh)
    state, losses0 = step(state, raw)          # step 0 < warmup: gated
    d_after0 = dp0()
    np.testing.assert_array_equal(d_before, d_after0)
    # the whole optimizer update is skipped pre-warmup: Adam moments and
    # step count must be untouched (not merely a zeroed update)
    counts = [int(jax.device_get(l)) for l in
              jax.tree_util.tree_leaves(state.d_opt_state)
              if getattr(l, "ndim", None) == 0]
    assert all(c == 0 for c in counts), counts
    l0 = jax.device_get(losses0)
    # z_g is reported but its weighted contribution is zero
    mfcc_plus_total0 = float(l0["total"])
    assert np.isclose(mfcc_plus_total0, float(l0["mfcc"]), rtol=1e-5)

    raw = shard_batch({k: jnp.asarray(v) for k, v in next(b).items()},
                      tr.mesh)
    state, losses1 = step(state, raw)          # step 1 >= warmup: active
    d_after1 = dp0()
    assert not np.allclose(d_after0, d_after1), "D did not train"
    l1 = jax.device_get(losses1)
    # total now includes 0.1 * ramp(0.5) * z_g
    assert not np.isclose(float(l1["total"]), float(l1["mfcc"]),
                          rtol=1e-5)


def test_z_adversarial_cchunk_prior():
    """gan_cfg cchunk_prior: the z-discriminator's 'real' samples are
    PASE(cchunk) embeddings instead of N(0,1) (core.py:381-384) — the
    model forwards cchunk even without a regularizer worker."""
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.parallel.mesh import get_mesh, shard_batch
    workers = {
        "regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                  "hidden_layers": 1, "name": "mfcc", "r": 1,
                  "loss": "MSELoss", "skip": False}],
        "cls": [],
    }
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    cfg = dict(backprop_mode="base", hop=160, bpe=1, epoch=1, batch_size=8,
               chunk_size=4800, log_freq=1, save_path="/tmp/pase_zccp")
    tr = Trainer(fe, workers, cfg, mesh=get_mesh(),
                 gan_cfg={"type": "z", "loss": "BCE", "lr": 5e-4,
                          "weight": 0.1, "cchunk_prior": True})
    assert tr.model.force_cchunk
    state = tr.init_state(0)
    step = tr._make_train_step()
    b = iter(SyntheticChunkBatcher(8, 4800, seed=0))
    for _ in range(2):
        raw = shard_batch({k: jnp.asarray(v) for k, v in next(b).items()},
                          tr.mesh)
        state, losses = step(state, raw)
    l = jax.device_get(losses)
    assert "z_g" in l and "d_loss" in l
    for k, v in l.items():
        assert np.isfinite(float(v)), k
