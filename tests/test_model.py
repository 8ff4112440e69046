"""Multi-task PASE model assembly tests: shapes, label synthesis, losses,
and head parity vs the reference minions."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pase_tpu.model import build_pase, worker_losses
from pase_tpu.ops import features as F

PASEP_CFG = "/root/reference/cfg/frontend/PASE+.cfg"
WORKERSP_CFG = "/root/reference/cfg/workers/workers+.cfg"

B, T = 2, 8000   # small chunk for test speed
HOP = 160


def _make_batch(rng):
    keys = jax.random.split(rng, 8)
    batch = {
        "chunk": jax.random.normal(keys[0], (B, T)) * 0.1,
        "chunk_ctxt": jax.random.normal(keys[1], (B, T)) * 0.1,
        "chunk_rand": jax.random.normal(keys[2], (B, T)) * 0.1,
        "cchunk": jax.random.normal(keys[3], (B, T)) * 0.1,
        "overlap": jnp.zeros((B, T // HOP)),
    }
    clean = batch["cchunk"]
    with open(WORKERSP_CFG) as f:
        wcfg = json.load(f)
    targets = {}
    for w in wcfg["regr"]:
        name = w["name"]
        fn = F.feature_fn_for_worker(name, w.get("transform"))
        if fn is not None:
            targets[name] = fn(clean)
    batch.update(targets)
    return batch


@pytest.fixture(scope="module")
def model_and_batch():
    model, meta = build_pase(PASEP_CFG, WORKERSP_CFG)
    rng = jax.random.PRNGKey(0)
    batch = _make_batch(rng)
    variables = model.init({"params": rng, "sample": rng, "dropout": rng},
                           batch, train=False)
    return model, meta, batch, variables


def test_forward_shapes_and_labels(model_and_batch):
    model, meta, batch, variables = model_and_batch
    h, chunk, preds, labels = model.apply(
        variables, batch, train=False,
        rngs={"sample": jax.random.PRNGKey(1)})
    frames = T // HOP
    assert chunk.shape == (B, frames, 256)
    # regression heads: r=7 multi-frame outputs
    assert preds["lps"].shape == (B, frames, 3075 * 7)
    assert preds["mfcc"].shape == (B, frames, 39 * 7)
    assert preds["cchunk"].shape == (B, T, 1)
    # contrastive: mi = 2B pos + 2B neg? (no augment for mi) -> 2B
    assert preds["mi"].shape == (2 * B, frames, 1)
    assert labels["mi"].shape == (2 * B, frames, 1)
    np.testing.assert_allclose(np.asarray(labels["mi"][:B]), 1.0)
    np.testing.assert_allclose(np.asarray(labels["mi"][B:]), 0.0)
    # cmi has augment=true -> doubled batch, time-averaged
    assert preds["cmi"].shape == (4 * B, 1, 1)


def test_losses_finite(model_and_batch):
    model, meta, batch, variables = model_and_batch
    h, chunk, preds, labels = model.apply(
        variables, batch, train=False,
        rngs={"sample": jax.random.PRNGKey(1)})
    losses = worker_losses(meta, preds, labels)
    assert set(losses) == {"cchunk", "lps", "lps_long", "fbank",
                           "fbank_long", "gtn", "gtn_long", "mfcc",
                           "mfcc_long", "prosody", "mi", "cmi"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_contextualize_matches_reference(ref):
    import torch
    from pase.losses import ContextualizedLoss
    from pase_tpu.losses import contextualize_r
    rng = np.random.RandomState(0)
    g = rng.randn(2, 5, 10).astype(np.float32)   # torch (B, D, T)
    closs = ContextualizedLoss(torch.nn.MSELoss(), r=7)
    ref_framed = closs.contextualize_r(torch.tensor(g)).numpy()  # (B,D*7,T)
    ours = np.asarray(contextualize_r(jnp.asarray(g.transpose(0, 2, 1)), 7))
    np.testing.assert_allclose(ours.transpose(0, 2, 1), ref_framed,
                               atol=1e-6)


def test_mlp_minion_parity(ref):
    """MLPMinion forward parity with converted torch weights."""
    import torch
    from pase.models.Minions.minions import MLPMinion as RefMLP
    from pase_tpu.minions import MLPMinion
    from pase_tpu.checkpoint import torch_to_variables
    tm = RefMLP(num_inputs=64, num_outputs=10, dropout=0.0,
                hidden_size=32, hidden_layers=2, skip=False, r=3)
    tm.eval()
    x = np.random.RandomState(1).randn(2, 64, 50).astype(np.float32)
    with torch.no_grad():
        y_ref = tm(torch.tensor(x)).numpy()
    m = MLPMinion(num_outputs=10, hidden_size=32, hidden_layers=2, r=3)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.asarray(x.transpose(0, 2, 1)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_variables(sd, variables)
    y = np.asarray(m.apply(variables, jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(y.transpose(0, 2, 1), y_ref, atol=2e-5)


def test_decoder_minion_parity(ref):
    import torch
    from pase.models.Minions.minions import DecoderMinion as RefDec
    from pase_tpu.minions import DecoderMinion
    from pase_tpu.checkpoint import torch_to_variables
    cfg = dict(num_inputs=32, num_outputs=1, dropout=0.0, hidden_size=16,
               hidden_layers=1, fmaps=[32, 16, 8], strides=[4, 4, 10],
               kwidths=[30, 30, 30], skip=False)
    tm = RefDec(**cfg)
    tm.eval()
    x = np.random.RandomState(2).randn(1, 32, 20).astype(np.float32)
    with torch.no_grad():
        y_ref = tm(torch.tensor(x)).numpy()
    m = DecoderMinion(num_outputs=1, hidden_size=16, hidden_layers=1,
                      fmaps=(32, 16, 8), strides=(4, 4, 10),
                      kwidths=(30, 30, 30))
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.asarray(x.transpose(0, 2, 1)))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = torch_to_variables(sd, variables)
    y = np.asarray(m.apply(variables, jnp.asarray(x.transpose(0, 2, 1))))
    assert y.transpose(0, 2, 1).shape == y_ref.shape
    np.testing.assert_allclose(y.transpose(0, 2, 1), y_ref, atol=2e-5)


def test_patterned_dropout():
    from pase_tpu.nn import PatternedDropout
    import jax
    x = jnp.ones((2, 10, 16))
    m = PatternedDropout(emb_size=16, p=0.5, dropout_mode="fixed_given",
                         range_fixed="4:12")
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=True)
    y = np.asarray(m.apply(v, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)}))
    # protected range 4:12 untouched
    np.testing.assert_allclose(y[..., 4:12], 1.0)
    outside = y[..., list(range(4)) + list(range(12, 16))]
    assert set(np.unique(outside.round(4))) <= {0.0, 2.0}
    # eval mode = identity
    ye = np.asarray(m.apply(v, x, train=False))
    np.testing.assert_allclose(ye, 1.0)


def test_mlp_minion_with_dropin():
    from pase_tpu.minions import MLPMinion
    import jax
    m = MLPMinion(num_outputs=4, hidden_size=8, hidden_layers=1,
                  dropin=0.3, dropin_mode="fixed_rand", ratio_fixed=0.5)
    x = jnp.ones((2, 10, 16))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, train=True)
    y = m.apply(v, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert y.shape == (2, 10, 4)


def test_gru_minion():
    from pase_tpu.minions import GRUMinion
    import jax
    m = GRUMinion(num_outputs=5, hidden_size=16, hidden_layers=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 8)
                    .astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 12, 5)


def test_spc_minion_shapes():
    from pase_tpu.minions import SPCMinion
    import jax
    m = SPCMinion(num_outputs=1, hidden_size=16, hidden_layers=1,
                  ctxt_frames=5, seq_pad=16)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 100, 8)
                    .astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0),
                "sample": jax.random.PRNGKey(1)}, x)
    y = m.apply(v, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert y.shape == (6, 1, 1)   # pos batch + neg batch


def test_gap_minion_labels():
    from pase_tpu.minions import GapMinion
    import jax
    m = GapMinion(num_outputs=1, hidden_size=16, hidden_layers=1)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 50, 8)
                    .astype(np.float32))
    v = m.init({"params": jax.random.PRNGKey(0),
                "sample": jax.random.PRNGKey(1)}, x)
    y, dists = m.apply(v, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert y.shape == (4, 1, 1)
    d = np.asarray(dists).reshape(-1)
    assert np.all((d >= 0) & (d <= 1))


def test_torch_gru_conversion(ref):
    """torch nn.GRU weights -> flax GRUCell: sequence outputs match."""
    import torch
    from flax import linen as fnn
    from pase_tpu.checkpoint import torch_gru_params
    torch.manual_seed(0)
    gru = torch.nn.GRU(6, 10, num_layers=1, batch_first=True)
    x = np.random.RandomState(0).randn(2, 15, 6).astype(np.float32)
    with torch.no_grad():
        y_ref, _ = gru(torch.tensor(x))
    sd = {f"g.{k}": v.numpy() for k, v in gru.state_dict().items()}
    params = torch_gru_params(sd, "g")
    cell = fnn.GRUCell(features=10)
    rnn = fnn.RNN(cell)
    v = rnn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    from flax.core import unfreeze
    base = unfreeze(v)["params"]["cell"]
    for k in params:
        for kk in params[k]:
            assert base[k][kk].shape == params[k][kk].shape, (k, kk)
    y = rnn.apply({"params": {"cell": params}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), y_ref.numpy(), atol=2e-5)
