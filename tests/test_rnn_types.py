"""rnn_type lstm/gru context layers + rnn_dropout (VERDICT r3 #3).

The reference's build_rnn_block dispatches QRNN *or* torch nn.LSTM/GRU
(/root/reference/pase/models/modules.py:45-60, used at frontend.py:257-262
with bidirectional=True and hidden rnn_dim//2). These tests pin:
  * numerical parity of BiRNN (nn.py) vs the torch oracle through the
    full WaveFe, both conversion directions,
  * rnn_dropout actually doing something (torchqrnn/torch semantics:
    inter-layer dropout, layers>1 only),
  * loud failure on unrecognized rnn_type (previously silently ignored).
"""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pase_tpu.frontend import wf_builder, build_wavefe
from pase_tpu.checkpoint import torch_to_variables

PASEP_CFG = "/root/reference/cfg/frontend/PASE+.cfg"


def _small_cfg(tmp_path, **over):
    cfg = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
           "fmaps": [32, 32, 64, 64], "emb_dim": 64, "norm_out": True,
           "rnn_pool": True, "rnn_dim": 64, "denseskips": True}
    cfg.update(over)
    p = tmp_path / "fe.cfg"
    p.write_text(json.dumps(cfg))
    return str(p)


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
def test_wavefe_rnn_type_matches_reference(ref, tmp_path, rnn_type):
    """Full PASE+ cfg with rnn_type lstm/gru: torch oracle forward ==
    ours with converted weights."""
    import torch
    from pase.models.frontend import wf_builder as ref_builder
    with open(PASEP_CFG) as f:
        cfg = json.load(f)
    cfg["rnn_type"] = rnn_type
    p = tmp_path / "fe.cfg"
    p.write_text(json.dumps(cfg))

    fe = ref_builder(str(p))
    fe.eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 8000).astype(np.float32)
    with torch.no_grad():
        y_ref = fe(torch.tensor(x)).numpy()
    sd = {k: v.numpy() for k, v in fe.state_dict().items()}

    enc = wf_builder(str(p))
    enc.init(example_len=8000)
    enc.variables = torch_to_variables(sd, enc.variables, load_last=True)
    y = np.asarray(enc(x))
    assert y.shape == y_ref.shape
    err = np.abs(y - y_ref).max() / max(np.abs(y_ref).max(), 1e-6)
    assert err < 2e-4, err


@pytest.mark.parametrize("rnn_type", ["lstm", "gru"])
def test_rnn_type_torch_roundtrip(ref, tmp_path, rnn_type):
    """Reverse direction: our random init -> export-torch -> reference
    WaveFe forward parity (the FE_e*.ckpt interop contract)."""
    import argparse
    import torch
    import util_scripts
    from pase.models.frontend import wf_builder as ref_builder
    from pase_tpu.checkpoint import save_variables

    cfg_path = _small_cfg(tmp_path, rnn_type=rnn_type, rnn_layers=2)
    enc = wf_builder(cfg_path)
    enc.init(example_len=8000)
    npz = str(tmp_path / "FE_e0.npz")
    save_variables(npz, enc.variables, 0)
    tckpt = str(tmp_path / "FE_e0.ckpt")
    util_scripts.export_torch(argparse.Namespace(in_ckpt=npz,
                                                 out_ckpt=tckpt))

    fe = ref_builder(cfg_path)
    fe.load_pretrained(tckpt, load_last=True, verbose=False)
    fe.eval()
    rng = np.random.RandomState(1)
    x = rng.randn(2, 1, 8000).astype(np.float32)
    with torch.no_grad():
        y_ref = fe(torch.tensor(x)).numpy()
    y = np.asarray(enc(x))
    err = np.abs(y - y_ref).max() / max(np.abs(y_ref).max(), 1e-6)
    assert err < 2e-4, err


def test_unknown_rnn_type_raises(tmp_path):
    """A typo'd rnn_type must raise (reference modules.py:58-59) — the
    silent fall-through to QRNN trained the wrong architecture."""
    cfg_path = _small_cfg(tmp_path, rnn_type="elman")
    enc = wf_builder(cfg_path)
    with pytest.raises(TypeError, match="Unrecognized rnn type"):
        enc.init(example_len=4000)


@pytest.mark.parametrize("rnn_type", ["qrnn", "lstm"])
def test_rnn_dropout_interlayer(tmp_path, rnn_type):
    """rnn_dropout is honored: train-mode forwards differ across dropout
    keys for layers=2 (torch/torchqrnn apply it between layers only), and
    eval mode is deterministic and matches dropout=0."""
    cfg_path = _small_cfg(tmp_path, rnn_type=rnn_type, rnn_layers=2,
                          rnn_dropout=0.5, qrnn_impl="scan")
    enc = wf_builder(cfg_path)
    enc.init(example_len=4000)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 4000)
                    .astype(np.float32))
    mod, v = enc.module, enc.variables

    def fwd(train, seed):
        y, _ = mod.apply(v, x, train=train,
                         rngs={"dropout": jax.random.PRNGKey(seed)},
                         mutable=["batch_stats"])
        return np.asarray(y)

    t1, t2 = fwd(True, 0), fwd(True, 1)
    assert np.abs(t1 - t2).max() > 1e-4      # dropout is live in train
    e1 = np.asarray(mod.apply(v, x, train=False))
    e2 = np.asarray(mod.apply(v, x, train=False))
    np.testing.assert_array_equal(e1, e2)    # eval: deterministic

    # eval == the dropout=0 config's eval (scaling is train-time only)
    cfg0 = _small_cfg(tmp_path, rnn_type=rnn_type, rnn_layers=2,
                      rnn_dropout=0.0, qrnn_impl="scan")
    enc0 = wf_builder(cfg0)
    enc0.init(example_len=4000)
    enc0.variables = v
    # Encoder() emits the public (B, C, T') layout; e1 is internal NTC
    np.testing.assert_allclose(np.asarray(enc0(x)),
                               e1.transpose(0, 2, 1), atol=1e-6)


def test_lstm_frontend_trains(tmp_path):
    """End-to-end train steps with an lstm context layer: finite losses,
    params move."""
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.parallel.mesh import get_mesh, shard_batch
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [32, 32, 64, 64], "emb_dim": 64, "norm_out": True,
          "rnn_pool": True, "rnn_dim": 64, "rnn_type": "lstm"}
    wk = {"regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 64,
                    "hidden_layers": 1, "name": "mfcc", "context": 1,
                    "r": 1, "loss": "MSELoss", "skip": False}],
          "cls": []}
    cfg = dict(backprop_mode="base", hop=160, bpe=100, epoch=10,
               batch_size=8, chunk_size=4800, log_freq=1000,
               save_path=str(tmp_path / "ck"))
    tr = Trainer(fe, wk, cfg, mesh=get_mesh())
    state = tr.init_state(0)
    w0 = np.asarray(state.params["frontend"]["rnn"]["l0_fw_w_hh"])
    step = tr._make_train_step()
    it = iter(SyntheticChunkBatcher(8, 4800, seed=3))
    for _ in range(2):
        raw = shard_batch({k: jnp.asarray(v) for k, v in next(it).items()},
                          tr.mesh)
        state, losses = step(state, raw)
    assert np.isfinite(float(losses["total"]))
    w1 = np.asarray(state.params["frontend"]["rnn"]["l0_fw_w_hh"])
    assert np.abs(w1 - w0).max() > 0
