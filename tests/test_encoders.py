"""Alternative encoder + VQ tests: shapes, wf_builder dispatch, TDNN
oracle parity, VQ-EMA behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pase_tpu.frontend import wf_builder, build_frontend_module


def test_tdnn_fe_shapes():
    cfg = {"name": "tdnn", "emb_dim": 128, "kwidth": 321, "stride": 160}
    enc = wf_builder(cfg)
    enc.init(example_len=16000)
    y = enc(np.zeros((1, 1, 16000), np.float32))
    assert y.shape[0] == 1 and y.shape[1] == 128


@pytest.mark.slow
def test_aspp_res_encoder_shapes():
    cfg = {"name": "asppRes", "sinc_out": 32, "hidden_dim": 64,
           "kernel_sizes": [11, 11, 11, 11], "strides": [10, 4, 2, 2],
           "fmaps": [16, 16, 16, 16], "concat": [False, False, False, True]}
    enc = wf_builder(cfg)
    enc.init(example_len=16000)
    y = enc(np.zeros((1, 1, 16000), np.float32))
    assert y.shape == (1, 64, 100), y.shape   # stride product 160


def test_resnet_encoder_shapes():
    cfg = {"name": "Resnet50", "sinc_out": 16, "hidden_dim": 64,
           "stage_fmaps": [16, 32, 32, 64], "stage_blocks": [1, 1, 1, 1]}
    enc = wf_builder(cfg)
    enc.init(example_len=8000)
    y = enc(np.zeros((1, 1, 8000), np.float32))
    assert y.shape[1] == 64


def test_tdnn_trunk_matches_reference(ref):
    """Unpooled TDNN trunk parity with converted weights."""
    import torch
    from pase.models.tdnn import TDNN as RefTDNN
    from pase_tpu.encoders import TDNN
    from pase_tpu.checkpoint import torch_to_variables
    tm = RefTDNN(24, 2, method="unpooled")
    tm.eval()
    x = np.random.RandomState(0).randn(2, 24, 50).astype(np.float32)
    with torch.no_grad():
        y_ref = tm(torch.tensor(x)).numpy()
    m = TDNN(method="unpooled")
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.asarray(x.transpose(0, 2, 1)))
    # reference keys look like model.0.weight (Sequential); map manually
    sd = {}
    conv_i, bn_i = 0, 0
    for k, v in tm.state_dict().items():
        parts = k.split(".")
        layer = int(parts[1])
        stage = layer // 3
        kind = layer % 3
        if kind == 0:
            sd[f"conv_{stage}.{parts[2]}"] = v.numpy()
        elif kind == 1:
            sd[f"bn_{stage}.{parts[2]}"] = v.numpy()
    variables = torch_to_variables(sd, variables)
    y = np.asarray(m.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                           train=False))
    np.testing.assert_allclose(y.transpose(0, 2, 1), y_ref, atol=2e-4)


def test_vq_ema():
    from pase_tpu.nn import VQEMA
    m = VQEMA(emb_K=8, emb_dim=4, gamma=0.9)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 10, 4)
                    .astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    (loss, q, pp, enc), ups = m.apply(variables, x, train=True,
                                      mutable=["batch_stats"])
    assert q.shape == x.shape
    assert float(pp) > 1.0
    assert np.isfinite(float(loss))
    # EMA state moved
    before = np.asarray(variables["batch_stats"]["ema_cluster_size"])
    after = np.asarray(ups["batch_stats"]["ema_cluster_size"])
    assert np.abs(after - before).sum() > 0


def test_wavefe_with_vq():
    cfg = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
           "fmaps": [16, 16, 32, 32], "emb_dim": 32, "vq_K": 16}
    from pase_tpu.frontend import build_wavefe
    m = build_wavefe(cfg)
    x = jnp.zeros((1, 8000))
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y, ups = m.apply(variables, x, train=True,
                     mutable=["batch_stats", "intermediates"])
    assert y.shape == (1, 50, 32)
    from flax.traverse_util import flatten_dict
    from flax.core import unfreeze
    keys = {"/".join(k) for k in
            flatten_dict(unfreeze(ups["intermediates"]))}
    assert any("vq_loss" in k for k in keys), keys
