"""Fused linear-head MSE (losses.framed_mse_linear) equivalence.

The fused path skips materializing wide head predictions (VERDICT r1 #6
perf lever); these tests pin that it is numerically the same computation
as Conv1D head + make_loss('MSELoss', r): identical parameter trees,
matching loss values, and matching gradients (CPU, highest precision).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pase_tpu.losses import framed_mse_linear, make_loss
from pase_tpu.minions import MLPMinion
from pase_tpu.model import build_pase, worker_losses, materialize_pred

B, T, H, D, R = 2, 25, 16, 11, 7


def test_framed_mse_linear_matches_materialized():
    rng = np.random.RandomState(0)
    kernel = jnp.asarray(rng.randn(1, H, D * R).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.randn(D * R).astype(np.float32) * 0.05)
    h = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    tgt = jnp.asarray(rng.randn(B, T, D).astype(np.float32))

    ref_loss = make_loss("MSELoss", r=R)
    pred = h @ kernel[0] + bias

    v_ref = float(ref_loss(pred, tgt))
    v_fused = float(framed_mse_linear(kernel, bias, h, tgt, R))
    assert v_fused == pytest.approx(v_ref, rel=1e-5)

    # gradients w.r.t. kernel, bias, and the head input
    def f_ref(k, b, hh):
        return ref_loss(hh @ k[0] + b, tgt)

    def f_fused(k, b, hh):
        return framed_mse_linear(k, b, hh, tgt, R)

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(kernel, bias, h)
    g_fused = jax.grad(f_fused, argnums=(0, 1, 2))(kernel, bias, h)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def test_framed_mse_linear_r1_and_no_bias():
    rng = np.random.RandomState(1)
    kernel = jnp.asarray(rng.randn(1, H, D).astype(np.float32) * 0.1)
    h = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    tgt = jnp.asarray(rng.randn(B, T, D).astype(np.float32))
    v_ref = float(jnp.mean(jnp.square(h @ kernel[0] - tgt)))
    v_fused = float(framed_mse_linear(kernel, None, h, tgt, 1))
    assert v_fused == pytest.approx(v_ref, rel=1e-5)


def test_minion_return_linear_params_identical():
    """The _LinearTap creates the exact same param tree (names, shapes,
    init values) as the Conv1D 'W' it replaces."""
    m = MLPMinion(num_outputs=D, hidden_size=8, hidden_layers=1, r=R)
    x = jnp.zeros((B, T, H))
    p_plain = m.init(jax.random.PRNGKey(7), x)
    p_fused = m.init(jax.random.PRNGKey(7), x, return_linear=True)
    jax.tree_util.tree_all(
        jax.tree_util.tree_map(np.testing.assert_array_equal,
                               p_plain, p_fused))
    out = m.apply(p_fused, x, return_linear=True)
    assert out[0] == "linear" and out[2].shape == (1, 8, D * R)
    y = materialize_pred(out)
    np.testing.assert_allclose(np.asarray(y),
                               np.asarray(m.apply(p_plain, x)),
                               rtol=1e-6, atol=1e-7)


def _tiny_cfgs():
    fe_cfg = {"sinc_out": 8, "kwidths": [31, 3, 3], "strides": [4, 4, 10],
              "fmaps": [8, 8, 8], "emb_dim": 12, "name": "WaveFe"}
    wk_cfg = {"regr": [
        {"num_outputs": D, "hidden_size": 8, "hidden_layers": 1,
         "context": 1, "r": R, "loss": "MSELoss", "name": "lps"}],
        "cls": []}
    return fe_cfg, wk_cfg


@pytest.mark.slow
def test_model_fused_loss_matches_plain():
    fe_cfg, wk_cfg = _tiny_cfgs()
    t_wav = 1600
    frames = t_wav // 160
    batch = {
        "chunk": jnp.asarray(np.random.RandomState(3).randn(
            B, t_wav).astype(np.float32)),
        "chunk_ctxt": jnp.zeros((B, t_wav)),
        "chunk_rand": jnp.zeros((B, t_wav)),
        "lps": jnp.asarray(np.random.RandomState(4).randn(
            B, frames, D).astype(np.float32)),
    }
    rngs = {"sample": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}

    model_p, meta = build_pase(fe_cfg, wk_cfg, fused_mse_min_ch=0)
    model_f, _ = build_pase(fe_cfg, wk_cfg, fused_mse_min_ch=8)
    variables = model_p.init({"params": jax.random.PRNGKey(11), **rngs},
                             batch)

    def loss_of(model):
        def f(params):
            (h, chunk, preds, labels), _ = model.apply(
                {"params": params["params"]}, batch, 1.0, train=False,
                rngs=rngs, mutable=["batch_stats"])
            return worker_losses(meta, preds, labels)["lps"]
        return f

    v_p, g_p = jax.value_and_grad(loss_of(model_p))(variables)
    v_f, g_f = jax.value_and_grad(loss_of(model_f))(variables)
    assert float(v_f) == pytest.approx(float(v_p), rel=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_f),
                     jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-3, atol=1e-6)

def test_loss_precision_policy():
    """Trainer reserves Precision.HIGH for value-consuming policies and
    honors/validates the explicit cfg override (benchmarks/README.md
    round-3 regression root cause: HIGH on the base path cost 4.3 ms/step
    for ~1e-5 of value accuracy)."""
    from pase_tpu.trainer import Trainer

    tr = Trainer.__new__(Trainer)   # only _loss_precision's fields needed
    tr.cfg = {}
    tr._value_sensitive = {"softmax", "adaptive", "hyper_volume", "MGD"}
    assert tr._loss_precision("base") is None
    assert tr._loss_precision("select_one") is None
    for mode in ("softmax", "adaptive", "hyper_volume", "MGD"):
        assert tr._loss_precision(mode) == jax.lax.Precision.HIGH
    tr.cfg = {"loss_precision": "highest"}
    assert tr._loss_precision("base") == jax.lax.Precision.HIGHEST
    tr.cfg = {"loss_precision": "default"}
    assert tr._loss_precision("MGD") is None
    tr.cfg = {"loss_precision": "fast"}
    with pytest.raises(ValueError):
        tr._loss_precision("base")
