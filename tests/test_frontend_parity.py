"""Numerical parity of the TPU-native encoder against the PyTorch
reference (loaded as an oracle from /root/reference; SURVEY.md §7 gate 1).

Strategy: build the reference WaveFe, export its state dict, convert with
pase_tpu.checkpoint.torch_to_variables, and compare eval-mode forwards.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pase_tpu.frontend import wf_builder, build_wavefe
from pase_tpu.checkpoint import torch_to_variables

PASE_CFG = "/root/reference/cfg/frontend/PASE.cfg"
PASEP_CFG = "/root/reference/cfg/frontend/PASE+.cfg"


def _oracle_forward(ref, cfg_path, x_np):
    import torch
    from pase.models.frontend import wf_builder as ref_builder
    fe = ref_builder(cfg_path)
    fe.eval()
    with torch.no_grad():
        y = fe(torch.tensor(x_np))
    return fe.state_dict(), y.numpy()


@pytest.mark.parametrize("cfg_path", [PASE_CFG, PASEP_CFG])
def test_encoder_matches_reference(ref, cfg_path):
    rng = np.random.RandomState(42)
    x = rng.randn(2, 1, 8000).astype(np.float32)
    state_dict, y_ref = _oracle_forward(ref, cfg_path, x)
    sd_np = {k: v.numpy() for k, v in state_dict.items()}

    enc = wf_builder(cfg_path)
    enc.init(example_len=8000, batch=1)
    enc.variables = torch_to_variables(sd_np, enc.variables, load_last=True)
    y = np.asarray(enc(x))

    assert y.shape == y_ref.shape, (y.shape, y_ref.shape)
    err = np.abs(y - y_ref).max()
    scale = max(np.abs(y_ref).max(), 1e-6)
    assert err / scale < 2e-4, f"max err {err} (scale {scale})"


def test_all_torch_keys_convert(ref):
    """Every reference parameter/buffer must land in our tree (no silent
    architecture drift)."""
    import torch
    from pase.models.frontend import wf_builder as ref_builder
    fe = ref_builder(PASEP_CFG)
    sd = {k: v.numpy() for k, v in fe.state_dict().items()}
    enc = wf_builder(PASEP_CFG)
    enc.init(example_len=4000)
    from pase_tpu.checkpoint import _map_torch_key
    from flax.traverse_util import flatten_dict
    from flax.core import unfreeze
    flat = flatten_dict(unfreeze(enc.variables))
    missing = []
    for k, v in sd.items():
        m = _map_torch_key(k)
        if m is None:
            continue
        col, path, tag = m
        if tag == "weight":
            ok = any((col,) + path + (leaf,) in flat
                     for leaf in ("kernel", "weight", "scale"))
        else:
            ok = (col,) + path in flat
        if not ok:
            missing.append(k)
    assert not missing, f"unmapped torch keys: {missing}"


def test_encoder_output_contract():
    """(1,1,100000) -> (1,256,625) for PASE+ (README.md:36-39)."""
    enc = wf_builder(PASEP_CFG)
    enc.init(example_len=16000)
    x = np.zeros((1, 1, 100000), dtype=np.float32)
    y = enc(x)
    assert y.shape == (1, 256, 625), y.shape


def test_select_output_modes():
    from pase_tpu.frontend import select_output
    h = jnp.asarray(np.random.randn(2, 4, 10).astype(np.float32))
    assert select_output(h, "avg_norm").shape == (2, 4, 10)
    assert select_output(h, "avg_concat").shape == (2, 8, 10)
    assert select_output(h, "avg_norm_concat").shape == (2, 8, 10)
    an = select_output(h, "avg_norm")
    np.testing.assert_allclose(np.asarray(jnp.mean(an, axis=2)), 0, atol=1e-5)
