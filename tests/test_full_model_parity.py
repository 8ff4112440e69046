"""End-to-end PASE model parity: encoder + ALL worker heads forwarded on
the same batch with converted reference weights; predictions must match
the PyTorch reference numerically (deterministic workers; SPC excluded —
its frame sampling uses python RNG in the reference)."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

PASE_CFG = "/root/reference/cfg/frontend/PASE.cfg"
WORKERS_CFG = "/root/reference/cfg/workers/workers.cfg"


from pase_tpu.checkpoint import rename_reference_pase_keys as _rename_torch_keys


@pytest.mark.slow
def test_full_pase_forward_parity(ref):
    import torch
    import torch.nn as tnn
    from pase.models.pase import pase as RefPase
    from pase.losses import ContextualizedLoss
    from pase_tpu.model import build_pase
    from pase_tpu.checkpoint import torch_to_variables

    with open(WORKERS_CFG) as f:
        wcfg = json.load(f)
    with open(PASE_CFG) as f:
        fecfg = json.load(f)
    for group in wcfg.values():
        for e in group:
            e.pop("transform", None)
            e["loss"] = ContextualizedLoss(getattr(tnn, e["loss"])(),
                                           r=e.get("r"))
    ref_model = RefPase(frontend_cfg=dict(fecfg), minions_cfg=wcfg)
    ref_model.eval()

    rng = np.random.RandomState(0)
    B, T = 2, 8000
    frames = T // 160
    batch_t = {
        "chunk": torch.tensor(rng.randn(B, 1, T).astype(np.float32) * .1),
        "chunk_ctxt": torch.tensor(rng.randn(B, 1, T).astype(np.float32) * .1),
        "chunk_rand": torch.tensor(rng.randn(B, 1, T).astype(np.float32) * .1),
        "cchunk": torch.tensor(rng.randn(B, 1, T).astype(np.float32) * .1),
        "lps": torch.zeros(B, 1025, frames),
        "mfcc": torch.zeros(B, 20, frames),
        "prosody": torch.zeros(B, 4, frames),
    }
    with torch.no_grad():
        h_ref, chunk_ref, preds_ref, labels_ref = ref_model.forward(
            batch_t, 1, "cpu")

    model, meta = build_pase(PASE_CFG, WORKERS_CFG)
    regr_names = [e["name"] for e in meta["regr"]]
    cls_names = [e["name"] for e in meta["cls"]]
    sd = _rename_torch_keys(
        {k: v.numpy() for k, v in ref_model.state_dict().items()},
        regr_names, cls_names)

    batch = {k: jnp.asarray(v.numpy()[:, 0, :]) for k, v in batch_t.items()
             if k in ("chunk", "chunk_ctxt", "chunk_rand", "cchunk")}
    batch["lps"] = jnp.zeros((B, frames, 1025))
    batch["mfcc"] = jnp.zeros((B, frames, 20))
    batch["prosody"] = jnp.zeros((B, frames, 4))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, batch,
                           train=False)
    variables = torch_to_variables(sd, variables, load_last=True)
    h, chunk, preds, labels = model.apply(
        variables, batch, 1.0, train=False, rngs={"sample": key})

    # encoder output parity
    np.testing.assert_allclose(
        np.asarray(chunk).transpose(0, 2, 1), chunk_ref.numpy(),
        atol=2e-4)
    # deterministic worker predictions
    for name in ("cchunk", "lps", "mfcc", "prosody", "mi", "cmi"):
        ours = np.asarray(preds[name]).transpose(0, 2, 1)
        theirs = preds_ref[name].numpy()
        scale = max(np.abs(theirs).max(), 1e-3)
        err = np.abs(ours - theirs).max() / scale
        assert err < 5e-3, (name, err)
    # contrastive labels identical
    np.testing.assert_allclose(
        np.asarray(labels["mi"]).transpose(0, 2, 1),
        labels_ref["mi"].numpy())


def test_load_reference_pase_ckpt(ref, tmp_path):
    """Full-run import: a saved reference pase state dict loads into our
    variable tree through the public helper."""
    import torch
    import torch.nn as tnn
    from pase.models.pase import pase as RefPase
    from pase.losses import ContextualizedLoss
    from pase_tpu.model import build_pase
    from pase_tpu.checkpoint import load_reference_pase_ckpt

    with open(WORKERS_CFG) as f:
        wcfg = json.load(f)
    with open(PASE_CFG) as f:
        fecfg = json.load(f)
    for group in wcfg.values():
        for e in group:
            e.pop("transform", None)
            e["loss"] = ContextualizedLoss(getattr(tnn, e["loss"])(),
                                           r=e.get("r"))
    ref_model = RefPase(frontend_cfg=dict(fecfg), minions_cfg=wcfg)
    ck = str(tmp_path / "PASE-run.ckpt")
    torch.save({"step": 1234, "state_dict": ref_model.state_dict()}, ck)

    model, meta = build_pase(PASE_CFG, WORKERS_CFG)
    B, T = 1, 8000
    frames = T // 160
    batch = {k: jnp.zeros((B, T)) for k in
             ("chunk", "chunk_ctxt", "chunk_rand", "cchunk")}
    batch.update(lps=jnp.zeros((B, frames, 1025)),
                 mfcc=jnp.zeros((B, frames, 20)),
                 prosody=jnp.zeros((B, frames, 4)))
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, batch,
                           train=False)
    loaded = load_reference_pase_ckpt(ck, variables, meta)
    w_ref = ref_model.state_dict()["regression_workers.1.W.weight"].numpy()
    w_ours = np.asarray(loaded["params"]["lps"]["W"]["kernel"])
    np.testing.assert_allclose(w_ours.transpose(2, 1, 0), w_ref)
