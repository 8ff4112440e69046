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


@pytest.mark.slow
def test_workers_plus_full_bank_forward_parity(ref):
    """END-TO-END forward parity on the FULL production bank: PASE+
    frontend (cfg/frontend/PASE+.cfg) + every workers+ head (cchunk
    decoder, lps/lps_long, fbank/fbank_long, gtn/gtn_long, mfcc/
    mfcc_long, prosody, mi, cmi — cfg/workers/workers+.cfg) + the
    spc/gap/overlap classification workers, with the stochastic SPC/Gap
    frame sampling determinized by injecting identical indices on both
    sides (reference minions.py:575-705)."""
    import importlib.util
    import os
    import torch
    import torch.nn as tnn
    from pase.models.pase import pase as RefPase
    from pase.losses import ContextualizedLoss
    from pase_tpu.model import build_pase
    from pase_tpu.checkpoint import torch_to_variables
    import pase.models.Minions.minions as ref_minions

    spec = importlib.util.spec_from_file_location(
        "trajectory_parity",
        os.path.join(os.path.dirname(__file__), "..", "experiments",
                     "trajectory_parity.py"))
    tp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tp)

    fe_cfg, wk_cfg, _, _ = tp.bank_cfgs("full", policy="adaptive")
    # (policy='adaptive' variant = no regu worker; the regu head is
    # parameterless and covered by the trajectory gate)
    wcfg_t = json.loads(json.dumps(wk_cfg))
    for group, entries in wcfg_t.items():
        for e in entries:
            e.pop("transform", None)
            e.pop("keys", None)
            e["loss"] = ContextualizedLoss(getattr(tnn, e["loss"])(),
                                           r=e.get("r"))
    torch.manual_seed(0)
    ref_model = RefPase(frontend_cfg=dict(fe_cfg), minions_cfg=wcfg_t)
    ref_model.eval()

    rng = np.random.RandomState(0)
    B, T = 2, 8000
    frames = T // 160
    dims = {"lps": 3075, "lps_long": 3075, "fbank": 120,
            "fbank_long": 120, "gtn": 120, "gtn_long": 120, "mfcc": 39,
            "mfcc_long": 60, "prosody": 12}
    wavs = {k: (rng.randn(B, T) * 0.1).astype(np.float32)
            for k in ("chunk", "chunk_ctxt", "chunk_rand", "cchunk")}
    overlap = (rng.rand(B, frames) < 0.3).astype(np.float32)
    spc_idx, gap_idx = tp._spc_gap_indices(rng, frames, B)

    batch_t = {k: torch.tensor(v[:, None, :]) for k, v in wavs.items()}
    for k, d in dims.items():
        batch_t[k] = torch.zeros(B, d, frames)
    batch_t["overlap"] = torch.tensor(overlap[:, None, :])
    cq = tp._ChoiceQueue()
    cq.q = [int(v) for v in spc_idx]
    old_random = ref_minions.random
    ref_minions.random = cq
    try:
        with torch.no_grad():
            h_ref, chunk_ref, preds_ref, labels_ref = \
                tp._forward_per_worker_alpha(ref_model, batch_t, 1,
                                             gap_idx=gap_idx)
    finally:
        ref_minions.random = old_random

    model, meta = build_pase(dict(fe_cfg), json.loads(json.dumps(wk_cfg)))
    regr_names = [e["name"] for e in meta["regr"]]
    cls_names = [e["name"] for e in meta["cls"]]
    sd = _rename_torch_keys(
        {k: v.numpy() for k, v in ref_model.state_dict().items()},
        regr_names, cls_names)

    batch = {k: jnp.asarray(v) for k, v in wavs.items()}
    for k, d in dims.items():
        batch[k] = jnp.zeros((B, frames, d))
    batch["overlap"] = jnp.asarray(overlap)
    batch["spc_idx"] = jnp.asarray(spc_idx)
    batch["gap_idx"] = jnp.asarray(gap_idx)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "sample": key}, batch,
                           train=False)
    variables = torch_to_variables(sd, variables, load_last=True)
    h, chunk, preds, labels = model.apply(
        variables, batch, 1.0, train=False, rngs={"sample": key})

    np.testing.assert_allclose(
        np.asarray(chunk).transpose(0, 2, 1), chunk_ref.numpy(),
        atol=2e-4)
    for name in (list(dims) + ["cchunk", "mi", "cmi", "spc", "gap",
                               "overlap"]):
        ours = np.asarray(preds[name]).transpose(0, 2, 1)
        theirs = preds_ref[name].numpy()
        assert ours.shape == theirs.shape, (name, ours.shape, theirs.shape)
        scale = max(np.abs(theirs).max(), 1e-3)
        err = np.abs(ours - theirs).max() / scale
        assert err < 5e-3, (name, err)
    # determinized gap labels agree exactly (|a-b| in {0, T'-1} makes
    # the reference's legacy floor label equal our float label)
    np.testing.assert_allclose(
        np.asarray(labels["gap"]),
        labels_ref["gap"].numpy())
    np.testing.assert_allclose(
        np.asarray(labels["spc"]).transpose(0, 2, 1),
        labels_ref["spc"].numpy())


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
