"""Step-0 GRADIENT parity probe for a single worker vs the torch
reference, at full production scale.

The trajectory gate (experiments/trajectory_parity.py --bank full)
shows the chaotic heads (gap, spc) exceeding a naive 1 % pointwise
bound over 50 steps while matching at step 0 to ~1e-7. This probe
discriminates implementation bias from chaos at the one place it can
be measured exactly: the FIRST backward pass. It builds the identical
full-bank batch on both sides, loads the identical init, computes ONE
worker's loss and its gradients, and compares loss values, per-tensor
gradients, and frontend/head gradient norms.

Measured (recorded in benchmarks/trajectory_parity_full_r5.json
"step0_grad_parity"):
  gap: loss rel 9.2e-7; frontend grad norm 68.568604 (torch) vs
       68.568558 (jax); head grad norm 12.069625 vs 12.069618
  spc: loss rel 1.7e-7; frontend grad norm 9.779304 vs 9.779300

Reference anchors: pase/models/Minions/minions.py:575-705 (SPC/Gap
forward + sampling), pase/models/pase.py:310-356 (assembly).

Usage: python experiments/grad_parity_probe.py [gap|spc|overlap|...]
"""

import importlib.util
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

_spec = importlib.util.spec_from_file_location(
    "trajectory_parity", os.path.join(_REPO, "experiments",
                                      "trajectory_parity.py"))
tp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(tp)


def main():
    target = sys.argv[1] if len(sys.argv) > 1 else "gap"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))

    fns = tp.feature_fns("full", "base")
    batches = tp.make_batches(1, fns, bank="full")
    stats = tp.compute_stats(batches, n_stat=1)

    # ---- torch side: one worker's loss + grads -----------------------------
    import torch
    import torch.nn as tnn
    from conftest import load_reference
    load_reference()
    import pase.models.Minions.minions as ref_minions
    from pase.models.pase import pase as RefPase
    from pase.losses import ContextualizedLoss

    fe_cfg, wk_cfg, bsz, t = tp.bank_cfgs("full", "base")
    wcfg = json.loads(json.dumps(wk_cfg))
    for group, entries in wcfg.items():
        for e in entries:
            e.pop("transform", None)
            e.pop("keys", None)
            if group != "regu":
                e["loss"] = ContextualizedLoss(getattr(tnn, e["loss"])(),
                                               r=e.get("r"))
    torch.manual_seed(0)
    model = RefPase(frontend_cfg=dict(fe_cfg), minions_cfg=wcfg)
    model.train()
    sd = {k: v.detach().numpy().copy()
          for k, v in model.state_dict().items()}

    raw, feats, extra = batches[0]
    batch = {k: torch.tensor(v[:, None, :]) for k, v in raw.items()}
    for name, f in feats.items():
        f = (f - stats[name]["mean"]) / stats[name]["std"]
        batch[name] = torch.tensor(
            np.ascontiguousarray(f.transpose(0, 2, 1)))
    batch["overlap"] = torch.tensor(extra["overlap"][:, None, :])
    cq = tp._ChoiceQueue()
    cq.q = [int(v) for v in extra["spc_idx"]]
    ref_minions.random = cq
    _, chunk, preds, labels = tp._forward_per_worker_alpha(
        model, batch, 1, gap_idx=extra.get("gap_idx"))

    w = [x for x in model.classification_workers +
         model.regression_workers if x.name == target][0]
    loss = w.loss_weight * w.loss(preds[target], labels[target])
    model.zero_grad()
    loss.backward()
    tgrads = {k: p.grad.detach().numpy().copy()
              for k, p in model.named_parameters()
              if p.grad is not None and float(p.grad.abs().max()) > 0}
    tloss = float(loss.detach())
    print(f"torch {target} loss {tloss} grad tensors {len(tgrads)}")

    # ---- jax side -----------------------------------------------------------
    import jax.numpy as jnp
    from flax.core import unfreeze
    from pase_tpu.trainer import Trainer
    from pase_tpu.checkpoint import (rename_reference_pase_keys,
                                     torch_to_variables)
    from pase_tpu.parallel.mesh import get_mesh
    from pase_tpu.model import worker_losses

    one = get_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    cfg = dict(backprop_mode="base", hop=160, bpe=1000, epoch=1000,
               batch_size=bsz, chunk_size=t, log_freq=10**9,
               fe_lr=5e-4, min_lr=5e-4, lr_mode="step", lrdec_step=10**9,
               save_path="/tmp/gp_ckpt")
    tr = Trainer(fe_cfg, json.loads(json.dumps(wk_cfg)), cfg, mesh=one,
                 stats=stats)
    state = tr.init_state(0)
    meta = tr.meta
    sd2 = rename_reference_pase_keys(
        sd, [e["name"] for e in meta["regr"]],
        [e["name"] for e in meta["cls"]])
    host_params = jax.device_get(state.params)
    host_bs = jax.device_get(state.batch_stats)
    loaded = unfreeze(torch_to_variables(
        sd2, {"params": host_params, "batch_stats": host_bs},
        load_last=True))
    params, bs = loaded["params"], loaded["batch_stats"]

    b = {k: jnp.asarray(v) for k, v in raw.items()}
    b.update({k: jnp.asarray(v) for k, v in feats.items()})
    b.update({k: jnp.asarray(v) for k, v in extra.items()})
    key = jax.random.PRNGKey(0)
    prep = tr.prepare(b, key)

    def loss_fn(p):
        variables = {"params": p, "batch_stats": bs}
        (_, _, preds_j, labels_j), _ = tr.model.apply(
            variables, prep, 1.0, train=True,
            rngs={"sample": key, "dropout": key},
            mutable=["batch_stats"])
        return worker_losses(meta, preds_j, labels_j)[target]

    val, grads = jax.value_and_grad(loss_fn)(params)
    jloss = float(val)
    print(f"jax   {target} loss {jloss}")

    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + k + "/")
            else:
                flat[prefix + k] = np.asarray(v)

    walk(unfreeze(grads))
    nz = {k: v for k, v in flat.items() if np.abs(v).max() > 0}
    print(f"jax nonzero grad tensors {len(nz)}")

    def tnorm(d, sel):
        return float(np.sqrt(sum((g ** 2).sum()
                                 for k, g in d.items() if sel(k))))

    tf = tnorm(tgrads, lambda k: k.startswith("frontend."))
    jf = tnorm(nz, lambda k: k.startswith("frontend/"))
    th = tnorm(tgrads, lambda k: "_workers" in k)
    jh = tnorm(nz, lambda k: k.startswith(target + "/"))
    print(f"frontend grad norm  torch {tf:.6f}  jax {jf:.6f}  "
          f"rel {abs(tf - jf) / max(tf, 1e-12):.2e}")
    print(f"head grad norm      torch {th:.6f}  jax {jh:.6f}  "
          f"rel {abs(th - jh) / max(th, 1e-12):.2e}")
    loss_rel = abs(tloss - jloss) / max(abs(tloss), 1e-12)
    print(f"loss rel {loss_rel:.2e}")
    ok = (loss_rel < 1e-5
          and abs(tf - jf) / max(tf, 1e-12) < 1e-5
          and abs(th - jh) / max(th, 1e-12) < 1e-5)
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
