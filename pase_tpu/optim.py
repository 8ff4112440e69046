"""Optimizers + LR schedules.

Replicates the reference's per-component optimizer semantics
(/root/reference/pase/models/WorkerScheduler/trainer.py:86-143) with one
optax.multi_transform: a 'frontend' group at fe_lr and a 'minion' group at
min_lr. Adam moments are elementwise, so per-worker Adam instances ==
one Adam over the disjoint union — no 10 optimizer objects needed.

LR schedules mirror LR_Scheduler (lr_scheduler.py:3-61):
  step: lr * 0.1^(epoch // lr_step)
  poly: lr * (1 - T/N)^0.9
  cos:  0.5 * lr * (1 + cos(pi * T/N))
(T = global step, N = epochs * bpe). The reference only refreshes the lr
every log_freq steps; we apply it continuously (same envelope).
"""

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
import optax


def make_lr_schedule(mode: str, base_lr: float, epochs: int, bpe: int,
                     lr_step: int = 30, warmup_epochs: int = 0,
                     lr_gamma: float = 0.1):
    n_total = max(epochs * bpe, 1)
    warmup_iters = warmup_epochs * bpe

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / bpe)
        if mode == "cos":
            lr = 0.5 * base_lr * (1 + jnp.cos(step / n_total * jnp.pi))
        elif mode == "poly":
            lr = base_lr * jnp.power(jnp.maximum(1 - step / n_total, 0.0), 0.9)
        elif mode == "step":
            # lr_gamma: 0.1 is LR_Scheduler's hardcoded step decay
            # (lr_scheduler.py:36); --lrdecay > 0 overrides it with the
            # legacy core.py StepLR gamma (core.py:135-155 — the modern
            # reference path accepts but ignores that flag)
            lr = base_lr * jnp.power(lr_gamma, jnp.floor(epoch / lr_step))
        else:
            raise NotImplementedError(mode)
        if warmup_iters > 0:
            lr = jnp.where(step < warmup_iters, lr * step / warmup_iters, lr)
        return lr

    return sched


def _make_opt(name: str, sched):
    name = (name or "Adam").lower()
    if name == "adam":
        return optax.adam(sched)
    if name == "radam":
        return optax.radam(sched)
    if name == "adamw":
        return optax.adamw(sched)
    if name == "sgd":
        return optax.sgd(sched)
    if name == "rmsprop":
        return optax.rmsprop(sched)
    raise ValueError(f"Unknown optimizer {name}")


def build_optimizer(params, fe_opt: str = "Adam", min_opt: str = "Adam",
                    fe_lr: float = 1e-3, min_lr: float = 5e-4,
                    lr_mode: str = "poly", epochs: int = 100, bpe: int = 1000,
                    lr_step: int = 30, lr_gamma: float = 0.1):
    """Multi-transform optimizer over {'frontend', 'minion'} groups."""
    fe_sched = make_lr_schedule(lr_mode, fe_lr, epochs, bpe, lr_step,
                                lr_gamma=lr_gamma)
    min_sched = make_lr_schedule(lr_mode, min_lr, epochs, bpe, lr_step,
                                 lr_gamma=lr_gamma)
    tx = optax.multi_transform(
        {"frontend": _make_opt(fe_opt, fe_sched),
         "minion": _make_opt(min_opt, min_sched)},
        param_labels=_labels(params))
    return tx, {"frontend": fe_sched, "minion": min_sched}


def _labels(params):
    import jax
    return {k: jax.tree.map(lambda _: "frontend" if k == "frontend"
                            else "minion", v)
            for k, v in params.items()}
