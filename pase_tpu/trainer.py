"""Trainer: one jitted multi-task train step + epoch loop.

Functional redesign of the reference trainer
(/root/reference/pase/models/WorkerScheduler/trainer.py:26-451): instead
of 10 optimizer objects and an imperative backprop scheduler, a single
jitted step performs on-device batch preparation (targets + distortions),
the shared-encoder forward, per-worker losses, the weighting policy, and
one optax multi-transform update. Per-worker update semantics are
preserved exactly: each worker's params only receive gradients from its
own loss; the frontend from the (policy-weighted) sum, scaled per worker
by the previous step's alpha (alphaSG).

Data parallelism: batch sharded over the mesh 'data' axis; XLA inserts
the gradient all-reduce (ICI psum) automatically.
"""

import json
import os
import time
from functools import partial
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import freeze, unfreeze

from pase_tpu.model import build_pase, worker_losses
from pase_tpu.optim import build_optimizer
from pase_tpu.scheduling import PolicyState, init_policy_state, apply_policy
from pase_tpu.data.pipeline import make_prepare_fn
from pase_tpu.checkpoint import Saver, save_variables
from pase_tpu.parallel.mesh import (get_mesh, shard_batch, replicate,
                                    batch_sharding)
from pase_tpu.log import MetricLogger


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    policy_state: PolicyState
    alpha: jnp.ndarray          # per-worker frontend grad scale (alphaSG)
    rng: jax.Array
    step: jnp.ndarray
    # adversarial (GAN) worker state; None when disabled
    d_params: Any = None
    d_batch_stats: Any = None
    d_opt_state: Any = None


class Trainer:

    def __init__(self, frontend_cfg, workers_cfg, cfg: Dict[str, Any],
                 stats=None, dist_cfg=None, dist_assets=None,
                 mesh=None, name="Pase_base", gan_cfg=None,
                 zs_bank=None, zs_snrs=(0, 5, 10)):
        self.cfg = dict(cfg)
        self.name = name
        from pase_tpu.precision import resolve as _resolve_dtype
        _resolve_dtype(self.cfg.get("compute_dtype"))  # fail fast on typos
        # fused head+loss for wide MSE regression heads (lps/lps_long):
        # skips materializing the [B, T, 21525] prediction — measured
        # ~10 ms/step on a v5e chip (losses.framed_mse_linear). On by
        # default; cfg fused_heads=False restores the materializing path.
        fused_min = 4096 if cfg.get("fused_heads", True) else 0
        # --cchunk_prior z-GAN needs PASE(cchunk) even without a
        # cchunk regularizer worker (core.py:381-384)
        _force_cc = bool(gan_cfg and gan_cfg.get("type") == "z"
                         and gan_cfg.get("cchunk_prior"))
        self.model, self.meta = build_pase(
            frontend_cfg, workers_cfg, att_cfg=cfg.get("att_cfg"),
            chunking_K=cfg.get("chunking_K"),
            fused_mse_min_ch=fused_min, force_cchunk=_force_cc)
        from pase_tpu.frontend import build_frontend_module, load_cfg
        fe_mod = build_frontend_module(load_cfg(frontend_cfg))
        self.model_emb_dim = getattr(fe_mod, "output_dim",
                                     getattr(fe_mod, "emb_dim", 256))
        self.ordered_names = ([e["name"] for e in self.meta["cls"]] +
                              [e["name"] for e in self.meta["regr"]])
        self.regu_names = [e["name"] for e in self.meta["regu"]]
        self.num_workers = len(self.ordered_names)
        self.mode = cfg.get("backprop_mode", "base")
        self.hop = cfg.get("hop", 160)
        # fused wide-head loss precision: HIGH where loss VALUES steer
        # the policy in-graph (or always, via cfg loss_precision);
        # backend default on the hot summed-loss path — the HIGH 3-pass
        # matmuls cost a measured 4.3 ms/step at PASE+ shapes (see
        # losses.framed_mse_linear)
        self._value_sensitive = {"softmax", "adaptive", "hyper_volume",
                                 "MGD"}
        self.prepare = make_prepare_fn(
            self.meta, stats=stats, dist_cfg=dist_cfg, assets=dist_assets,
            hop=self.hop, random_scale=cfg.get("random_scale", False),
            zs_bank=zs_bank, zs_snrs=zs_snrs)
        self.mesh = mesh if mesh is not None else get_mesh()
        self.bpe = cfg.get("bpe", 100)
        self.epochs = cfg.get("epoch", 100)
        self.save_path = cfg.get("save_path", "ckpt")
        self.log_freq = cfg.get("log_freq", 100)
        self.chunk_size = cfg.get("chunk_size", 16000)
        self.batch_size = cfg.get("batch_size", 32)

        # optional GAN worker: D judges a waveform-reconstruction worker's
        # output vs the clean wav (the alldistortions_GAN recipe —
        # losses.py:137-213 wired through worker_parser). Worker cfg
        # entries with loss LSGAN/GAN/Hinge are auto-routed here, like
        # the reference's worker_parser (pase/utils.py:53-90).
        if gan_cfg is None:
            for group in ("regr", "cls"):
                for e in self.meta[group]:
                    if e.get("loss") in ("LSGAN", "GAN", "Hinge"):
                        gan_cfg = {"worker": e["name"],
                                   "loss": {"GAN": "BCE"}.get(e["loss"],
                                                              e["loss"]),
                                   "lr": cfg.get("z_lr", 5e-4)}
                        # adversarial-only worker: zero out the
                        # reconstruction criterion
                        e["loss"] = "L1Loss"
                        e["loss_weight"] = 0.0
        self.gan_cfg = gan_cfg
        self._d_module = None
        self._d_tx = None
        if gan_cfg is not None:
            if gan_cfg.get("type", "wave") == "z":
                # latent prior regularizer (ZAdversarialLoss,
                # losses.py:40-135): D on embeddings vs N(0,1)
                from pase_tpu.adversarial import ZDiscriminator
                self._d_module = ZDiscriminator()
            else:
                from pase_tpu.adversarial import WaveDiscriminator
                self._d_module = WaveDiscriminator()

        self._tx = None
        self._train_step = None
        self._eval_step = None
        self.logger = MetricLogger(self.save_path)
        self.saver = Saver(self.save_path, max_ckpts=cfg.get("max_ckpts", 5),
                           prefix="PASE-")

    # -- initialization -----------------------------------------------------

    def init_state(self, seed: int = 0) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        k_init, k_prep, rng = jax.random.split(rng, 3)
        dummy = {
            "chunk": jnp.zeros((2, self.chunk_size)),
            "chunk_ctxt": jnp.zeros((2, self.chunk_size)),
            "chunk_rand": jnp.zeros((2, self.chunk_size)),
        }
        prepared = self.prepare(dummy, k_prep)
        variables = self.model.init(
            {"params": k_init, "sample": k_init, "dropout": k_init},
            prepared, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # warm-start the frontend from a pretrained encoder checkpoint
        # (reference pase(pretrained_ckpt=...), pase.py:307-308)
        pre = self.cfg.get("pretrained_ckpt")
        if pre:
            from pase_tpu.checkpoint import load_frontend_ckpt
            from flax.core import unfreeze
            fe_vars = {"params": variables["params"]["frontend"],
                       "batch_stats": batch_stats.get("frontend", {})}
            loaded = load_frontend_ckpt(pre, None, fe_vars, load_last=True)
            params = unfreeze(params)
            params["frontend"] = loaded["params"]
            if "batch_stats" in loaded and loaded["batch_stats"]:
                batch_stats = unfreeze(batch_stats)
                batch_stats["frontend"] = loaded["batch_stats"]
        self._tx, self._scheds = build_optimizer(
            params,
            fe_opt=self.cfg.get("fe_opt", "Adam"),
            min_opt=self.cfg.get("min_opt", "Adam"),
            fe_lr=self.cfg.get("fe_lr", 1e-3),
            min_lr=self.cfg.get("min_lr", 5e-4),
            lr_mode=self.cfg.get("lr_mode", "poly"),
            epochs=self.epochs, bpe=self.bpe,
            lr_step=self.cfg.get("lrdec_step", 30),
            lr_gamma=float(self.cfg.get("lrdecay") or 0) or 0.1)
        opt_state = self._tx.init(params)
        d_params = d_bs = d_opt = None
        if self._d_module is not None:
            import optax as _optax
            if self.gan_cfg.get("type", "wave") == "z":
                fake = jnp.zeros((2, self.chunk_size // self.hop,
                                  self.model_emb_dim))
            else:
                fake = jnp.zeros((2, self.chunk_size, 1))
            dv = self._d_module.init(k_init, fake, train=False)
            d_params = dv["params"]
            d_bs = dv.get("batch_stats", {})
            # z_lr fallback: legacy z-flag cfgs carried the D lr under
            # that key (reference core.py:216 opt.Adam(lr=cfg['z_lr']))
            self._d_tx = _optax.adam(
                self.gan_cfg.get("lr", self.gan_cfg.get("z_lr", 5e-4)))
            d_opt = self._d_tx.init(d_params)
        state = TrainState(
            params=params, batch_stats=batch_stats, opt_state=opt_state,
            policy_state=init_policy_state(self.num_workers),
            alpha=jnp.ones((self.num_workers,)), rng=rng,
            step=jnp.zeros((), jnp.int32),
            d_params=d_params, d_batch_stats=d_bs, d_opt_state=d_opt)
        state = replicate(state, self.mesh)
        if dict(self.mesh.shape).get("model", 1) > 1:
            # 2-D data x model mesh: re-lay params/opt-state with the
            # column-parallel rule (parallel/mesh.state_shardings);
            # replicated leaves stay replicated
            from pase_tpu.parallel.mesh import shard_state
            state = shard_state(state, self.mesh)
        return state

    # -- steps ----------------------------------------------------------------

    def _loss_precision(self, mode):
        """Matmul precision for the fused wide-head loss: explicit cfg
        `loss_precision` wins; else HIGH for policies whose weights are a
        function of the loss VALUES (their in-graph decisions deserve the
        3-pass value), backend default otherwise (losses are only summed
        — value noise <~1% on ZNorm'd targets, gradients in the same
        precision class as every other bf16 head)."""
        want = self.cfg.get("loss_precision")
        if want:
            table = {"default": None,
                     "high": jax.lax.Precision.HIGH,
                     "highest": jax.lax.Precision.HIGHEST}
            if str(want).lower() not in table:
                raise ValueError(f"loss_precision must be one of "
                                 f"{sorted(table)}, got {want!r}")
            return table[str(want).lower()]
        return jax.lax.Precision.HIGH if mode in self._value_sensitive \
            else None

    def _make_train_step(self):
        model, meta = self.model, self.meta
        ordered, regu = self.ordered_names, self.regu_names
        prepare, tx, mode = self.prepare, self._tx, self.mode
        loss_prec = self._loss_precision(mode)
        pol_kwargs = dict(
            dropout_rate=self.cfg.get("dropout_rate", 0.5) or 0.5,
            delta=self.cfg.get("delta", 1.5) or 1.5,
            temp=self.cfg.get("temp", 1.0) or 1.0,
            alpha_ema=self.cfg.get("alpha", 0.5) or 0.5)

        gan_cfg, d_module, d_tx = self.gan_cfg, self._d_module, self._d_tx
        if gan_cfg is not None:
            from pase_tpu.adversarial import d_loss_fn, g_loss_fn
            gan_worker = gan_cfg.get("worker", "cchunk")
            gan_loss = gan_cfg.get("loss", "LSGAN")
            gan_weight = gan_cfg.get("weight", 1.0)
            gan_type = gan_cfg.get("type", "wave")
            # legacy Waveminionet z-adversarial warm-up schedule
            # (core.py:179-182,302-303,378-397): weight 0 until `warmup`
            # steps, then zinit_weight ramped by zinc/step up to 1.
            # Defaults (warmup=0, zinit=1) keep the constant weight.
            gan_warmup = int(gan_cfg.get("warmup", 0) or 0)
            gan_zinit = float(gan_cfg.get("zinit_weight", 1.0))
            gan_zinc = float(gan_cfg.get("zinc", 0.0002))

            def gan_ramp(step):
                ramp = jnp.minimum(
                    1.0, gan_zinit + gan_zinc *
                    jnp.maximum(step - gan_warmup, 0).astype(jnp.float32))
                return jnp.where(step >= gan_warmup, ramp, 0.0)

        def mgda_alpha(params, batch_stats, batch, k_sample, k_drop, alpha):
            """Per-worker MGDA-UB weights: jacrev of the loss vector w.r.t.
            a zero probe on the chunk representation (one forward + K
            head-only backwards; see scheduling.py MGDA note)."""
            from pase_tpu.scheduling import mgda_rep_weights

            def loss_vec_of_probe(probe):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                (h, chunk, preds, labels), _ = model.apply(
                    variables, batch, alpha, train=True,
                    rngs={"sample": k_sample, "dropout": k_drop},
                    rep_probe=probe, mutable=["batch_stats"])
                losses = worker_losses(meta, preds, labels,
                                       loss_precision=loss_prec)
                return jnp.stack([losses[n] for n in ordered])

            b = batch["chunk"].shape[0]
            frames = batch["chunk"].shape[1] // self.hop
            emb = self.model_emb_dim
            probe = jnp.zeros((b, frames, emb))
            grads = jax.jacrev(loss_vec_of_probe)(probe)
            return mgda_rep_weights(grads)

        from pase_tpu.precision import compute_dtype, resolve
        cdt = resolve(self.cfg.get("compute_dtype"))
        log_grads = bool(self.cfg.get("log_grad_norms", False))
        log_hists = bool(self.cfg.get("log_histograms", False))

        def _hist(x, bins=24):
            # in-graph fixed-bin histogram over the value range
            # (reference add_histogram observability, trainer.py:398-413)
            x = jnp.ravel(x).astype(jnp.float32)
            lo, hi = jnp.min(x), jnp.max(x)
            edges = lo + (hi - lo + 1e-9) * jnp.arange(bins + 1) / bins
            idx = jnp.clip(jnp.searchsorted(edges, x, side="right") - 1,
                           0, bins - 1)
            counts = jnp.zeros((bins,), jnp.int32).at[idx].add(1)
            return jnp.concatenate([jnp.stack([lo, hi]),
                                    counts.astype(jnp.float32)])

        def train_step(state: TrainState, raw_batch):
            # trace-time mixed-precision policy (bf16 MXU passes, f32
            # accumulation/params) — static once jitted
            ctx = compute_dtype(cdt)
            ctx.__enter__()
            rng, k_prep, k_sample, k_drop, k_pol = jax.random.split(
                state.rng, 5)
            batch = prepare(raw_batch, k_prep)
            mg_alpha = None
            if mode == "MGD":
                mg_alpha = mgda_alpha(state.params, state.batch_stats,
                                      batch, k_sample, k_drop, state.alpha)

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                (h, chunk, preds, labels), ups = model.apply(
                    variables, batch, state.alpha, train=True,
                    rngs={"sample": k_sample, "dropout": k_drop},
                    mutable=["batch_stats", "intermediates"])
                losses = worker_losses(meta, preds, labels,
                                       loss_precision=loss_prec)
                loss_vec = jnp.stack([losses[n] for n in ordered])
                weights, alpha_next, new_pstate = apply_policy(
                    mode, loss_vec, state.policy_state, k_pol,
                    mgda_alpha=mg_alpha, **pol_kwargs)
                total = jnp.sum(jax.lax.stop_gradient(weights) * loss_vec)
                for n in regu:
                    total = total + losses[n]
                # VQ commitment loss (vq_K configs): sown by WaveFe,
                # aggregated into the objective like the reference VQ path
                # (core.py / modules.py:1080-1147) — this is what trains
                # the encoder toward the codebook
                from pase_tpu.model import collect_sown
                vq = collect_sown(ups, "vq_loss")
                if vq:
                    vq_total = sum(vq)
                    losses["vq"] = vq_total
                    total = total + vq_total
                    pp = collect_sown(ups, "vq_perplexity")
                    if pp:
                        losses["vq_perplexity"] = sum(pp) / len(pp)
                if log_hists:
                    # pred/target distributions per worker ([lo, hi,
                    # bin counts...] rows in the JSONL; the reference's
                    # tensorboard add_histogram, trainer.py:398-413)
                    from pase_tpu.model import materialize_pred
                    for n in ordered:
                        losses[f"hist/{n}"] = _hist(materialize_pred(
                            preds[n]))
                        losses[f"hist/gtruth_{n}"] = _hist(labels[n])
                fake = z_real_h = None
                if gan_cfg is not None:
                    if gan_type == "z" and gan_cfg.get("cchunk_prior"):
                        # real side = PASE(cchunk): push noisy-chunk
                        # embeddings toward clean-chunk embeddings
                        # (core.py:381-384 cchunk_prior)
                        z_real_h = h["cchunk"]
                    # generator objective: D(fake) should look real; D
                    # params are a closed-over constant inside loss_fn so
                    # only the generator receives these gradients
                    from pase_tpu.model import materialize_pred
                    fake = chunk if gan_type == "z" \
                        else materialize_pred(preds[gan_worker])
                    d_vars = {"params": state.d_params,
                              "batch_stats": state.d_batch_stats}
                    d_on_fake = d_module.apply(d_vars, fake, train=False)
                    gl = g_loss_fn(d_on_fake, gan_loss)
                    name_g = "z_g" if gan_type == "z" else f"{gan_worker}_g"
                    losses[name_g] = gl
                    total = total + gan_weight * gan_ramp(state.step) * gl
                losses["total"] = total
                return total, (losses, ups.get("batch_stats", {}),
                               alpha_next, new_pstate, fake, z_real_h)

            (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
            losses, new_bs, alpha_next, new_pstate, fake, z_real_h = aux
            if log_grads:
                # per-component grad norms (reference get_grad_norms
                # observability, pase/utils.py:188-203)
                for comp, sub in grads.items():
                    flat = jnp.concatenate(
                        [jnp.ravel(g) for g in jax.tree.leaves(sub)])
                    losses[f"grad_norm/{comp}"] = jnp.linalg.norm(flat)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)

            d_params, d_bs, d_opt = (state.d_params, state.d_batch_stats,
                                     state.d_opt_state)
            if gan_cfg is not None:
                if gan_type == "z":
                    # real distribution: N(0,1) prior, or PASE(cchunk)
                    # under cchunk_prior (core.py:381-384)
                    real = (jax.lax.stop_gradient(z_real_h)
                            if z_real_h is not None else
                            jax.random.normal(jax.random.fold_in(rng, 3),
                                              fake.shape))
                else:
                    real = batch["cchunk"][..., None]
                fake_sg = jax.lax.stop_gradient(fake)

                def d_objective(dp):
                    d_vars = {"params": dp, "batch_stats": d_bs}
                    dr, d_ups = d_module.apply(d_vars, real, train=True,
                                               mutable=["batch_stats"])
                    df, d_ups = d_module.apply(
                        {"params": dp, "batch_stats": d_ups["batch_stats"]},
                        fake_sg, train=True, mutable=["batch_stats"])
                    return d_loss_fn(dr, df, gan_loss), d_ups["batch_stats"]

                (dl, d_bs), d_grads = jax.value_and_grad(
                    d_objective, has_aux=True)(d_params)

                def d_apply(ops):
                    dp, do = ops
                    d_updates, do = d_tx.update(d_grads, do, dp)
                    return optax.apply_updates(dp, d_updates), do

                if gan_warmup:
                    # D training starts AT warm-up (core.py:378): skip
                    # the whole optimizer update before it so Adam
                    # moments/step count stay untouched (a zeroed update
                    # would still advance them and shrink the first real
                    # post-warmup steps via stale bias correction)
                    d_params, d_opt = jax.lax.cond(
                        state.step >= gan_warmup, d_apply,
                        lambda ops: ops, (d_params, d_opt))
                else:
                    d_params, d_opt = d_apply((d_params, d_opt))
                losses["d_loss"] = dl

            new_state = TrainState(
                params=new_params, batch_stats=new_bs, opt_state=new_opt,
                policy_state=new_pstate, alpha=alpha_next, rng=rng,
                step=state.step + 1, d_params=d_params, d_batch_stats=d_bs,
                d_opt_state=d_opt)
            ctx.__exit__(None, None, None)
            return new_state, losses

        self._train_step_body = train_step   # un-jitted body, reused by
        # make_multi_train_step (no private jit attributes involved)
        return jax.jit(train_step, donate_argnums=(0,))

    def make_fused_feed_step(self, feed_fn):
        """ONE dispatch per step: in-graph batch materialization
        (feed_fn: feed_state -> (raw batch, feed_state'), e.g. the
        device-corpus gather or on-device synthetic generation) fused
        with the train step.  Removes the per-step feed-dispatch +
        device_put latency of the staged path (~6 ms/step over the axon
        tunnel); the feed state (corpus buffer, PRNG key, index tables)
        is threaded as a jit ARGUMENT, so the buffer is never baked
        into the executable and is not copied between steps."""
        if self._train_step is None:
            self._train_step = self._make_train_step()
        body = self._train_step_body
        bsh = batch_sharding(self.mesh)

        def fused(state, feed):
            raw, feed = feed_fn(feed)
            raw = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, bsh), raw)
            state, losses = body(state, raw)
            return state, losses, feed

        return jax.jit(fused, donate_argnums=(0,))

    def make_multi_train_step(self, n_inner: int):
        """K train steps fused into one executable via lax.scan over
        stacked batches [K, B, T] — amortizes per-dispatch latency and
        lets XLA overlap the optimizer tail with the next step's head."""
        single = getattr(self, "_train_step_body", None)
        if single is None:
            self._make_train_step()          # stores _train_step_body
            single = self._train_step_body

        def multi(state, batches):
            def body(carry, batch):
                new_state, losses = single(carry, batch)
                return new_state, losses["total"]

            state, totals = jax.lax.scan(body, state, batches)
            return state, totals

        return jax.jit(multi, donate_argnums=(0,))

    def _make_eval_step(self):
        model, meta = self.model, self.meta
        prepare = self.prepare
        from pase_tpu.precision import compute_dtype, resolve
        cdt = resolve(self.cfg.get("compute_dtype"))

        def eval_step(state: TrainState, raw_batch, key):
            # eval measures the TRAINING configuration: run under the same
            # compute-dtype policy as the train step (reference eval_
            # evaluates the model it trains, WorkerScheduler/trainer.py)
            with compute_dtype(cdt):
                k_prep, k_sample = jax.random.split(key)
                batch = prepare(raw_batch, k_prep)
                variables = {"params": state.params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                (h, chunk, preds, labels), ups = model.apply(
                    variables, batch, 1.0, train=False,
                    rngs={"sample": k_sample}, mutable=["intermediates"])
                losses = worker_losses(meta, preds, labels,
                                       loss_precision=jax.lax.Precision.HIGH)
                losses["total"] = sum(losses.values())
                # VQ commitment term: eval measures the SAME objective as
                # the train step (which adds sown vq_loss to its total) —
                # otherwise epoch eval can improve while codebook
                # commitment degrades (core.py VQ loss aggregation)
                from pase_tpu.model import collect_sown
                vq = collect_sown(ups, "vq_loss")
                if vq:
                    vq_total = sum(vq)
                    losses["vq"] = vq_total
                    losses["total"] = losses["total"] + vq_total
            return losses

        return jax.jit(eval_step)

    # -- loops ----------------------------------------------------------------

    def train_(self, batcher, valid_batcher=None, state=None,
               epochs: Optional[int] = None, resume: bool = True):
        if state is None:
            state = None
            if resume:
                state = self.try_resume()
            if state is None:
                state = self.init_state(self.cfg.get("seed", 0))
        if self._train_step is None:
            self._train_step = self._make_train_step()
        epochs = epochs if epochs is not None else self.epochs
        bpe = self.bpe
        step0 = int(jax.device_get(state.step))
        epoch_beg = step0 // bpe
        it = iter(batcher)
        eval_key = jax.random.PRNGKey(1234)

        wire_i16 = str(self.cfg.get("wire_dtype", "float32")) == "int16"
        wave_keys = ("chunk", "chunk_ctxt", "chunk_rand", "cchunk")

        def stage(raw):
            # async H2D: device_put returns immediately; the transfer
            # overlaps the in-flight step (double buffering). wire_dtype
            # int16 ships PCM-sourced waveforms on the PCM16 grid —
            # v*32768 is exactly the original sample (read_wav divides
            # by 32768), so the device-side dequantization in the step
            # is LOSSLESS while halving host->device bytes (measured
            # ~55 MB/s over the axon tunnel; pipeline.py dequantizes).
            if wire_i16:
                # host (numpy) waveforms only — device-side batchers
                # (DeviceCorpus/DeviceSynthetic) are already on-chip and
                # must not round-trip through the host
                raw = {k: (np.clip(np.asarray(v) * 32768.0,
                                   -32768, 32767).astype(np.int16)
                           if k in wave_keys and isinstance(v, np.ndarray)
                           else v)
                       for k, v in raw.items()}
            return shard_batch({k: jnp.asarray(v) for k, v in raw.items()},
                               self.mesh)

        # fused in-graph feed: device-side batchers expose feed_fn /
        # feed_state (device corpus, on-device synthetic) — one dispatch
        # per step instead of feed + device_put + step.  Multi-process
        # runs keep the staged path (per-host batch assembly) unless
        # the batcher's feed is itself a global SPMD program
        # (multiprocess_ok: the sharded device corpus).
        feed_fn = getattr(batcher, "feed_fn", None)
        fused = feed = None
        if feed_fn is not None \
                and (jax.process_count() == 1
                     or getattr(batcher, "multiprocess_ok", False)) \
                and not self.cfg.get("no_fused_feed"):
            fused = self.make_fused_feed_step(feed_fn)
            # seed the feed at the resumed global step: device batchers
            # derive per-batch keys as fold_in(key0, step), so a resumed
            # run replays the uninterrupted run's batch sequence exactly
            # (bitwise-transparent preemption; recipes/rehearsal.sh)
            try:
                feed = batcher.feed_state(step0)
            except TypeError:           # external batcher, legacy signature
                feed = batcher.feed_state()
        else:
            if getattr(batcher, "pre_sharded", False) \
                    and jax.process_count() > 1:
                raise ValueError(
                    "the sharded device corpus requires the fused feed "
                    "on multi-process runs (drop --no_fused_feed)")
            staged = stage(next(it))
        for e in range(epoch_beg, epochs):
            t0 = time.time()
            last_losses = None
            for bidx in range(1, bpe + 1):
                if fused is not None:
                    state, losses, feed = fused(state, feed)
                else:
                    raw = staged
                    staged = stage(next(it))
                    state, losses = self._train_step(state, raw)
                if bidx % self.log_freq == 0 or bidx >= bpe:
                    last_losses = {
                        k: (v if getattr(v, "ndim", 0) > 0 else float(v))
                        for k, v in jax.device_get(losses).items()}
                    gstep = e * bpe + bidx
                    self.logger.log("train", gstep, last_losses)
                    # NaN guard (the reference's commented-out
                    # detect_anomaly, train.py:263 — here always on)
                    if not np.isfinite(last_losses.get("total", 0.0)):
                        raise FloatingPointError(
                            f"non-finite total loss at step {gstep}: "
                            f"{last_losses}")
            dt = time.time() - t0
            sps = bpe / dt
            self.logger.log("perf", (e + 1) * bpe, {
                "steps_per_sec": sps,
                "audio_sec_per_sec": sps * self.batch_size *
                self.chunk_size / 16000})
            if valid_batcher is not None:
                self.evaluate(state, valid_batcher, epoch=e, key=eval_key)
            self.save(state, e)
            # async downstream probes (AuxiliarSuperviser,
            # pase/utils.py:164-185; trigger trainer.py:274-278)
            sup_exec = self.cfg.get("sup_exec")
            sup_freq = self.cfg.get("sup_freq", 1)
            if sup_exec and ((e + 1) % sup_freq == 0 or (e + 1) >= epochs):
                from pase_tpu.utils import AuxiliarSuperviser
                if not hasattr(self, "_aux_sup"):
                    aux_path = os.path.join(self.save_path, "sup_aux")
                    os.makedirs(aux_path, exist_ok=True)
                    self._aux_sup = AuxiliarSuperviser(sup_exec, aux_path)
                self._aux_sup(e, os.path.join(self.save_path,
                                              f"FE_e{e}.npz"),
                              self.cfg.get("fe_cfg", ""))
        return state

    def evaluate(self, state, batcher, epoch=0, n_batches: Optional[int] = None,
                 key=None):
        if self._eval_step is None:
            self._eval_step = self._make_eval_step()
        key = key if key is not None else jax.random.PRNGKey(0)
        n_batches = n_batches or self.cfg.get("va_bpe", 10)
        running: Dict[str, list] = {}
        it = iter(batcher)
        pre_sharded = getattr(batcher, "pre_sharded", False)
        for bidx in range(n_batches):
            key, sub = jax.random.split(key)
            raw = next(it)
            if not pre_sharded:
                # sharded-corpus batches are already mesh-global arrays;
                # re-staging them would device_get non-addressable shards
                raw = shard_batch(
                    {k: jnp.asarray(v) for k, v in raw.items()},
                    self.mesh)
            losses = jax.device_get(self._eval_step(state, raw, sub))
            for k, v in losses.items():
                running.setdefault(k, []).append(float(v))
        means = {k: float(np.mean(v)) for k, v in running.items()}
        self.logger.log("eval", epoch, means)
        return means

    # -- checkpointing ---------------------------------------------------------

    def save(self, state, epoch: int):
        """Persist the FULL TrainState — params, batch_stats, optimizer
        moments, policy state, alpha, rng, and GAN discriminator state —
        so a preempted run resumes with bit-identical optimization
        (reference Saver semantics, modules.py:151-301)."""
        from pase_tpu.checkpoint import train_state_to_tree
        if jax.process_index() != 0:
            return      # multi-host: one writer (state is replicated)
        host = jax.device_get(state)
        step = int(host.step)
        self.saver.save(self.name, train_state_to_tree(host), step)
        # encoder-only artifact, the reference's published format
        # (FE_e{e}.ckpt — trainer.py:267-269)
        fe_vars = {"params": host.params["frontend"],
                   "batch_stats": host.batch_stats.get("frontend", {})}
        save_variables(os.path.join(self.save_path, f"FE_e{epoch}.npz"),
                       fe_vars, step)

    def try_resume(self) -> Optional[TrainState]:
        tree, meta = self.saver.load_weights()
        if tree is None:
            return None
        state = self.init_state(self.cfg.get("seed", 0))
        step = int(meta.get("step", 0))
        if "opt_state" not in tree:
            # legacy weights-only checkpoint (round-1 format): resume
            # params/batch_stats/step, fresh optimizer — loud about it
            print("[trainer] WARNING: legacy checkpoint without optimizer "
                  "state; resuming weights only (Adam moments reset)")
            return state._replace(params=tree["params"],
                                  batch_stats=tree.get("batch_stats", {}),
                                  step=jnp.asarray(step, jnp.int32))
        from pase_tpu.checkpoint import restore_train_state
        restored = restore_train_state(jax.device_get(state), tree)
        # step consistency: index step, __meta__ step and the state's own
        # step leaf must agree (reference enforces all savers at the same
        # step on resume — WorkerScheduler/trainer.py:339-363)
        if int(restored.step) != step:
            raise ValueError(
                f"checkpoint step mismatch: index says {step}, state "
                f"holds {int(restored.step)}")
        return replicate(restored, self.mesh)
