"""PASE multi-task model assembly: frontend + worker bank, one graph.

Reproduces /root/reference/pase/models/pase.py:241-356 functionally: the
encoder runs once on the concatenated {chunk, ctxt, rand, (cchunk)} batch,
every worker consumes the shared hidden, contrastive labels are
synthesized in-graph, and the whole thing lives in a single jitted
train/eval step (SURVEY.md §7 design stance).

Worker configs are the reference JSON worker cfgs (cfg/workers/*.cfg),
parsed by ``parse_workers_cfg`` (mirrors pase/utils.py:worker_parser but
keeps losses as names + r instead of objects).
"""

import json
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pase_tpu.frontend import WaveFe, build_wavefe
from pase_tpu.minions import (MLPMinion, DecoderMinion, GRUMinion, SPCMinion,
                              GapMinion, make_mi_samples, make_mi_labels,
                              scale_grad)
from pase_tpu.wavernn import WaveRNNMinion
from pase_tpu.losses import make_loss


_MINION_FIELDS = {
    "mlp": ("num_outputs", "hidden_size", "hidden_layers", "context",
            "tie_context_weights", "dropout", "dropout_time", "dropin",
            "dropin_mode", "ratio_fixed", "range_fixed", "drop_channels",
            "r", "skip"),
    "decoder": ("num_outputs", "fmaps", "strides", "kwidths", "hidden_size",
                "hidden_layers", "dropout", "dropout_time", "norm_type",
                "skip"),
    "gru": ("num_outputs", "hidden_size", "hidden_layers", "dropout", "skip"),
    "spc": ("num_outputs", "hidden_size", "hidden_layers", "ctxt_frames",
            "seq_pad", "dropout", "skip"),
    "gap": ("num_outputs", "hidden_size", "hidden_layers", "dropout", "skip"),
    # vocoder head (minions.py:58-146) — wired into the worker bank here,
    # unlike the reference, whose pase.py:336 call never passes the
    # kwargs minions.py:114 requires (documented broken wiring)
    "wavernn": ("num_inputs", "rnn_dims", "fc_dims", "bits", "hop_length",
                "mode", "pad", "upsample_scales", "res_out_dims"),
}

_MINION_CLS = {
    "mlp": MLPMinion,
    "decoder": DecoderMinion,
    "gru": GRUMinion,
    "spc": SPCMinion,
    "gap": GapMinion,
    "wavernn": WaveRNNMinion,
}


def parse_workers_cfg(cfg) -> Dict[str, List[dict]]:
    """Load a reference worker cfg JSON; normalize entries.

    Returns {'regr': [...], 'cls': [...], 'regu': [...]} where each entry
    keeps: name, type, loss (name), loss_weight, r, transform, and the
    head hyperparameters.
    """
    if isinstance(cfg, str):
        with open(cfg, "r") as f:
            cfg = json.load(f)
    out = {"regr": [], "cls": [], "regu": []}
    for group, entries in cfg.items():
        if group not in out:   # provenance/comment keys
            continue
        for e in entries:
            e = dict(e)
            e.setdefault("type", "mlp")
            e.setdefault("loss_weight", 1.0)
            out[group].append(e)
    return out


def _build_minion(cfg: dict, name: str):
    mtype = cfg.get("type", "mlp")
    # contrastive wrappers route by *name* in the reference
    # (cls_minions.py:10-27)
    if name == "spc":
        mtype = "spc"
    if name == "gap":
        mtype = "gap"
    cls = _MINION_CLS[mtype]
    fields = _MINION_FIELDS[mtype]
    kwargs = {k: cfg[k] for k in fields if k in cfg}
    for seq_key in ("fmaps", "strides", "kwidths", "upsample_scales"):
        if seq_key in kwargs:
            kwargs[seq_key] = tuple(kwargs[seq_key])
    return cls(name=f"{name}", **kwargs), mtype


class PASE(nn.Module):
    """Frontend + regression/classification/regularizer worker bank.

    __call__ consumes a batch dict with device arrays:
      'chunk' [B, T]            distorted input chunk
      'chunk_ctxt' [B, T]       temporal-neighbor chunk (for LIM/GIM)
      'chunk_rand' [B, T]       random-utterance chunk
      'cchunk' [B, T]           clean chunk (denoising target / regularizer)
      '<worker>' [B, F, D]      regression targets (computed on device)
      'overlap' [B, F]          overlap mask label (optional)
    and returns (hidden dict, chunk_hidden, preds, labels).

    ``alpha`` may be a scalar or a [num_workers] vector of per-worker
    frontend-gradient scales (hyper-volume/adaptive policies). The
    reference passes the vector unindexed, which only works for scalars;
    we index per worker (the documented intent).
    """
    frontend_cfg: Any
    workers_cfg: Any
    att_cfg: Any = None          # pase_attention (pase.py:17-130)
    chunking_K: Any = None       # pase_chunking fixed masks (pase.py:133-236)
    chunking_seed: int = 0
    # fused head+loss: MLP regression heads with an MSE loss and at least
    # this many output channels (num_outputs * r) skip materializing their
    # prediction — worker_losses computes the r-framed MSE directly from
    # (hidden, W) via losses.framed_mse_linear. 0 disables. Parameters and
    # loss values are unchanged (up to accumulation order); preds[name]
    # becomes a ("linear", h, kernel, bias) tuple for these workers.
    fused_mse_min_ch: int = 0
    # always forward cchunk through the encoder even without a
    # regularizer worker — needed by the legacy --cchunk_prior
    # z-adversarial mode (core.py:381-384: PASE(cchunk) is the D's
    # 'real' distribution)
    force_cchunk: bool = False

    def setup(self):
        from pase_tpu.frontend import build_frontend_module
        self.frontend = build_frontend_module(_thaw(self.frontend_cfg))
        wcfg = _thaw(self.workers_cfg)
        regr, cls_ = [], []
        regr_meta, cls_meta, regu_meta = [], [], []
        for e in wcfg.get("regr", []):
            m, _ = _build_minion(e, e["name"])
            regr.append(m)
            regr_meta.append(e)
        for e in wcfg.get("cls", []):
            m, _ = _build_minion(e, e["name"])
            cls_.append(m)
            cls_meta.append(e)
        for e in wcfg.get("regu", []):
            regu_meta.append(e)
        self._regr_meta = regr_meta
        self._cls_meta = cls_meta
        self._regu_meta = regu_meta
        self.regression_workers = regr
        self.classification_workers = cls_
        emb = getattr(self.frontend, "output_dim",
                      getattr(self.frontend, "emb_dim", 256))
        if self.att_cfg is not None:
            from pase_tpu.attention import AttentionBlock
            acfg = _thaw(self.att_cfg)
            self.attention_blocks = {
                e["name"]: AttentionBlock(
                    emb_dim=emb, K=acfg.get("K", 40),
                    avg_factor=acfg.get("avg_factor", 0.0),
                    att_mode=acfg.get("att_mode", "avg_time"),
                    hidden=tuple(acfg.get("hidden", (256,))),
                    name=f"att_{e['name']}")
                for e in cls_meta + regr_meta}
        if self.chunking_K is not None:
            from pase_tpu.attention import make_chunk_masks
            self.chunk_masks = make_chunk_masks(
                [e["name"] for e in cls_meta + regr_meta], emb,
                int(self.chunking_K), seed=self.chunking_seed)
        # the encoder only sees cchunk when a regularizer ties
        # PASE(chunk) to PASE(cchunk) (pase.py:300-317); the cchunk
        # DECODER worker's target is the raw clean wav from the batch
        self.fwd_cchunk = self.force_cchunk or any(
            "cchunk" in e["name"] for e in self._regu_meta)

    @property
    def worker_names(self) -> List[str]:
        """Loss ordering: cls first then regr (worker_scheduler.py loss
        vector order), then regularizers."""
        return ([e["name"] for e in self._cls_meta] +
                [e["name"] for e in self._regr_meta] +
                [e["name"] for e in self._regu_meta])

    def encode(self, wav, train: bool = False):
        return self.frontend(wav, train=train)

    def __call__(self, batch: Dict[str, jnp.ndarray], alpha=1.0,
                 train: bool = False, rep_probe=None):
        keys = [k for k in ("chunk", "chunk_ctxt", "chunk_rand", "cchunk")
                if k in batch]
        if "cchunk" in keys and not self.fwd_cchunk:
            keys.remove("cchunk")
        x = jnp.concatenate([batch[k] for k in keys], axis=0)
        hcat = self.frontend(x, train=train)            # [n*B, F, emb]
        hs = jnp.split(hcat, len(keys), axis=0)
        h = dict(zip(keys, hs))
        chunk = h["chunk"]
        if rep_probe is not None:
            # zero probe injected after the encoder: jacrev w.r.t. it
            # yields per-worker representation gradients (MGDA-UB) with
            # one forward + K head-only backward passes
            chunk = chunk + rep_probe
            h["chunk"] = chunk

        num_workers = len(self._cls_meta) + len(self._regr_meta)

        def a_of(i):
            if isinstance(alpha, (int, float)):
                return alpha
            al = jnp.asarray(alpha)
            return al[i] if al.ndim > 0 else al

        preds, labels = {}, {}
        widx = 0

        def worker_view(name):
            """Per-worker (chunk view, channel mask) under the attention /
            chunking variants; identity for the base model."""
            if self.att_cfg is not None:
                return self.attention_blocks[name](chunk, train=train)
            if self.chunking_K is not None:
                m = self.chunk_masks[name]
                return chunk * m[None, None, :], \
                    jnp.broadcast_to(m[None, :], (chunk.shape[0],
                                                  m.shape[0]))
            return chunk, None

        for e, worker in zip(self._cls_meta, self.classification_workers):
            name = e["name"]
            aw = a_of(widx)
            wchunk, wmask = worker_view(name)
            if name in ("spc", "gap"):
                # optional injected frame indices (parity harnesses) make
                # the stochastic sampling deterministic on both sides
                inj = batch.get(f"{name}_idx")
                if name == "gap":
                    y, dists = worker(wchunk, aw, train=train, idx=inj)
                    preds[name] = y
                    labels[name] = dists
                else:
                    y = worker(wchunk, aw, train=train, idx=inj)
                    preds[name] = y
                    labels[name] = make_mi_labels(y)
            elif name == "overlap":
                y = worker(wchunk, aw, train=train)
                preds[name] = y
                labels[name] = batch["overlap"][..., None]
            else:
                # LIM ('mi') / GIM ('cmi') — sample synthesis in-graph
                augment = bool(e.get("augment", False))
                hc, hr = h["chunk_ctxt"], h["chunk_rand"]
                if wmask is not None:
                    hc = hc * wmask[:, None, :]
                    hr = hr * wmask[:, None, :]
                pos, neg = make_mi_samples(wchunk, hc, hr, augment)
                xin = jnp.concatenate([pos, neg], axis=0)
                if name == "cmi":
                    xin = jnp.mean(xin, axis=1, keepdims=True)
                y = worker(xin, aw, train=train)
                preds[name] = y
                labels[name] = make_mi_labels(y)
            widx += 1

        for e, worker in zip(self._regr_meta, self.regression_workers):
            name = e["name"]
            wchunk, _ = worker_view(name)
            if e.get("type") == "wavernn":
                # teacher-forced vocoder head: previous clean samples +
                # edge-padded PASE frames -> per-sample logits; target is
                # the clean waveform (fixes the reference's broken
                # pase.py:336 wiring)
                wav = batch.get("cchunk", batch["chunk"])
                wav = wav[..., 0] if wav.ndim == 3 else wav
                pad_f = int(e.get("pad", 2) or 2)
                mels = scale_grad(wchunk, a_of(widx))
                mels = jnp.pad(mels, ((0, 0), (pad_f, pad_f), (0, 0)),
                               mode="edge")
                x_prev = jnp.pad(wav, ((0, 0), (1, 0)))[:, :-1]
                preds[name] = worker(x_prev, mels, train=train)
                labels[name] = jax.lax.stop_gradient(wav)
                widx += 1
                continue
            if _fuse_eligible(e, self.fused_mse_min_ch):
                y = worker(wchunk, a_of(widx), train=train,
                           return_linear=True)
            else:
                y = worker(wchunk, a_of(widx), train=train)
            preds[name] = y
            target = batch[name]
            if name in ("chunk", "cchunk"):
                # waveform reconstruction target: the (clean) wav itself
                target = target[..., None] if target.ndim == 2 else target
            labels[name] = jax.lax.stop_gradient(target)
            widx += 1

        for e in self._regu_meta:
            # parameterless regularizer: tie PASE(chunk) to PASE(cchunk)
            # (pase.py:300-333)
            name = e["name"]
            preds[name] = chunk
            labels[name] = jax.lax.stop_gradient(h["cchunk"])

        return h, chunk, preds, labels


def collect_sown(ups, key: str):
    """Gather every value sown under ``key`` anywhere in a mutated
    'intermediates' collection (flax sow appends tuples)."""
    out = []

    def walk(d):
        for k, v in dict(d).items():
            if k == key:
                out.extend(list(v) if isinstance(v, (tuple, list)) else [v])
            elif hasattr(v, "items"):
                walk(v)

    walk(ups.get("intermediates", {}))
    return out


def _fuse_eligible(e: dict, min_ch: int) -> bool:
    """A regr worker can use the fused linear-head MSE path when its head
    is a plain MLP ending in a kwidth-1 conv, the loss is MSE, and the
    output width clears the threshold (below it, materializing is cheap
    and large-matmul fusion has nothing to win)."""
    if min_ch <= 0 or e.get("type", "mlp") != "mlp":
        return False
    if e.get("loss") != "MSELoss" or e["name"] in ("chunk", "cchunk"):
        return False
    if int(e.get("context", 1) or 1) != 1 and \
            int(e.get("hidden_layers", 2) or 0) < 1:
        return False
    r = int(e.get("r", 1) or 1)
    return int(e.get("num_outputs", 1)) * max(r, 1) >= min_ch


def materialize_pred(pred):
    """Apply the deferred final linear of a fused head ("linear", h, W, b)
    — for histogram logging / external consumers; identity otherwise."""
    if isinstance(pred, tuple) and len(pred) == 4 and pred[0] == "linear":
        _, h, kernel, bias = pred
        y = h @ kernel[0].astype(h.dtype)
        return y + bias.astype(y.dtype)
    return pred


def worker_losses(model_meta, preds, labels, loss_precision=None):
    """Per-worker losses as a dict; loss fns from each worker cfg.

    loss_precision: matmul precision for the fused wide-head loss
    (losses.framed_mse_linear) — the Trainer passes Precision.HIGH for
    value-consuming policies and eval, None (backend default) on the hot
    base-policy path (see framed_mse_linear's docstring)."""
    from pase_tpu.losses import framed_mse_linear
    losses = {}
    for group in ("cls", "regr", "regu"):
        for e in model_meta[group]:
            name = e["name"]
            r = e.get("r") if group == "regr" else None
            pred = preds[name]
            if isinstance(pred, tuple) and len(pred) == 4 and \
                    pred[0] == "linear":
                _, h, kernel, bias = pred
                val = framed_mse_linear(kernel, bias, h, labels[name], r,
                                        precision=loss_precision)
            elif e.get("type") == "wavernn":
                from pase_tpu.wavernn import (raw_loss,
                                              discretized_mix_logistic_loss)
                logits = pred.astype(jnp.float32)
                if e.get("mode", "RAW") == "MOL":
                    val = discretized_mix_logistic_loss(logits,
                                                        labels[name])
                else:
                    val = raw_loss(logits, labels[name],
                                   bits=int(e.get("bits", 9)))
            else:
                fn = make_loss(e["loss"], r=r)
                val = fn(pred, labels[name])
            losses[name] = e.get("loss_weight", 1.0) * val
    return losses


def build_pase(frontend_cfg, workers_cfg, att_cfg=None,
               chunking_K=None,
               fused_mse_min_ch: int = 0,
               force_cchunk: bool = False) -> Tuple[PASE, Dict[str, Any]]:
    """Construct the model + normalized metadata from JSON cfgs/paths.
    att_cfg selects the pase_attention variant; chunking_K the
    pase_chunking variant (trainer.py:51-71 dispatch in the reference)."""
    if isinstance(frontend_cfg, str):
        with open(frontend_cfg) as f:
            frontend_cfg = json.load(f)
    if isinstance(att_cfg, str):
        with open(att_cfg) as f:
            att_cfg = json.load(f)
    meta = parse_workers_cfg(workers_cfg)
    # make cfgs hashable (flax module fields are static)
    model = PASE(frontend_cfg=_freeze(frontend_cfg),
                 workers_cfg=_freeze(meta),
                 att_cfg=_freeze(att_cfg) if att_cfg else None,
                 chunking_K=chunking_K,
                 fused_mse_min_ch=int(fused_mse_min_ch),
                 force_cchunk=bool(force_cchunk))
    return model, meta


def _freeze(v):
    if isinstance(v, dict):
        return ("__dict__",) + tuple(
            sorted(((k, _freeze(x)) for k, x in v.items()),
                   key=lambda kv: kv[0]))
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


def _thaw(v):
    if isinstance(v, tuple):
        if len(v) >= 1 and v[0] == "__dict__":
            return {k: _thaw(x) for k, x in v[1:]}
        return [_thaw(x) for x in v]
    return v
