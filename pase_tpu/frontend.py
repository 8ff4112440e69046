"""Waveform encoders (the PASE "frontend"), TPU-native.

``WaveFe`` reproduces the reference encoder behavior
(/root/reference/pase/models/frontend.py:116-279): SincNet first layer,
strided FeBlocks (stride product 160 -> 100 Hz frames at 16 kHz), optional
dense skip 1x1 projections fused by mean-pool downsampling + sum/concat,
optional window-2 QRNN context layer, 1x1 projection ``W`` to ``emb_dim``,
optional affine-free BatchNorm output normalization, optional tanh.

Internal layout is [B, T, C]; the public ``Encoder`` wrapper exposes the
reference's (B, 1, T) -> (B, emb, T') contract
((1,1,100000) -> (1,256,625) for PASE+ — README.md:36-39).
"""

import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import freeze, unfreeze

from pase_tpu.nn import (FeBlock, FeResBlock, Conv1D, QRNN, BatchNorm1d,
                         InstanceNorm1d, build_norm)


def pool_to(skip, out_len: int):
    """Mean-pool downsample to out_len frames (fuse_skip semantics,
    reference frontend.py:213-232: factor = realized length ratio,
    trailing remainder dropped). NTC layout."""
    dfactor = skip.shape[1] // out_len
    if dfactor > 1:
        maxlen = out_len * dfactor
        skip = skip[:, :maxlen]
        b, t, c = skip.shape
        skip = skip.reshape(b, t // dfactor, dfactor, c).mean(axis=2)
    return skip


def fuse_skip(y, skip, densemerge="sum"):
    """Fuse a (possibly higher-rate) skip into y (frontend.py:213-232)."""
    skip = pool_to(skip, y.shape[1])
    if densemerge == "concat":
        return jnp.concatenate([y, skip], axis=-1)
    if densemerge == "sum":
        return y + skip
    raise TypeError(f"Unknown densemerge: {densemerge}")


class WaveFe(nn.Module):
    """Convolutional front-end: waveform [B, T] -> features [B, T//160, emb].

    Config keys mirror the reference JSON configs (cfg/frontend/*.cfg).
    """
    num_inputs: int = 1
    sincnet: bool = True
    kwidths: Sequence[int] = (251, 10, 5, 5, 5, 5, 5, 5)
    strides: Sequence[int] = (1, 10, 2, 1, 2, 1, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1, 1, 1, 1, 1)
    fmaps: Sequence[int] = (64, 64, 128, 128, 256, 256, 512, 512)
    norm_type: str = "bnorm"
    pad_mode: str = "reflect"
    sr: int = 16000
    emb_dim: int = 256
    rnn_dim: Optional[int] = None
    activation: Optional[str] = None
    rnn_pool: bool = False
    rnn_layers: int = 1
    rnn_dropout: float = 0.0
    rnn_type: str = "qrnn"
    qrnn_impl: str = "auto"      # 'auto' | 'scan' | 'pallas' (nn.QRNN)
    virtual_pads: Any = "auto"   # FeBlock pad-in-conv: True/False/'auto'
                                 # ('auto' = TPU only, see nn.FeBlock)
    vq_K: Optional[int] = None
    vq_beta: float = 0.25
    vq_gamma: float = 0.99
    norm_out: bool = False
    tanh_out: bool = False
    resblocks: bool = False
    denseskips: bool = False
    densemerge: str = "sum"
    name_: str = "WaveFe"

    @property
    def output_dim(self) -> int:
        if self.denseskips and self.densemerge == "concat":
            return self.emb_dim * len(self.kwidths)
        return self.emb_dim

    @nn.compact
    def __call__(self, wav, train: bool = False):
        """wav: [B, T] or [B, T, 1] -> [B, T//prod(strides), emb_dim]."""
        if wav.ndim == 2:
            h = wav[..., None]
        else:
            h = wav
        dskips = []
        nblocks = len(self.kwidths)
        for i, (kw, st, dil, fm) in enumerate(zip(self.kwidths, self.strides,
                                                  self.dilations, self.fmaps)):
            sinc_here = self.sincnet and i == 0
            if self.resblocks and not sinc_here:
                # residual path (reference frontend.py:160-168):
                # FeResBlock for every non-sinc layer, stride expressed
                # as nearest-neighbor downsampling
                h = FeResBlock(fmaps=fm, kwidth=kw, downsample=st,
                               act=self.activation,
                               norm_type=self.norm_type,
                               name=f"blocks_{i}")(h, train=train)
            else:
                h = FeBlock(fmaps=fm, kwidth=kw, stride=st, dilation=dil,
                            pad_mode=self.pad_mode, act=self.activation,
                            norm_type=self.norm_type,
                            sincnet=sinc_here, sr=self.sr,
                            virtual_pads=self.virtual_pads,
                            name=f"blocks_{i}")(h, train=train)
            if self.denseskips and (i + 1) < nblocks:
                # The 1x1 projection is bias-free and the skip fuse
                # downsamples by mean-pooling — both linear, so pooling
                # FIRST is exactly the same function. Projecting at the
                # block rate would cost ~100 GFLOP + a 1.6 GB activation
                # at block 0 (B=96, T=32000); pooled first it is ~0.6
                # GFLOP. The projection itself is applied at fuse time
                # (after y fixes the output length).
                dskips.append(h)
        if self.rnn_pool:
            rnn_dim = self.rnn_dim if self.rnn_dim is not None else self.emb_dim
            rt = str(self.rnn_type).lower()
            if rt == "qrnn":
                # reference bidirectional quirk: QRNN ignores the flag and
                # doubles rnn_dim//2 back to rnn_dim (modules.py:48-53)
                h = QRNN(hidden=rnn_dim, layers=self.rnn_layers,
                         impl=self.qrnn_impl, dropout=self.rnn_dropout,
                         name="rnn")(h, train=train)
            elif rt in ("lstm", "gru"):
                # build_rnn_block's torch nn.LSTM/GRU branch
                # (modules.py:54-57): bidirectional with hidden
                # rnn_dim//2 each way -> rnn_dim features out
                from pase_tpu.nn import BiRNN
                h = BiRNN(hidden=rnn_dim // 2, layers=self.rnn_layers,
                          cell=rt, dropout=self.rnn_dropout,
                          name="rnn")(h, train=train)
            else:
                # reference raises TypeError too (modules.py:58-59);
                # silently training the wrong architecture is worse
                raise TypeError(f"Unrecognized rnn type: {self.rnn_type}")
        y = Conv1D(self.emb_dim, 1, name="W")(h)
        for i, dskip in enumerate(dskips):
            pooled = pool_to(dskip, y.shape[1])
            proj = Conv1D(self.emb_dim, 1, use_bias=False,
                          name=f"denseskips_{i}")(pooled)
            y = fuse_skip(y, proj, self.densemerge)
        if self.norm_out:
            if self.norm_type == "bnorm":
                y = BatchNorm1d(self.output_dim, affine=False,
                                name="norm_out")(y, train=train)
            else:
                y = InstanceNorm1d(self.output_dim,
                                   name="norm_out")(y, train=train)
        if self.tanh_out:
            y = jnp.tanh(y)
        if self.vq_K is not None and self.vq_K > 0:
            from pase_tpu.nn import VQEMA
            qloss, y, pp, _ = VQEMA(self.vq_K, self.output_dim,
                                    self.vq_beta, self.vq_gamma,
                                    name="quantizer")(y, train=train)
            self.sow("intermediates", "vq_loss", qloss)
            self.sow("intermediates", "vq_perplexity", pp)
        return y


def load_cfg(cfg) -> Dict[str, Any]:
    if isinstance(cfg, str):
        with open(cfg, "r") as f:
            cfg = json.load(f)
    return dict(cfg)


_WAVEFE_KEYS = {
    "num_inputs", "sincnet", "kwidths", "strides", "dilations", "fmaps",
    "norm_type", "pad_mode", "sr", "emb_dim", "rnn_dim", "activation",
    "rnn_pool", "rnn_layers", "rnn_dropout", "rnn_type", "qrnn_impl",
    "virtual_pads", "vq_K", "vq_beta",
    "vq_gamma", "norm_out", "tanh_out", "resblocks", "denseskips",
    "densemerge",
}


def build_wavefe(cfg) -> WaveFe:
    cfg = load_cfg(cfg)
    cfg.pop("name", None)
    kwargs = {k: v for k, v in cfg.items() if k in _WAVEFE_KEYS}
    for seq_key in ("kwidths", "strides", "dilations", "fmaps"):
        if seq_key in kwargs:
            kwargs[seq_key] = tuple(kwargs[seq_key])
    return WaveFe(**kwargs)


class Encoder:
    """Stateful convenience wrapper preserving the reference public API:

        fe = wf_builder('cfg/frontend/PASE+.cfg')
        fe.load_pretrained('FE_e199.ckpt', load_last=True)
        y = fe(x)          # x: (B, 1, T) or (B, T) -> (B, emb, T')

    Internally holds a WaveFe module definition plus a frozen variable
    dict (params + batch_stats).
    """

    def __init__(self, cfg, seed: int = 0):
        self.cfg = load_cfg(cfg)
        self.module = build_frontend_module(self.cfg)
        self.emb_dim = getattr(self.module, "output_dim",
                               getattr(self.module, "emb_dim", 256))
        self._variables = None
        self._seed = seed
        self._apply = None

    # -- parameter management -------------------------------------------
    def init(self, example_len: int = 16000, batch: int = 1):
        key = jax.random.PRNGKey(self._seed)
        x = jnp.zeros((batch, example_len))
        self._variables = self.module.init(key, x, train=False)
        return self._variables

    @property
    def variables(self):
        if self._variables is None:
            self.init()
        return self._variables

    @variables.setter
    def variables(self, v):
        self._variables = v
        self._apply = None

    def load_pretrained(self, ckpt_path, load_last: bool = True,
                        verbose: bool = False):
        """Load a checkpoint: native .npz/.msgpack, or a reference torch
        ``FE_e*.ckpt`` (state-dict) converted on the fly
        (modules.py:267-301 semantics)."""
        from pase_tpu.checkpoint import load_frontend_ckpt
        self._variables = load_frontend_ckpt(ckpt_path, self.module,
                                             self.variables,
                                             load_last=load_last,
                                             verbose=verbose)
        self._apply = None
        return self

    # -- inference --------------------------------------------------------
    def __call__(self, x, train: bool = False, mode: Optional[str] = None):
        if train:
            # the cached jitted apply is eval-mode only (running BN
            # stats, no batch-stat mutation); silently ignoring the flag
            # would return wrong numerics — training goes through the
            # flax module inside the Trainer's step
            raise ValueError(
                "Encoder is the inference wrapper (train=False only); "
                "use the flax module via Trainer / model.apply for "
                "train-mode forwards")
        x = jnp.asarray(x)
        squeeze_batch = False
        if x.ndim == 3:       # (B, 1, T) reference layout
            x = x[:, 0, :]
        elif x.ndim == 1:
            x = x[None]
            squeeze_batch = True
        if self._apply is None:
            self._apply = jax.jit(
                lambda v, w: self.module.apply(v, w, train=False))
        y = self._apply(self.variables, x)       # [B, T', C]
        y = jnp.transpose(y, (0, 2, 1))           # reference (B, C, T')
        y = select_output(y, mode)
        if squeeze_batch:
            y = y[0]
        return y


def select_output(h, mode=None):
    """Eval-time output post-processing (modules.py:62-74), (B, C, T)."""
    if mode == "avg_norm":
        return h - jnp.mean(h, axis=2, keepdims=True)
    if mode == "avg_concat":
        g = jnp.repeat(jnp.mean(h, axis=2, keepdims=True), h.shape[-1], axis=2)
        return jnp.concatenate([h, g], axis=1)
    if mode == "avg_norm_concat":
        g = jnp.mean(h, axis=2, keepdims=True)
        h = h - g
        g = jnp.repeat(g, h.shape[-1], axis=2)
        return jnp.concatenate([h, g], axis=1)
    return h


def build_frontend_module(cfg):
    """cfg dict -> (module, cfg) for any encoder family (the 'name'
    dispatch of the reference wf_builder, frontend.py:18-40)."""
    cfg = load_cfg(cfg)
    name = cfg.get("name")
    if name in (None, "WaveFe"):
        return build_wavefe(cfg)
    from pase_tpu import encoders
    kw = {k: v for k, v in cfg.items() if k != "name"}
    if name == "tdnn":
        fields = set(encoders.TDNNFe.__dataclass_fields__)
        return encoders.TDNNFe(**{k: v for k, v in kw.items()
                                  if k in fields})
    if name == "asppRes":
        fields = set(encoders.ASPPResEncoder.__dataclass_fields__)
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in kw.items() if k in fields}
        return encoders.ASPPResEncoder(**kw)
    if name == "Resnet50":
        fields = set(encoders.ResnetEncoder.__dataclass_fields__)
        return encoders.ResnetEncoder(**{k: v for k, v in kw.items()
                                         if k in fields})
    raise TypeError(f"Unrecognized frontend type: {name}")


def wf_builder(cfg) -> Encoder:
    """Frontend factory preserving the reference entrypoint
    (frontend.py:18-40). Dispatches on the optional 'name' key."""
    if cfg is None:
        raise ValueError("cfg cannot be None!")
    cfg = load_cfg(cfg)
    return Encoder(cfg)
