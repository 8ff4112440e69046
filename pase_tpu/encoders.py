"""Alternative waveform encoders: TDNN (x-vector style), ASPP-residual,
and a 1-D ResNet — the reference's frontend zoo
(/root/reference/pase/models/frontend.py:43-114, 282-413;
tdnn.py:10-101; aspp.py:56-223). NTC layout throughout.

The reference's Resnet50 encoder wraps a *pretrained torchvision
resnet34* over a sinc-gram; there is no pretrained-weights story on TPU,
so ``ResnetEncoder`` provides the same topology trained from scratch.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from pase_tpu.nn import (Conv1D, BatchNorm1d, SincConv, FeBlock, QRNN,
                         build_norm, PReLU)
from pase_tpu.ops.pad import pad_1d


class StatisticalPooling(nn.Module):
    """[B, T, D] -> [B, 1, 2D] mean+std over time (tdnn.py:10-16)."""

    @nn.compact
    def __call__(self, x):
        mu = jnp.mean(x, axis=1, keepdims=True)
        # torch .std() is the unbiased estimator
        n = x.shape[1]
        var = jnp.sum(jnp.square(x - mu), axis=1, keepdims=True) / max(n - 1,
                                                                       1)
        return jnp.concatenate([mu, jnp.sqrt(var)], axis=-1)


class TDNN(nn.Module):
    """x-vector TDNN trunk (tdnn.py:18-68): 5 conv/bn/relu stages, then
    (method-dependent) statistical pooling + segment layers."""
    num_outputs: int = 2
    method: str = "unpooled"   # 'cls' | 'xvector' | 'unpooled'
    emb_dim: int = 1500

    @nn.compact
    def __call__(self, x, train: bool = False):
        specs = [(512, 5, 1, 2), (512, 3, 2, 2), (512, 3, 3, 3),
                 (512, 1, 1, 0), (1500, 1, 1, 0)]
        h = x
        for i, (fm, k, dil, pad) in enumerate(specs):
            if pad:
                h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
            h = Conv1D(fm, k, dilation=dil, name=f"conv_{i}")(h)
            h = BatchNorm1d(fm, name=f"bn_{i}")(h, train=train)
            h = nn.relu(h)
        if self.method == "unpooled":
            return h
        h = StatisticalPooling()(h)
        h = Conv1D(512, 1, name="seg_0")(h)
        if self.method == "xvector":
            return h
        h = BatchNorm1d(512, name="seg_bn_0")(h, train=train)
        h = nn.relu(h)
        h = Conv1D(512, 1, name="seg_1")(h)
        h = BatchNorm1d(512, name="seg_bn_1")(h, train=train)
        h = nn.relu(h)
        h = Conv1D(self.num_outputs, 1, name="out")(h)
        return nn.log_softmax(h, axis=-1)


class TDNNFe(nn.Module):
    """TDNN front-end (frontend.py:43-114): sinc FeBlock -> unpooled TDNN
    -> optional QRNN -> 1x1 W."""
    emb_dim: int = 256
    kwidth: int = 641
    stride: int = 160
    fmaps: int = 128
    sincnet: bool = True
    norm_type: str = "bnorm"
    pad_mode: str = "reflect"
    sr: int = 16000
    rnn_pool: bool = False
    rnn_layers: int = 1
    rnn_dropout: float = 0.0
    rnn_type: str = "qrnn"

    @property
    def output_dim(self):
        return self.emb_dim

    @nn.compact
    def __call__(self, wav, train: bool = False):
        h = wav[..., None] if wav.ndim == 2 else wav
        if self.sincnet:
            h = FeBlock(fmaps=self.fmaps, kwidth=self.kwidth,
                        stride=self.stride, pad_mode=self.pad_mode,
                        norm_type=self.norm_type, sincnet=True, sr=self.sr,
                        name="feblock")(h, train=train)
        h = TDNN(method="unpooled", name="tdnn")(h, train=train)
        if self.rnn_pool:
            # build_rnn_block(fmap, emb_dim//2, bidirectional=True)
            # (reference frontend.py:77-83): QRNN doubles back to
            # emb_dim; LSTM/GRU run emb_dim//2 each direction
            rt = str(self.rnn_type).lower()
            if rt == "qrnn":
                h = QRNN(hidden=self.emb_dim, layers=self.rnn_layers,
                         dropout=self.rnn_dropout,
                         name="rnn")(h, train=train)
            elif rt in ("lstm", "gru"):
                from pase_tpu.nn import BiRNN
                h = BiRNN(hidden=self.emb_dim // 2,
                          layers=self.rnn_layers, cell=rt,
                          dropout=self.rnn_dropout,
                          name="rnn")(h, train=train)
            else:
                raise TypeError(f"Unrecognized rnn type: {self.rnn_type}")
        return Conv1D(self.emb_dim, 1, name="W")(h)


class ASPPModule(nn.Module):
    """Atrous conv branch (aspp.py:8-30)."""
    fmaps: int
    kwidth: int
    dilation: int
    padding: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.padding:
            x = jnp.pad(x, ((0, 0), (self.padding, self.padding), (0, 0)))
        h = Conv1D(self.fmaps, self.kwidth, dilation=self.dilation,
                   use_bias=False, name="atrous_conv")(x)
        h = BatchNorm1d(self.fmaps, name="bn")(h, train=train)
        return nn.relu(h)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling over time (aspp.py:56-110):
    4 dilation branches + global-avg branch, concat, 1x1 projection."""
    emb_dim: int
    dilations: Sequence[int] = (1, 6, 12, 18)
    fmaps: int = 48
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dilations
        branches = [
            ASPPModule(self.fmaps, 1, d[0], 0, name="aspp1")(x, train=train),
            ASPPModule(self.fmaps, 3, d[1], d[1], name="aspp2")(x,
                                                                train=train),
            ASPPModule(self.fmaps, 3, d[2], d[2], name="aspp3")(x,
                                                                train=train),
            ASPPModule(self.fmaps, 3, d[3], d[3], name="aspp4")(x,
                                                                train=train),
        ]
        g = jnp.mean(x, axis=1, keepdims=True)
        g = Conv1D(self.fmaps, 1, use_bias=False, name="gap_conv")(g)
        g = BatchNorm1d(self.fmaps, name="gap_bn")(g, train=train)
        g = nn.relu(g)
        g = jnp.broadcast_to(g, branches[0].shape)
        h = jnp.concatenate(branches + [g], axis=-1)
        h = Conv1D(self.emb_dim, 1, use_bias=False, name="conv1")(h)
        h = BatchNorm1d(self.emb_dim, name="bn1")(h, train=train)
        h = nn.relu(h)
        if self.dropout > 0 and train:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        return h


class ASPPResBlock(nn.Module):
    """Two ASPP+conv stages with residual sum (aspp.py:171-223)."""
    out_channel: int
    kwidth: int
    stride: int
    dilations: Sequence[int] = (1, 6, 12, 18)
    fmaps: int = 48

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kwidth // 2

        def stage(h, stride, name):
            h = ASPP(self.out_channel, self.dilations, self.fmaps,
                     name=f"{name}_aspp")(h, train=train)
            h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)))
            h = Conv1D(self.out_channel, self.kwidth, stride,
                       use_bias=False, name=f"{name}_conv")(h)
            h = BatchNorm1d(self.out_channel, name=f"{name}_bn")(h,
                                                                 train=train)
            return nn.relu(h)

        out1 = stage(x, self.stride, "block1")
        out2 = stage(out1, 1, "block2")
        return out1 + out2


class ASPPResEncoder(nn.Module):
    """aspp_res_encoder (frontend.py:282-362): sinc layer + ASPP residual
    stack, optional QRNN pooling, level concat."""
    sinc_out: int = 64
    hidden_dim: int = 256
    kernel_sizes: Sequence[int] = (11, 11, 11, 11)
    sinc_kernel: int = 251
    sinc_stride: int = 1
    strides: Sequence[int] = (10, 4, 2, 2)
    dilations: Sequence[int] = (1, 6, 12, 18)
    fmaps: Sequence[int] = (48, 48, 48, 48)
    concat: Sequence[bool] = (False, False, False, True)
    rnn_pool: bool = False
    rnn_add: bool = False

    @property
    def output_dim(self):
        return self.hidden_dim * max(sum(bool(c) for c in self.concat), 1)

    @nn.compact
    def __call__(self, wav, train: bool = False):
        x = wav[..., None] if wav.ndim == 2 else wav
        h = SincConv(self.sinc_out, self.sinc_kernel, self.sinc_stride,
                     padding="SAME", name="sinc")(x)
        outs = []
        for i, k in enumerate(self.kernel_sizes):
            h = ASPPResBlock(self.hidden_dim, k, self.strides[i],
                             self.dilations, self.fmaps[i],
                             name=f"aspp_blocks_{i}")(h, train=train)
            if self.concat[i]:
                outs.append(h)
        if not outs:
            # all-False concat would silently index an empty list while
            # output_dim pretends the config works — take the trunk
            # output (equivalent to concat on the last block only)
            outs = [h]
        if len(outs) > 1:
            tlen = outs[-1].shape[1]
            pooled = []
            for o in outs:
                dfac = o.shape[1] // tlen
                o = o[:, :tlen * dfac].reshape(o.shape[0], tlen, dfac, -1)
                pooled.append(o.mean(axis=2))
            out = jnp.concatenate(pooled, axis=-1)
        else:
            out = outs[0]
        if self.rnn_pool:
            rnn_out = QRNN(hidden=out.shape[-1], name="rnn")(out)
            out = out + rnn_out if self.rnn_add else rnn_out
        return out


class ResBlock1D(nn.Module):
    fmaps: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        h = Conv1D(self.fmaps, 3, self.stride, use_bias=False,
                   name="conv1")(h)
        h = BatchNorm1d(self.fmaps, name="bn1")(h, train=train)
        h = nn.relu(h)
        h = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
        h = Conv1D(self.fmaps, 3, use_bias=False, name="conv2")(h)
        h = BatchNorm1d(self.fmaps, name="bn2")(h, train=train)
        if x.shape[-1] != self.fmaps or self.stride != 1:
            x = Conv1D(self.fmaps, 1, self.stride, use_bias=False,
                       name="proj")(x)
            x = BatchNorm1d(self.fmaps, name="proj_bn")(x, train=train)
        return nn.relu(h + x)


class ResnetEncoder(nn.Module):
    """ResNet-over-sincgram encoder (frontend.py:364-413 topology, 1-D
    residual stages instead of torchvision resnet34; no pretraining)."""
    sinc_out: int = 64
    hidden_dim: int = 256
    sinc_kernel: int = 251
    sinc_stride: int = 1
    conv_stride: int = 5
    kernel_size: int = 21
    stage_fmaps: Sequence[int] = (64, 128, 256, 512)
    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    stage_strides: Sequence[int] = (1, 2, 2, 2)

    @property
    def output_dim(self):
        return self.hidden_dim

    @nn.compact
    def __call__(self, wav, train: bool = False):
        x = wav[..., None] if wav.ndim == 2 else wav
        h = SincConv(self.sinc_out, self.sinc_kernel, self.sinc_stride,
                     padding="SAME", name="sinc")(x)
        p = self.kernel_size // 2
        h = jnp.pad(h, ((0, 0), (p, p), (0, 0)))
        h = Conv1D(64, self.kernel_size, self.conv_stride, use_bias=False,
                   name="conv1")(h)
        h = BatchNorm1d(64, name="bn1")(h, train=train)
        h = nn.relu(h)
        for si, (fm, nb, st) in enumerate(zip(self.stage_fmaps,
                                              self.stage_blocks,
                                              self.stage_strides)):
            for bi in range(nb):
                h = ResBlock1D(fm, st if bi == 0 else 1,
                               name=f"layer{si+1}_{bi}")(h, train=train)
        return Conv1D(self.hidden_dim, 1, name="head")(h)
