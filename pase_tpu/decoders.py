"""Spectrum decoders: autoregressive spectrum LM + spectrogram decoder.

Reproduces /root/reference/pase/models/decoders.py:9-105 (`SpectrumLM`,
`SpectrogramDecoder`) — dead code in the reference (no imports anywhere),
ported for module-inventory completeness. TPU-native shape: NTC layout,
the autoregressive rollout is a single `lax.scan`-compiled loop (via
``flax.linen.scan``) instead of the reference's per-step Python RNN
calls, and the teacher-forcing checkpoints (``dec_cps``) become a
static [T] override mask + [T, B, F] frame tensor so the scan stays
trace-once.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from pase_tpu.nn import Conv1D, GDeconv1DBlock, PReLU, build_norm
from pase_tpu.ops.pad import pad_1d


class GConv1DBlock(nn.Module):
    """Reflect-pad conv + activation + norm (modules.py:376-405; note
    the reference applies the activation BEFORE the norm here, unlike
    FeBlock)."""
    fmaps: int
    kwidth: int
    stride: int = 1
    norm_type: Optional[str] = None
    act: Optional[str] = "prelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        wfmaps = 2 * self.fmaps if self.act == "glu" else self.fmaps
        if self.stride > 1 or self.kwidth % 2 == 0:
            p = (self.kwidth // 2 - 1, self.kwidth // 2)
        else:
            p = (self.kwidth // 2, self.kwidth // 2)
        y = pad_1d(x, p, mode="reflect")
        y = Conv1D(wfmaps, self.kwidth, self.stride, name="conv")(y)
        if self.act == "glu":
            z, g = jnp.split(y, 2, axis=-1)
            y = z * jax.nn.sigmoid(g)
        elif self.act is None or self.act == "prelu":
            y = PReLU(self.fmaps, name="act")(y)
        else:
            y = getattr(jax.nn, self.act.lower())(y)
        norm = build_norm(self.norm_type, self.fmaps)
        if norm is not None:
            y = norm(y, train=train)
        return y


class SpectrogramDecoder(nn.Module):
    """Conv stack projecting frame embeddings to nfft//2+1 spectrum bins
    (decoders.py:73-99): per-stage GDeconv (stride>1) or reflect-pad
    GConv (stride 1), then a 1x1 conv head. NTC in/out."""
    nfft: int = 1024
    strides: Tuple[int, ...] = (1, 1, 1)
    kwidths: Tuple[int, ...] = (3, 3, 3)
    fmaps: Tuple[int, ...] = (256, 256, 256)
    norm_type: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for di, (kw, st, fm) in enumerate(zip(self.kwidths, self.strides,
                                              self.fmaps), start=1):
            if st > 1:
                x = GDeconv1DBlock(fm, kw, st, norm_type=self.norm_type,
                                   name=f"dec_{di}")(x, train=train)
            else:
                x = GConv1DBlock(fm, kw, 1, norm_type=self.norm_type,
                                 name=f"dec_{di}")(x, train=train)
        return Conv1D(self.nfft // 2 + 1, 1, name="out")(x)


class _LMStep(nn.Module):
    """One closed-loop step: (states, prev frame) x (override, mask) ->
    next frame. Scanned over time by SpectrumLM."""
    rnn_size: int
    rnn_layers: int
    out_dim: int
    dropout: float
    rnn_type: str
    train: bool

    @nn.compact
    def __call__(self, carry, inp):
        states, prev = carry
        override, use_override = inp
        h = jnp.where(use_override, override, prev)
        new_states = []
        for i in range(self.rnn_layers):
            if self.rnn_type == "LSTM":
                cell = nn.OptimizedLSTMCell(self.rnn_size, name=f"l{i}")
            else:
                cell = nn.GRUCell(self.rnn_size, name=f"l{i}")
            st, h = cell(states[i], h)
            new_states.append(st)
            if self.dropout > 0 and i < self.rnn_layers - 1:
                # torch nn.LSTM applies dropout between layers only
                h = nn.Dropout(self.dropout)(
                    h, deterministic=not self.train)
        y = nn.Dense(self.out_dim, name="out_fc")(h)
        return (tuple(new_states), y), y


class SpectrumLM(nn.Module):
    """Autoregressive RNN over spectrum frames (decoders.py:9-71): the
    seed frame [B, F] is rolled out closed-loop for ``dec_steps`` —
    each step's output is the next step's input — with optional
    teacher-forcing frames injected at given steps (the reference's
    ``dec_cps`` dict). Returns ([B, T, F] frames, final state).

    The reference's bidirectional flag is rejected: its own forward
    would crash (rnn emits dirs*rnn_size features into a
    Linear(rnn_size) head), and a bidirectional closed-loop LM is
    ill-defined.
    """
    rnn_size: int
    rnn_layers: int
    out_dim: int
    dropout: float = 0.0
    rnn_type: str = "LSTM"

    def init_state(self, rng, batch: int):
        """Random-normal initial state (init_hidden, decoders.py:62-71
        uses randn, not zeros)."""
        def one(key):
            h = jax.random.normal(key, (batch, self.rnn_size))
            if self.rnn_type == "LSTM":
                k2 = jax.random.fold_in(key, 1)
                return (jax.random.normal(k2, (batch, self.rnn_size)), h)
            return h
        keys = jax.random.split(rng, self.rnn_layers)
        return tuple(one(k) for k in keys)

    @nn.compact
    def __call__(self, x, dec_steps: int, state=None,
                 dec_cps: Optional[Dict[int, jnp.ndarray]] = None,
                 train: bool = False):
        if self.rnn_type not in ("LSTM", "GRU"):
            raise ValueError(f"rnn_type must be LSTM or GRU, got "
                             f"{self.rnn_type}")
        b, f = x.shape
        assert f == self.out_dim, (x.shape, self.out_dim)
        if state is None:
            state = self.init_state(self.make_rng("sample"), b)
        # teacher-forcing checkpoints -> [T, B, F] overrides + [T] mask;
        # step 0 always consumes the seed frame x
        overrides = jnp.zeros((dec_steps, b, f), x.dtype)
        mask = jnp.zeros((dec_steps, 1, 1), bool)
        overrides = overrides.at[0].set(x)
        mask = mask.at[0].set(True)
        for t, frame in (dec_cps or {}).items():
            if frame.ndim == 3:
                frame = frame[:, 0]
            overrides = overrides.at[int(t)].set(frame.astype(x.dtype))
            mask = mask.at[int(t)].set(True)

        scan = nn.scan(_LMStep, variable_broadcast="params",
                       split_rngs={"params": False, "dropout": True},
                       in_axes=0, out_axes=0)
        (state, _), frames = scan(
            self.rnn_size, self.rnn_layers, self.out_dim, self.dropout,
            self.rnn_type, train, name="step")(
            (state, jnp.zeros((b, f), x.dtype)), (overrides, mask))
        return jnp.transpose(frames, (1, 0, 2)), state
