"""Streaming (stateful, chunk-by-chunk) encoder inference.

The reference has no streaming API — ``util_scripts/forward_chunk.py``
re-forwards overlapping windows and the encoder itself is always applied
to a whole utterance (/root/reference/util_scripts/forward_chunk.py,
frontend.py:234-279). Because the WaveFe trunk is causal-izable (convs
with bounded receptive field + a unidirectional window-2 QRNN), an exact
online form exists: this module maintains per-layer context FIFOs and the
QRNN carry so that feeding an utterance in arbitrary chunk sizes yields
*bit-compatible* outputs with the offline ``Encoder.__call__``.

Mechanics
---------
Offline, every conv block applies fixed reflect SAME padding ``(l, r)``
(ops/pad.py) and a strided VALID conv. Streaming per layer:

* the first ``l`` pad frames are synthesized by reflecting the start of
  the stream once ``l+1`` real frames have arrived;
* an input FIFO holds enough trailing frames to (a) provide the
  ``K_eff - stride`` overlap of the next VALID window and (b) still be
  able to synthesize the ``r`` right-reflect pad frames at end-of-stream
  (``flush``), i.e. ``keep = max(K_eff - stride, r + 1)`` frames;
* ``flush()`` appends the reflected tail and drains the FIFO, so the
  total per-layer output length equals the offline ``ceil(T/stride)``.

Residual trunks (``resblocks=True`` — FeResBlock, nn.py:448-527) stream
too: each block is a nearest-neighbor decimator (complete-group
semantics reproduce the offline floor), two zero-padded stride-1 conv
stages run as constant-pad _ConvStreams, and an identity FIFO fused by
min-available frames before the eval-mode norm2 (_ResBlockStream).

Dense skips are 1x1 projections of intermediate block outputs mean-pool
downsampled to the final frame rate (frontend.py:213-232) — streamed with
per-skip pooling FIFOs and a final fuse synchronizer (different blocks
have different streaming latencies). The QRNN carries ``(x_{t-1}, c_t)``
across chunks (ops/qrnn.py). BatchNorm eval statistics, PReLU, the 1x1
``W`` projection, tanh, and VQ nearest-codebook lookup are stateless.

Latency: the algorithmic lookahead is the per-layer right pads mapped
back to input samples — for the PASE+ trunk 125 (sinc) + 10 + 50 + 100 +
100 + 200 + 200 + 400 ~= 1185 samples ~= 74 ms at 16 kHz, the minimum
for any exact implementation of this (non-causal SAME-padded) stack.

Exactness caveat: the offline ``fuse_skip`` derives its downsampling
factor from the realized ratio ``skip_len // y_len``. For totals where
that ratio still equals ``prod(strides[i+1:])`` (e.g. any multiple of
160, and most other lengths — 32073 gives 32073//200 = 160), streaming
is exactly equal. When the ratio deviates (e.g. T=31991: 31991//200 =
159) the offline form pools deviant-size groups — a reference quirk
(frontend.py:213-232) that no online algorithm can reproduce without
knowing the total length in advance; streaming then emits
``floor(T/160)`` frames with the canonical factor instead
(tests/test_streaming.py pins both behaviors).

TPU precision caveat: equality holds at f32 matmul precision
(``jax_default_matmul_precision='highest'``, ~2e-7 measured on chip).
The TPU DEFAULT bf16-ish conv passes add O(1e-2) noise that differs
between blocked and full-sequence evaluation — extraction CLIs
(forward-chunk) set 'highest'. The QRNN pooling itself resolves to the
same kernel as the offline encoder ('auto' -> Pallas on TPU) and its
seeded block evaluation is bit-exact under any chunking.

Usage::

    enc = wf_builder('cfg/frontend/PASE+.cfg')
    enc.load_pretrained('FE_e199.ckpt')
    stream = StreamingEncoder(enc)
    for chunk in chunks:              # [B, n] waveform pieces, any sizes
        y = stream.push(chunk)        # [B, emb, m] (m >= 0) or None
    y = stream.flush()                # remaining frames
"""

from typing import List, Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np

from pase_tpu.nn import FeBlock, BatchNorm1d, conv1d, split_norm
from pase_tpu.ops.pad import pad_1d, feblock_pad, sinc_same_pad
from pase_tpu.ops.qrnn import qrnn_pool


@functools.partial(jax.jit, static_argnames=("impl",))
def _qrnn_layer(w, b, prev, carry, h, impl="scan"):
    """One chunk through one QRNN layer (jitted; recompiles per shape).

    impl mirrors nn.QRNN: the streaming pool MUST use the same
    ForgetMult evaluation as the offline encoder or the documented
    streaming/offline equality breaks (the Pallas linear scan steps
    sequentially, so seeded block evaluation is bit-identical to the
    full sequence; see forget_mult_pallas)."""
    shifted = jnp.concatenate([prev, h[:, :-1]], axis=1)
    src = jnp.concatenate([h, shifted], axis=-1)
    # mirror nn.QRNN's Dense(dtype=cd): under a bf16 compute policy the
    # offline linear runs in bf16 — streaming must too, or the outputs
    # drift beyond float noise
    from pase_tpu.precision import get_compute_dtype
    cd = get_compute_dtype()
    if cd is not None:
        y = (src.astype(cd) @ w.astype(cd) + b.astype(cd))
    else:
        y = src @ w + b
    if impl == "pallas":
        from pase_tpu.ops.pallas_qrnn import qrnn_pool_pallas
        h2, c_t = qrnn_pool_pallas(y.astype(jnp.float32), c0=carry)
    else:
        h2, c_t = qrnn_pool(y.astype(jnp.float32), c0=carry)
    return h2, c_t


def _tcat(a, b):
    """Concatenate two optional [B, T, C] frame packets on time."""
    if a is None or a.shape[1] == 0:
        return b
    if b is None or b.shape[1] == 0:
        return a
    return jnp.concatenate([a, b], axis=1)


class _ConvStream:
    """Streaming state for one pad->conv block (exact offline semantics)."""

    def __init__(self, apply_fn, kwidth: int, stride: int, dilation: int,
                 pad, pad_mode: str):
        self.apply_fn = apply_fn
        self.stride = stride
        self.k_eff = (kwidth - 1) * dilation + 1
        self.l, self.r = pad
        # trailing frames retained: VALID-window overlap, plus enough true
        # signal to reflect the right pad at flush
        self.keep = max(self.k_eff - self.stride, self.r + 1)
        self.pad_mode = pad_mode
        self.buf = None
        self.started = False

    def _emit(self, final: bool):
        if self.buf is None:
            return None
        ln = self.buf.shape[1]
        if final:
            n = (ln - self.k_eff) // self.stride + 1 if ln >= self.k_eff else 0
        else:
            n = max(0, (ln - self.keep) // self.stride)
        if n <= 0:
            return None
        use = self.buf[:, :(n - 1) * self.stride + self.k_eff]
        y = self.apply_fn(use)
        self.buf = self.buf[:, n * self.stride:]
        return y

    def push(self, x):
        """x: [B, t, C] new input frames -> [B, m, C'] outputs or None."""
        if x is None or x.shape[1] == 0:
            return None
        self.buf = x if self.buf is None else jnp.concatenate(
            [self.buf, x], axis=1)
        if not self.started:
            if self.l > 0 and self.buf.shape[1] < self.l + 1:
                return None          # not enough signal to reflect yet
            if self.l > 0:
                self.buf = pad_1d(self.buf, (self.l, 0), self.pad_mode)
            self.started = True
        return self._emit(final=False)

    def get_state(self):
        # 'started' is a host-side bool (pre-prime restores previously
        # mis-encoded: set_state assumed the left pad was injected).
        # The serving export strips it — post-prime it is always True.
        return {"buf": self.buf, "started": self.started}

    def set_state(self, st):
        """Restore a snapshot. Legacy/exported snapshots carry no
        'started' key; those are post-prime by construction (the left
        pad was already injected), so it defaults to True."""
        self.buf = st["buf"]
        self.started = bool(st.get("started", True))

    def flush(self):
        if self.buf is None:
            return None
        if not self.started:
            # stream shorter than the left pad: mirror offline behavior by
            # padding whatever arrived (requires >= 2 frames for reflect)
            if self.l > 0:
                self.buf = pad_1d(self.buf, (self.l, 0), self.pad_mode)
            self.started = True
        if self.r > 0:
            if self.pad_mode == "reflect":
                tail = jnp.flip(self.buf[:, -self.r - 1:-1], axis=1)
            elif self.pad_mode in ("replicate", "edge"):
                tail = jnp.repeat(self.buf[:, -1:], self.r, axis=1)
            else:                     # constant
                tail = jnp.zeros_like(self.buf[:, :1]).repeat(self.r, axis=1)
            self.buf = jnp.concatenate([self.buf, tail], axis=1)
        return self._emit(final=True)


class _PoolStream:
    """Mean-pool downsampler by an integer factor (fuse_skip semantics:
    trailing frames that do not fill a group are dropped)."""

    def __init__(self, factor: int):
        self.factor = factor
        self.buf = None

    def get_state(self):
        return {"buf": self.buf}

    def set_state(self, st):
        self.buf = st["buf"]

    def push(self, x):
        if x is None or x.shape[1] == 0:
            return None
        if self.factor == 1:
            return x
        self.buf = x if self.buf is None else jnp.concatenate(
            [self.buf, x], axis=1)
        n = self.buf.shape[1] // self.factor
        if n == 0:
            return None
        b, _, c = self.buf.shape
        y = self.buf[:, :n * self.factor].reshape(
            b, n, self.factor, c).mean(axis=2)
        self.buf = self.buf[:, n * self.factor:]
        return y


class _DecimStream:
    """Nearest-neighbor time downsampler by an integer factor
    (F.interpolate scale=1/ds: out[i] = in[i*ds], length floor(T/ds)).
    Emits the first frame of each COMPLETE group so the trailing
    partial group is dropped exactly like the offline floor."""

    def __init__(self, factor: int):
        self.factor = factor
        self.buf = None

    def get_state(self):
        return {"buf": self.buf}

    def set_state(self, st):
        self.buf = st["buf"]

    def push(self, x):
        if x is None or x.shape[1] == 0:
            return None
        if self.factor == 1:
            return x
        self.buf = x if self.buf is None else jnp.concatenate(
            [self.buf, x], axis=1)
        n = self.buf.shape[1] // self.factor
        if n == 0:
            return None
        y = self.buf[:, :n * self.factor:self.factor]
        self.buf = self.buf[:, n * self.factor:]
        return y


def _effective_conv(params, reparam, bstats=None):
    """(kernel, bias) of a possibly weight-reparameterized conv, in eval
    form (WNConv1D / SNConv1D formulas — nn.py:211-285)."""
    if reparam == "wnorm":
        v = jnp.asarray(params["v"])
        g = jnp.asarray(params["g"])
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1),
                                keepdims=True)) + 1e-12
        kernel = v / norm * g[None, None, :]
    elif reparam == "snorm":
        kernel = jnp.asarray(params["kernel"])
        u = jnp.asarray(bstats["u"])
        w = kernel.reshape(-1, kernel.shape[-1])
        v = w @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_n = w.T @ v
        u_n = u_n / (jnp.linalg.norm(u_n) + 1e-12)
        sigma = jnp.dot(v, w @ u_n)
        kernel = kernel / jnp.maximum(sigma, 1e-12)
    else:
        kernel = jnp.asarray(params["kernel"])
    bias = jnp.asarray(params["bias"]) if "bias" in params else None
    return kernel, bias


def _act_fn(act, params, name):
    """Eval activation: PReLU from stored weight, or a jax.nn fn."""
    if act in (None, "prelu"):
        a = jnp.asarray(params[name]["weight"])
        return lambda h: jnp.maximum(h, 0) + a * jnp.minimum(h, 0)
    fn = getattr(jax.nn, act.lower())
    return fn


def _bnorm_eval(params, stats):
    mean = jnp.asarray(stats["mean"])
    var = jnp.asarray(stats["var"])
    w = jnp.asarray(params["weight"])
    b = jnp.asarray(params["bias"])
    inv = jax.lax.rsqrt(var + 1e-5)
    return lambda h: (h - mean) * inv * w + b


class _ResBlockStream:
    """Streaming state for one FeResBlock (nn.py:448-527): nearest
    decimation, two zero-padded stride-1 convs (conv1+norm1+act1,
    conv2+act2) streamed as _ConvStreams in 'constant' pad mode, the
    (projected, decimated) identity buffered in a FIFO and fused by
    min-available frames, then the eval-mode norm2. Exact because every
    stage matches the offline op order and the zero pads are applied to
    the same intermediate tensors."""

    def __init__(self, params, bstats, fmaps: int, kwidth: int,
                 downsample: int, dilations, act, norm_type,
                 in_features: int):
        reparam, post_norm = split_norm(norm_type)
        if post_norm in ("inorm", "affinorm"):
            raise NotImplementedError(
                "InstanceNorm inside resblocks normalizes over the whole "
                "utterance and has no exact streaming form")
        d1, d2 = int(dilations[0]), int(dilations[1])
        p1 = (kwidth // 2) * d1
        p2 = (kwidth // 2) * d2
        k1, b1 = _effective_conv(params["conv1"], reparam,
                                 bstats.get("conv1"))
        k2, b2 = _effective_conv(params["conv2"], reparam,
                                 bstats.get("conv2"))
        act1 = _act_fn(act, params, "act1")
        act2 = _act_fn(act, params, "act2")
        norm1 = None
        if post_norm == "bnorm":
            norm1 = _bnorm_eval(params["norm1"], bstats["norm1"])
        elif post_norm == "lnorm":
            w, b = (jnp.asarray(params["norm1"]["weight"]),
                    jnp.asarray(params["norm1"]["bias"]))

            def norm1(h, w=w, b=b):
                mu = jnp.mean(h, axis=-1, keepdims=True)
                vr = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
                return (h - mu) * jax.lax.rsqrt(vr + 1e-5) * w + b

        def stage1(x):
            h = conv1d(x, k1, 1, d1)
            if b1 is not None:
                h = h + b1
            if norm1 is not None:
                h = norm1(h)
            return act1(h)

        def stage2(h):
            h = conv1d(h, k2, 1, d2)
            if b2 is not None:
                h = h + b2
            return act2(h)

        self.decim = _DecimStream(downsample)
        self.conv1 = _ConvStream(jax.jit(stage1), kwidth, 1, d1,
                                 (p1, p1), "constant")
        self.conv2 = _ConvStream(jax.jit(stage2), kwidth, 1, d2,
                                 (p2, p2), "constant")
        self.resproj = None
        if in_features != fmaps:
            self.resproj = _effective_conv(params["resproj"], None)
        self.norm2 = None
        if post_norm == "bnorm":
            self.norm2 = _bnorm_eval(params["norm2"], bstats["norm2"])
        elif post_norm == "lnorm":
            w, b = (jnp.asarray(params["norm2"]["weight"]),
                    jnp.asarray(params["norm2"]["bias"]))

            def norm2(h, w=w, b=b):
                mu = jnp.mean(h, axis=-1, keepdims=True)
                vr = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
                return (h - mu) * jax.lax.rsqrt(vr + 1e-5) * w + b
            self.norm2 = norm2
        self.id_fifo = None
        self.h_fifo = None

    def _ingest(self, x, flush: bool):
        xd = self.decim.push(x)
        if xd is not None:
            ident = xd
            if self.resproj is not None:
                k, b = self.resproj
                ident = conv1d(xd, k)
                if b is not None:
                    ident = ident + b
            self.id_fifo = _tcat(self.id_fifo, ident)
        h1 = self.conv1.push(xd)
        if flush:
            h1 = _tcat(h1, self.conv1.flush())
        h2 = self.conv2.push(h1)
        if flush:
            h2 = _tcat(h2, self.conv2.flush())
        self.h_fifo = _tcat(self.h_fifo, h2)

    def _emit(self):
        if self.h_fifo is None or self.h_fifo.shape[1] == 0 or \
                self.id_fifo is None:
            return None
        m = min(self.h_fifo.shape[1], self.id_fifo.shape[1])
        if m == 0:
            return None
        y = self.h_fifo[:, :m] + self.id_fifo[:, :m]
        self.h_fifo = self.h_fifo[:, m:]
        self.id_fifo = self.id_fifo[:, m:]
        if self.norm2 is not None:
            y = self.norm2(y)
        return y

    def get_state(self):
        return {"decim": self.decim.get_state(),
                "conv1": self.conv1.get_state(),
                "conv2": self.conv2.get_state(),
                "id_fifo": self.id_fifo, "h_fifo": self.h_fifo}

    def set_state(self, st):
        self.decim.set_state(st["decim"])
        self.conv1.set_state(st["conv1"])
        self.conv2.set_state(st["conv2"])
        self.id_fifo = st["id_fifo"]
        self.h_fifo = st["h_fifo"]

    def push(self, x):
        if x is None or x.shape[1] == 0:
            return None
        self._ingest(x, flush=False)
        return self._emit()

    def flush(self):
        self._ingest(None, flush=True)
        return self._emit()


class _QRNNStream:
    """Window-2 QRNN with cross-chunk (x_{t-1}, c) state (ops/qrnn.py)."""

    def __init__(self, params, layers: int, impl: str = "auto"):
        self.kernels = [(jnp.asarray(params[f"layers_{li}_linear"]["kernel"]),
                         jnp.asarray(params[f"layers_{li}_linear"]["bias"]))
                        for li in range(layers)]
        self.prev: List[Optional[jnp.ndarray]] = [None] * layers
        self.carry: List[Optional[jnp.ndarray]] = [None] * layers
        # resolve 'auto' exactly like nn.QRNN so streaming uses the
        # SAME ForgetMult kernel as the offline encoder
        if impl == "auto":
            from pase_tpu.ops.pallas_qrnn import pallas_available
            impl = "pallas" if pallas_available() else "scan"
        self.impl = impl

    def get_state(self):
        return {"prev": list(self.prev), "carry": list(self.carry)}

    def set_state(self, st):
        self.prev = list(st["prev"])
        self.carry = list(st["carry"])

    def push(self, h):
        if h is None or h.shape[1] == 0:
            return None
        for li, (w, b) in enumerate(self.kernels):
            prev = self.prev[li]
            if prev is None:
                prev = jnp.zeros_like(h[:, :1])
            h_in = h
            h, c_t = _qrnn_layer(w, b, prev, self.carry[li], h_in,
                                 impl=self.impl)
            self.prev[li] = h_in[:, -1:]
            self.carry[li] = c_t
        return h


class StreamingEncoder:
    """Exact online form of a WaveFe ``Encoder`` (see module docstring).

    Accepts chunks as [B, t], [B, 1, t] or [t]; emits [B, emb, m] frame
    packets (reference channel-first layout) or None when no new frame is
    computable yet. Call ``flush()`` once at end-of-stream.
    """

    def __init__(self, encoder, qrnn_impl=None):
        from pase_tpu.frontend import WaveFe
        module = encoder.module
        if not isinstance(module, WaveFe):
            raise TypeError("StreamingEncoder supports the WaveFe trunk "
                            f"(got {type(module).__name__})")
        if module.norm_type == "inorm" or (
                module.norm_out and module.norm_type != "bnorm"):
            # WaveFe's norm_out uses whole-utterance InstanceNorm for
            # EVERY non-bnorm norm_type (frontend.py norm_out path) —
            # admitting 'lnorm'/None here crashed on a missing param and
            # would be wrong even with one (per-frame vs whole-utterance)
            raise NotImplementedError(
                "InstanceNorm normalizes over the whole utterance and has "
                "no exact streaming form")
        self.module = module
        self.variables = encoder.variables
        params = self.variables["params"]
        bstats = self.variables.get("batch_stats", {})

        self.conv_streams: List[_ConvStream] = []
        nblocks = len(module.kwidths)
        in_feats = 1
        for i, (kw, st, dil) in enumerate(zip(module.kwidths, module.strides,
                                              module.dilations)):
            sinc = module.sincnet and i == 0
            if module.resblocks and not sinc:
                # residual trunk (frontend.py resblocks path): each block
                # streams as decimate + two zero-padded stride-1 convs +
                # identity FIFO (_ResBlockStream)
                self.conv_streams.append(_ResBlockStream(
                    params[f"blocks_{i}"], bstats.get(f"blocks_{i}", {}),
                    module.fmaps[i], kw, st, (1, 2), module.activation,
                    module.norm_type, in_feats))
                in_feats = module.fmaps[i]
                continue
            in_feats = module.fmaps[i]
            if sinc:
                k = kw + 1 if kw % 2 == 0 else kw
                pad = sinc_same_pad(k, st)
            else:
                k = kw
                pad = feblock_pad(kw, st, dil) if kw > 1 else (0, 0)
            blk = FeBlock(fmaps=module.fmaps[i], kwidth=kw, stride=st,
                          dilation=dil, pad_mode=module.pad_mode,
                          act=module.activation, norm_type=module.norm_type,
                          sincnet=sinc, sr=module.sr, do_pad=False)
            sub = {"params": params[f"blocks_{i}"]}
            if f"blocks_{i}" in bstats:
                sub["batch_stats"] = bstats[f"blocks_{i}"]
            # jitted per-block apply: streaming chunks are usually a fixed
            # size, so each block compiles once (shape-keyed cache); eager
            # dispatch of the ~10 ops per block is the bottleneck on
            # remote-device backends
            self.conv_streams.append(_ConvStream(
                jax.jit(lambda x, blk=blk, sub=sub:
                        blk.apply(sub, x, train=False)),
                k, st, dil, pad, module.pad_mode))

        # dense skip 1x1 projections + pool-downsamplers to the final rate
        self.skip_kernels = []
        self.skip_pools: List[_PoolStream] = []
        self.skip_fifos: List[Optional[jnp.ndarray]] = []
        if module.denseskips:
            for i in range(nblocks - 1):
                self.skip_kernels.append(
                    jnp.asarray(params[f"denseskips_{i}"]["kernel"]))
                dfactor = int(np.prod(module.strides[i + 1:]))
                self.skip_pools.append(_PoolStream(dfactor))
                self.skip_fifos.append(None)

        self.qrnn = None
        if module.rnn_pool:
            if module.rnn_type != "qrnn":
                raise NotImplementedError(
                    f"streaming rnn_type={module.rnn_type!r} not implemented")
            self.qrnn = _QRNNStream(params["rnn"], module.rnn_layers,
                                    impl=qrnn_impl or
                                    getattr(module, "qrnn_impl", "auto"))

        self.w_kernel = jnp.asarray(params["W"]["kernel"])
        self.w_bias = jnp.asarray(params["W"]["bias"])
        self.y_fifo: Optional[jnp.ndarray] = None

        self.norm_out_stats = None
        if module.norm_out:
            if module.norm_type == "bnorm":
                s = bstats["norm_out"]
                self.norm_out_stats = (jnp.asarray(s["mean"]),
                                       jnp.asarray(s["var"]))
            else:                     # lnorm: per-frame, stateless w/ params
                self.norm_out_params = params["norm_out"]

        self.vq_emb = None
        if module.vq_K is not None and module.vq_K > 0:
            self.vq_emb = jnp.asarray(bstats["quantizer"]["emb"])

    # ------------------------------------------------------------------
    def _blocks(self, x, flush: bool):
        """Run frames through the conv trunk, feeding skip taps."""
        h = x
        for i, cs in enumerate(self.conv_streams):
            y = cs.push(h)
            if flush:
                y = _tcat(y, cs.flush())
            if i < len(self.skip_kernels):
                # pool-then-project, matching the offline WaveFe order
                # (linear ops commute; projecting at the pooled rate)
                pooled = self.skip_pools[i].push(y)
                tap = None
                if pooled is not None:
                    tap = conv1d(pooled, self.skip_kernels[i])
                self.skip_fifos[i] = _tcat(self.skip_fifos[i], tap)
            h = y
            if h is None and not flush:
                return None
        return h

    def _tail(self, h):
        """QRNN + W projection; returns final-rate un-fused frames."""
        if h is None or h.shape[1] == 0:
            return None
        if self.qrnn is not None:
            h = self.qrnn.push(h)
        return conv1d(h, self.w_kernel) + self.w_bias

    def _fuse(self):
        """Emit min-available fused frames across y and all skips."""
        if self.y_fifo is None or self.y_fifo.shape[1] == 0:
            return None
        m = self.y_fifo.shape[1]
        for f in self.skip_fifos:
            m = 0 if f is None else min(m, f.shape[1])
        if m == 0:
            return None
        y = self.y_fifo[:, :m]
        self.y_fifo = self.y_fifo[:, m:]
        mod = self.module
        for i, f in enumerate(self.skip_fifos):
            if mod.densemerge == "concat":
                y = jnp.concatenate([y, f[:, :m]], axis=-1)
            else:
                y = y + f[:, :m]
            self.skip_fifos[i] = f[:, m:]
        if self.norm_out_stats is not None:
            mean, var = self.norm_out_stats
            y = (y - mean) / jnp.sqrt(var + 1e-5)
        elif self.module.norm_out and self.module.norm_type == "lnorm":
            p = self.norm_out_params
            mu = jnp.mean(y, axis=-1, keepdims=True)
            vr = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
            y = (y - mu) / jnp.sqrt(vr + 1e-5)
            y = y * p["weight"] + p["bias"]
        if self.module.tanh_out:
            y = jnp.tanh(y)
        if self.vq_emb is not None:
            b, t, d = y.shape
            flat = y.reshape(-1, d)
            dist = (jnp.sum(flat ** 2, axis=1, keepdims=True)
                    + jnp.sum(self.vq_emb ** 2, axis=1)
                    - 2.0 * flat @ self.vq_emb.T)
            y = self.vq_emb[jnp.argmin(dist, axis=1)].reshape(b, t, d)
        return jnp.transpose(y, (0, 2, 1))     # reference (B, C, T')

    def _step(self, wav, flush: bool):
        if wav is not None:
            wav = jnp.asarray(wav)
            if wav.ndim == 1:
                wav = wav[None]
            if wav.ndim == 3:                  # (B, 1, t) reference layout
                wav = wav[:, 0, :]
            wav = wav[..., None]               # NTC
        h = self._blocks(wav, flush)
        self.y_fifo = _tcat(self.y_fifo, self._tail(h))
        return self._fuse()

    def get_state(self):
        """Snapshot every FIFO/carry as a pytree of arrays (Nones where a
        stage is stateless). With ``set_state`` this makes the whole
        encoder a PURE step function — the basis of the exported
        streaming serving artifact (serving.export_streaming_encoder):
        state/emission shapes are constant once the stream reaches its
        steady state (fixed chunk size divisible by prod(strides))."""
        return {
            "convs": [cs.get_state() for cs in self.conv_streams],
            "skip_pools": [p.get_state() for p in self.skip_pools],
            "skip_fifos": list(self.skip_fifos),
            "qrnn": None if self.qrnn is None else self.qrnn.get_state(),
            "y_fifo": self.y_fifo,
        }

    def set_state(self, st):
        """Restore a ``get_state`` snapshot taken AFTER the first push
        (all layers primed: left pads injected, every FIFO realized)."""
        for cs, s in zip(self.conv_streams, st["convs"]):
            cs.set_state(s)
        for p, s in zip(self.skip_pools, st["skip_pools"]):
            p.set_state(s)
        self.skip_fifos = list(st["skip_fifos"])
        if self.qrnn is not None:
            self.qrnn.set_state(st["qrnn"])
        self.y_fifo = st["y_fifo"]

    def push(self, wav):
        """Feed new waveform samples; returns [B, emb, m] or None."""
        return self._step(wav, flush=False)

    def flush(self):
        """Signal end-of-stream; returns the remaining [B, emb, m] or None."""
        return self._step(None, flush=True)
