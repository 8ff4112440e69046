"""AOT serving artifacts for the frozen encoder (jax.export / StableHLO).

The reference's deployment story is a torch checkpoint plus the full
pase source tree imported in-process (README.md:28,
util_scripts/forward_chunk.py): serving requires torch, the model code,
and the cfg. The TPU-native deployment unit is instead an ahead-of-time
exported, version-stable StableHLO artifact (``jax.export``): the
forward graph is lowered ONCE for both the cpu and tpu backends and
serialized; at serve time nothing but jax + numpy is needed — no model
code, no cfg parsing, no checkpoint conversion.

Shape policy (TPU-first): XLA serving wants STATIC shapes, so the
artifact holds one exported function per time-length BUCKET (default
0.5/1/2/4 s at 16 kHz) with a SYMBOLIC batch dimension. The time axis
cannot be symbolic for this model family — the QRNN's associative scan
needs a static trip count and the reflect pads need provable bounds —
and static buckets are the idiomatic TPU answer anyway. The loader
windows an incoming utterance at the largest bucket, routes the tail to
the smallest covering bucket (zero-padded), and trims the frame axis
back: exactly the reference's forward_chunk window semantics
(util_scripts/forward_chunk.py tail handling), so ``ServingEncoder``
output matches ``util_scripts.py forward-chunk`` frame for frame.

Layout: ``out_dir/meta.json`` (buckets, dims, jax version, precision),
``out_dir/params.npz`` (one shared copy of the weights,
checkpoint.save_variables format), ``out_dir/encoder_T{N}.jaxexp`` (the
serialized Exported per bucket, weights passed as call arguments so the
blobs stay small).
"""

import contextlib
import json
import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from pase_tpu.checkpoint import save_variables, load_variables

__all__ = ["export_encoder", "ServingEncoder",
           "export_streaming_encoder", "ServingStreamingEncoder"]


def _plain(tree):
    """FrozenDict -> plain nested dict (export serializes builtin pytrees)."""
    from flax.core import unfreeze
    return jax.tree_util.tree_map(lambda x: x, unfreeze(tree))


def export_encoder(enc, out_dir: str,
                   chunk_sizes: Sequence[int] = (8000, 16000, 32000, 64000),
                   platforms: Sequence[str] = ("cpu", "tpu"),
                   precision: Optional[str] = "highest",
                   weights_dtype: Optional[str] = None) -> str:
    """Export a (loaded or init'd) ``Encoder`` as a serving artifact.

    Args:
      enc: ``pase_tpu.frontend.Encoder``.
      chunk_sizes: static time-length buckets (samples); each becomes one
        exported function with a symbolic batch dim.
      platforms: backends to lower for (cross-lowering — a tpu entry can
        be produced on a cpu-only host and vice versa).
      precision: matmul precision baked into the traced graph.
        "highest" matches the forward-chunk extraction contract
        (bit-comparable features across backends); None keeps the
        backend default (bf16-ish on TPU — faster, noisier).
      weights_dtype: optionally quantize float weights (e.g. "bfloat16"
        — halves the serving-time weight HBM traffic; the graph upcasts
        to f32 internally so compute still runs at ``precision``).
        params.npz stores the quantized values upcast to f32 (npz has
        no bf16; bf16->f32->bf16 is lossless) and the loader re-casts.
        None keeps the training dtypes (the extraction contract).
    Returns ``out_dir``.
    """
    from jax import export as jexport

    module = enc.module
    pins = {}
    if getattr(module, "qrnn_impl", "scan") != "scan":
        # Pin the XLA associative-scan QRNN for export: the Pallas
        # kernel (a) cannot trace a SYMBOLIC batch dim (its block-size
        # arithmetic needs concrete shapes) and (b) would embed a
        # TPU-only custom call in an artifact that promises cpu+tpu
        # portability. 'auto' resolves to Pallas on a TPU host, so the
        # rehearsal export-jax died exactly here while the CPU-forced CI
        # never could (recipes/rehearsal.sh post-mortem). scan == pallas
        # within float noise (tests/test_qrnn.py impl-equality).
        pins["qrnn_impl"] = "scan"
    if getattr(module, "virtual_pads", False) is not False:
        # True OR 'auto' (the platform-resolved default) both pin to
        # False: the artifact must not depend on the exporting host's
        # backend.
        # Pin materialized pads for export: the virtual-pad edge-splice
        # (ops/virtual_pad.py) makes XLA:CPU's conv tiling depend on the
        # runtime batch at the 1-ulp level, which would break the
        # artifact's batched-encode == single-encode bitwise contract
        # (ServingEncoder.encode_batch, tests/test_serving.py). The pad
        # materialization it avoids is a training-step HBM concern, not
        # a serving one.
        pins["virtual_pads"] = False
    if pins:
        from pase_tpu.frontend import build_frontend_module
        module = build_frontend_module({**dict(enc.cfg), **pins})
    variables = _plain(enc.variables)

    def _is_float(x):
        return jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)

    if weights_dtype is not None:
        wd = jnp.dtype(weights_dtype)
        variables = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x).astype(wd) if _is_float(x) else x,
            variables)
    strides = getattr(module, "strides", None)
    hop = int(np.prod(strides)) if strides is not None else 160
    try:
        from pase_tpu.parallel.sp import time_shard_halo
        halo = int(time_shard_halo(module))   # trunk receptive extent
    except Exception:
        # unknown extent (non-WaveFe trunk, even resblock kwidths):
        # the loader then always routes to the largest bucket (exact)
        halo = None
    os.makedirs(out_dir, exist_ok=True)
    if weights_dtype is not None:
        # npz cannot hold bf16: store the quantized values upcast to f32
        # (lossless round trip); the loader re-casts per meta
        stored = jax.tree_util.tree_map(
            lambda x: np.asarray(jnp.asarray(x).astype(jnp.float32))
            if _is_float(x) else x, variables)
    else:
        stored = variables            # keep the training dtypes
    save_variables(os.path.join(out_dir, "params.npz"), stored,
                   extra={"serving": True})

    def fwd(params, wav):
        if weights_dtype is not None:
            # quantized weights travel to the device at weights_dtype;
            # compute upcasts to f32 in-graph (dtype-safe everywhere)
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32) if _is_float(x) else x,
                params)
        return module.apply(params, wav, train=False)

    pspecs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), variables)
    buckets = sorted(int(t) for t in chunk_sizes)
    for T in buckets:
        if T % hop:
            raise ValueError(f"bucket {T} must divide the hop {hop}")
        b, = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, T), jnp.float32)
        ctx = jax.default_matmul_precision(precision) if precision \
            else contextlib.nullcontext()
        with ctx:
            exp = jexport.export(jax.jit(fwd),
                                 platforms=tuple(platforms))(pspecs, spec)
        with open(os.path.join(out_dir, f"encoder_T{T}.jaxexp"), "wb") as f:
            f.write(exp.serialize())

    emb = getattr(module, "output_dim", None)   # WaveFe: a @property int
    if not isinstance(emb, (int, np.integer)):
        emb = module.emb_dim
    meta = {
        "format": "pase_tpu.serving/1",
        "buckets": buckets,
        "hop": hop,
        "halo": halo,
        "emb_dim": int(emb),
        "sr": int(getattr(module, "sr", 16000)),
        "platforms": list(platforms),
        "precision": precision,
        "weights_dtype": weights_dtype,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


class ServingEncoder:
    """Load an exported artifact dir and encode arbitrary-length audio.

    ``encode(wav)`` accepts [T] or [B, T] float32 and returns features in
    the public encoder contract — [emb, F] / [B, emb, F] at 100 Hz —
    matching ``util_scripts.py forward-chunk`` with chunk_size = the
    largest bucket (window-at-largest + zero-padded tail semantics).
    """

    def __init__(self, export_dir: str):
        from jax import export as jexport
        with open(os.path.join(export_dir, "meta.json")) as f:
            self.meta = json.load(f)
        if self.meta.get("format") != "pase_tpu.serving/1":
            raise ValueError(f"not a pase_tpu serving artifact: {export_dir}")
        self.params, _ = load_variables(
            os.path.join(export_dir, "params.npz"))
        self.params = _plain(self.params)
        wd = self.meta.get("weights_dtype")
        if wd is not None:
            # stored as f32 (npz has no bf16); the exported graphs take
            # weights at the quantized dtype — re-cast (lossless)
            wdt = jnp.dtype(wd)
            self.params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x).astype(wdt)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                else x, self.params)
        self.buckets = list(self.meta["buckets"])
        self.hop = int(self.meta["hop"])
        self.halo = self.meta.get("halo")
        self._fns = {}
        for T in self.buckets:
            with open(os.path.join(export_dir,
                                   f"encoder_T{T}.jaxexp"), "rb") as f:
                self._fns[T] = jexport.deserialize(f.read())

    def _run(self, wav: np.ndarray) -> np.ndarray:
        """[B, T<=max_bucket] -> [B, T//hop, emb] via the smallest
        bucket covering T PLUS the trunk's receptive halo (zero-padded,
        frames trimmed). The halo margin keeps every kept frame's
        receptive field inside the zero region — never reaching the
        bucket-edge reflect pad — so the result is identical to padding
        into the largest bucket (= the forward-chunk window semantics);
        without a recorded halo, only the largest bucket is exact."""
        T = wav.shape[1]
        bucket = self._bucket_for(T)
        if T > bucket:
            raise ValueError(f"window {T} exceeds the largest bucket "
                             f"{self.buckets[-1]}")
        if T < bucket:
            wav = np.pad(wav, ((0, 0), (0, bucket - T)))
        y = np.asarray(self._fns[bucket].call(self.params, wav))
        return y[:, :T // self.hop]

    def _bucket_for(self, T: int) -> int:
        """Smallest bucket whose zero-pad region provably covers every
        kept frame's receptive field (see _run); falls back to the
        largest bucket (always exact)."""
        need = T if T == self.buckets[-1] else T + (
            self.halo if self.halo is not None else self.buckets[-1])
        return next((b for b in self.buckets if b >= need),
                    self.buckets[-1])

    def encode_batch(self, wavs) -> list:
        """Encode a LIST of variable-length wavs, batching same-bucket
        utterances through one exported call (the symbolic batch dim) —
        the server-side throughput path. Each output equals
        ``encode(wav)`` exactly; wavs longer than the largest bucket
        fall back to the windowed single path.
        Returns a list of [emb, F_i] arrays in input order."""
        wavs = [np.asarray(w, np.float32) for w in wavs]
        outs = [None] * len(wavs)
        groups = {}
        for i, w in enumerate(wavs):
            if w.ndim != 1 or len(w) < self.hop:
                raise ValueError(f"wav {i}: expected [T >= {self.hop}]")
            if len(w) > self.buckets[-1]:
                outs[i] = self.encode(w)       # windowed fallback
            else:
                groups.setdefault(self._bucket_for(len(w)), []).append(i)
        for bucket, idxs in groups.items():
            stack = np.stack([np.pad(wavs[i], (0, bucket - len(wavs[i])))
                              for i in idxs])
            y = np.asarray(self._fns[bucket].call(self.params, stack))
            for row, i in enumerate(idxs):
                outs[i] = np.transpose(
                    y[row, :len(wavs[i]) // self.hop])
        return outs

    def encode(self, wav) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        squeeze = wav.ndim == 1
        if squeeze:
            wav = wav[None]
        if wav.ndim != 2 or wav.shape[1] < self.hop:
            raise ValueError(f"expected [T] or [B, T] with T >= "
                             f"{self.hop}, got {wav.shape}")
        big = self.buckets[-1]
        outs = [self._run(wav[:, beg:beg + big])
                for beg in range(0, wav.shape[1], big)]
        y = np.concatenate(outs, axis=1)          # [B, F, emb] (NTC)
        y = np.transpose(y, (0, 2, 1))            # public [B, emb, F]
        return y[0] if squeeze else y


# ---------------------------------------------------------------------------
# Streaming serving: the exact online encoder as an explicit-state artifact
# ---------------------------------------------------------------------------

class _VarShim:
    """Minimal (module, variables) pair StreamingEncoder accepts — lets the
    exporter build the stream machinery around TRACED weight arguments so
    the serialized graphs stay weight-free (params travel via params.npz,
    exactly like the offline artifact)."""

    def __init__(self, module, variables):
        self.module = module
        self.variables = variables


def export_streaming_encoder(enc, out_dir: str, chunk: int = 16000,
                             platforms: Sequence[str] = ("cpu", "tpu"),
                             precision: Optional[str] = "highest",
                             weights_dtype: Optional[str] = None) -> str:
    """Export the EXACT online encoder (pase_tpu/streaming.py) as three
    StableHLO step graphs with the FIFO/carry state as explicit arrays:

      * ``prime(params, wav[b, chunk]) -> (state, frames)`` — first chunk:
        injects the per-layer left reflect pads and fills the FIFOs;
      * ``step(params, state, wav[b, chunk]) -> (state, frames)`` — the
        steady-state graph, reused for every subsequent chunk;
      * ``flush(params, state) -> frames`` — end-of-stream: synthesizes
        the right pads and drains every FIFO.

    The reference has no streaming story at all (its closest tool
    re-forwards overlapping windows, util_scripts/forward_chunk.py); this
    artifact serves the 74 ms-lookahead online encoder from any jax+numpy
    host with no model code, complementing the offline bucket artifact
    (``export_encoder``). Feeding chunks of ``chunk`` samples and
    concatenating prime/step/flush emissions is bit-equal to the in-
    process ``StreamingEncoder`` and matches the offline whole-utterance
    forward (tests/test_serving_streaming.py).

    Shape policy: jax.export demands static shapes, and the streaming
    FIFO lengths are only CONSTANT once the stream is in its steady
    state, so ``chunk`` must (a) be a multiple of prod(strides) and
    (b) be large enough that one chunk primes every layer — both checked
    here via jax.eval_shape (a too-small chunk raises). The batch dim is
    symbolic, but must stay constant over a stream (the state carries it).

    The QRNN pooling is pinned to the scan ForgetMult so ONE graph serves
    both cpu and tpu (the Pallas kernel only lowers for TPU; the two
    impls agree to float noise and the artifact's contract is the
    'highest'-precision extraction one anyway).
    """
    from jax import export as jexport
    from pase_tpu.streaming import StreamingEncoder

    module = enc.module
    variables = _plain(enc.variables)
    # same quantization story as export_encoder
    def _is_float(x):
        return jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
    if weights_dtype is not None:
        wd = jnp.dtype(weights_dtype)
        variables = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x).astype(wd) if _is_float(x) else x,
            variables)
        stored = jax.tree_util.tree_map(
            lambda x: np.asarray(jnp.asarray(x).astype(jnp.float32))
            if _is_float(x) else x, variables)
    else:
        stored = variables
    strides = getattr(module, "strides", None)
    hop = int(np.prod(strides)) if strides is not None else 160
    if chunk % hop:
        raise ValueError(f"streaming chunk {chunk} must divide the total "
                         f"stride {hop}")
    emb = getattr(module, "output_dim", None)
    if not isinstance(emb, (int, np.integer)):
        emb = module.emb_dim

    def _upcast(params):
        if weights_dtype is None:
            return params
        return jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32) if _is_float(x) else x, params)

    def _pack(y, b):
        return jnp.zeros((b, emb, 0), jnp.float32) if y is None else y

    def _arrays_only(st):
        """Drop host-side snapshot bools (_ConvStream 'started') from the
        exported state pytree: the artifact is post-prime by construction
        (steady-state fixpoint check below), where started is always
        True — set_state defaults it when the key is absent."""
        if isinstance(st, dict):
            return {k: _arrays_only(v) for k, v in st.items()
                    if k != "started"}
        if isinstance(st, list):
            return [_arrays_only(v) for v in st]
        return st

    def prime(params, wav):
        se = StreamingEncoder(_VarShim(module, _upcast(params)),
                              qrnn_impl="scan")
        y = se.push(wav)
        return _arrays_only(se.get_state()), _pack(y, wav.shape[0])

    def stepf(params, state, wav):
        se = StreamingEncoder(_VarShim(module, _upcast(params)),
                              qrnn_impl="scan")
        se.set_state(state)
        y = se.push(wav)
        return _arrays_only(se.get_state()), _pack(y, wav.shape[0])

    def flushf(params, state):
        se = StreamingEncoder(_VarShim(module, _upcast(params)),
                              qrnn_impl="scan")
        se.set_state(state)
        y = se.flush()
        return _pack(y, state["y_fifo"].shape[0])

    pspecs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        variables)
    b, = jexport.symbolic_shape("b")
    wspec = jax.ShapeDtypeStruct((b, chunk), jnp.float32)

    # steady-state certification: the state signature out of prime must be
    # a fixed point of step (same pytree, same shapes) — otherwise the
    # exported step graph could not feed itself
    def _sig(tree):
        return jax.tree_util.tree_map(
            lambda x: (tuple(str(d) for d in x.shape), str(x.dtype)), tree)
    st0, y0 = jax.eval_shape(prime, pspecs, wspec)
    st1, y1 = jax.eval_shape(stepf, pspecs, st0, wspec)
    if _sig(st0) != _sig(st1) or int(y1.shape[2]) == 0:
        raise ValueError(
            f"streaming chunk {chunk} is too small to reach the steady "
            "state in one push (a layer FIFO is still filling); use a "
            "larger chunk")
    yf = jax.eval_shape(flushf, pspecs, st0)

    os.makedirs(out_dir, exist_ok=True)
    save_variables(os.path.join(out_dir, "params.npz"), stored,
                   extra={"serving": True})
    ctx = jax.default_matmul_precision(precision) if precision \
        else contextlib.nullcontext()
    with ctx:
        for name, fn, args in (
                ("prime", prime, (pspecs, wspec)),
                ("step", stepf, (pspecs, st0, wspec)),
                ("flush", flushf, (pspecs, st0))):
            exp = jexport.export(jax.jit(fn),
                                 platforms=tuple(platforms))(*args)
            with open(os.path.join(
                    out_dir, f"streaming_{name}_C{chunk}.jaxexp"),
                    "wb") as f:
                f.write(exp.serialize())

    meta = {
        "format": "pase_tpu.serving.streaming/1",
        "chunk": int(chunk),
        "hop": hop,
        "emb_dim": int(emb),
        "sr": int(getattr(module, "sr", 16000)),
        "platforms": list(platforms),
        "precision": precision,
        "weights_dtype": weights_dtype,
        "jax_version": jax.__version__,
        "prime_frames": int(y0.shape[2]),
        "step_frames": int(y1.shape[2]),
        "flush_frames": int(yf.shape[2]),
    }
    with open(os.path.join(out_dir, "meta_streaming.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return out_dir


class ServingStreamingEncoder:
    """Drive an ``export_streaming_encoder`` artifact: a stateful online
    encoder needing only jax + numpy (no model code, no cfg).

    ``push(wav)`` takes exactly ``chunk`` samples ([chunk] or [B, chunk];
    B must stay constant over a stream) and returns the newly computable
    frames as [B, emb, m] (m is prime_frames on the first push,
    step_frames after); ``flush()`` returns the tail frames and ends the
    stream; ``reset()`` starts a new one. Total emitted frames over
    prime+steps+flush equal the offline forward of the concatenated
    waveform, frame for frame.
    """

    def __init__(self, export_dir: str):
        from jax import export as jexport
        with open(os.path.join(export_dir, "meta_streaming.json")) as f:
            self.meta = json.load(f)
        if self.meta.get("format") != "pase_tpu.serving.streaming/1":
            raise ValueError(
                f"not a pase_tpu streaming serving artifact: {export_dir}")
        self.chunk = int(self.meta["chunk"])
        self.params, _ = load_variables(
            os.path.join(export_dir, "params.npz"))
        self.params = _plain(self.params)
        wd = self.meta.get("weights_dtype")
        if wd is not None:
            wdt = jnp.dtype(wd)
            self.params = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x).astype(wdt)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                else x, self.params)
        self._fns = {}
        for name in ("prime", "step", "flush"):
            path = os.path.join(
                export_dir, f"streaming_{name}_C{self.chunk}.jaxexp")
            with open(path, "rb") as f:
                self._fns[name] = jexport.deserialize(f.read())
        self._state = None
        self._done = False

    def reset(self):
        self._state = None
        self._done = False

    def _chunked(self, wav) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None]
        if wav.ndim != 2 or wav.shape[1] != self.chunk:
            raise ValueError(f"push wants [B, {self.chunk}] or "
                             f"[{self.chunk}], got {wav.shape}")
        return wav

    def push(self, wav) -> np.ndarray:
        if self._done:
            raise RuntimeError("stream flushed; call reset() first")
        wav = self._chunked(wav)
        if self._state is None:
            self._state, y = self._fns["prime"].call(self.params, wav)
        else:
            self._state, y = self._fns["step"].call(
                self.params, self._state, wav)
        return np.asarray(y)

    def flush(self) -> np.ndarray:
        if self._state is None:
            raise RuntimeError("nothing pushed yet")
        self._done = True
        return np.asarray(self._fns["flush"].call(self.params,
                                                  self._state))
