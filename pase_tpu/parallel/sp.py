"""Sequence-parallel (time-sharded) WaveFe encoder forward.

SURVEY.md §5.7 names this as the TPU lever beyond the reference's
whole-utterance inference (run_TIMIT_full_decoding.py:147-155 forwards
entire utterances on one device): the PASE trunk is convs with a
bounded receptive field plus ONE first-order linear recurrence (the
window-2 QRNN, ops/qrnn.py), so arbitrarily long utterances can be
encoded with the TIME axis sharded over the mesh — each device holds
1/D of the waveform and the only cross-device traffic is one
[B, H] carry composition per QRNN layer plus one [B, H] boundary frame
per extra layer.

Scheme (exact up to float reassociation):
  * every shard gets a FIXED-size window ``E = T/D + 2*H`` of the
    waveform, positioned with clamping so the first/last windows end at
    the true sequence edges (their reflect pads then reproduce the
    offline edge behavior exactly); ``H`` covers the trunk's total
    receptive extent, so the kept interior frames are pad-free;
  * the conv trunk + dense-skip taps + QRNN GATES are computed on the
    extended window and the kept frames extracted (windows start on
    multiples of the total stride, so frame grids align globally);
  * the QRNN ForgetMult ``c_t = (1-f_t) c_{t-1} + f_t z_t`` is a linear
    recurrence: each shard scans its kept frames for per-frame
    composition elements ``(A_t, B_t)`` (``c_t = A_t c_in + B_t``), the
    per-shard totals are all-gathered and prefix-composed to give each
    shard its incoming carry, and local states are corrected in closed
    form — a classic two-level (Blelloch) scan over the device axis;
  * W projection / dense-skip fusion / norm_out (bnorm) / tanh / VQ are
    frame-local.

Both trunk families shard: strided FeBlocks and the resblocks path
(decimation + zero-padded stride-1 convs are window-local; odd kwidths
keep the T/R frame grid). Not supported (raise): even resblock kwidths
(length growth), rnn_type != qrnn, InstanceNorm norm_out or per-block
inorm/affinorm (they normalize over the WHOLE time axis — no sharded
form is exact), GRU/LSTM context layers.

Like streaming.py, this module mirrors WaveFe.__call__ out of the same
building blocks and must track any change to its pad/conv/QRNN
semantics (tests/test_sequence_parallel.py pins equality).
"""

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pase_tpu.ops.qrnn import _fm_combine

__all__ = ["encode_time_sharded", "time_sharded_apply",
           "time_shard_halo"]


def _inclusive_compose_seq(a, b):
    """Sequential inclusive scan of _fm_combine over axis 1 (time)."""
    at, bt = jnp.moveaxis(a, 1, 0), jnp.moveaxis(b, 1, 0)

    def comb(carry, ab):
        out = _fm_combine(carry, ab)
        return out, out

    init = (jnp.ones_like(at[0]), jnp.zeros_like(bt[0]))
    _, (A, Bc) = jax.lax.scan(comb, init, (at, bt))
    return jnp.moveaxis(A, 0, 1), jnp.moveaxis(Bc, 0, 1)


@jax.custom_vjp
def _inclusive_compose(a, b):
    """Inclusive composition scan (A_t, B_t) with c_t = A_t c_in + B_t.

    Forward: log-depth associative_scan. Backward: the VJP of the
    numerically-identical sequential scan — associative_scan's own
    transpose breaks shard_map's sharding inference under jax.grad in
    this jax version ("Unexpected XLA sharding override"), while
    lax.scan transposes cleanly.
    """
    return jax.lax.associative_scan(_fm_combine, (a, b), axis=1)


def _ic_fwd(a, b):
    return _inclusive_compose(a, b), (a, b)


def _ic_bwd(res, ct):
    a, b = res
    _, vjp = jax.vjp(_inclusive_compose_seq, a, b)
    return vjp(ct)


_inclusive_compose.defvjp(_ic_fwd, _ic_bwd)


def time_shard_halo(module) -> int:
    """Trunk receptive extent in samples, rounded up to the total
    stride R (+ one extra R of slack for the asymmetric SAME pads).

    Covers both trunk families: strided FeBlocks, and the resblocks
    path (nearest decimation by the stride, then two stride-1 convs at
    dilations (1, 2) — FeResBlock defaults, frontend.py resblocks
    branch). Even resblock kwidths grow the sequence length (symmetric
    zero pad of kw//2 per conv) and are rejected — the frame grid would
    no longer be T/R (the reference's residual add crashes there too,
    modules.py:936-1012)."""
    ext = 0
    cum = 1
    for i, (kw, st, dil) in enumerate(zip(module.kwidths, module.strides,
                                          module.dilations)):
        sinc = module.sincnet and i == 0
        if getattr(module, "resblocks", False) and not sinc:
            if kw % 2 == 0:
                raise ValueError(
                    "even resblock kwidths grow the sequence length; "
                    "no time-sharded form")
            cum *= st                      # decimate FIRST, convs after
            ext += (kw - 1) * (1 + 2) * cum
        else:
            k = kw + 1 if (sinc and kw % 2 == 0) else kw
            ext += (k - 1) * dil * cum
            cum *= st
    R = int(np.prod(module.strides))
    return ((ext + R - 1) // R + 1) * R


def encode_time_sharded(encoder, wav, mesh, axis: str = "data"):
    """WaveFe forward with the TIME axis sharded over ``mesh[axis]``.

    Args:
      encoder: a ``pase_tpu.frontend.Encoder`` (init'd / loaded).
      wav: [B, T] float32 waveform, T divisible by D * 160.
      mesh: jax.sharding.Mesh with axis ``axis`` of size D.
    Returns:
      [B, T//160, emb] features (NTC), numerically equal to
      ``encoder.module.apply(vars, wav, train=False)``.
    """
    return time_sharded_apply(encoder.module, encoder.variables, wav,
                              mesh, axis=axis)


def time_sharded_apply(module, variables, wav, mesh, axis: str = "data"):
    """Pure-function form of :func:`encode_time_sharded` — a function of
    ``(variables, wav)``, so it is DIFFERENTIABLE: shard_map transposes
    the halo slices / all_gathers / ppermutes, giving exact
    context-parallel gradients for long-sequence training
    (tests/test_sequence_parallel.py pins grad equality vs offline)."""
    from pase_tpu.frontend import WaveFe, pool_to, fuse_skip
    from pase_tpu.nn import FeBlock, FeResBlock
    from pase_tpu.precision import get_compute_dtype

    if not isinstance(module, WaveFe):
        raise TypeError("encode_time_sharded supports the WaveFe trunk "
                        f"(got {type(module).__name__})")
    if module.rnn_pool and module.rnn_type != "qrnn":
        raise NotImplementedError(
            f"time-sharded rnn_type={module.rnn_type!r} not implemented")
    if module.norm_out and module.norm_type != "bnorm":
        raise NotImplementedError(
            "InstanceNorm norm_out normalizes over the whole utterance; "
            "no exact time-sharded form")
    if module.norm_type in ("inorm", "affinorm"):
        raise NotImplementedError(
            "per-block InstanceNorm normalizes over the whole time axis; "
            "no exact time-sharded form (bnorm/lnorm/snorm/wnorm are "
            "time-local and supported)")

    D = int(mesh.shape[axis])
    R = int(np.prod(module.strides))
    Bsz, T = wav.shape
    if T % (D * R):
        raise ValueError(f"T={T} must divide by D*R={D * R}")
    Tl = T // D
    H = time_shard_halo(module)
    E = Tl + 2 * H
    if E > T:
        raise ValueError(
            f"utterance too short to time-shard: need T >= T/D + 2*{H} "
            f"(got T={T}, D={D}); use the offline encoder")
    Fl, Fe = Tl // R, E // R

    nblocks = len(module.kwidths)
    blocks = []
    for i, (kw, st, dil, fm) in enumerate(zip(
            module.kwidths, module.strides, module.dilations,
            module.fmaps)):
        sinc = module.sincnet and i == 0
        if module.resblocks and not sinc:
            # residual trunk (frontend.py resblocks branch): decimation
            # + zero-padded stride-1 convs are window-local, and odd
            # kwidths (enforced by time_shard_halo) preserve the T/R
            # frame grid, so the same halo scheme applies
            blocks.append(FeResBlock(
                fmaps=fm, kwidth=kw, downsample=st,
                act=module.activation, norm_type=module.norm_type))
        else:
            blocks.append(FeBlock(
                fmaps=fm, kwidth=kw, stride=st, dilation=dil,
                pad_mode=module.pad_mode, act=module.activation,
                norm_type=module.norm_type, sincnet=sinc, sr=module.sr))

    rnn_dim = module.rnn_dim if module.rnn_dim is not None \
        else module.emb_dim
    cd = get_compute_dtype()

    def dense(params, h, li):
        """QRNN layer dense over [x_t, x_{t-1}], mirroring nn.QRNN
        (nn.Dense(dtype=cd) then f32 pooling)."""
        w = params["rnn"][f"layers_{li}_linear"]
        k, b = w["kernel"], w["bias"]
        hin = h.astype(cd) if cd is not None else h
        y = hin @ k.astype(hin.dtype) + b.astype(hin.dtype)
        return y.astype(jnp.float32)

    def shift_right_local(h):
        return jnp.pad(h, ((0, 0), (1, 0), (0, 0)))[:, :-1]

    def qrnn_carry_fix(y3):
        """Kept-frame gates [B, Fl, 3H] -> corrected hidden [B, Fl, H]
        via the two-level scan over the device axis."""
        z, f, o = jnp.split(y3, 3, axis=-1)
        z = jnp.tanh(z)
        f = jax.nn.sigmoid(f)
        a, b = 1.0 - f, f * z
        A, Bc = _inclusive_compose(a, b)
        # incoming carry: exclusive prefix composition of the shard
        # totals (c_in for shard s = compose of shards < s applied to 0)
        allA = jax.lax.all_gather(A[:, -1], axis)      # [D, B, H]
        allB = jax.lax.all_gather(Bc[:, -1], axis)

        def step(c, ab):
            a_s, b_s = ab
            return a_s * c + b_s, c                     # emit EXCLUSIVE

        _, prefix = jax.lax.scan(step, jnp.zeros_like(allB[0]),
                                 (allA, allB))          # [D, B, H]
        # one-hot contraction instead of prefix[axis_index]: the gather's
        # transpose (scatter at a traced index) breaks shard_map's
        # sharding inference under jax.grad
        sel = jax.nn.one_hot(jax.lax.axis_index(axis), prefix.shape[0],
                             dtype=prefix.dtype)
        c_in = jnp.einsum("d,dbh->bh", sel, prefix)
        c = A * c_in[:, None] + Bc
        return jax.nn.sigmoid(o) * c

    def block_fn(vars_, wav_full):
        params = vars_["params"]
        bstats = vars_.get("batch_stats", {})
        s = jax.lax.axis_index(axis)
        # per-shard window start, clamped so edge windows end at the
        # true sequence edges (all multiples of R — frame grids align)
        start = jnp.clip(s * Tl - H, 0, T - E)
        xw = jax.lax.dynamic_slice(wav_full, (0, start), (Bsz, E))
        of = (s * Tl - start) // R          # kept-frame offset (traced)

        def kept(arr):
            # extract the Fl kept frames at the final rate
            return jax.lax.dynamic_slice_in_dim(arr, of, Fl, axis=1)

        h = xw[..., None]
        taps = []
        for i, blk in enumerate(blocks):
            sub = {"params": params[f"blocks_{i}"]}
            if f"blocks_{i}" in bstats:
                sub["batch_stats"] = bstats[f"blocks_{i}"]
            h = blk.apply(sub, h, train=False)
            if module.denseskips and (i + 1) < nblocks:
                taps.append(h)

        if module.rnn_pool:
            # layer 1 gates on the EXTENDED window (shift_right is then
            # exact for every kept frame incl. the global t=0), then
            # kept-frame extraction + cross-shard carry fix
            y3 = kept(dense(params, jnp.concatenate(
                [h, shift_right_local(h)], axis=-1), 0))
            h = qrnn_carry_fix(y3)
            for li in range(1, module.rnn_layers):
                # deeper layers see only corrected kept frames: the
                # boundary x_{t-1} travels by ppermute (shard 0 gets 0)
                prev_last = jax.lax.ppermute(
                    h[:, -1], axis, [(d, d + 1) for d in range(D - 1)])
                xm1 = jnp.concatenate([prev_last[:, None], h[:, :-1]],
                                      axis=1)
                y3 = dense(params, jnp.concatenate([h, xm1], axis=-1), li)
                h = qrnn_carry_fix(y3)
        else:
            h = kept(h)

        wk = params["W"]
        y = h @ wk["kernel"][0] + wk["bias"]
        for i, tap in enumerate(taps):
            pooled = kept(pool_to(tap, Fe))
            proj = pooled @ params[f"denseskips_{i}"]["kernel"][0]
            y = fuse_skip(y, proj, module.densemerge)
        if module.norm_out:                          # bnorm, eval form
            st = bstats["norm_out"]
            y = (y - st["mean"]) / jnp.sqrt(st["var"] + 1e-5)
        if module.tanh_out:
            y = jnp.tanh(y)
        if module.vq_K is not None and module.vq_K > 0:
            # eval-path VQ with the straight-through estimator
            # (nn.py quantizer semantics): forward value is the nearest
            # codebook entry; gradients pass through y unchanged, so
            # time-sharded grads match the offline encoder for VQ cfgs
            e = bstats["quantizer"]["emb"]
            flat = y.reshape(-1, y.shape[-1])
            d2 = (jnp.sum(flat ** 2, axis=1, keepdims=True)
                  + jnp.sum(e ** 2, axis=1) - 2.0 * flat @ e.T)
            q = e[jnp.argmin(d2, axis=1)].reshape(y.shape)
            y = y + jax.lax.stop_gradient(q - y)
        return y

    smapped = jax.shard_map(
        block_fn, mesh=mesh,
        in_specs=(P(), P()),                  # params + wav replicated
        out_specs=P(None, axis, None))        # frames sharded over time
    if not isinstance(wav, jax.core.Tracer):  # eager: commit to the mesh
        wav = jax.device_put(wav, NamedSharding(mesh, P()))
    return smapped(variables, wav)
