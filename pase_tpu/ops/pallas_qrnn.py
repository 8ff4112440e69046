"""Pallas TPU kernel for the QRNN forget-mult linear recurrence.

The reference relies on torchqrnn's CUDA ForgetMult kernel
(/root/reference/pase/models/modules.py:45-60). Our default path is a
log-depth ``lax.associative_scan`` (ops/qrnn.py); this module provides a
Pallas time-blocked kernel that keeps the carry in VMEM and streams the
sequence once — O(T) work instead of O(T log T), no materialized scan
tree — useful for long-utterance inference and large batch training.

Kernel: c_t = a_t * c_{t-1} + b_t  (a = 1-f, b = f*z)
Grid: (batch_tiles, time_blocks); time is the sequential ('arbitrary')
minor axis, the per-tile carry persists in a VMEM scratch across time
blocks. Custom VJP runs the same kernel on time-reversed inputs:
  g_t = a_{t+1} * g_{t+1} + dc_t ;  db = g ;  da_t = g_t * c_{t-1}.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scan_kernel(a_ref, b_ref, out_ref, carry):
    tb = pl.program_id(1)

    @pl.when(tb == 0)
    def _():
        carry[:] = jnp.zeros_like(carry)

    tblk = a_ref.shape[1]

    def body(t, c):
        a_t = a_ref[:, pl.ds(t, 1), :][:, 0]
        b_t = b_ref[:, pl.ds(t, 1), :][:, 0]
        c = a_t * c + b_t
        out_ref[:, pl.ds(t, 1), :] = c[:, None, :]
        return c

    carry[:] = jax.lax.fori_loop(0, tblk, body, carry[:])


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("time_block",))
def _linear_scan_pallas_raw(a, b, time_block=128):
    bsz, t, h = a.shape
    bt = min(8, bsz)
    t_pad = _round_up(t, time_block)
    b_pad = _round_up(bsz, bt)
    if t_pad != t or b_pad != bsz:
        pad = ((0, b_pad - bsz), (0, t_pad - t), (0, 0))
        a = jnp.pad(a, pad)
        b = jnp.pad(b, pad)
    grid = (b_pad // bt, t_pad // time_block)
    spec = pl.BlockSpec((bt, time_block, h),
                        lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _scan_kernel,
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, t_pad, h), a.dtype),
        scratch_shapes=[pltpu.VMEM((bt, h), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(a, b)
    return out[:bsz, :t]


@jax.custom_vjp
def linear_scan(a, b):
    """c_t = a_t * c_{t-1} + b_t over axis 1 of [B, T, H] (c_0 = 0)."""
    return _linear_scan_pallas_raw(a, b)


def _ls_fwd(a, b):
    c = _linear_scan_pallas_raw(a, b)
    return c, (a, c)


def _ls_bwd(res, dc):
    a, c = res
    # g_t = dc_t + a_{t+1} g_{t+1}: reverse-time scan with shifted a
    a_next = jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1)
    g = _linear_scan_pallas_raw(jnp.flip(a_next, 1), jnp.flip(dc, 1))
    g = jnp.flip(g, 1)
    c_prev = jnp.concatenate([jnp.zeros_like(c[:, :1]), c[:, :-1]], axis=1)
    return g * c_prev, g


linear_scan.defvjp(_ls_fwd, _ls_bwd)


def forget_mult_pallas(f, z, c0=None):
    """ForgetMult via the Pallas linear scan: c_t = f_t z_t + (1-f_t)c_{t-1}.

    c0 [B, H] seeds the recurrence (streaming carry): with a = 1-f and
    b = f*z, c_1 = a_1 c0 + b_1, so folding a_1*c0 into b_1 makes the
    zero-init kernel compute the seeded scan EXACTLY (the kernel steps
    sequentially, so block-streamed and full-sequence evaluations are
    bit-identical — pase_tpu/streaming.py relies on this)."""
    a = 1.0 - f
    b = f * z
    if c0 is not None:
        b = b.at[:, 0].add(a[:, 0] * c0.astype(b.dtype))
    return linear_scan(a, b)


def qrnn_pool_pallas(y, c0=None):
    """Window-2 QRNN pooling with the Pallas scan (same contract as
    ops.qrnn.qrnn_pool, incl. the c0 streaming carry)."""
    z, f, o = jnp.split(y, 3, axis=-1)
    z = jnp.tanh(z)
    f = jax.nn.sigmoid(f)
    c = forget_mult_pallas(f, z, c0)
    h = jax.nn.sigmoid(o) * c
    return h, c[:, -1]


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon") or \
            "TPU" in str(jax.devices()[0])
    except Exception:
        return False
