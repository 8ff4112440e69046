"""QRNN (quasi-recurrent) context layer primitives, TPU-native.

The reference uses torchqrnn's CUDA ForgetMult kernel
(/root/reference/pase/models/modules.py:45-60). Semantics (torchqrnn,
window=2, as wired by build_rnn_block):

  source_t = [x_t, x_{t-1}]            (x_{-1} = 0)
  (z, f, o) = split(W @ source_t + b)  (3 * hidden)
  z = tanh(z); f = sigmoid(f)
  c_t = f_t * z_t + (1 - f_t) * c_{t-1}     (ForgetMult)
  h_t = sigmoid(o_t) * c_t

On TPU the sequential ForgetMult is a first-order linear recurrence, which
we evaluate in O(log T) depth with ``jax.lax.associative_scan`` — the
idiomatic XLA form (no per-step kernel launches, fully fused). A Pallas
time-blocked kernel is available in pase_tpu.ops.pallas_qrnn for long
sequences.
"""

import jax
import jax.numpy as jnp


def _fm_combine(elem_a, elem_b):
    """Compose two linear-recurrence elements c' = a*c + b."""
    a1, b1 = elem_a
    a2, b2 = elem_b
    return a1 * a2, a2 * b1 + b2


def forget_mult(f, z, c0=None, axis=1):
    """ForgetMult: c_t = f_t * z_t + (1 - f_t) * c_{t-1}.

    Args:
      f, z: [B, T, H] gates/candidates.
      c0: optional [B, H] initial state.
      axis: time axis (default 1 for NTC).
    Returns: c [B, T, H].
    """
    a = 1.0 - f
    b = f * z
    if c0 is not None:
        # fold the initial state into the first step: c_1 = a_1*c0 + b_1
        if axis != 1:
            raise NotImplementedError("c0 only supported with axis=1")
        b = b.at[:, 0].add(a[:, 0] * c0)
    _, c = jax.lax.associative_scan(_fm_combine, (a, b), axis=axis)
    return c


def qrnn_pool(y, c0=None):
    """Full window-2 QRNN pooling given pre-activation gates.

    Args:
      y: [B, T, 3H] linear output over [x_t, x_{t-1}].
    Returns: (h [B, T, H], c_T [B, H]).
    """
    z, f, o = jnp.split(y, 3, axis=-1)
    z = jnp.tanh(z)
    f = jax.nn.sigmoid(f)
    c = forget_mult(f, z, c0=c0)
    h = jax.nn.sigmoid(o) * c
    return h, c[:, -1]


def shift_right(x, axis=1):
    """x_{t-1} with zero at t=0 (torchqrnn window-2 'Xm1') — zero-filled
    for ANY axis (jnp.roll would wrap x[T-1] to the front)."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 0)
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, x.shape[axis])
    return jnp.pad(x, pad)[tuple(sl)]
