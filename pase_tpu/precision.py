"""Mixed-precision policy.

``set_compute_dtype(jnp.bfloat16)`` makes every conv/matmul site run its
MXU passes in bfloat16 with float32 accumulation (params, optimizer
state, norms, and losses stay float32). Read at trace time, so it is a
static property of the compiled step.
"""

from contextlib import contextmanager

import jax.numpy as jnp

_COMPUTE_DTYPE = None


def set_compute_dtype(dtype):
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype


def get_compute_dtype():
    return _COMPUTE_DTYPE


@contextmanager
def compute_dtype(dtype):
    global _COMPUTE_DTYPE
    prev = _COMPUTE_DTYPE
    _COMPUTE_DTYPE = dtype
    try:
        yield
    finally:
        _COMPUTE_DTYPE = prev


def resolve(name):
    if name in (None, "float32", "f32"):
        return None
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"Unknown compute_dtype {name!r}: "
                     "expected 'float32'/'f32' or 'bfloat16'/'bf16'")
