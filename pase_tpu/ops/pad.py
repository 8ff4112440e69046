"""Time-axis padding helpers for NTC ([batch, time, channels]) tensors.

The padding rules reproduce the reference's conv blocks exactly:
* FeBlock non-sinc convs: /root/reference/pase/models/modules.py:1058-1071
* SincConv 'SAME' padding: /root/reference/pase/models/modules.py:922-928
(asymmetric (k//2-1, k//2) pads whenever stride>1 or kwidth is even).
"""

import jax.numpy as jnp


def pad_1d(x, pad, mode="reflect"):
    """Pad the time axis (axis 1) of an NTC tensor.

    Args:
      x: [B, T, C] array.
      pad: (left, right) tuple of ints.
      mode: 'reflect' | 'constant' | 'replicate' (torch naming; 'replicate'
        maps to numpy 'edge').
    """
    l, r = pad
    if l == 0 and r == 0:
        return x
    np_mode = {"reflect": "reflect", "constant": "constant",
               "replicate": "edge", "edge": "edge"}[mode]
    return jnp.pad(x, ((0, 0), (l, r), (0, 0)), mode=np_mode)


def feblock_pad(kwidth, stride, dilation=1):
    """(left, right) pad of the reference FeBlock conv (modules.py:1061-1070)."""
    if kwidth <= 1:
        return (0, 0)
    if stride > 1 or kwidth % 2 == 0:
        if dilation > 1:
            raise ValueError("Cannot make dilated convolution with stride > 1")
        return (kwidth // 2 - 1, kwidth // 2)
    p = (kwidth // 2) * (dilation - 1) + (kwidth // 2)
    return (p, p)


def sinc_same_pad(kernel_size, stride):
    """(left, right) pad of the reference SincConv_fast SAME padding
    (modules.py:922-928)."""
    if stride > 1:
        return (kernel_size // 2 - 1, kernel_size // 2)
    return (kernel_size // 2, kernel_size // 2)
