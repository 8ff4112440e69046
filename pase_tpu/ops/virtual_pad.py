"""Padded 1-D conv WITHOUT materializing the padded activation.

The reference's FeBlocks reflect-pad every trunk activation before the
conv (/root/reference/pase/models/modules.py:1058-1071). A literal
`jnp.pad` materializes a full copy of the activation (and its transpose
rule materializes slice+add passes in the backward) — measured at ~3 GB
of the 31 GB fusion-boundary HBM traffic per train step
(benchmarks/hlo_attribution_r5.json). XLA's convolution op carries its
own implicit ZERO padding, which costs nothing: the conv just reads the
unpadded input.

`conv1d_padded` exploits that: run the conv with native zero padding
(l, r) — every output whose window lies inside [0, T) is the exact
same dot product as with a materialized pad — then recompute the few
edge outputs whose windows cross the array boundary from a SMALL
reflect/edge-padded slice (O(k + stride) samples) and splice them in
with dynamic_update_slice. Outputs are exactly equal to
`conv1d(pad_1d(x, pad, mode), kernel, stride)` (same windows, same
dot-product values; pinned by tests/test_virtual_pad.py).

For pad_mode='constant' (zeros) the native padding IS the semantics —
no fixup at all.
"""

import jax
import jax.numpy as jnp

from pase_tpu.ops.pad import pad_1d


def _edge_counts(t, k_eff, stride, l, r):
    """(#left outputs touching the left pad, #right outputs touching the
    right pad, total outputs) of a (l, r)-padded stride conv."""
    t_out = (t + l + r - k_eff) // stride + 1
    n_l = -(-l // stride) if l > 0 else 0            # ceil(l / stride)
    if r > 0:
        # output i reads original positions [i*s - l, i*s - l + k_eff-1];
        # it crosses the right boundary when i*s - l + k_eff - 1 > t - 1
        first_bad = (t - k_eff + l) // stride + 1
        n_r = max(t_out - first_bad, 0)
    else:
        n_r = 0
    return n_l, n_r, t_out


def conv1d_padded(x, kernel, stride=1, dilation=1, pad=(0, 0),
                  pad_mode="reflect"):
    """conv1d(pad_1d(x, pad, pad_mode), kernel, stride, dilation) with
    the pad virtualized into the conv (zero HBM cost for the pad).

    Args:
      x: [B, T, Cin]; kernel: [K, Cin, Cout]; pad: (left, right).
    """
    from pase_tpu.nn import conv1d
    from pase_tpu.precision import get_compute_dtype

    l, r = pad
    if l == 0 and r == 0:
        return conv1d(x, kernel, stride, dilation)

    cd = get_compute_dtype()
    if cd is not None and x.dtype == jnp.float32:
        x = x.astype(cd)

    k = kernel.shape[0]
    k_eff = (k - 1) * dilation + 1
    b, t, _ = x.shape

    if pad_mode == "constant":
        # zeros: the conv's native padding is exactly the semantics
        return jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(stride,),
            padding=((l, r),), rhs_dilation=(dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"))

    n_l, n_r, t_out = _edge_counts(t, k_eff, stride, l, r)

    # the fix-up slices must also contain the REFLECT mirror sources
    # (x[1..l] on the left, x[t-1-r..t-2] on the right); tiny inputs
    # where that spills past the array fall back to the materialized pad
    need_l = max((n_l - 1) * stride + k_eff - l, l + 1) if n_l else 0
    if n_r:
        i0 = t_out - n_r                          # first affected output
        start = i0 * stride - l                   # original sample offset
        # extend left in stride multiples until the mirror sources fit
        m = max(0, -(-((r + 1) - (t - start)) // stride))
        a0 = start - m * stride
    if (n_l and need_l > t) or (n_r and a0 < 0):
        return conv1d(pad_1d(x, pad, pad_mode), kernel, stride, dilation)

    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(stride,),
        padding=((l, r),), rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))

    # --- left fixup: outputs 0..n_l-1 read padded positions
    # [0, (n_l-1)*stride + k_eff - 1] = original [-l, ...] ----------------
    if n_l > 0:
        edge = pad_1d(x[:, :need_l], (l, 0), pad_mode)
        y_l = conv1d(edge, kernel, stride, dilation)[:, :n_l]
        y = jax.lax.dynamic_update_slice(y, y_l.astype(y.dtype),
                                         (0, 0, 0))

    # --- right fixup: the last n_r outputs ------------------------------
    if n_r > 0:
        edge = pad_1d(x[:, a0:], (0, r), pad_mode)
        y_r = conv1d(edge, kernel, stride, dilation)[:, m:m + n_r]
        y = jax.lax.dynamic_update_slice(y, y_r.astype(y.dtype),
                                         (0, i0, 0))
    return y
