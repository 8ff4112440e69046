"""conv1d_padded (virtual pad) == pad_1d + conv1d, exactly.

The trunk's reflect pads are virtualized into the conv op
(pase_tpu/ops/virtual_pad.py) to kill the materialized padded-activation
copies (~3 GB/step, benchmarks/hlo_attribution_r5.json). Semantics must
stay the reference's F.pad(mode)+conv (modules.py:1058-1071): every
output window reads the same values, so the results agree to float
noise for every (k, stride, dilation, pad, mode) the trunk uses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pase_tpu.nn import conv1d
from pase_tpu.ops.pad import pad_1d, feblock_pad
from pase_tpu.ops.virtual_pad import conv1d_padded, _edge_counts


CASES = [
    # (T, Cin, Cout, k, stride, dilation, pad, mode) — every trunk
    # shape family + adversarial odd sizes
    (200, 4, 8, 20, 10, 1, (9, 10), "reflect"),
    (200, 4, 8, 11, 2, 1, (4, 6), "reflect"),
    (64, 3, 5, 11, 1, 1, (5, 5), "reflect"),
    (64, 3, 5, 11, 1, 2, (10, 10), "reflect"),
    (50, 2, 3, 7, 3, 1, (2, 4), "reflect"),
    (50, 2, 3, 7, 3, 1, (2, 4), "edge"),
    (50, 2, 3, 7, 3, 1, (2, 4), "constant"),
    (33, 2, 3, 5, 1, 1, (0, 4), "reflect"),
    (33, 2, 3, 5, 1, 1, (4, 0), "reflect"),
    (40, 2, 3, 4, 2, 1, (1, 2), "reflect"),
]


@pytest.mark.parametrize("t,ci,co,k,s,d,pad,mode", CASES)
def test_conv1d_padded_equals_materialized(t, ci, co, k, s, d, pad,
                                           mode):
    rng = np.random.RandomState(hash((t, k, s)) % 2**31)
    x = jnp.asarray(rng.randn(3, t, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, ci, co).astype(np.float32) / k)
    ref = conv1d(pad_1d(x, pad, mode), w, s, d)
    got = conv1d_padded(x, w, s, d, pad=pad, pad_mode=mode)
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("t,ci,co,k,s,d,pad,mode", CASES[:5])
def test_conv1d_padded_gradients_match(t, ci, co, k, s, d, pad, mode):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, t, ci).astype(np.float32))
    w = jnp.asarray(rng.randn(k, ci, co).astype(np.float32) / k)

    def loss_a(x, w):
        return jnp.sum(conv1d(pad_1d(x, pad, mode), w, s, d) ** 2)

    def loss_b(x, w):
        return jnp.sum(conv1d_padded(x, w, s, d, pad=pad,
                                     pad_mode=mode) ** 2)

    ga = jax.grad(loss_a, argnums=(0, 1))(x, w)
    gb = jax.grad(loss_b, argnums=(0, 1))(x, w)
    for a, b in zip(ga, gb):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale,
                                   rtol=1e-5, atol=1e-6)


def test_edge_counts_cover_every_boundary_window():
    """Brute-force check of _edge_counts: an output window crosses the
    boundary iff it is inside the [0, n_l) / [t_out - n_r, t_out)
    fix-up ranges."""
    for t in (17, 40, 64):
        for k in (3, 5, 11, 20):
            for s in (1, 2, 3, 10):
                for d in (1, 2):
                    for l, r in ((0, 0), (2, 3), (k - 1, k - 1),
                                 (k // 2 - 1 if k > 1 else 0, k // 2)):
                        k_eff = (k - 1) * d + 1
                        if t + l + r < k_eff:
                            continue
                        n_l, n_r, t_out = _edge_counts(t, k_eff, s, l, r)
                        for i in range(t_out):
                            lo = i * s - l
                            hi = lo + k_eff - 1
                            crosses_l = lo < 0
                            crosses_r = hi > t - 1
                            assert crosses_l == (i < n_l), \
                                (t, k, s, d, l, r, i)
                            assert crosses_r == (i >= t_out - n_r), \
                                (t, k, s, d, l, r, i)


def test_feblock_uses_virtual_pad_exactly():
    """FeBlock output with the new virtual-pad conv path equals the
    reference pad semantics (pad_1d + VALID conv) at a trunk shape."""
    from pase_tpu.nn import FeBlock
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 120, 8).astype(np.float32))
    # virtual_pads=True forces the vpad path even on the CPU test
    # backend ('auto' resolves to False off-TPU, like nn.QRNN's 'auto')
    blk = FeBlock(fmaps=16, kwidth=11, stride=2, norm_type="bnorm",
                  virtual_pads=True)
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    y = blk.apply(v, x, train=False)
    # manual reference: reflect pad + VALID conv with the same kernel
    kern = v["params"]["conv"]["kernel"]
    bias = v["params"]["conv"]["bias"]
    ref = conv1d(pad_1d(x, feblock_pad(11, 2), "reflect"), kern, 2) + bias
    # compare pre-norm conv output via monkey run: norm in eval mode uses
    # running stats (zeros/ones at init), so y = prelu(norm(ref))
    mean = v["batch_stats"]["norm"]["mean"]
    var = v["batch_stats"]["norm"]["var"]
    scale = v["params"]["norm"]["weight"]
    b2 = v["params"]["norm"]["bias"]
    normed = (ref - mean) / jnp.sqrt(var + 1e-5) * scale + b2
    alpha = v["params"]["act"]["weight"]
    want = jnp.where(normed >= 0, normed, alpha * normed)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_feblock_virtual_pads_auto_and_forced_agree():
    """'auto' (materialized on the CPU test backend) and forced
    virtual_pads=True produce the same function — the platform switch
    changes lowering, not semantics. Also pins that both settings share
    one parameter tree (flax fields are static), so checkpoints are
    interchangeable across platforms."""
    from pase_tpu.nn import FeBlock
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(3, 200, 8).astype(np.float32))
    auto_blk = FeBlock(fmaps=16, kwidth=11, stride=2, norm_type="bnorm")
    on_blk = FeBlock(fmaps=16, kwidth=11, stride=2, norm_type="bnorm",
                     virtual_pads=True)
    v = auto_blk.init(jax.random.PRNGKey(1), x, train=False)
    y_auto = auto_blk.apply(v, x, train=False)
    y_on = on_blk.apply(v, x, train=False)   # same variables, vpad path
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_on),
                               rtol=1e-6, atol=1e-6)
