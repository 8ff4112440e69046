"""QRNN scan tests: associative-scan vs naive loop, Pallas kernel
(interpreter mode on CPU) vs reference, gradients."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pase_tpu.ops.qrnn import forget_mult, qrnn_pool, shift_right


def _naive_forget_mult(f, z):
    b, t, h = f.shape
    c = np.zeros((b, h), np.float64)
    out = np.zeros_like(f, dtype=np.float64)
    for i in range(t):
        c = f[:, i] * z[:, i] + (1 - f[:, i]) * c
        out[:, i] = c
    return out


def test_forget_mult_matches_naive():
    rng = np.random.RandomState(0)
    f = jax.nn.sigmoid(jnp.asarray(rng.randn(2, 57, 16).astype(np.float32)))
    z = jnp.tanh(jnp.asarray(rng.randn(2, 57, 16).astype(np.float32)))
    c = np.asarray(forget_mult(f, z))
    ref = _naive_forget_mult(np.asarray(f), np.asarray(z))
    np.testing.assert_allclose(c, ref, atol=1e-5)


def test_forget_mult_c0():
    rng = np.random.RandomState(1)
    f = jax.nn.sigmoid(jnp.asarray(rng.randn(1, 9, 4).astype(np.float32)))
    z = jnp.asarray(rng.randn(1, 9, 4).astype(np.float32))
    c0 = jnp.asarray(rng.randn(1, 4).astype(np.float32))
    c = np.asarray(forget_mult(f, z, c0=c0))
    # naive with c0
    cc = np.asarray(c0)[0].astype(np.float64)
    fn, zn = np.asarray(f)[0], np.asarray(z)[0]
    for i in range(9):
        cc = fn[i] * zn[i] + (1 - fn[i]) * cc
        np.testing.assert_allclose(c[0, i], cc, atol=1e-5)


def test_shift_right():
    x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 3, 2))
    s = np.asarray(shift_right(x))
    np.testing.assert_allclose(s[0, 0], 0)
    np.testing.assert_allclose(s[0, 1:], np.asarray(x)[0, :2])


def test_pallas_scan_interpret_matches():
    """Pallas kernel in interpreter mode (CPU) vs associative scan."""
    from pase_tpu.ops import pallas_qrnn as pq
    import pase_tpu.ops.pallas_qrnn as mod
    from jax.experimental import pallas as pl

    rng = np.random.RandomState(2)
    a = jnp.asarray(rng.rand(3, 40, 8).astype(np.float32))
    b = jnp.asarray(rng.randn(3, 40, 8).astype(np.float32))

    import jax.experimental.pallas.tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        c_pl = np.asarray(mod._linear_scan_pallas_raw(a, b, time_block=16))
    # reference: c_t = a_t c_{t-1} + b_t
    c_ref = np.zeros((3, 40, 8))
    c = np.zeros((3, 8))
    an, bn = np.asarray(a), np.asarray(b)
    for t in range(40):
        c = an[:, t] * c + bn[:, t]
        c_ref[:, t] = c
    np.testing.assert_allclose(c_pl, c_ref, atol=1e-5)


def test_pallas_scan_grad_interpret():
    from pase_tpu.ops import pallas_qrnn as mod
    import jax.experimental.pallas.tpu as pltpu
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.rand(1, 12, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(1, 12, 4).astype(np.float32))

    def loss_pl(a, b):
        return jnp.sum(mod.linear_scan(a, b) ** 2)

    def loss_ref(a, b):
        def step(c, ab):
            aa, bb = ab
            c = aa * c + bb
            return c, c
        _, cs = jax.lax.scan(step, jnp.zeros((1, 4)),
                             (jnp.moveaxis(a, 1, 0), jnp.moveaxis(b, 1, 0)))
        return jnp.sum(cs ** 2)

    with pltpu.force_tpu_interpret_mode():
        ga, gb = jax.grad(loss_pl, argnums=(0, 1))(a, b)
    ra, rb = jax.grad(loss_ref, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=1e-4)


def test_qrnn_module_impl_flag_equality():
    """nn.QRNN impl='pallas' (interpret mode on CPU) == impl='scan'."""
    import jax.experimental.pallas.tpu as pltpu
    from pase_tpu.nn import QRNN

    x = jnp.asarray(np.random.RandomState(0).randn(2, 40, 16),
                    jnp.float32)
    scan_m = QRNN(hidden=16, layers=2, impl="scan")
    v = scan_m.init(jax.random.PRNGKey(0), x)
    y_scan = scan_m.apply(v, x)
    pal_m = QRNN(hidden=16, layers=2, impl="pallas")
    with pltpu.force_tpu_interpret_mode():
        y_pal = pal_m.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_scan),
                               atol=2e-5, rtol=1e-4)


def test_pallas_pool_carry_matches_scan_and_blocks():
    """Seeded Pallas pooling (c0 folded into the first step) matches the
    associative-scan pool with carry, and block-streamed evaluation
    reconstructs the full sequence — the streaming/offline equality the
    TPU default path relies on (pase_tpu/streaming.py)."""
    from pase_tpu.ops.qrnn import qrnn_pool
    from pase_tpu.ops import pallas_qrnn as mod
    import jax.experimental.pallas.tpu as pltpu

    rng = np.random.RandomState(7)
    y = jnp.asarray(rng.randn(2, 24, 3 * 8).astype(np.float32))
    c0 = jnp.asarray(rng.randn(2, 8).astype(np.float32))

    h_ref, c_ref = qrnn_pool(y, c0=c0)
    with pltpu.force_tpu_interpret_mode():
        h_pl, c_pl = mod.qrnn_pool_pallas(y, c0=c0)
        # block-streamed: two halves with carry threading
        h1, c1 = mod.qrnn_pool_pallas(y[:, :12], c0=c0)
        h2, c2 = mod.qrnn_pool_pallas(y[:, 12:], c0=c1)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref),
                               atol=2e-5)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(h1), np.asarray(h2)], axis=1),
        np.asarray(h_pl), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c_pl),
                               atol=1e-6)
