"""SpectrumLM / SpectrogramDecoder (pase_tpu/decoders.py) shape and
semantics tests (reference decoders.py:9-105 — dead code there, ported
for inventory completeness)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pase_tpu.decoders import SpectrogramDecoder, SpectrumLM


def test_spectrogram_decoder_shapes():
    dec = SpectrogramDecoder(nfft=1024)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 50, 512),
                    jnp.float32)
    vars_ = dec.init(jax.random.PRNGKey(0), x)
    y = dec.apply(vars_, x)
    # stride-1 stack preserves T; head emits nfft//2+1 bins
    assert y.shape == (2, 50, 513)


def test_spectrogram_decoder_upsamples():
    dec = SpectrogramDecoder(nfft=256, strides=(2, 1), kwidths=(4, 3),
                             fmaps=(32, 32), norm_type="bnorm")
    x = jnp.asarray(np.random.RandomState(1).randn(2, 20, 16), jnp.float32)
    vars_ = dec.init(jax.random.PRNGKey(0), x)
    y = dec.apply(vars_, x, mutable=["batch_stats"])[0]
    assert y.shape == (2, 40, 129)


@pytest.mark.parametrize("rnn_type", ["LSTM", "GRU"])
def test_spectrum_lm_rollout(rnn_type):
    lm = SpectrumLM(rnn_size=32, rnn_layers=2, out_dim=16,
                    rnn_type=rnn_type)
    x = jnp.asarray(np.random.RandomState(2).randn(3, 16), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(1)}
    vars_ = lm.init(rngs, x, 5)
    frames, state = lm.apply(vars_, x, 5,
                             rngs={"sample": jax.random.PRNGKey(1)})
    assert frames.shape == (3, 5, 16)
    n_states = len(state)
    assert n_states == 2
    # jit-compatible (static dec_steps)
    f2, _ = jax.jit(lambda v, x: lm.apply(
        v, x, 5, rngs={"sample": jax.random.PRNGKey(1)}),
        static_argnums=())(vars_, x)
    np.testing.assert_allclose(np.asarray(frames), np.asarray(f2),
                               rtol=1e-6)


def test_spectrum_lm_closed_loop_and_teacher_forcing():
    """Step t's input is step t-1's output; a dec_cps frame at step t
    replaces it (decoders.py:46-57)."""
    lm = SpectrumLM(rnn_size=8, rnn_layers=1, out_dim=4)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "sample": jax.random.PRNGKey(7)}
    vars_ = lm.init(rngs, x, 4)
    state0 = lm.apply(vars_, jax.random.PRNGKey(7), 1,
                      method=SpectrumLM.init_state)
    frames, _ = lm.apply(vars_, x, 4, state=state0)
    # manual per-step rollout matches the scan
    cur, st = x, state0
    outs = []
    for _ in range(4):
        out, (st, _) = None, (st, None)
        f1, st_full = lm.apply(vars_, cur, 1, state=st)
        st = st_full
        cur = f1[:, 0]
        outs.append(cur)
    manual = np.stack([np.asarray(o) for o in outs], 1)
    np.testing.assert_allclose(np.asarray(frames), manual[:, :, :],
                               rtol=1e-5, atol=1e-6)
    # teacher forcing at t=2 changes steps >= 2 only
    force = jnp.asarray(rng.randn(1, 4), jnp.float32)
    f_tf, _ = lm.apply(vars_, x, 4, state=state0, dec_cps={2: force})
    np.testing.assert_allclose(np.asarray(f_tf[:, :2]),
                               np.asarray(frames[:, :2]), rtol=1e-6)
    assert not np.allclose(np.asarray(f_tf[:, 2]),
                           np.asarray(frames[:, 2]))
