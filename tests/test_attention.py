"""pase_attention / pase_chunking variant tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pase_tpu.model import build_pase, worker_losses
from pase_tpu.attention import AttentionBlock, make_chunk_masks

SMALL_FE = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
            "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
SMALL_WORKERS = {
    "regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
              "hidden_layers": 1, "name": "mfcc", "r": 1,
              "loss": "MSELoss", "skip": False}],
    "cls": [{"num_outputs": 1, "dropout": 0, "hidden_size": 32,
             "hidden_layers": 1, "name": "mi",
             "loss": "BCEWithLogitsLoss", "skip": False}],
}


def test_attention_block_topk():
    m = AttentionBlock(emb_dim=16, K=4)
    h = jnp.asarray(np.random.RandomState(0).randn(2, 10, 16)
                    .astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), h, train=False)
    (masked, mask), ups = m.apply(v, h, train=True,
                                  mutable=["batch_stats"])
    assert masked.shape == h.shape
    np.testing.assert_allclose(np.asarray(mask).sum(axis=1), 4)
    # masked channels are zero
    mnp = np.asarray(mask)
    hm = np.asarray(masked)
    for b in range(2):
        off = np.where(mnp[b] == 0)[0]
        np.testing.assert_allclose(hm[b][:, off], 0)
    # running distribution updated
    assert not np.allclose(
        np.asarray(ups["batch_stats"]["running_dist"]),
        np.ones(16) / 16)


def test_chunk_masks():
    masks = make_chunk_masks(["a", "b"], emb_dim=16, K=5, seed=1)
    for m in masks.values():
        assert float(m.sum()) == 5
    assert not np.array_equal(np.asarray(masks["a"]),
                              np.asarray(masks["b"]))


def _batch(rng, b=2, t=4800):
    from pase_tpu.ops import features as F
    keys = jax.random.split(rng, 4)
    batch = {k: jax.random.normal(keys[i], (b, t)) * 0.1
             for i, k in enumerate(("chunk", "chunk_ctxt", "chunk_rand",
                                    "cchunk"))}
    batch["mfcc"] = F.mfcc(batch["cchunk"])[:, :, :39]
    return batch


@pytest.mark.parametrize("variant", ["attention", "chunking"])
def test_pase_variants_forward(variant):
    kwargs = {}
    if variant == "attention":
        kwargs["att_cfg"] = {"K": 8, "avg_factor": 0.3,
                             "att_mode": "avg_time", "hidden": [32]}
    else:
        kwargs["chunking_K"] = 8
    model, meta = build_pase(SMALL_FE, SMALL_WORKERS, **kwargs)
    rng = jax.random.PRNGKey(0)
    batch = _batch(rng)
    variables = model.init({"params": rng, "sample": rng}, batch,
                           train=False)
    out, ups = model.apply(variables, batch, train=True,
                           rngs={"sample": rng},
                           mutable=["batch_stats"])
    h, chunk, preds, labels = out
    losses = worker_losses(meta, preds, labels)
    for v in losses.values():
        assert np.isfinite(float(v))
    assert preds["mfcc"].shape[-1] == 39
