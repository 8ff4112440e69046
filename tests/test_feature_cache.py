"""Precomputed worker-target cache (pase_tpu/data/cache.py): the
reference's precompute_aco_data.py + CachedCompose path
(transforms.py:253-292)."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from pase_tpu.data.io import write_wav

SR = 16000
WORKERS = {"regr": [
    {"num_outputs": 39, "dropout": 0, "hidden_size": 32,
     "hidden_layers": 1, "name": "mfcc", "r": 1, "loss": "MSELoss",
     "skip": False},
    {"num_outputs": 120, "dropout": 0, "hidden_size": 32,
     "hidden_layers": 1, "name": "fbank", "r": 1, "loss": "MSELoss",
     "skip": False}],
    "cls": []}


@pytest.fixture(scope="module")
def cached_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cache_corpus")
    rng = np.random.RandomState(0)
    files, durs = [], 0
    for i, n in enumerate((int(1.5 * SR), int(1.2 * SR), 2 * SR)):
        fname = f"spk{i}-0000{i}-0000.wav"
        write_wav(str(root / fname), rng.randn(n).astype(np.float32) * 0.2)
        files.append({"filename": fname})
        durs += n
    cfg = {"speakers": ["spk0", "spk1", "spk2"],
           "train": {"data": files, "total_wav_dur": durs,
                     "speakers": ["spk0", "spk1", "spk2"]}}
    with open(root / "data.cfg", "w") as f:
        json.dump(cfg, f)

    from pase_tpu.model import parse_workers_cfg
    from pase_tpu.data.cache import precompute_features
    meta = parse_workers_cfg(WORKERS)
    n = precompute_features(str(root), [d["filename"] for d in files],
                            meta, str(root / "cache"), hop=160)
    assert n == 3
    return root


def test_precompute_writes_full_utterance_features(cached_corpus):
    from pase_tpu.data.cache import CACHE_EXT
    path = str(cached_corpus / "cache" / ("spk2-00002-0000" + CACHE_EXT))
    with np.load(path) as z:
        assert set(z.files) >= {"mfcc", "fbank", "_hop"}
        # 2 s utterance at hop 160 -> 200 frames, mfcc 13*(1+2 ders)
        assert z["mfcc"].shape == (200, 39)
        assert z["fbank"].shape == (200, 120)
        assert int(z["_hop"]) == 160


def test_cached_batcher_slices_match_cache(cached_corpus):
    from pase_tpu.data.dataset import LibriSpeechTupleDataset
    from pase_tpu.data.cache import CachedTargetBatcher, _cache_path
    ds = LibriSpeechTupleDataset(str(cached_corpus),
                                 str(cached_corpus / "data.cfg"), "train")
    bt = CachedTargetBatcher(ds, 4, SR // 2, str(cached_corpus / "cache"),
                             ["mfcc", "fbank"], hop=160, seed=1)
    batch = bt._make_batch()
    assert batch["mfcc"].shape == (4, 50, 39)
    assert batch["fbank"].shape == (4, 50, 120)
    # every per-sample target block is a contiguous frame slice of one
    # cached utterance (exact copies, so exact matching is valid)
    caches = []
    for d in ds.wavs:
        with np.load(_cache_path(str(cached_corpus / "cache"),
                                 d["filename"])) as z:
            caches.append(z["mfcc"])
    for i in range(4):
        blk = batch["mfcc"][i]
        found = False
        for full in caches:
            for f0 in range(max(len(full) - len(blk), 0) + 1):
                if np.array_equal(full[f0:f0 + len(blk)], blk):
                    found = True
                    break
            if found:
                break
        assert found, f"sample {i} target is not a cache slice"


def test_prepare_fn_passthrough(cached_corpus):
    """make_prepare_fn must consume a cached target key instead of
    recomputing, still applying ZNorm."""
    from pase_tpu.data.pipeline import make_prepare_fn
    from pase_tpu.model import parse_workers_cfg
    import jax
    meta = parse_workers_cfg(WORKERS)
    stats = {"mfcc": {"mean": np.full(39, 2.0, np.float32),
                      "std": np.full(39, 4.0, np.float32)}}
    prepare = make_prepare_fn(meta, stats=stats, hop=160)
    b, t = 2, SR // 2
    rng = np.random.RandomState(3)
    batch = {k: jnp.asarray(rng.randn(b, t).astype(np.float32) * .1)
             for k in ("chunk", "chunk_ctxt", "chunk_rand")}
    sentinel = jnp.asarray(
        np.arange(b * 50 * 39, dtype=np.float32).reshape(b, 50, 39))
    batch_cached = dict(batch, mfcc=sentinel)
    out = prepare(batch_cached, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["mfcc"]),
                               (np.asarray(sentinel) - 2.0) / 4.0,
                               rtol=1e-6)
    # without the cached key the value is computed from the chunk
    out2 = prepare(batch, jax.random.PRNGKey(0))
    assert not np.allclose(np.asarray(out2["mfcc"]),
                           np.asarray(out["mfcc"]))


def test_cached_batcher_rejects_zerospeech(cached_corpus):
    from pase_tpu.data.dataset import LibriSpeechTupleDataset
    from pase_tpu.data.cache import CachedTargetBatcher
    ds = LibriSpeechTupleDataset(str(cached_corpus),
                                 str(cached_corpus / "data.cfg"), "train",
                                 zero_speech_p=0.5)
    with pytest.raises(ValueError):
        CachedTargetBatcher(ds, 2, SR // 2,
                            str(cached_corpus / "cache"), ["mfcc"])
