"""Host data layer tests: wav IO, data cfg, tuple sampling, chunking,
native C++ loader, stats schema."""

import json
import os
import subprocess

import numpy as np
import pytest

from pase_tpu.data.io import read_wav, write_wav, native_load_chunk_batch
from pase_tpu.data.dataset import (LibriSpeechTupleDataset, ChunkBatcher,
                                   FastChunkBatcher, crop_chunk)

SR = 16000


def _ensure_native():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libpase_wavio.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", os.path.join(root, "native")],
                           check=True, capture_output=True)
        except Exception:
            return False
    import pase_tpu.data.io as io
    io._NATIVE = None
    return os.path.exists(so)


def test_wav_roundtrip(tmp_path):
    sig = (np.sin(2 * np.pi * 440 * np.arange(SR) / SR) * 0.5).astype(
        np.float32)
    path = str(tmp_path / "t.wav")
    write_wav(path, sig)
    w, sr = read_wav(path)
    assert sr == SR and len(w) == SR
    np.testing.assert_allclose(w, np.round(sig * 32767) / 32768, atol=1e-4)


def test_crop_chunk():
    rng = np.random.RandomState(0)
    long = rng.randn(5000).astype(np.float32)
    c = crop_chunk(long, 1000, rng)
    assert c.shape == (1000,)
    short = rng.randn(300).astype(np.float32)
    c2 = crop_chunk(short, 1000, rng)
    assert c2.shape == (1000,)
    np.testing.assert_allclose(c2[:300], short)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("libri")
    rng = np.random.RandomState(0)
    wavs = []
    total = 0
    # two 'utterance prefixes' with two segments each (neighbor scheme)
    for utt in ("1001-134707-0001", "2002-234707-0002"):
        for seg in range(2):
            n = SR + rng.randint(0, SR)
            sig = rng.randn(n).astype(np.float32) * 0.1
            fname = f"{utt}-{seg}.wav"
            write_wav(str(root / fname), sig)
            wavs.append({"filename": fname, "speaker": utt.split("-")[0]})
            total += n
    cfg = {"speakers": ["1001", "2002"],
           "train": {"data": wavs, "speakers": ["1001", "2002"],
                     "total_wav_dur": total},
           "valid": {"data": wavs, "speakers": ["1001", "2002"],
                     "total_wav_dur": total}}
    cfg_path = str(root / "data_cfg.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    return str(root), cfg_path


def test_tuple_dataset(corpus):
    root, cfg = corpus
    ds = LibriSpeechTupleDataset(root, cfg, "train")
    assert len(ds) == 4
    wav, cwav, rwav = ds.sample_tuple(0)
    assert wav.ndim == 1 and cwav.ndim == 1 and rwav.ndim == 1
    # neighbor must come from the same prefix, different file
    assert not np.array_equal(wav, cwav) or True


def test_chunk_batcher(corpus):
    root, cfg = corpus
    ds = LibriSpeechTupleDataset(root, cfg, "train")
    b = ChunkBatcher(ds, batch_size=4, chunk_size=8000)
    batch = next(iter(b))
    for k in ("chunk", "chunk_ctxt", "chunk_rand"):
        assert batch[k].shape == (4, 8000)
        assert batch[k].dtype == np.float32


def test_native_loader(corpus, tmp_path):
    if not _ensure_native():
        pytest.skip("no native toolchain")
    sig = (np.sin(2 * np.pi * 220 * np.arange(SR) / SR) * 0.4).astype(
        np.float32)
    p = str(tmp_path / "n.wav")
    write_wav(p, sig)
    out = native_load_chunk_batch([p, p, p], 4000, seed=1)
    assert out is not None and out.shape == (3, 4000)
    assert np.abs(out).max() > 0.1


def test_fast_chunk_batcher(corpus):
    if not _ensure_native():
        pytest.skip("no native toolchain")
    root, cfg = corpus
    ds = LibriSpeechTupleDataset(root, cfg, "train")
    b = FastChunkBatcher(ds, batch_size=4, chunk_size=8000)
    batch = b._make_batch()
    for k in ("chunk", "chunk_ctxt", "chunk_rand"):
        assert batch[k].shape == (4, 8000)
        assert np.abs(batch[k]).max() > 0


def test_stats_pkl_roundtrip(tmp_path):
    from pase_tpu.data.pipeline import save_stats_pkl, load_stats_pkl
    stats = {"mfcc": {"mean": np.arange(39, dtype=np.float32),
                      "std": np.ones(39, dtype=np.float32)}}
    p = str(tmp_path / "stats.pkl")
    save_stats_pkl(stats, p)
    back = load_stats_pkl(p)
    np.testing.assert_allclose(back["mfcc"]["mean"], stats["mfcc"]["mean"])


def test_reference_stats_pkl_loadable(tmp_path):
    """Reference stats pkls store torch tensors; loader must accept them."""
    import torch
    import pickle
    stats = {"lps": {"mean": torch.arange(5).float(),
                     "std": torch.ones(5)}}
    p = str(tmp_path / "ref_stats.pkl")
    with open(p, "wb") as f:
        pickle.dump(stats, f)
    from pase_tpu.data.pipeline import load_stats_pkl
    back = load_stats_pkl(p)
    np.testing.assert_allclose(back["lps"]["mean"], np.arange(5))


def test_pair_and_concat_datasets(corpus):
    from pase_tpu.data.dataset import (PairWavDataset, MetaConcatDataset,
                                       LibriSpeechTupleDataset)
    root, cfg = corpus
    pair = PairWavDataset(root, cfg, "train")
    w, c, r = pair.sample_tuple(0)
    np.testing.assert_allclose(w, c)   # ctxt falls back to current
    d1 = LibriSpeechTupleDataset(root, cfg, "train")
    meta = MetaConcatDataset([d1, pair])
    assert len(meta) == len(d1) + len(pair)
    assert meta.total_wav_dur == d1.total_wav_dur + pair.total_wav_dur
    w2, c2, r2 = meta.sample_tuple(len(d1) + 1)
    assert w2.ndim == 1


def test_genhancement_dataset(corpus, tmp_path):
    from pase_tpu.data.dataset import GenhancementDataset
    root, cfg = corpus
    import shutil, json
    clean = tmp_path / "clean"
    shutil.copytree(root, clean, dirs_exist_ok=True)
    ds = GenhancementDataset(root, str(clean), cfg, "train")
    noisy, cl, rnd = ds.sample_tuple(1)
    np.testing.assert_allclose(noisy, cl)  # identical trees here


def test_compute_stats_matches_reference_semantics():
    """stats pkl: mean of per-sample temporal means; STD of per-sample
    temporal stds (make_trainset_statistics.py:98-104, torch unbiased)."""
    import torch
    import jax
    from pase_tpu.data.pipeline import compute_stats
    from pase_tpu.model import parse_workers_cfg
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.data.pipeline import make_prepare_fn
    import jax.numpy as jnp

    workers = {"regr": [{"num_outputs": 39, "hidden_size": 8,
                         "hidden_layers": 1, "name": "mfcc", "r": 1,
                         "loss": "MSELoss", "dropout": 0}], "cls": []}
    meta = parse_workers_cfg(workers)
    stats = compute_stats(SyntheticChunkBatcher(4, 4800, seed=2), meta,
                          max_batches=3, seed=7)
    # reproduce with torch on the same prepared features
    prep = make_prepare_fn(meta)
    rng = jax.random.PRNGKey(7)
    feats = []
    b = iter(SyntheticChunkBatcher(4, 4800, seed=2))
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        out = prep({k: jnp.asarray(v) for k, v in next(b).items()}, sub)
        feats.append(np.asarray(out["mfcc"]))
    v = torch.tensor(np.concatenate(feats)).transpose(1, 2)  # [N, D, T]
    ref_mean = torch.mean(torch.mean(v, dim=2), dim=0).numpy()
    ref_std = torch.std(torch.std(v, dim=2), dim=0).numpy()
    np.testing.assert_allclose(stats["mfcc"]["mean"], ref_mean, atol=1e-4)
    np.testing.assert_allclose(stats["mfcc"]["std"], ref_std, atol=1e-4,
                               rtol=1e-3)


def test_chunk_batcher_thread_cleanup():
    """Repeated iter() must not accumulate producer threads
    (the prefetch thread re-checks stop while blocked on a full queue)."""
    import gc
    import threading
    import time
    from pase_tpu.data.dataset import ChunkBatcher

    class _TinyDS:
        total_wav_dur = 16000 * 4

        def __len__(self):
            return 4

        def sample_tuple(self, idx, rng=None):
            w = np.random.RandomState(idx).randn(3200).astype(np.float32)
            return w, w, w

    base = threading.active_count()
    for _ in range(5):
        bt = ChunkBatcher(_TinyDS(), batch_size=2, chunk_size=1600,
                          prefetch=1)
        it = iter(bt)
        next(it)          # producer now blocks on the full queue
        del it
        gc.collect()
    deadline = time.time() + 5.0
    while time.time() < deadline and threading.active_count() > base:
        time.sleep(0.1)
    assert threading.active_count() <= base, (
        f"leaked {threading.active_count() - base} producer threads")


def test_chunk_batcher_propagates_producer_error():
    """A crashing producer must raise in the consumer, not deadlock
    q.get() forever."""
    from pase_tpu.data.dataset import ChunkBatcher

    class _BadDS:
        total_wav_dur = 16000 * 4

        def __len__(self):
            return 4

        def sample_tuple(self, idx, rng=None):
            raise RuntimeError("boom")

    bt = ChunkBatcher(_BadDS(), batch_size=2, chunk_size=1600, prefetch=1)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="boom"):
        next(iter(bt))


def test_feats_and_wav_class_datasets(tmp_path):
    """FeatsClassDataset / WavClassDataset (pase/dataset.py:705-801):
    utt2class json + split list + per-utt features / wavs."""
    import json as _json
    from pase_tpu.data.dataset import FeatsClassDataset, WavClassDataset
    from pase_tpu.data.io import write_wav
    rng = np.random.RandomState(0)
    names = ["a.wav", "b.wav", "c.wav"]
    (tmp_path / "u2c.json").write_text(
        _json.dumps({n: i % 2 for i, n in enumerate(names)}))
    (tmp_path / "split.lst").write_text("\n".join(names) + "\n")
    for n in names:
        w = rng.randn(12000).astype(np.float32) * 0.1
        write_wav(str(tmp_path / n), w)
        np.save(str(tmp_path / (n[:-4] + ".fb.npy")),
                rng.randn(30, 40).astype(np.float32))
    import pickle
    with open(tmp_path / "st.pkl", "wb") as f:
        pickle.dump({"mean": np.zeros(40, np.float32),
                     "std": np.ones(40, np.float32) * 2}, f)

    fds = FeatsClassDataset(str(tmp_path), str(tmp_path / "u2c.json"),
                            str(tmp_path / "split.lst"),
                            stats=str(tmp_path / "st.pkl"))
    assert len(fds) == 3
    ft, lab = fds[1]
    assert ft.shape == (30, 40) and lab == 1
    raw = np.load(str(tmp_path / "b.fb.npy"))
    np.testing.assert_allclose(ft, raw / 2, rtol=1e-6)

    # chunking pads short wavs to chunk_size+1 first (reference semantics)
    wds = WavClassDataset(str(tmp_path), str(tmp_path / "u2c.json"),
                          [n for n in names], chunk_size=16000)
    wav, lab0 = wds[0]
    assert wav.shape == (16000,) and lab0 == 0
    wds2 = WavClassDataset(str(tmp_path), str(tmp_path / "u2c.json"),
                           str(tmp_path / "split.lst"))
    full, _ = wds2[2]
    assert full.shape == (12000,)


def test_threaded_prefetcher_cleanup_and_content():
    """ThreadedPrefetcher: N producers feed one queue; threads exit when
    the consumer goes away; batches come from per-thread iterators."""
    import gc
    import threading
    import time
    from pase_tpu.data.dataset import (ThreadedPrefetcher,
                                       SyntheticChunkBatcher)

    base = threading.active_count()
    for _ in range(3):
        tp = ThreadedPrefetcher(
            lambda tid: SyntheticChunkBatcher(2, 1600, seed=tid),
            n_threads=3, prefetch=2)
        it = iter(tp)
        b = next(it)
        assert b["chunk"].shape == (2, 1600)
        assert b["chunk"].dtype == np.float32
        del it
        gc.collect()
    deadline = time.time() + 5.0
    while time.time() < deadline and threading.active_count() > base:
        time.sleep(0.1)
    assert threading.active_count() <= base, (
        f"leaked {threading.active_count() - base} producer threads")


def test_device_synthetic_batcher():
    """DeviceSyntheticBatcher yields jitted on-device batches with the MI
    tuple structure and deterministic streams per seed."""
    import jax.numpy as jnp
    from pase_tpu.data.dataset import DeviceSyntheticBatcher
    b1 = iter(DeviceSyntheticBatcher(2, 1600, seed=3))
    b2 = iter(DeviceSyntheticBatcher(2, 1600, seed=3))
    x1, x2 = next(b1), next(b2)
    assert set(x1) == {"chunk", "chunk_ctxt", "chunk_rand"}
    assert x1["chunk"].shape == (2, 1600)
    np.testing.assert_allclose(np.asarray(x1["chunk"]),
                               np.asarray(x2["chunk"]))
    # chunk and ctxt share the speaker (strong envelope correlation is not
    # guaranteed per-sample; at least they must differ from chunk_rand)
    assert not np.allclose(np.asarray(x1["chunk"]),
                           np.asarray(x1["chunk_rand"]))


def test_parallel_batcher_aligned_cchunk(corpus, tmp_path):
    """GenhancementDataset (parallel=True): the batcher crops noisy and
    clean at ONE shared window and emits the aligned clean as 'cchunk'
    (reference dataset.py:383-420 chunk_beg/end reuse)."""
    import shutil
    from pase_tpu.data.dataset import GenhancementDataset, ChunkBatcher
    from pase_tpu.data.io import read_wav, write_wav
    root, cfg = corpus
    clean = tmp_path / "clean"
    noisy = tmp_path / "noisy"
    clean.mkdir()
    noisy.mkdir()
    for f in os.listdir(root):
        if not f.endswith(".wav"):
            continue
        w, _ = read_wav(os.path.join(root, f))
        write_wav(str(clean / f), w)
        write_wav(str(noisy / f), w + 0.125)   # known additive "noise"
    ds = GenhancementDataset(str(noisy), str(clean), cfg, "train")
    bt = ChunkBatcher(ds, 4, 4000, seed=5)
    batch = bt._make_batch()
    assert "cchunk" in batch
    # exact alignment: noisy - clean == the constant offset everywhere
    np.testing.assert_allclose(batch["chunk"] - batch["cchunk"], 0.125,
                               atol=2e-4)
    # ctxt is an independent clean crop, generally NOT the same window
    assert not np.allclose(batch["chunk_ctxt"], batch["cchunk"])


def test_metaconcat_dist_mask(corpus, tmp_path):
    """MetaConcat dist_flags -> per-sample dist_mask in the batch
    (per-corpus distortion stacks, run_pase_libri_ami_ihm_sdm.sh)."""
    import json as _json
    from pase_tpu.data.dataset import (LibriSpeechTupleDataset,
                                       MetaConcatDataset, ChunkBatcher)
    from pase_tpu.data.io import write_wav
    root, cfg = corpus
    # second corpus: constant-sign wavs so provenance is identifiable
    d2root = tmp_path / "d2"
    d2root.mkdir()
    files = []
    for i in range(3):
        f = f"90{i}-00000-0000.wav"
        write_wav(str(d2root / f),
                  np.full(8000, -0.25, np.float32))
        files.append({"filename": f})
    with open(d2root / "d2.cfg", "w") as fh:
        _json.dump({"speakers": ["900", "901", "902"],
                    "train": {"data": files, "total_wav_dur": 24000,
                              "speakers": ["900", "901", "902"]}}, fh)
    d1 = LibriSpeechTupleDataset(root, cfg, "train")
    d2 = LibriSpeechTupleDataset(str(d2root), str(d2root / "d2.cfg"),
                                 "train")
    meta = MetaConcatDataset([d1, d2], dist_flags=[True, False])
    bt = ChunkBatcher(meta, 16, 4000, seed=3)
    batch = bt._make_batch()
    assert "dist_mask" in batch and batch["dist_mask"].shape == (16,)
    for i in range(16):
        from_d2 = np.allclose(batch["chunk"][i], -0.25, atol=1e-3)
        assert batch["dist_mask"][i] == (0.0 if from_d2 else 1.0)
    assert 0.0 < batch["dist_mask"].mean() < 1.0  # both corpora sampled


def test_prepare_respects_dist_mask_and_parallel_cchunk():
    """prepare(): masked samples keep the undistorted chunk + zero
    overlap label; an explicit batch cchunk feeds the worker targets."""
    import jax
    import jax.numpy as jnp
    from pase_tpu.data.pipeline import make_prepare_fn
    from pase_tpu.data.distortions import DistortionConfig, DistortionAssets
    from pase_tpu.model import parse_workers_cfg
    meta = parse_workers_cfg(
        {"regr": [{"num_outputs": 39, "hidden_size": 8, "name": "mfcc",
                   "r": 1, "loss": "MSELoss", "hidden_layers": 1}],
         "cls": [{"num_outputs": 1, "hidden_size": 8, "name": "overlap",
                  "loss": "BCEWithLogitsLoss", "hidden_layers": 1}]})
    rng = np.random.RandomState(0)
    t = 4000
    assets = DistortionAssets(
        ir_bank=None, ir_pmax=None,
        noise_bank=jnp.asarray(rng.randn(2, 2 * t).astype(np.float32)),
        overlap_bank=jnp.asarray(rng.randn(2, 2 * t).astype(np.float32)))
    cfg = DistortionConfig(noises_p=1.0, overlap_p=1.0)
    prepare = make_prepare_fn(meta, dist_cfg=cfg, assets=assets, hop=160)
    chunk = rng.randn(2, t).astype(np.float32) * 0.3
    cchunk = rng.randn(2, t).astype(np.float32) * 0.3
    batch = {"chunk": jnp.asarray(chunk),
             "chunk_ctxt": jnp.asarray(chunk),
             "chunk_rand": jnp.asarray(chunk),
             "cchunk": jnp.asarray(cchunk),
             "dist_mask": jnp.asarray([1.0, 0.0])}
    out = prepare(batch, jax.random.PRNGKey(1))
    out = jax.device_get(out)
    # sample 1 masked: untouched input + zero overlap label
    np.testing.assert_allclose(out["chunk"][1], chunk[1], atol=1e-6)
    assert np.all(out["overlap"][1] == 0)
    # sample 0 distorted (noise at p=1 must change the signal)
    assert not np.allclose(out["chunk"][0], chunk[0])
    # targets come from the EXPLICIT clean channel
    from pase_tpu.ops.features import feature_fn_for_worker
    ref = np.asarray(feature_fn_for_worker("mfcc", None, hop=160)(
        jnp.asarray(cchunk)))
    np.testing.assert_allclose(np.asarray(out["mfcc"]), ref, atol=1e-5)
    np.testing.assert_allclose(out["cchunk"], cchunk, atol=1e-6)


# ---------------------------------------------------------------------------
# Device-resident corpus (pase_tpu/data/device_corpus.py)
# ---------------------------------------------------------------------------

def test_device_corpus_gather_exact(corpus):
    """Rows gathered from the HBM int16 buffer must EXACTLY equal the
    host crop of the same window: PCM-sourced wavs live on the k/32768
    grid, so quantize->dequantize is the identity."""
    from pase_tpu.data.device_corpus import DeviceCorpusBatcher
    from pase_tpu.data.dataset import crop_at

    root, cfg = corpus
    ds = LibriSpeechTupleDataset(root, cfg, "train")
    wavs_by_name = {w["filename"]: read_wav(os.path.join(root,
                                                         w["filename"]))[0]
                    for w in ds.wavs}
    t = 8000
    b = DeviceCorpusBatcher(ds, batch_size=4, chunk_size=t, seed=5)
    batch = next(iter(b))
    assert set(batch) == {"chunk", "chunk_ctxt", "chunk_rand"}
    for k in batch:
        assert batch[k].shape == (4, t)
    # reproduce the same index stream and compare against host crops
    b2 = DeviceCorpusBatcher(ds, batch_size=4, chunk_size=t, seed=5)
    starts = b2._sample_starts()
    got = np.asarray(batch["chunk"])
    for j in range(4):
        abs_beg = int(starts[0, j])
        # find which utterance owns this absolute offset
        i = int(np.searchsorted(b2.offsets, abs_beg, side="right") - 1)
        beg = abs_beg - int(b2.offsets[i])
        wav = wavs_by_name[ds.wavs[i]["filename"]]
        want = crop_at(wav, beg, t) if len(wav) >= t else crop_at(
            wav, 0, t)
        np.testing.assert_array_equal(
            got[j], np.clip(want * 32768, -32768, 32767).astype(
                np.int16).astype(np.float32) / 32768, err_msg=str(j))
        # PCM grid: the quantization round-trip is the identity
        np.testing.assert_allclose(got[j], want, atol=1.0 / 32768)


def test_device_corpus_sampling_semantics(corpus):
    """ctxt indices are same-prefix neighbors; rand never equals the
    anchor; begs stay inside each utterance."""
    from pase_tpu.data.device_corpus import DeviceCorpusBatcher

    root, cfg = corpus
    ds = LibriSpeechTupleDataset(root, cfg, "train")
    b = DeviceCorpusBatcher(ds, batch_size=64, chunk_size=4000, seed=1)
    s = b._sample_starts()

    def owner(abs_beg):
        return int(np.searchsorted(b.offsets, abs_beg, side="right") - 1)

    for j in range(64):
        i, c, r = (owner(int(s[k, j])) for k in range(3))
        assert r != i
        assert c in b.neighbors[i]
        for k, u in zip(range(3), (i, c, r)):
            off = int(s[k, j]) - int(b.offsets[u])
            assert 0 <= off <= int(b.lengths[u]) - 4000


def test_device_corpus_parallel_trees(corpus, tmp_path):
    """Parallel (clean/noisy) device corpus: two HBM buffers; chunk and
    cchunk share ONE window offset across the trees (host
    ChunkBatcher/crop_at semantics); ctxt is an independent CLEAN crop
    of the same utterance; rand comes from the noisy tree."""
    from pase_tpu.data.device_corpus import DeviceCorpusBatcher
    from pase_tpu.data.dataset import GenhancementDataset

    root, cfg = corpus
    clean = tmp_path / "clean"
    noisy = tmp_path / "noisy"
    clean.mkdir()
    noisy.mkdir()
    for f in os.listdir(root):
        if not f.endswith(".wav"):
            continue
        w, _ = read_wav(os.path.join(root, f))
        write_wav(str(clean / f), w)
        write_wav(str(noisy / f), w + 0.125)   # known additive "noise"
    ds = GenhancementDataset(str(noisy), str(clean), cfg, "train")
    t = 4000
    b = DeviceCorpusBatcher(ds, batch_size=8, chunk_size=t, seed=7)
    batch = next(iter(b))
    assert set(batch) == {"chunk", "cchunk", "chunk_ctxt", "chunk_rand"}
    for k in batch:
        assert batch[k].shape == (8, t)
    # exact alignment: noisy - clean == the constant offset everywhere
    np.testing.assert_allclose(
        np.asarray(batch["chunk"]) - np.asarray(batch["cchunk"]), 0.125,
        atol=2e-4)
    # ctxt is an independent clean crop, generally NOT the cchunk window
    assert not np.allclose(np.asarray(batch["chunk_ctxt"]),
                           np.asarray(batch["cchunk"]))

    # index semantics on a fresh same-seed batcher
    b2 = DeviceCorpusBatcher(ds, batch_size=8, chunk_size=t, seed=7)
    s = b2._sample_starts()                      # [4, B]
    assert s.shape[0] == 4
    for j in range(8):
        i = int(np.searchsorted(b2.offsets, int(s[0, j]),
                                side="right") - 1)
        ci = int(np.searchsorted(b2.coffsets, int(s[1, j]),
                                 side="right") - 1)
        assert ci == i                           # same utterance
        # shared relative window offset across the two trees
        assert int(s[0, j]) - int(b2.offsets[i]) == \
            int(s[1, j]) - int(b2.coffsets[ci])
        # ctxt: same utterance, clean tree
        cti = int(np.searchsorted(b2.coffsets, int(s[2, j]),
                                  side="right") - 1)
        assert cti == i
        # rand: different utterance, noisy tree
        ri = int(np.searchsorted(b2.offsets, int(s[3, j]),
                                 side="right") - 1)
        assert ri != i


def test_sharded_device_corpus(tmp_path):
    """Corpus sharded over the mesh data axis (shard_map sampling):
    every gathered row must exactly equal the host crop of the
    utterance named by the returned (local id, rel offset); row block d
    draws only from shard d; ctxt shares the anchor's prefix; rand
    differs from the anchor; the output batch is laid out in
    batch_sharding (data-axis) form."""
    import jax
    from pase_tpu.parallel.mesh import get_mesh
    from pase_tpu.data.device_corpus import ShardedDeviceCorpusBatcher
    from pase_tpu.data.dataset import crop_at

    rng = np.random.RandomState(0)
    names = []
    for g in range(16):                       # 16 prefix groups x 2 utts
        for u in range(2):
            nm = f"{100 + g}-7-{u:04d}.wav"
            write_wav(str(tmp_path / nm),
                      rng.randn(6000).astype(np.float32) * 0.2)
            names.append(nm)
    cfg = {"train": {"data": [{"filename": n} for n in names],
                     "total_wav_dur": 6000 * len(names)}}
    cfg_p = str(tmp_path / "cfg.json")
    with open(cfg_p, "w") as f:
        json.dump(cfg, f)
    ds = LibriSpeechTupleDataset(str(tmp_path), cfg_p, "train")
    wavs = {n: read_wav(str(tmp_path / n))[0] for n in names}

    mesh = get_mesh()                          # 8 x 1 CPU mesh
    D = mesh.shape["data"]
    t, B = 4000, 16
    b = ShardedDeviceCorpusBatcher(ds, batch_size=B, chunk_size=t,
                                   mesh=mesh, seed=2)
    assert b.n_shards == D
    # partition: every utterance appears exactly once, groups whole
    allocated = [n for files in b.shard_names for n in files]
    assert sorted(allocated) == sorted(names)
    for files in b.shard_names:
        fs = set(files)
        for n in files:
            pref = ds.rec.sub("", n)
            assert all(s in fs for s in ds.neighbor_prefixes[pref])

    batch = next(iter(b))
    ids = np.asarray(jax.device_get(b.last_ids))     # [B, 3]
    rel = np.asarray(jax.device_get(b.last_rel))     # [B, 3]
    bl = B // D
    # output layout: the batch is sharded over all data-axis devices
    assert len(batch["chunk"].sharding.device_set) == D
    keys = ("chunk", "chunk_ctxt", "chunk_rand")
    for j in range(B):
        d = j // bl                                  # owning shard
        files = b.shard_names[d]
        a_n, c_n, r_n = (files[ids[j, k]] for k in range(3))
        assert ds.rec.sub("", c_n) == ds.rec.sub("", a_n)
        assert c_n != a_n                            # 2-utt groups
        assert r_n != a_n
        for k, nm in enumerate((a_n, c_n, r_n)):
            want = crop_at(wavs[nm], int(rel[j, k]), t)
            got = np.asarray(jax.device_get(batch[keys[k]][j]))
            np.testing.assert_allclose(got, want, atol=1.0 / 32768,
                                       err_msg=f"row {j} {keys[k]}")

    # too few prefix groups for the mesh -> loud error
    small = {"train": {"data": [{"filename": n} for n in names[:4]],
                       "total_wav_dur": 6000 * 4}}
    small_p = str(tmp_path / "small.json")
    with open(small_p, "w") as f:
        json.dump(small, f)
    ds2 = LibriSpeechTupleDataset(str(tmp_path), small_p, "train")
    with pytest.raises(ValueError, match="prefix groups"):
        ShardedDeviceCorpusBatcher(ds2, batch_size=B, chunk_size=t,
                                   mesh=mesh, seed=2)


def test_sharded_device_corpus_parallel(tmp_path):
    """Sharded PARALLEL (clean/noisy) corpus: both trees sharded over
    the mesh; chunk/cchunk share one window (verified exactly via the
    returned ids/rels), ctxt is an independent clean crop of the same
    utterance, rand is a noisy other."""
    import jax
    from pase_tpu.parallel.mesh import get_mesh
    from pase_tpu.data.device_corpus import ShardedDeviceCorpusBatcher
    from pase_tpu.data.dataset import GenhancementDataset, crop_at

    rng = np.random.RandomState(6)
    noisy = tmp_path / "noisy"
    clean = tmp_path / "clean"
    noisy.mkdir()
    clean.mkdir()
    names = []
    for g in range(16):
        for u in range(2):
            nm = f"{500 + g}-2-{u:04d}.wav"
            # keep |w + 0.125| < 1: write_wav clips, which would break
            # the constant noisy-clean offset at extreme samples
            w = rng.randn(6000).astype(np.float32) * 0.1
            write_wav(str(clean / nm), w)
            write_wav(str(noisy / nm), w + 0.125)
            names.append(nm)
    cfg = {"train": {"data": [{"filename": n} for n in names],
                     "total_wav_dur": 6000 * len(names)}}
    cfg_p = str(tmp_path / "cfg.json")
    with open(cfg_p, "w") as f:
        json.dump(cfg, f)
    ds = GenhancementDataset(str(noisy), str(clean), cfg_p, "train")
    nwavs = {n: read_wav(str(noisy / n))[0] for n in names}
    cwavs = {n: read_wav(str(clean / n))[0] for n in names}

    mesh = get_mesh()
    D = mesh.shape["data"]
    t, B = 4000, 16
    b = ShardedDeviceCorpusBatcher(ds, batch_size=B, chunk_size=t,
                                   mesh=mesh, seed=5)
    assert b.parallel
    batch = next(iter(b))
    assert set(batch) == {"chunk", "cchunk", "chunk_ctxt", "chunk_rand"}
    ids = np.asarray(jax.device_get(b.last_ids))    # [B, 3]
    rel = np.asarray(jax.device_get(b.last_rel))    # [B, 3]
    bl = B // D
    np.testing.assert_allclose(
        np.asarray(jax.device_get(batch["chunk"]))
        - np.asarray(jax.device_get(batch["cchunk"])), 0.125, atol=2e-4)
    for j in range(B):
        d = j // bl
        files = b.shard_names[d]
        a_n, c_n, r_n = (files[ids[j, k]] for k in range(3))
        assert c_n == a_n                     # cchunk/ctxt: same utt
        assert r_n != a_n                     # rand: other utt
        checks = [("chunk", nwavs[a_n], rel[j, 0]),
                  ("cchunk", cwavs[a_n], rel[j, 0]),   # SHARED window
                  ("chunk_ctxt", cwavs[a_n], rel[j, 1]),
                  ("chunk_rand", nwavs[r_n], rel[j, 2])]
        for key, wav, r0 in checks:
            want = crop_at(wav, int(r0), t)
            got = np.asarray(jax.device_get(batch[key][j]))
            np.testing.assert_allclose(got, want, atol=1.0 / 32768,
                                       err_msg=f"row {j} {key}")


def test_device_corpus_short_utterance_pad(tmp_path):
    """Utterances shorter than the chunk are padded ONCE at build with
    crop_chunk's reflect-tail semantics."""
    from pase_tpu.data.device_corpus import DeviceCorpusBatcher
    from pase_tpu.data.dataset import crop_at

    rng = np.random.RandomState(3)
    sig = rng.randn(3000).astype(np.float32) * 0.2
    write_wav(str(tmp_path / "9-9-0001.wav"), sig)
    cfg = {"train": {"data": [{"filename": "9-9-0001.wav"}],
                     "total_wav_dur": 3000}}
    cfg_p = str(tmp_path / "cfg.json")
    with open(cfg_p, "w") as f:
        json.dump(cfg, f)
    ds = LibriSpeechTupleDataset(str(tmp_path), cfg_p, "train")
    t = 8000
    b = DeviceCorpusBatcher(ds, batch_size=2, chunk_size=t, seed=0)
    row = np.asarray(next(iter(b))["chunk"][0])
    wav = read_wav(str(tmp_path / "9-9-0001.wav"))[0]
    want = crop_at(wav, 0, t)
    np.testing.assert_allclose(row, want, atol=1.0 / 32768)
