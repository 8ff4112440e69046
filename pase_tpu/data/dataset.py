"""Host-side dataset: file lists, tuple sampling, chunk cropping, batching.

The heavy per-sample work of the reference pipeline (feature extraction,
distortions) moved on-device (pase_tpu.data.pipeline); the host only reads
wavs, samples the (current, neighbor, random) utterance tuple, and crops
fixed-size chunks — replicating the sampling semantics of
LibriSpeechSegTupleWavDataset (/root/reference/pase/dataset.py:428-513)
and SingleChunk/MIChunkWav (transforms.py:295-436; norm_and_scale happens
on device).

'Epoch' follows the reference bpe convention: total_wav_dur // chunk_size
// batch_size random chunks (train.py:283-297).
"""

import json
import os
import re
import threading
import queue as queue_mod
from typing import Dict, Iterator, List, Optional

import numpy as np

from pase_tpu.data.io import read_wav, load_data_cfg


def zerospeech(n_samples: int, rng) -> np.ndarray:
    """Near-silent synthetic sample (pase/utils.py:208-210)."""
    return (rng.randn(n_samples) * 1e-5).astype(np.float32)


class LibriSpeechTupleDataset:
    """Samples (raw, raw_ctxt, raw_rand) wav tuples per the reference's
    filename-prefix neighboring scheme."""

    def __init__(self, data_root: str, data_cfg_file: str, split: str,
                 preload_wav: bool = False, cache_on_load: bool = True,
                 zero_speech_p: float = 0.0, seed: int = 0):
        self.data_root = data_root
        self.split = split
        self.zero_speech_p = zero_speech_p
        cfg = load_data_cfg(data_cfg_file)
        self.wavs = cfg[split]["data"]
        self.total_wav_dur = int(cfg[split]["total_wav_dur"])
        self.spk_info = cfg.get("speakers", [])
        self.rng = np.random.RandomState(seed)
        self.cache_on_load = cache_on_load
        self.wav_cache: Dict[str, np.ndarray] = {}
        self.rec = re.compile(r"(\d+).wav")
        self.neighbor_prefixes: Dict[str, List[str]] = {}
        for wav in self.wavs:
            fname = wav["filename"]
            prefix = self.rec.sub("", fname)
            self.neighbor_prefixes.setdefault(prefix, []).append(fname)

    def __len__(self):
        return len(self.wavs)

    def _load(self, fname: str) -> np.ndarray:
        if fname in self.wav_cache:
            return self.wav_cache[fname]
        wav, _ = read_wav(os.path.join(self.data_root, fname))
        if self.cache_on_load:
            self.wav_cache[fname] = wav
        return wav

    def sample_tuple(self, index: int, rng=None, info=None):
        """rng: optional caller-owned RandomState. Threaded batchers MUST
        pass their per-thread RNG — the dataset's own self.rng is a
        single-consumer fallback, not thread-safe (wav_cache writes are
        GIL-atomic dict assignments; a duplicate load is benign).

        info: optional dict the dataset annotates with per-sample facts;
        currently {'zs': bool} — whether this draw was a zero-speech
        injection (the batcher turns it into the batch's zs_mask so the
        device pipeline can skip distortions and apply the zero-speech
        additive on exactly those rows, reference dataset.py:525-531)."""
        rng = self.rng if rng is None else rng
        if rng.rand() < self.zero_speech_p:
            if info is not None:
                info["zs"] = True
            wav = zerospeech(int(5 * 16e3), rng)
            cwav = wav
        else:
            uttname = self.wavs[index]["filename"]
            wav = self._load(uttname)
            prefix = self.rec.sub("", uttname)
            neighbors = [n for n in self.neighbor_prefixes[prefix]
                         if n != uttname]
            cwav = self._load(rng.choice(neighbors)) if neighbors else wav
        rindex = rng.randint(len(self.wavs) - 1)
        if rindex >= index:
            rindex += 1
        rwav = self._load(self.wavs[rindex]["filename"])
        return wav, cwav, rwav


def crop_at(wav: np.ndarray, beg: int, chunk_size: int) -> np.ndarray:
    """Chunk at a FIXED offset with the short-utterance pad semantics of
    crop_chunk (reflect tail / tile) — used to slice parallel noisy and
    clean recordings at one shared window."""
    if len(wav) <= chunk_size:
        p = chunk_size - len(wav)
        if len(wav) == 0:
            return np.zeros(chunk_size, dtype=np.float32)
        if p == 0:
            return wav.astype(np.float32)
        if p < len(wav):
            return np.concatenate([wav, wav[-2:-2 - p:-1]]).astype(np.float32)
        reps = int(np.ceil(chunk_size / len(wav)))
        return np.tile(wav, reps)[:chunk_size].astype(np.float32)
    beg = min(beg, len(wav) - chunk_size)
    return wav[beg:beg + chunk_size]


def crop_chunk(wav: np.ndarray, chunk_size: int, rng) -> np.ndarray:
    """Random chunk crop with reflect pad for short utterances
    (SingleChunkWav.select_chunk, transforms.py:309-356)."""
    if len(wav) > chunk_size:
        return crop_at(wav, rng.randint(0, len(wav) - chunk_size),
                       chunk_size)
    return crop_at(wav, 0, chunk_size)


class ChunkBatcher:
    """Iterates [B] batches of raw chunk triplets as numpy arrays, with a
    background prefetch thread (replaces DataLoader workers)."""

    def __init__(self, dataset: LibriSpeechTupleDataset, batch_size: int,
                 chunk_size: int, seed: int = 0, prefetch: int = 4):
        self.ds = dataset
        self.batch_size = batch_size
        self.chunk_size = chunk_size
        self.rng = np.random.RandomState(seed + 77)
        self.prefetch = prefetch
        self.bpe = max((dataset.total_wav_dur // chunk_size) // batch_size, 1)

    def _make_batch(self):
        b, t = self.batch_size, self.chunk_size
        ds = self.ds
        chunk = np.empty((b, t), dtype=np.float32)
        ctxt = np.empty((b, t), dtype=np.float32)
        rand = np.empty((b, t), dtype=np.float32)
        masked = getattr(ds, "dist_flags", None) is not None
        mask = np.ones((b,), dtype=np.float32) if masked else None
        subsets = getattr(ds, "datasets", None)
        # zero-speech rows carry a zs_mask so the device pipeline can
        # (a) skip the distortion stack on them and (b) apply the
        # optional zero-speech additive — the reference's per-sample
        # ZERO_SPEECH branch (dataset.py:525-531)
        zs_on = any(getattr(d, "zero_speech_p", 0.0) > 0
                    for d in (subsets or [ds]))
        zs_mask = np.zeros((b,), dtype=np.float32) if zs_on else None
        any_parallel = (any(getattr(d, "parallel", False)
                            for d in subsets) if subsets
                        else getattr(ds, "parallel", False))
        cchunk = np.empty((b, t), dtype=np.float32) if any_parallel \
            else None
        for i in range(b):
            idx = self.rng.randint(len(ds))
            sub = ds.datasets[ds._locate(idx)[0]] if subsets else ds
            # only pass info when zs is on: duck-typed dataset stand-ins
            # without the info kwarg keep working
            if zs_on:
                info = {}
                tup = ds.sample_tuple(idx, self.rng, info)
                if info.get("zs"):
                    zs_mask[i] = 1.0
            else:
                tup = ds.sample_tuple(idx, self.rng)
            wav, cwav, rwav = tup[:3]
            # optional 4th element: a dedicated contrastive-context
            # source (AMI channel-key mode returns the neighbor's SDM
            # channel here); default is the clean/neighbor wav
            ctxt_src = tup[3] if len(tup) > 3 else cwav
            if getattr(sub, "parallel", False):
                # parallel clean/noisy: one shared window for chunk and
                # cchunk (reference GenhancementDataset semantics); the
                # contrastive ctxt is an independent crop
                beg = (self.rng.randint(0, len(wav) - t)
                       if len(wav) > t else 0)
                chunk[i] = crop_at(wav, beg, t)
                cchunk[i] = crop_at(cwav, beg, t)
                ctxt[i] = crop_chunk(ctxt_src, t, self.rng)
            else:
                chunk[i] = crop_chunk(wav, t, self.rng)
                ctxt[i] = crop_chunk(ctxt_src, t, self.rng)
                if cchunk is not None:
                    cchunk[i] = chunk[i]
            rand[i] = crop_chunk(rwav, t, self.rng)
            if masked:
                mask[i] = ds.dist_mask_of(idx)
        out = {"chunk": chunk, "chunk_ctxt": ctxt, "chunk_rand": rand}
        if cchunk is not None:
            out["cchunk"] = cchunk
        if masked:
            out["dist_mask"] = mask
        if zs_mask is not None:
            out["zs_mask"] = zs_mask
        return out

    def __iter__(self) -> Iterator[dict]:
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    batch = self._make_batch()
                except BaseException as e:   # noqa: BLE001
                    # propagate to the consumer — a silently-dead
                    # producer would block q.get() forever
                    batch = ("__producer_error__", e)
                # bounded put that re-checks stop: a producer blocked on a
                # full queue must exit when the consumer goes away, or
                # repeated iter() leaks a thread per epoch loop
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.25)
                        break
                    except queue_mod.Full:
                        continue
                if isinstance(batch, tuple):
                    return

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, tuple) and len(item) == 2 and \
                        item[0] == "__producer_error__":
                    raise item[1]
                yield item
        finally:
            stop.set()


class ThreadedPrefetcher:
    """Fan out batch production over N threads into one bounded queue.

    Generic replacement for the reference's DataLoader num_workers
    (train.py:278-281): ``make_iter(tid)`` must return an independent
    batch iterator per thread (own RNG seed — do not share one stateful
    iterator across threads). numpy ufuncs release the GIL, so CPU-bound
    producers (synthetic generation, wav decode, cropping) scale with
    threads. Batch order across threads is nondeterministic; per-thread
    streams are deterministic given their seeds.
    """

    def __init__(self, make_iter, n_threads: int = 4, prefetch: int = 8,
                 bpe: Optional[int] = None):
        self.make_iter = make_iter
        self.n_threads = max(1, int(n_threads))
        self.prefetch = prefetch
        if bpe is not None:
            self.bpe = bpe

    def __iter__(self) -> Iterator[dict]:
        q: queue_mod.Queue = queue_mod.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker(tid):
            try:
                it = iter(self.make_iter(tid))
            except BaseException as e:   # noqa: BLE001
                it = None
                err = e
            while not stop.is_set():
                if it is None:
                    batch = ("__producer_error__", err)
                else:
                    try:
                        batch = next(it)
                    except BaseException as e:   # noqa: BLE001
                        # propagate — if every producer died silently,
                        # the consumer's q.get() would block forever
                        batch = ("__producer_error__", e)
                while not stop.is_set():
                    try:
                        q.put(batch, timeout=0.25)
                        break
                    except queue_mod.Full:
                        continue
                if isinstance(batch, tuple):
                    return

        threads = [threading.Thread(target=worker, args=(tid,), daemon=True)
                   for tid in range(self.n_threads)]
        for th in threads:
            th.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, tuple) and len(item) == 2 and \
                        item[0] == "__producer_error__":
                    if isinstance(item[1], StopIteration):
                        return    # finite per-thread iterator drained
                    raise item[1]
                yield item
        finally:
            stop.set()


class PairWavDataset(LibriSpeechTupleDataset):
    """(current, random) pairs — no neighbor context; the MI context
    chunk falls back to the current wav (pase/dataset.py:274-330)."""

    def sample_tuple(self, index: int, rng=None, info=None):
        wav, _, rwav = super().sample_tuple(index, rng, info)
        return wav, wav, rwav


class GenhancementDataset(LibriSpeechTupleDataset):
    """Parallel noisy/clean corpora: 'chunk' from the noisy tree,
    'cchunk' from the clean tree at the SAME chunk window (dataset.py
    GenhancementDataset: reference __getitem__ chunks the clean wav
    first, then slices the noisy wav at the recorded chunk_beg/end —
    dataset.py:383-420; also covers the AMI ihm/sdm layout when
    clean_root points at the ihm channel).

    `parallel = True` tells the batcher to crop noisy and clean at one
    shared offset and emit the aligned clean as the batch's 'cchunk'
    (worker targets then come from clean audio, the denoising setup)."""

    parallel = True

    def __init__(self, data_root, clean_root, data_cfg_file, split,
                 **kwargs):
        super().__init__(data_root, data_cfg_file, split, **kwargs)
        self.clean_root = clean_root

    def _load_clean(self, fname):
        key = "clean::" + fname
        if key in self.wav_cache:
            return self.wav_cache[key]
        wav, _ = read_wav(os.path.join(self.clean_root, fname))
        if self.cache_on_load:
            self.wav_cache[key] = wav
        return wav

    def sample_tuple(self, index: int, rng=None, info=None):
        rng = self.rng if rng is None else rng
        uttname = self.wavs[index]["filename"]
        noisy = self._load(uttname)
        clean = self._load_clean(uttname)
        rindex = rng.randint(len(self.wavs) - 1)
        if rindex >= index:
            rindex += 1
        rwav = self._load(self.wavs[rindex]["filename"])
        return noisy, clean, rwav  # (chunk source, clean source, rand)


class AmiSegTupleWavDataset(GenhancementDataset):
    """AMI parallel-channel tuples (pase/dataset.py:516-650
    AmiSegTupleWavDataset). Two layouts:

    * tree mode (``ihm2sdm=None``): 'chunk' from the far-field sdm tree
      (data_root), clean 'cchunk' from the headset ihm tree
      (clean_root) at the same relative path.
    * channel-key mode (``ihm2sdm="1,3,5,7"``): cfg entries carry the
      distant-mic paths under per-channel keys (the ami-cfg builder's
      output, data/prep/unsupervised_data_cfg_ami.py) — each sample
      draws a RANDOM distant channel for chunk/rand while cchunk stays
      the close-talk 'filename'; the contrastive context is a
      same-prefix NEIGHBOR utterance in the SAME distant channel,
      falling back to the current utterance's distant channel when the
      prefix has no other segment (reference __getitem__:607-637);
      entries missing any requested channel are dropped
      (reference:547-555). Deviation: the reference mutates its cached
      neighbor list (``neighbors.remove(...)`` on the shared table,
      dataset.py:594) so each visit permanently shrinks the prefix
      pool; we sample non-destructively.
    """

    def __init__(self, data_root, clean_root, data_cfg_file, split,
                 ihm2sdm: Optional[str] = None, **kwargs):
        super().__init__(data_root, clean_root or data_root,
                         data_cfg_file, split, **kwargs)
        self.ihm2sdm = [c for c in ihm2sdm.split(",") if c] \
            if ihm2sdm else None
        if self.ihm2sdm:
            kept = [w for w in self.wavs
                    if all(c in w for c in self.ihm2sdm)]
            n_lost = len(self.wavs) - len(kept)
            if n_lost:
                print(f"AmiSegTupleWavDataset: dropped {n_lost} segments "
                      f"missing sdm channels {self.ihm2sdm}")
            self.wavs = kept
            # prefix -> cfg ENTRIES (dicts), so a neighbor can be read
            # in any requested distant channel (reference:558-565)
            self.neighbor_entries = {}
            for wav in self.wavs:
                prefix = self.rec.sub("", wav["filename"])
                self.neighbor_entries.setdefault(prefix, []).append(wav)

    def sample_tuple(self, index: int, rng=None, info=None):
        if not self.ihm2sdm:
            return super().sample_tuple(index, rng, info)
        rng = self.rng if rng is None else rng
        entry = self.wavs[index]
        # one random distant channel shared by chunk/ctxt/rand
        # (reference:612 picks idx once per sample)
        chan = self.ihm2sdm[rng.randint(len(self.ihm2sdm))]
        noisy = self._load(entry[chan])
        clean = self._load_clean(entry["filename"])
        prefix = self.rec.sub("", entry["filename"])
        neighbors = [e for e in self.neighbor_entries[prefix]
                     if e["filename"] != entry["filename"]]
        ctxt = (self._load(neighbors[rng.randint(len(neighbors))][chan])
                if neighbors else noisy)
        rindex = rng.randint(len(self.wavs) - 1)
        if rindex >= index:
            rindex += 1
        rwav = self._load(self.wavs[rindex][chan])
        return noisy, clean, rwav, ctxt


def _load_utt2class(utt2class: str) -> dict:
    """utt2class map from .json or a pickled/npy dict
    (pase/dataset.py:716-723)."""
    if utt2class.endswith(".json"):
        import json as _json
        with open(utt2class) as f:
            return _json.load(f)
    arr = np.load(utt2class, allow_pickle=True)
    return dict(arr.item() if hasattr(arr, "item") and arr.ndim == 0
                else arr.any())


def _load_split_list(split_list):
    if isinstance(split_list, list):
        return list(split_list)
    with open(split_list) as f:
        return [ln.rstrip() for ln in f if ln.strip()]


class FeatsClassDataset:
    """Precomputed-features -> class-id dataset for downstream probes
    (/root/reference/pase/dataset.py:705-751): per-utterance .npy feature
    files (stored [T, D] there, transposed on load — here NTC [T, D]
    natively), utt2class map, optional stats-pkl ZNorm."""

    def __init__(self, data_root: str, utt2class: str, split_list,
                 stats: Optional[str] = None, ext: str = "fb.npy"):
        self.data_root = data_root
        self.ext = ext
        self.utt2class = _load_utt2class(utt2class)
        self.split_list = _load_split_list(split_list)
        self.stats = None
        if stats is not None:
            import pickle
            with open(stats, "rb") as f:
                st = pickle.load(f)
            self.stats = {"mean": np.asarray(st["mean"], np.float32),
                          "std": np.asarray(st["std"], np.float32)}

    def __len__(self):
        return len(self.split_list)

    def __getitem__(self, index: int):
        item = self.split_list[index]
        bname = os.path.splitext(item)[0]
        ft = np.load(os.path.join(self.data_root,
                                  bname + "." + self.ext))
        ft = np.asarray(ft, np.float32)          # [T, D] (NTC)
        if self.stats is not None:
            ft = (ft - self.stats["mean"]) / self.stats["std"]
        return ft, int(self.utt2class[item])


class WavClassDataset:
    """Wav -> class-id dataset (pase/dataset.py:754-801): split-list of
    wav names under data_root, utt2class map, optional random chunking
    (zero-padded to chunk_size+1 first, like the reference)."""

    def __init__(self, data_root: str, utt2class: str, split_list,
                 chunk_size: Optional[int] = None, seed: int = 0):
        self.data_root = data_root
        self.utt2class = _load_utt2class(utt2class)
        self.split_list = _load_split_list(split_list)
        self.chunk_size = chunk_size
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.split_list)

    def __getitem__(self, index: int):
        from pase_tpu.data.io import read_wav
        item = self.split_list[index]
        bname = os.path.splitext(item)[0]
        wav, _ = read_wav(os.path.join(self.data_root, bname + ".wav"))
        wav = np.asarray(wav, np.float32)
        if self.chunk_size is not None:
            if len(wav) < self.chunk_size + 1:
                wav = np.concatenate(
                    [wav, np.zeros(self.chunk_size + 1 - len(wav),
                                   np.float32)])
            wav = crop_chunk(wav, self.chunk_size, self.rng)
        return wav, int(self.utt2class[item])


class MetaConcatDataset:
    """Concatenation of several tuple datasets
    (pase/dataset.py MetaWavConcatDataset).

    dist_flags: optional per-dataset bools — the reference applies each
    dataset's own distortion stack inside its DataLoader workers (e.g.
    Libri distorted + AMI sdm raw in run_pase_libri_ami_ihm_sdm.sh);
    here the on-device engine is global, so samples carry a
    `dist_mask` and the prepare fn skips distortion where it is 0."""

    def __init__(self, datasets, dist_flags=None):
        self.datasets = list(datasets)
        self.total_wav_dur = sum(d.total_wav_dur for d in self.datasets)
        self._offsets = []
        off = 0
        for d in self.datasets:
            self._offsets.append(off)
            off += len(d)
        self._len = off
        self.rec = self.datasets[0].rec
        self.wavs = [w for d in self.datasets for w in d.wavs]
        self.dist_flags = (list(dist_flags) if dist_flags is not None
                           else None)

    def __len__(self):
        return self._len

    def _locate(self, index: int):
        for i in range(len(self.datasets) - 1, -1, -1):
            if index >= self._offsets[i]:
                return i, index - self._offsets[i]
        return 0, index

    def sample_tuple(self, index: int, rng=None, info=None):
        i, sub = self._locate(index)
        return self.datasets[i].sample_tuple(sub, rng, info)

    def dist_mask_of(self, index: int) -> float:
        if self.dist_flags is None:
            return 1.0
        return 1.0 if self.dist_flags[self._locate(index)[0]] else 0.0


class FastChunkBatcher(ChunkBatcher):
    """ChunkBatcher using the native C++ decoder/cropper
    (native/wavio.cc) when available: python only samples the utterance
    tuple (current/neighbor/random); decode + random crop happen in C++
    worker threads. Falls back to the python path transparently."""

    def _make_batch(self):
        from pase_tpu.data.io import native_load_chunk_batch
        b, t = self.batch_size, self.chunk_size
        ds = self.ds
        if getattr(ds, "datasets", None) is not None or \
                getattr(ds, "parallel", False) or \
                getattr(ds, "zero_speech_p", 0.0) > 0:
            # MetaConcat / parallel-clean datasets need per-sample masks
            # or shared-offset crops the native path doesn't implement;
            # zero-speech injection needs the python sample_tuple draw
            return super()._make_batch()
        paths = []
        for _ in range(b):
            idx = self.rng.randint(len(ds))
            utt = ds.wavs[idx]["filename"]
            prefix = ds.rec.sub("", utt)
            neighbors = [n for n in ds.neighbor_prefixes[prefix] if n != utt]
            ctxt = self.rng.choice(neighbors) if neighbors else utt
            ridx = self.rng.randint(len(ds.wavs) - 1)
            if ridx >= idx:
                ridx += 1
            rand = ds.wavs[ridx]["filename"]
            paths += [os.path.join(ds.data_root, p)
                      for p in (utt, ctxt, rand)]
        out = native_load_chunk_batch(paths, t,
                                      seed=int(self.rng.randint(2 ** 31)))
        if out is None:
            return super()._make_batch()
        out = out.reshape(b, 3, t)
        return {"chunk": out[:, 0], "chunk_ctxt": out[:, 1],
                "chunk_rand": out[:, 2]}


class SyntheticChunkBatcher:
    """Deterministic synthetic raw-chunk source (tests / benchmarks).

    Mirrors the MI-tuple structure of real data: 'chunk' and 'chunk_ctxt'
    come from the same synthetic 'speaker' (shared f0/timbre, different
    noise + modulation phase); 'chunk_rand' from a different speaker —
    so the LIM/GIM contrastive task is actually learnable."""

    def __init__(self, batch_size: int, chunk_size: int, seed: int = 0,
                 bpe: int = 100):
        self.batch_size = batch_size
        self.chunk_size = chunk_size
        self.rng = np.random.RandomState(seed)
        self.bpe = bpe

    def _speechlike(self, f0, tilt, t):
        b = f0.shape[0]
        n = np.arange(t, dtype=np.float32)
        f0 = f0.astype(np.float32)
        sig = np.zeros((b, t), np.float32)
        for k in range(1, 6):
            ph = self.rng.uniform(0, 6.28, (b, 1)).astype(np.float32)
            sig += np.sin(2 * np.pi * f0 * k * n[None, :] / 16000 + ph,
                          dtype=np.float32) / (k ** tilt).astype(np.float32)
        env = 0.5 + 0.5 * np.sin(
            2 * np.pi * self.rng.uniform(1, 4, (b, 1)).astype(np.float32)
            * n[None, :] / 16000
            + self.rng.uniform(0, 6.28, (b, 1)).astype(np.float32),
            dtype=np.float32)
        noise = self.rng.randn(b, t).astype(np.float32) * 0.05
        return sig * env * np.float32(0.2) + noise

    def _make_batch(self):
        b, t = self.batch_size, self.chunk_size
        f0 = self.rng.uniform(80, 260, size=(b, 1))
        tilt = self.rng.uniform(0.7, 1.5, size=(b, 1))
        f0_rand = self.rng.uniform(80, 260, size=(b, 1))
        tilt_rand = self.rng.uniform(0.7, 1.5, size=(b, 1))
        return {"chunk": self._speechlike(f0, tilt, t),
                "chunk_ctxt": self._speechlike(f0, tilt, t),
                "chunk_rand": self._speechlike(f0_rand, tilt_rand, t)}

    def __iter__(self):
        while True:
            yield self._make_batch()


class DeviceSyntheticBatcher:
    """SyntheticChunkBatcher generated ON the accelerator (jitted
    jax.random harmonic stacks, sub-ms per batch) — keeps a synthetic
    training loop device-bound instead of host-bound (numpy ufuncs hold
    the GIL, so host-side generation cannot be threaded away). Same
    signal family as SyntheticChunkBatcher: chunk/chunk_ctxt share a
    'speaker' (f0, tilt), chunk_rand draws another, so LIM/GIM stays
    learnable."""

    def __init__(self, batch_size: int, chunk_size: int, seed: int = 0,
                 bpe: int = 100):
        import jax
        import jax.numpy as jnp
        self.batch_size = batch_size
        self.chunk_size = chunk_size
        self.bpe = bpe
        self._key = jax.random.PRNGKey(seed)
        b, t = batch_size, chunk_size

        def speechlike(key, f0, tilt):
            n = jnp.arange(t, dtype=jnp.float32)
            k_ph, k_env, k_ns = jax.random.split(key, 3)
            phases = jax.random.uniform(k_ph, (5, b, 1), maxval=6.28)
            ks = jnp.arange(1, 6, dtype=jnp.float32)[:, None, None]
            sig = jnp.sum(jnp.sin(2 * jnp.pi * f0[None] * ks * n / 16000
                                  + phases) / ks ** tilt[None], axis=0)
            ke1, ke2 = jax.random.split(k_env)
            env = 0.5 + 0.5 * jnp.sin(
                2 * jnp.pi * jax.random.uniform(ke1, (b, 1), minval=1.0,
                                                maxval=4.0) * n / 16000
                + jax.random.uniform(ke2, (b, 1), maxval=6.28))
            noise = jax.random.normal(k_ns, (b, t)) * 0.05
            return sig * env * 0.2 + noise

        def make(key):
            k_f0, k_tilt, k_f0r, k_tiltr, k1, k2, k3 = jax.random.split(
                key, 7)
            f0 = jax.random.uniform(k_f0, (b, 1), minval=80., maxval=260.)
            tilt = jax.random.uniform(k_tilt, (b, 1), minval=.7, maxval=1.5)
            f0r = jax.random.uniform(k_f0r, (b, 1), minval=80., maxval=260.)
            tiltr = jax.random.uniform(k_tiltr, (b, 1), minval=.7,
                                       maxval=1.5)
            return {"chunk": speechlike(k1, f0, tilt),
                    "chunk_ctxt": speechlike(k2, f0, tilt),
                    "chunk_rand": speechlike(k3, f0r, tiltr)}

        self._make = jax.jit(make)
        self._make_body = make               # un-jitted: fused-feed path

    def __iter__(self):
        import jax
        t = 0
        while True:
            yield self._make(jax.random.fold_in(self._key, t))
            t += 1

    # ---- fused in-graph feed (Trainer.make_fused_feed_step) --------------
    # Per-batch keys are STEP-INDEXED (fold_in(key0, t), not a split
    # chain): a run resumed at global step t draws exactly the batches
    # the uninterrupted run would have drawn, so preemption + resume is
    # bitwise-transparent to training (recipes/rehearsal.sh asserts it).
    def feed_state(self, start_step: int = 0):
        import jax.numpy as jnp
        return {"key": self._key, "t": jnp.int32(start_step)}

    def feed_fn(self, fs):
        import jax
        sub = jax.random.fold_in(fs["key"], fs["t"])
        return self._make_body(sub), dict(fs, t=fs["t"] + 1)
