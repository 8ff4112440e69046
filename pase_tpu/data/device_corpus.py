"""Device-resident corpus: the whole training set lives in HBM as one
int16 buffer; the host ships only crop INDICES per step.

TPU-native answer to the reference's DataLoader feed (reference hot
loop train.py:278-281 consumes host-cropped tuples): on this image the
host->device link is the measured bottleneck of disk-fed training
(~55 MB/s over the axon tunnel; 3 x [32, 32000] f32 waveforms = 12.3 MB
per step ~ 220 ms, vs a 72 ms train step).  PCM16 audio is 2 bytes per
sample, so even the BASELINE 50 h-LibriSpeech workload is 5.76 GB — it
fits in a single v5e chip's 16 GB HBM next to the model.  Uploading the
corpus ONCE and gathering crops on device turns the per-step wire into
[B, 3] int32 start indices (microseconds) and makes disk-fed training
run at the synthetic (device-generated) rate.

Semantics preserved from the host path (data/dataset.py):
  * tuple sampling — chunk from utterance i, chunk_ctxt from a random
    same-prefix neighbor, chunk_rand from a random OTHER utterance
    (LibriSpeechTupleDataset.sample_tuple; reference dataset.py
    LibriSpeechSegTupleWavDataset);
  * random crop offsets per epoch (crop_chunk), with short utterances
    reflect-tail/tile padded — applied ONCE at buffer build (a short
    utterance yields the same padded chunk every epoch in the host path
    too, since crop_chunk always starts it at 0);
  * int16 quantization is LOSSLESS for PCM-sourced wavs (read_wav
    divides the original int16 sample by 32768; v*32768 restores it).

Documented deviations:
  * the RandomState consumption ORDER differs from ChunkBatcher (indices
    are vector-sampled), so a given seed yields a different (equally
    distributed) crop sequence;
  * zero-speech injection draws from a pre-built bank of
    near-silent utterances instead of fresh noise per draw — and 1e-5
    amplitude noise quantizes to exact silence on the int16 grid (the
    same caveat as train.py --wire_dtype int16).

Not supported (host path covers these): parallel clean/noisy corpora
(cchunk trees), MetaConcat multi-corpus dist masks, host-stage
distortions (codec2/whisperize need host arrays), --cache_feats_dir.

Scale limit: int32 gather indices cap one buffer at 2^31 samples
(~37 h at 16 kHz) per process; larger corpora belong on >= 2 hosts
with per-host data_cfg slices (a 50 h corpus across 2 hosts is 25 h
per buffer).  The build raises past the cap.
"""

import numpy as np

__all__ = ["DeviceCorpusBatcher"]


class DeviceCorpusBatcher:
    """Iterates dicts of DEVICE [B, T] f32 arrays gathered from an HBM
    int16 corpus buffer; duck-compatible with ChunkBatcher (bpe attr).

    Parameters
    ----------
    dataset : LibriSpeechTupleDataset
        Provides wavs, neighbor_prefixes and _load (host wav cache is
        released after the buffer is built).
    """

    def __init__(self, dataset, batch_size: int, chunk_size: int,
                 seed: int = 0, zero_speech_bank: int = 16):
        import jax
        import jax.numpy as jnp
        from pase_tpu.data.dataset import crop_at, zerospeech

        self.batch_size = batch_size
        self.chunk_size = chunk_size
        self.rng = np.random.RandomState(seed + 77)
        self.bpe = max(
            (dataset.total_wav_dur // chunk_size) // batch_size, 1)
        self.zero_speech_p = getattr(dataset, "zero_speech_p", 0.0)

        # ---- host-side index tables --------------------------------------
        names = [w["filename"] for w in dataset.wavs]
        n = len(names)
        name_pos = {f: i for i, f in enumerate(names)}
        # neighbors[i] = utterance indices sharing i's filename prefix
        # (excluding i); empty -> ctxt falls back to i itself
        self.neighbors = []
        for i, f in enumerate(names):
            prefix = dataset.rec.sub("", f)
            sibs = [name_pos[s] for s in dataset.neighbor_prefixes[prefix]
                    if s != f]
            self.neighbors.append(np.asarray(sibs if sibs else [i],
                                             dtype=np.int64))

        # ---- build the int16 HBM buffer ----------------------------------
        offsets = np.empty(n, dtype=np.int64)
        lengths = np.empty(n, dtype=np.int64)
        parts = []
        pos = 0
        for i, f in enumerate(names):
            wav = dataset._load(f)
            if len(wav) < chunk_size:  # pad once, crop_chunk semantics
                wav = crop_at(wav, 0, chunk_size)
            dataset.wav_cache.pop(f, None)  # buffer replaces host cache
            pcm = np.clip(wav * 32768.0, -32768, 32767).astype(np.int16)
            offsets[i] = pos
            lengths[i] = len(pcm)
            parts.append(pcm)
            pos += len(pcm)
        if self.zero_speech_p > 0:
            zs_rng = np.random.RandomState(seed + 911)
            self._zs_ids = np.arange(n, n + zero_speech_bank)
            for _ in range(zero_speech_bank):
                pcm = np.clip(
                    zerospeech(max(int(5 * 16e3), chunk_size), zs_rng)
                    * 32768.0, -32768, 32767).astype(np.int16)
                offsets = np.append(offsets, pos)
                lengths = np.append(lengths, len(pcm))
                parts.append(pcm)
                pos += len(pcm)
        if pos >= 1 << 31:
            raise ValueError(
                f"device corpus is {pos} samples (> 2^31, the int32 "
                "gather-index cap, ~37 h at 16 kHz); split the corpus "
                "across hosts (per-host data_cfg) for --device_corpus")
        buf = np.concatenate(parts)
        parts.clear()
        self.offsets, self.lengths = offsets, lengths
        self.n_utts = n
        self.buf = jax.device_put(jnp.asarray(buf))
        self.buf_gb = buf.nbytes / 1e9
        del buf

        t = chunk_size

        def gather(buf, starts):
            # [B, T] rows from flat PCM at per-row offsets. MUST be a
            # vmapped dynamic_slice, not fancy indexing: buf[starts[:,
            # None] + arange(T)] lowers to a generic per-element gather
            # (measured 68 ms for 96 x 32000 on v5e), while the slice
            # form lowers to B contiguous row DMAs (1.6 ms, ~dispatch
            # floor) — HBM-bandwidth bound as intended
            rows = jax.vmap(
                lambda s: jax.lax.dynamic_slice(buf, (s,), (t,)))(starts)
            return rows.astype(jnp.float32) / 32768.0

        self._gather = jax.jit(gather)

    # ---- host-side index sampling ---------------------------------------
    def _sample_starts(self):
        b, t = self.batch_size, self.chunk_size
        rng = self.rng
        idx = rng.randint(0, self.n_utts, size=b)
        if self.zero_speech_p > 0:
            zs = rng.rand(b) < self.zero_speech_p
            idx = np.where(
                zs, self._zs_ids[rng.randint(0, len(self._zs_ids),
                                             size=b)], idx)
        ctxt = np.empty(b, dtype=np.int64)
        for j, i in enumerate(idx):
            nb = self.neighbors[i] if i < self.n_utts else \
                np.asarray([i])
            ctxt[j] = nb[rng.randint(0, len(nb))]
        if self.n_utts > 1:
            rand = rng.randint(0, self.n_utts - 1, size=b)
            rand = np.where(rand >= idx, rand + 1, rand)
        else:
            rand = np.zeros(b, dtype=np.int64)

        def beg(ids):
            span = np.maximum(self.lengths[ids] - t, 0)
            r = rng.randint(0, 1 << 30, size=len(ids))
            return self.offsets[ids] + np.where(span > 0, r % (span + 1),
                                                0)

        return np.stack([beg(idx), beg(ctxt), beg(rand)]).astype(np.int32)

    def __iter__(self):
        import jax.numpy as jnp
        b = self.batch_size
        while True:
            s = self._sample_starts()           # [3, B] int32 — the wire
            rows = self._gather(self.buf, jnp.asarray(s.reshape(-1)))
            yield {"chunk": rows[:b],
                   "chunk_ctxt": rows[b:2 * b],
                   "chunk_rand": rows[2 * b:]}
