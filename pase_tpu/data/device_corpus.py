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
  * index sampling runs ON DEVICE (jax.random) so the steady-state feed
    performs ZERO host->device transfers — the 384 B/step index upload
    still paid one tunnel round trip (~10 ms) per batch; the RNG stream
    therefore differs from ChunkBatcher's RandomState (equally
    distributed: uniform utterance draw, uniform same-prefix neighbor,
    uniform other-utterance, uniform in-range crop start);
  * zero-speech injection draws from a pre-built bank of
    near-silent utterances instead of fresh noise per draw — and 1e-5
    amplitude noise quantizes to exact silence on the int16 grid (the
    same caveat as train.py --wire_dtype int16).

Parallel clean/noisy corpora (GenhancementDataset / AMI tree mode,
``dataset.parallel``) are supported with a SECOND clean-tree buffer:
'chunk' and 'cchunk' share one anchor window (host ChunkBatcher
crop_at semantics), 'chunk_ctxt' is an independent clean crop of the
same utterance (GenhancementDataset.sample_tuple), 'chunk_rand' comes
from the noisy tree.  Budget doubles: 50 h noisy+clean = 11.5 GB int16.

Not supported (host path covers these): AMI channel-key mode
(--ihm2sdm multi-channel cfg entries), MetaConcat multi-corpus dist
masks, zero-speech injection on parallel corpora, host-stage
distortions (codec2/whisperize need host arrays), --cache_feats_dir.

Scale limit: int32 gather indices cap one buffer at 2^31 samples
(~37 h at 16 kHz) per process.  The build raises past the cap.  The
padded neighbor table is O(n_utts * max_siblings) int32 on device.
Past the cap — or on any multi-chip mesh — use
``ShardedDeviceCorpusBatcher`` (``--shard_device_corpus``): the corpus
is PARTITIONED over the mesh's data axis, one HBM shard per device,
shard_map samples each device's sub-batch in place, and capacity
scales linearly with chips (8 x v5e = ~300 h) with no per-step buffer
broadcast.  The sharded batcher is also the multi-process (DCN) path:
the layout comes from wav headers on every host identically, each host
decodes only the shards its devices own, and the fused feed runs as
one multi-controller SPMD program (2-process CPU test,
tests/test_multihost.py).  The single-BUFFER batcher stays
single-process (train.py guards this loudly — the staged fallback
would device_get every HBM batch back through the slow wire).
"""

import numpy as np

__all__ = ["DeviceCorpusBatcher", "ShardedDeviceCorpusBatcher"]


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
        self.bpe = max(
            (dataset.total_wav_dur // chunk_size) // batch_size, 1)
        self.zero_speech_p = getattr(dataset, "zero_speech_p", 0.0)
        self.parallel = bool(getattr(dataset, "parallel", False))
        if self.parallel and self.zero_speech_p > 0:
            raise ValueError("zero-speech injection is not supported on "
                             "parallel (clean/noisy) device corpora")

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

        # ---- build the int16 HBM buffer(s) --------------------------------
        def pack_tree(load, cache_prefix=""):
            """Pack one wav tree into (offsets, lengths, parts, pos)."""
            offs = np.empty(n, dtype=np.int64)
            lens = np.empty(n, dtype=np.int64)
            pts = []
            p = 0
            for i, f in enumerate(names):
                wav = load(f)
                if len(wav) < chunk_size:  # pad once, crop_chunk semantics
                    wav = crop_at(wav, 0, chunk_size)
                # buffer replaces the host cache
                dataset.wav_cache.pop(cache_prefix + f, None)
                pcm = np.clip(wav * 32768.0, -32768,
                              32767).astype(np.int16)
                offs[i] = p
                lens[i] = len(pcm)
                pts.append(pcm)
                p += len(pcm)
            return offs, lens, pts, p

        offsets, lengths, parts, pos = pack_tree(dataset._load)
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
                "gather-index cap, ~37 h at 16 kHz); use "
                "--shard_device_corpus to partition it over the mesh")
        buf = np.concatenate(parts)
        parts.clear()
        self.offsets, self.lengths = offsets, lengths
        self.n_utts = n
        self.buf = jax.device_put(jnp.asarray(buf))
        self.buf_gb = buf.nbytes / 1e9
        del buf
        if self.parallel:
            coffsets, clengths, cparts, cpos = pack_tree(
                dataset._load_clean, "clean::")
            if cpos >= 1 << 31:
                raise ValueError(
                    f"clean device corpus is {cpos} samples (> 2^31 "
                    "int32 gather-index cap)")
            cbuf = np.concatenate(cparts)
            cparts.clear()
            self.cbuf = jax.device_put(jnp.asarray(cbuf))
            self.buf_gb += cbuf.nbytes / 1e9
            self.coffsets, self.clengths = coffsets, clengths
            self._d_coffsets = jnp.asarray(coffsets.astype(np.int32))
            self._d_clengths = jnp.asarray(clengths.astype(np.int32))
            del cbuf

        # ---- device-side index tables ------------------------------------
        # padded neighbor matrix: nb_tab[i, j < nb_cnt[i]] are i's
        # same-prefix siblings (zero-speech rows self-neighbor)
        n_tot = len(offsets)
        max_nb = max(len(nb) for nb in self.neighbors) if n else 1
        nb_pad = np.zeros((n_tot, max_nb), dtype=np.int32)
        nb_cnt = np.ones(n_tot, dtype=np.int32)
        for i, nb in enumerate(self.neighbors):
            nb_pad[i, :len(nb)] = nb
            nb_cnt[i] = len(nb)
        for i in range(n, n_tot):
            nb_pad[i, 0] = i
        self._d_offsets = jnp.asarray(offsets.astype(np.int32))
        self._d_lengths = jnp.asarray(lengths.astype(np.int32))
        self._d_nb = jnp.asarray(nb_pad)
        self._d_cnt = jnp.asarray(nb_cnt)
        if self.zero_speech_p > 0:
            self._d_zs = jnp.asarray(self._zs_ids.astype(np.int32))
        # base key is CONSTANT; per-batch keys are fold_in(key0, step)
        # so a resumed run samples exactly the uninterrupted run's crops
        # (preemption-transparent training; recipes/rehearsal.sh)
        self._key = jax.random.PRNGKey(seed + 77)
        self._t = jnp.int32(0)

        t, b = chunk_size, batch_size
        n_utts, zs_p = self.n_utts, float(self.zero_speech_p)

        def sample_starts(key, offs, lens, nb, cnt, zs):
            """[3, B] absolute crop starts, entirely on device: anchor ~
            U(utts) (zero-speech bank w.p. zs_p), ctxt ~ U(same-prefix
            neighbors), rand ~ U(other utts), start ~ U(valid range)."""
            ks = jax.random.split(key, 6)
            idx = jax.random.randint(ks[0], (b,), 0, n_utts)
            if zs_p > 0:
                pick = jax.random.uniform(ks[1], (b,)) < zs_p
                idx = jnp.where(
                    pick, zs[jax.random.randint(ks[5], (b,), 0, len(zs))],
                    idx)
            j = jax.random.randint(ks[2], (b,), 0, 1 << 30) % cnt[idx]
            ctxt = nb[idx, j]
            if n_utts > 1:
                r = jax.random.randint(ks[3], (b,), 0, n_utts - 1)
                rand = jnp.where(r >= idx, r + 1, r)
            else:
                rand = jnp.zeros((b,), jnp.int32)
            ids = jnp.stack([idx, ctxt, rand])          # [3, B]
            span = jnp.maximum(lens[ids] - t, 0)
            r = jax.random.randint(ks[4], (3, b), 0, 1 << 30)
            return offs[ids] + jnp.where(span > 0, r % (span + 1), 0)

        def next_batch(buf, key0, step, offs, lens, nb, cnt, zs):
            sub = jax.random.fold_in(key0, step)
            starts = sample_starts(sub, offs, lens, nb, cnt,
                                   zs).reshape(-1)
            # [B, T] rows from flat PCM at per-row offsets. MUST be a
            # vmapped dynamic_slice, not fancy indexing: buf[starts[:,
            # None] + arange(T)] lowers to a generic per-element gather
            # (measured 68 ms for 96 x 32000 on v5e), while the slice
            # form lowers to B contiguous row DMAs (1.6 ms, ~dispatch
            # floor) — HBM-bandwidth bound as intended
            rows = jax.vmap(
                lambda s: jax.lax.dynamic_slice(buf, (s,), (t,)))(starts)
            return rows.astype(jnp.float32) / 32768.0, starts, step + 1

        self._next = jax.jit(next_batch)
        self._next_body = next_batch         # un-jitted: fused-feed path
        self._sample = jax.jit(sample_starts)

        if self.parallel:
            def sample_starts_par(key, offs, lens, coffs, clens):
                """[4, B] absolute starts (noisy anchor, clean anchor,
                clean ctxt, noisy rand).  chunk and cchunk share ONE
                window offset, valid in both trees (min of the two
                spans; the host path clamps the clean beg instead —
                identical when the parallel recordings have equal
                length, which the corpus builders guarantee)."""
                ks = jax.random.split(key, 4)
                idx = jax.random.randint(ks[0], (b,), 0, n_utts)
                span = jnp.maximum(
                    jnp.minimum(lens[idx], clens[idx]) - t, 0)
                r = jax.random.randint(ks[1], (b, 2), 0, 1 << 30)
                rel = jnp.where(span > 0, r[:, 0] % (span + 1), 0)
                # ctxt: independent crop of the CLEAN current utterance
                # (GenhancementDataset.sample_tuple returns clean as the
                # context source)
                cspan = jnp.maximum(clens[idx] - t, 0)
                crel = jnp.where(cspan > 0, r[:, 1] % (cspan + 1), 0)
                if n_utts > 1:
                    rr = jax.random.randint(ks[2], (b,), 0, n_utts - 1)
                    rand = jnp.where(rr >= idx, rr + 1, rr)
                else:
                    rand = jnp.zeros((b,), jnp.int32)
                rspan = jnp.maximum(lens[rand] - t, 0)
                r2 = jax.random.randint(ks[3], (b,), 0, 1 << 30)
                rrel = jnp.where(rspan > 0, r2 % (rspan + 1), 0)
                return jnp.stack([offs[idx] + rel, coffs[idx] + rel,
                                  coffs[idx] + crel, offs[rand] + rrel])

            def next_batch_par(buf, cbuf, key0, step, offs, lens, coffs,
                               clens):
                sub = jax.random.fold_in(key0, step)
                st = sample_starts_par(sub, offs, lens, coffs, clens)

                def slc(bf, starts):
                    return jax.vmap(lambda s: jax.lax.dynamic_slice(
                        bf, (s,), (t,)))(starts)

                rows = jnp.concatenate([
                    slc(buf, st[0]), slc(cbuf, st[1]),
                    slc(cbuf, st[2]), slc(buf, st[3])])
                return rows.astype(jnp.float32) / 32768.0, st, step + 1

            self._next = jax.jit(next_batch_par)
            self._next_body = next_batch_par
            self._sample = jax.jit(sample_starts_par)

    # ---- index sampling (device; host wrapper for tests) ----------------
    def _sample_starts(self):
        """[3|4, B] absolute starts for the NEXT batch (advances the
        step counter); numpy copy for inspection/tests."""
        import jax
        sub = jax.random.fold_in(self._key, self._t)
        self._t = self._t + 1
        if self.parallel:
            return np.asarray(jax.device_get(self._sample(
                sub, self._d_offsets, self._d_lengths,
                self._d_coffsets, self._d_clengths)))
        zs = self._d_zs if self.zero_speech_p > 0 else self._d_cnt
        return np.asarray(jax.device_get(self._sample(
            sub, self._d_offsets, self._d_lengths, self._d_nb,
            self._d_cnt, zs)))

    def _rows_to_batch(self, rows):
        b = self.batch_size
        if self.parallel:
            return {"chunk": rows[:b], "cchunk": rows[b:2 * b],
                    "chunk_ctxt": rows[2 * b:3 * b],
                    "chunk_rand": rows[3 * b:]}
        return {"chunk": rows[:b], "chunk_ctxt": rows[b:2 * b],
                "chunk_rand": rows[2 * b:]}

    def __iter__(self):
        while True:
            if self.parallel:
                rows, starts, self._t = self._next(
                    self.buf, self.cbuf, self._key, self._t,
                    self._d_offsets, self._d_lengths,
                    self._d_coffsets, self._d_clengths)
            else:
                zs = self._d_zs if self.zero_speech_p > 0 else self._d_cnt
                rows, starts, self._t = self._next(
                    self.buf, self._key, self._t, self._d_offsets,
                    self._d_lengths, self._d_nb, self._d_cnt, zs)
            self.last_starts = starts        # device [3|4 * B], for tests
            yield self._rows_to_batch(rows)

    # ---- fused in-graph feed (Trainer.make_fused_feed_step) --------------
    def feed_state(self, start_step: int = 0):
        """Pytree of device arrays the fused train step threads through
        (the corpus buffer rides along as a jit argument — never a
        captured constant — so it is not baked into the executable).
        ``start_step`` indexes the per-batch key derivation
        (fold_in(key0, step)): resuming a checkpointed run at global
        step N replays the exact crop sequence an uninterrupted run
        draws at steps N, N+1, ... — bitwise-transparent preemption."""
        import jax.numpy as jnp
        if self.parallel:
            return {"buf": self.buf, "cbuf": self.cbuf,
                    "key": self._key, "t": jnp.int32(start_step),
                    "offs": self._d_offsets,
                    "lens": self._d_lengths, "coffs": self._d_coffsets,
                    "clens": self._d_clengths}
        zs = self._d_zs if self.zero_speech_p > 0 else self._d_cnt
        return {"buf": self.buf, "key": self._key,
                "t": jnp.int32(start_step),
                "offs": self._d_offsets, "lens": self._d_lengths,
                "nb": self._d_nb, "cnt": self._d_cnt, "zs": zs}

    def feed_fn(self, fs):
        """Traceable: feed_state -> (raw batch, new feed_state).  Same
        sampling body and step-indexed key derivation as __iter__, so
        fused and dispatch-per-batch execution yield identical batch
        sequences."""
        if self.parallel:
            rows, _, t = self._next_body(
                fs["buf"], fs["cbuf"], fs["key"], fs["t"], fs["offs"],
                fs["lens"], fs["coffs"], fs["clens"])
        else:
            rows, _, t = self._next_body(
                fs["buf"], fs["key"], fs["t"], fs["offs"], fs["lens"],
                fs["nb"], fs["cnt"], fs["zs"])
        return self._rows_to_batch(rows), dict(fs, t=t)


class ShardedDeviceCorpusBatcher:
    """Corpus SHARDED over the mesh's 'data' axis: shard d holds 1/D of
    the utterances in its own chip's HBM, and each device samples +
    gathers its own [B/D] sub-batch in place via ``shard_map`` — so
    corpus capacity scales linearly with the mesh (D x the ~37 h int32
    single-buffer cap) and the buffer is never broadcast or resharded
    between chips.  The gathered sub-batches land exactly in
    ``batch_sharding(mesh)`` layout (row block d on shard d), so the
    fused train step consumes them with zero data motion.

    TPU-native scale-out of DeviceCorpusBatcher (reference hot loop
    /root/reference/train.py:278-281 reads host DataLoader tuples):
    where the single-buffer batcher answers "the corpus fits one chip",
    this answers "the corpus fits the POD" — 8 x v5e = ~300 h of PCM16
    audio resident in HBM with a zero-byte steady-state feed.

    Documented deviations from the single-buffer sampler:
      * the batch is STRATIFIED over shards — row block d always comes
        from shard d's utterances (a fixed seeded partition; prefix
        groups are kept whole so same-prefix neighbor sampling stays
        exact within a shard);
      * chunk_rand draws a random OTHER utterance within the same
        shard (the partition is random, so within-shard "other" is an
        unbiased sample of "other" overall);
      * zero-speech injection is not supported (single-buffer / host
        paths cover it).

    Parallel clean/noisy corpora (``dataset.parallel``) shard BOTH
    trees: a second clean row-buffer per device, chunk/cchunk at one
    shared window, ctxt an independent clean crop of the same
    utterance, rand from the noisy tree (single-buffer parallel
    semantics).

    MULTI-PROCESS (DCN) capable: the shard layout is computed from wav
    HEADER lengths on every process identically; each process decodes
    and uploads ONLY the shards its own devices hold (per-host IO and
    RAM scale down with the pod), and the fused feed runs as one
    multi-controller SPMD program (``multiprocess_ok``).
    """

    parallel = False
    multiprocess_ok = True       # fused feed is a global SPMD program
    pre_sharded = True           # __iter__ yields mesh-global arrays

    def __init__(self, dataset, batch_size: int, chunk_size: int,
                 mesh, seed: int = 0):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax import shard_map
        from pase_tpu.data.dataset import crop_at

        self.parallel = bool(getattr(dataset, "parallel", False))
        if getattr(dataset, "zero_speech_p", 0.0) > 0:
            raise ValueError("sharded device corpus does not support "
                             "zero-speech injection")
        D = int(mesh.shape["data"])
        if batch_size % D != 0:
            raise ValueError(f"batch {batch_size} not divisible by the "
                             f"data axis ({D})")
        self.batch_size = batch_size
        self.chunk_size = chunk_size
        self.mesh = mesh
        self.n_shards = D
        self.bpe = max(
            (dataset.total_wav_dur // chunk_size) // batch_size, 1)

        # ---- seeded partition: prefix groups -> D shards (greedy LPT
        # on total samples, largest group first) ---------------------------
        names = [w["filename"] for w in dataset.wavs]
        groups = {}
        for f in names:
            groups.setdefault(dataset.rec.sub("", f), []).append(f)
        glist = list(groups.values())
        if len(glist) < D:
            raise ValueError(
                f"corpus has {len(glist)} filename-prefix groups but the "
                f"mesh data axis is {D}; every shard needs at least one "
                "group (use the single-buffer --device_corpus)")
        rng = np.random.RandomState(seed + 13)
        rng.shuffle(glist)

        # header-only length probe: the partition must not decode (or
        # host-cache) the whole corpus — a 50 h corpus is 11.5 GB of
        # f32 if _load-cached here; packing below decodes each shard's
        # wavs exactly once
        import os as _os
        from pase_tpu.data.io import wav_len

        hdr_len = {}                       # one header read per file

        def _hlen(f):
            n = hdr_len.get(f)
            if n is None:
                n = hdr_len[f] = max(
                    wav_len(_os.path.join(dataset.data_root, f)),
                    chunk_size)
            return n

        sizes = [sum(_hlen(f) for f in g) for g in glist]
        order = np.argsort(sizes)[::-1]
        shard_files = [[] for _ in range(D)]
        shard_load = np.zeros(D, dtype=np.int64)
        for gi in order:
            d = int(np.argmin(shard_load))
            shard_files[d].extend(glist[gi])
            shard_load[d] += sizes[gi]

        # ---- shard layout from HEADER lengths only (no decode) ------------
        # every process computes the identical layout; audio is decoded
        # below ONLY for the shards this process's devices own
        t, b = chunk_size, batch_size
        bl = b // D
        self.shard_names = shard_files          # tests / inspection
        U = max(max(len(fl) for fl in shard_files), 1)
        NB = max((len(groups[dataset.rec.sub("", f)]) - 1
                  for fl in shard_files for f in fl), default=0)
        NB = max(NB, 1)
        offs = np.zeros((D, U), np.int32)
        lens = np.zeros((D, U), np.int32)
        nb = np.zeros((D, U, NB), np.int32)
        cnt = np.ones((D, U), np.int32)       # pad rows: cnt 1, nb 0
        nut = np.zeros(D, np.int32)
        totals = np.zeros(D, np.int64)
        for d, files in enumerate(shard_files):
            pos_of = {f: i for i, f in enumerate(files)}
            p = 0
            for i, f in enumerate(files):
                n = _hlen(f)
                offs[d, i], lens[d, i] = p, n
                p += n
                prefix = dataset.rec.sub("", f)
                sibs = [pos_of[s] for s in groups[prefix] if s != f]
                if not sibs:
                    sibs = [i]
                nb[d, i, :len(sibs)] = sibs
                cnt[d, i] = len(sibs)
            if p >= 1 << 31:
                raise ValueError(
                    f"one corpus shard is {p} samples (> 2^31 int32 "
                    "cap); increase the mesh data axis")
            nut[d] = len(files)
            totals[d] = p
        L = int(max(totals.max(), 1))
        self.offsets, self.lengths = offs.copy(), lens.copy()
        self.n_utts = nut.copy()
        self.buf_gb = D * L * 2 / 1e9

        coffs = clens = None
        if self.parallel:
            # clean-tree layout from the clean root's headers
            coffs = np.zeros((D, U), np.int32)
            clens = np.zeros((D, U), np.int32)
            ctotals = np.zeros(D, np.int64)
            for d, files in enumerate(shard_files):
                p = 0
                for i, f in enumerate(files):
                    n = max(wav_len(_os.path.join(dataset.clean_root, f)),
                            chunk_size)
                    coffs[d, i], clens[d, i] = p, n
                    p += n
                if p >= 1 << 31:
                    raise ValueError(
                        f"one CLEAN corpus shard is {p} samples "
                        "(> 2^31 int32 cap); increase the mesh data "
                        "axis")
                ctotals[d] = p
            cL = int(max(ctotals.max(), 1))
            self.coffsets, self.clengths = coffs.copy(), clens.copy()
            self.buf_gb += D * cL * 2 / 1e9

        # ---- decode + pack ONLY the shards this process owns ---------------
        bsh = NamedSharding(mesh, P("data", None))
        owned = sorted({idx[0].indices(D)[0]
                        for dev, idx in
                        bsh.addressable_devices_indices_map(
                            (D, L)).items()})
        self.owned_rows = list(owned)     # shards THIS process decoded

        def pack_rows(load, length_of, offset_of, row_len, cache_prefix):
            rows = {}
            for d in owned:
                row = np.zeros(row_len, np.int16)
                for i, f in enumerate(shard_files[d]):
                    wav = load(f)
                    if len(wav) < chunk_size:
                        wav = crop_at(wav, 0, chunk_size)
                    dataset.wav_cache.pop(cache_prefix + f, None)
                    pcm = np.clip(wav * 32768.0, -32768,
                                  32767).astype(np.int16)
                    if len(pcm) != length_of[d, i]:
                        raise ValueError(
                            f"{f}: decoded {len(pcm)} samples but the "
                            f"header said {length_of[d, i]}")
                    row[offset_of[d, i]:offset_of[d, i] + len(pcm)] = pcm
                rows[d] = row
            return rows

        row_np = pack_rows(dataset._load, lens, offs, L, "")
        crow_np = (pack_rows(dataset._load_clean, clens, coffs, cL,
                             "clean::") if self.parallel else None)

        def put(source, spec, shape, dtype):
            """Assemble a global array from per-device blocks — only
            the blocks addressable by THIS process are materialized
            (multi-process: each host decodes/ships only its shards)."""
            sh = NamedSharding(mesh, spec)
            imap = sh.addressable_devices_indices_map(shape)
            pieces = [
                jax.device_put(
                    np.ascontiguousarray(np.asarray(source(idx), dtype)),
                    dev)
                for dev, idx in imap.items()]
            return jax.make_array_from_single_device_arrays(
                shape, sh, pieces)

        def rows_of(rows):
            def get(idx):
                r0, r1, _ = idx[0].indices(D)
                return np.stack([rows[d] for d in range(r0, r1)])
            return get

        key0 = np.asarray(jax.random.PRNGKey(seed + 77))
        self._fs0 = {
            "buf": put(rows_of(row_np), P("data", None), (D, L),
                       np.int16),
            "offs": put(lambda i: offs[i], P("data", None), (D, U),
                        np.int32),
            "lens": put(lambda i: lens[i], P("data", None), (D, U),
                        np.int32),
            "nut": put(lambda i: nut[i], P("data"), (D,), np.int32),
            "key": put(lambda i: key0[i], P(), key0.shape, key0.dtype),
        }
        if self.parallel:
            self._fs0.update({
                "cbuf": put(rows_of(crow_np), P("data", None), (D, cL),
                            np.int16),
                "coffs": put(lambda i: coffs[i], P("data", None),
                             (D, U), np.int32),
                "clens": put(lambda i: clens[i], P("data", None),
                             (D, U), np.int32),
            })
            crow_np.clear()
        else:
            self._fs0.update({
                "nb": put(lambda i: nb[i], P("data", None, None),
                          (D, U, NB), np.int32),
                "cnt": put(lambda i: cnt[i], P("data", None), (D, U),
                           np.int32),
            })
        row_np.clear()

        def block(buf, offs, lens, nb, cnt, nut, key):
            """Per-shard sample + gather. Block shapes: buf [1, L],
            offs/lens/cnt [1, U], nb [1, U, NB], nut [1], key [2]."""
            d = jax.lax.axis_index("data")
            k = jax.random.fold_in(key, d)
            buf0, offs0, lens0 = buf[0], offs[0], lens[0]
            nb0, cnt0, n0 = nb[0], cnt[0], nut[0]
            ks = jax.random.split(k, 4)
            idx = jax.random.randint(ks[0], (bl,), 0, n0)
            j = jax.random.randint(ks[1], (bl,), 0, 1 << 30) % cnt0[idx]
            ctxt = nb0[idx, j]
            r = jax.random.randint(ks[2], (bl,), 0,
                                   jnp.maximum(n0 - 1, 1))
            rand = jnp.where(r >= idx, r + 1, r)
            rand = jnp.where(n0 > 1, rand, jnp.zeros_like(rand))
            ids = jnp.stack([idx, ctxt, rand])              # [3, bl]
            span = jnp.maximum(lens0[ids] - t, 0)
            rr = jax.random.randint(ks[3], (3, bl), 0, 1 << 30)
            rel = jnp.where(span > 0, rr % (span + 1), 0)
            starts = (offs0[ids] + rel).reshape(-1)
            rows = jax.vmap(lambda s: jax.lax.dynamic_slice(
                buf0, (s,), (t,)))(starts)
            rows = rows.astype(jnp.float32) / 32768.0
            # ids/rel ride along for tests ([bl, 3] -> global [B, 3])
            return (rows[:bl], rows[bl:2 * bl], rows[2 * bl:],
                    ids.T.astype(jnp.int32), rel.T.astype(jnp.int32))

        self._smapped = shard_map(
            block, mesh=mesh,
            in_specs=(P("data", None), P("data", None), P("data", None),
                      P("data", None, None), P("data", None), P("data"),
                      P()),
            out_specs=(P("data", None), P("data", None),
                       P("data", None), P("data", None),
                       P("data", None)))

        def block_par(buf, cbuf, offs, lens, coffs, clens, nut, key):
            """Parallel per-shard sample + gather: chunk/cchunk share
            one window; ctxt is an independent CLEAN crop of the same
            utterance; rand is a noisy OTHER utterance."""
            d = jax.lax.axis_index("data")
            k = jax.random.fold_in(key, d)
            buf0, cbuf0 = buf[0], cbuf[0]
            offs0, lens0 = offs[0], lens[0]
            coffs0, clens0, n0 = coffs[0], clens[0], nut[0]
            ks = jax.random.split(k, 3)
            idx = jax.random.randint(ks[0], (bl,), 0, n0)
            # one shared window, valid in both trees
            span = jnp.maximum(
                jnp.minimum(lens0[idx], clens0[idx]) - t, 0)
            r = jax.random.randint(ks[1], (bl, 2), 0, 1 << 30)
            rel = jnp.where(span > 0, r[:, 0] % (span + 1), 0)
            cspan = jnp.maximum(clens0[idx] - t, 0)
            crel = jnp.where(cspan > 0, r[:, 1] % (cspan + 1), 0)
            rr = jax.random.randint(ks[2], (bl, 2), 0, 1 << 30)
            rnd = rr[:, 0] % jnp.maximum(n0 - 1, 1)
            rand = jnp.where(rnd >= idx, rnd + 1, rnd)
            rand = jnp.where(n0 > 1, rand, jnp.zeros_like(rand))
            rspan = jnp.maximum(lens0[rand] - t, 0)
            rrel = jnp.where(rspan > 0, rr[:, 1] % (rspan + 1), 0)

            def slc(bf, starts):
                return jax.vmap(lambda s: jax.lax.dynamic_slice(
                    bf, (s,), (t,)))(starts)

            rows = jnp.concatenate([
                slc(buf0, offs0[idx] + rel),
                slc(cbuf0, coffs0[idx] + rel),
                slc(cbuf0, coffs0[idx] + crel),
                slc(buf0, offs0[rand] + rrel)])
            rows = rows.astype(jnp.float32) / 32768.0
            ids = jnp.stack([idx, idx, rand], axis=1)       # [bl, 3]
            rels = jnp.stack([rel, crel, rrel], axis=1)     # [bl, 3]
            return (rows[:bl], rows[bl:2 * bl], rows[2 * bl:3 * bl],
                    rows[3 * bl:], ids.astype(jnp.int32),
                    rels.astype(jnp.int32))

        self._smapped_par = shard_map(
            block_par, mesh=mesh,
            in_specs=(P("data", None), P("data", None), P("data", None),
                      P("data", None), P("data", None), P("data", None),
                      P("data"), P()),
            out_specs=tuple(P("data", None) for _ in range(6)))

        def step_fs(fs):
            # step-indexed per-batch key (see DeviceCorpusBatcher
            # .feed_state): resume replays the uninterrupted sequence
            sub = jax.random.fold_in(fs["key"], fs["t"])
            if self.parallel:
                c, cc, x, r, ids, rel = self._smapped_par(
                    fs["buf"], fs["cbuf"], fs["offs"], fs["lens"],
                    fs["coffs"], fs["clens"], fs["nut"], sub)
                return ({"chunk": c, "cchunk": cc, "chunk_ctxt": x,
                         "chunk_rand": r}, dict(fs, t=fs["t"] + 1),
                        ids, rel)
            c, x, r, ids, rel = self._smapped(
                fs["buf"], fs["offs"], fs["lens"], fs["nb"], fs["cnt"],
                fs["nut"], sub)
            return ({"chunk": c, "chunk_ctxt": x, "chunk_rand": r},
                    dict(fs, t=fs["t"] + 1), ids, rel)

        self._step_fs = step_fs
        self._jit_step = jax.jit(step_fs)

    # ---- duck-compatible batcher / fused-feed interface -------------------
    def feed_state(self, start_step: int = 0):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        fs = dict(self._fs0)
        fs["t"] = jax.device_put(
            jnp.int32(start_step), NamedSharding(self.mesh, P()))
        return fs

    def feed_fn(self, fs):
        batch, fs, _, _ = self._step_fs(fs)
        return batch, fs

    def __iter__(self):
        fs = self.feed_state()
        while True:
            batch, fs, ids, rel = self._jit_step(fs)
            self.last_ids, self.last_rel = ids, rel     # [B, 3] each
            yield batch
