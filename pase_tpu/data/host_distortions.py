"""Host-side (CPU) distortions that wrap external binaries — Codec2
round-trip compression and ahocoder whisperization
(/root/reference/pase/transforms.py:2039-2127, 2131-2325). These cannot
run on-device; they are applied on raw batches on the host before
transfer, or consumed from a precomputed cache directory (the reference's
Codec2Cached / Whisperize cache_dir modes).

All stages degrade to identity with a warning when the external tool
(c2enc/c2dec, ahocoder16_64/ahodecoder16_64, or the pycodec2 module) is
unavailable — the distortion stack is declared in config, not hard-wired.
"""

import os
import shutil
import subprocess
import tempfile
from typing import Optional

import numpy as np

from pase_tpu.data.io import read_wav, write_wav


def _have(binary: str) -> bool:
    return shutil.which(binary) is not None


class Codec2RoundTrip:
    """Encode+decode through codec2 at `kbps` (default 1600 bps mode),
    returning the degraded waveform (transforms.py:2131-2325)."""

    def __init__(self, kbps: int = 1600, cache_dir: Optional[str] = None):
        self.kbps = kbps
        self.cache_dir = cache_dir
        self.available = _have("c2enc") and _have("c2dec")
        try:
            import pycodec2  # noqa: F401
            self.pycodec2 = True
            self.available = True
        except ImportError:
            self.pycodec2 = False
        if not self.available:
            print("[host_distortions] codec2 unavailable; Codec2RoundTrip "
                  "is identity")

    def __call__(self, wav: np.ndarray, uttname: Optional[str] = None,
                 sr: int = 16000) -> np.ndarray:
        if self.cache_dir and uttname:
            path = os.path.join(self.cache_dir, uttname)
            if os.path.exists(path):
                cached, _ = read_wav(path)
                n = min(len(cached), len(wav))
                out = np.zeros_like(wav)
                out[:n] = cached[:n]
                return out
        if not self.available:
            return wav
        if self.pycodec2:
            import pycodec2
            c2 = pycodec2.Codec2(self.kbps)
            spf = c2.samples_per_frame()
            pcm = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
            n = (len(pcm) // spf) * spf
            out = np.zeros(n, dtype=np.int16)
            for i in range(0, n, spf):
                out[i:i + spf] = c2.decode(c2.encode(pcm[i:i + spf]))
            res = np.zeros_like(wav)
            res[:n] = out.astype(np.float32) / 32768.0
            return res
        with tempfile.TemporaryDirectory() as td:
            raw = os.path.join(td, "in.raw")
            enc = os.path.join(td, "enc.c2")
            dec = os.path.join(td, "out.raw")
            (np.clip(wav, -1, 1) * 32767).astype("<i2").tofile(raw)
            mode = str(self.kbps)
            subprocess.run(["c2enc", mode, raw, enc], check=True)
            subprocess.run(["c2dec", mode, enc, dec], check=True)
            out = np.fromfile(dec, dtype="<i2").astype(np.float32) / 32768.0
            res = np.zeros_like(wav)
            n = min(len(out), len(wav))
            res[:n] = out[:n]
            return res


class Whisperize:
    """Unvoice a waveform through the ahocoder vocoder (encode, overwrite
    F0/FV with unvoiced values, decode — transforms.py:2039-2127)."""

    def __init__(self, cache_dir: Optional[str] = None, sr: int = 16000):
        self.cache_dir = cache_dir
        self.sr = sr
        self.available = _have("ahocoder16_64") and _have("ahodecoder16_64")
        if not self.available and cache_dir is None:
            print("[host_distortions] ahocoder unavailable; Whisperize is "
                  "identity")

    def __call__(self, wav: np.ndarray, uttname: Optional[str] = None,
                 chunk_beg: int = 0, chunk_end: Optional[int] = None
                 ) -> np.ndarray:
        if self.cache_dir and uttname:
            path = os.path.join(self.cache_dir, os.path.basename(uttname))
            if os.path.exists(path):
                cached, _ = read_wav(path)
                end = chunk_end if chunk_end is not None else len(wav)
                if len(cached) < end:
                    cached = np.pad(cached, (0, end - len(cached)))
                return cached[chunk_beg:end].astype(np.float32)
        if not self.available:
            return wav
        with tempfile.TemporaryDirectory() as td:
            inw = os.path.join(td, "in.wav")
            f0 = os.path.join(td, "a.lf0")
            cc = os.path.join(td, "a.cc")
            fv = os.path.join(td, "a.fv")
            write_wav(inw, wav, self.sr)
            subprocess.run(["ahocoder16_64", inw, f0, cc, fv], check=True)
            n = os.path.getsize(f0) // 4
            np.full(n, -1e10, dtype="<f4").tofile(f0)
            np.full(n, 1e3, dtype="<f4").tofile(fv)
            outw = os.path.join(td, "out.wav")
            subprocess.run(["ahodecoder16_64", f0, cc, fv, outw], check=True)
            out, _ = read_wav(outw)
            res = np.zeros_like(wav)
            m = min(len(out), len(wav))
            res[:m] = out[:m]
            return res


class HostDistortionStage:
    """Applies host-side distortions to a raw numpy batch with per-sample
    probability, before device transfer."""

    def __init__(self, transforms, probs, seed: int = 0):
        self.transforms = transforms
        self.probs = probs
        self.rng = np.random.RandomState(seed)

    def __call__(self, batch: dict) -> dict:
        chunk = batch["chunk"].copy()
        for t, p in zip(self.transforms, self.probs):
            for i in range(chunk.shape[0]):
                if self.rng.rand() < p:
                    chunk[i] = t(chunk[i])
        out = dict(batch)
        out["chunk"] = chunk
        return out


class StagedBatcher:
    """Wraps a batcher so every raw numpy batch passes through a
    HostDistortionStage before device transfer (the reference applies
    codec2/whisperize inside its DataLoader workers — transforms.py
    config_distortions wiring)."""

    def __init__(self, batcher, stage: "HostDistortionStage"):
        self.batcher = batcher
        self.stage = stage

    @property
    def bpe(self):
        return getattr(self.batcher, "bpe", None)

    def __iter__(self):
        for batch in self.batcher:
            yield self.stage(batch)


def build_host_stage(dcfg_json: dict, seed: int = 0):
    """Construct the host-side distortion stage from the reference
    distortion-cfg keys (transforms.py:38-146: codec2_p / codec2_kbps /
    codec2_cachedir; plus whisper_p / whisper_cachedir for Whisperize,
    transforms.py:2039-2127). Returns None when no host distortion is
    configured."""
    transforms, probs = [], []
    codec2_p = float(dcfg_json.get("codec2_p", 0) or 0)
    if codec2_p > 0:
        transforms.append(Codec2RoundTrip(
            kbps=int(dcfg_json.get("codec2_kbps",
                                   dcfg_json.get("codec_kbits", 1600))),
            cache_dir=dcfg_json.get("codec2_cachedir")))
        probs.append(codec2_p)
    whisper_p = float(dcfg_json.get("whisper_p", 0) or 0)
    if whisper_p > 0:
        transforms.append(Whisperize(
            cache_dir=dcfg_json.get("whisper_cachedir")))
        probs.append(whisper_p)
    if not transforms:
        return None
    return HostDistortionStage(transforms, probs, seed=seed)
