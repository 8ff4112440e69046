"""Waveform + data-config IO (host side).

WAV decode replaces the reference's torchaudio/sox dependency
(/root/reference/pase/dataset.py:240) with a stdlib/numpy PCM reader, with
an optional C++ fast path (native/wavio.cc, loaded via ctypes) for
threaded decode of large batches.
"""

import json
import os
import struct
import wave
from typing import Dict, List, Optional, Tuple

import numpy as np

_NATIVE = None


def _native_lib():
    """Load the optional C++ wav decoder (native/libpase_wavio.so)."""
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE if _NATIVE is not False else None
    import ctypes
    so = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libpase_wavio.so")
    if not os.path.exists(so):
        _NATIVE = False
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.read_wav_pcm16.restype = ctypes.c_long
        lib.read_wav_pcm16.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_long]
        lib.wav_num_samples.restype = ctypes.c_long
        lib.wav_num_samples.argtypes = [ctypes.c_char_p]
        _NATIVE = lib
        return lib
    except OSError:
        _NATIVE = False
        return None


def native_load_chunk_batch(paths, chunk: int, seed: int = 0,
                            n_threads: int = 8) -> Optional[np.ndarray]:
    """Decode + random-crop a [B, chunk] batch in C++ worker threads.
    Returns None when the native library is unavailable."""
    import ctypes
    lib = _native_lib()
    if lib is None:
        return None
    if not hasattr(lib, "_batch_sig"):
        lib.load_chunk_batch.restype = ctypes.c_long
        lib.load_chunk_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
            ctypes.c_ulonglong, ctypes.c_int]
        lib._batch_sig = True
    b = len(paths)
    arr = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    out = np.empty((b, chunk), dtype=np.float32)
    r = lib.load_chunk_batch(
        arr, b, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, chunk, seed, n_threads)
    if r != b:
        return None
    return out


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 mono samples in [-1, 1], sample_rate)."""
    lib = _native_lib()
    if lib is not None:
        import ctypes
        n = lib.wav_num_samples(path.encode())
        if n > 0:
            buf = np.empty(n, dtype=np.float32)
            got = lib.read_wav_pcm16(
                path.encode(),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n)
            if got == n:
                return buf, 16000
    data, sr = read_wav_channels(path)
    if data.ndim > 1:
        data = data[:, 0].copy()
    return data, sr


def wav_len(path: str) -> int:
    """Sample count from the WAV header alone (no decode) — cheap
    length probe for corpus partitioning (native wav_num_samples when
    available, else the stdlib header read)."""
    lib = _native_lib()
    if lib is not None:
        n = lib.wav_num_samples(path.encode())
        if n > 0:
            return int(n)
    with wave.open(path, "rb") as w:
        return w.getnframes()


def read_wav_channels(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV keeping ALL channels -> ([N, C] or [N] float32, sr).
    Used by the corpus-prep layer (AMI array recordings, SWBD 2-channel
    sph-converted wavs); the training hot path stays on the mono
    ``read_wav``."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sw == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported sample width {sw} in {path}")
    if ch > 1:
        data = data.reshape(-1, ch).copy()
    return data, sr


def write_wav(path: str, data: np.ndarray, sr: int = 16000):
    data = np.clip(np.asarray(data, dtype=np.float64), -1.0, 1.0)
    pcm = (data * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def load_data_cfg(path: str) -> dict:
    """Load the generated data-config JSON (file lists + durations +
    speakers; data/prep/unsupervised_data_cfg_librispeech.py:13-102)."""
    with open(path, "r") as f:
        return json.load(f)
