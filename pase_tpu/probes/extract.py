"""Frozen-encoder feature extraction for downstream probes.

Mirrors the probes' extraction path: wf_builder + load_pretrained, full
utterance forward, optional output mode ('avg_concat' for spk/emo probes,
per-speaker mean subtraction for TIMIT —
/root/reference/ASR/run_TIMIT_full_decoding.py:117-211,
spk_id/run_minivox_fast.py:54-150)."""

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pase_tpu.frontend import Encoder, wf_builder
from pase_tpu.data.io import read_wav


class FeatureExtractor:
    """Frozen-encoder (or classical-feature baseline) extractor.

    feature_type='pase' uses the encoder; 'mfcc'/'fbank' compute the
    classical features instead (the spk_id/mfcc_baseline.py comparison
    path in the reference)."""

    def __init__(self, fe_cfg, ckpt_path: Optional[str] = None,
                 mode: Optional[str] = None, pad_to: int = 1600,
                 feature_type: str = "pase"):
        self.feature_type = feature_type
        self.encoder = None
        if feature_type == "pase":
            self.encoder = wf_builder(fe_cfg)
            if ckpt_path:
                self.encoder.load_pretrained(ckpt_path, load_last=True)
        self.mode = mode
        self.pad_to = pad_to  # static-shape buckets to bound recompiles

    def extract(self, wav: np.ndarray) -> np.ndarray:
        """[T] wav -> [frames, D] features (mode applied).

        The wav is zero-padded to a static-shape bucket (bounding
        recompiles), the encoder runs with NO mode, the frame axis is
        trimmed to the exact-length frame count (ceil(T/160) — SAME-pad
        stride chain, matching the reference's unpadded full-utterance
        forward), and only THEN is select_output applied — so the
        avg_concat/avg_norm statistics never see pad frames. Residual
        deviation: the last few frames' receptive field sees zero pad
        instead of the exact forward's reflect pad (use
        StreamingEncoder for bit-exact online extraction)."""
        t = len(wav)
        bucket = int(np.ceil(t / self.pad_to)) * self.pad_to
        x = np.zeros((1, bucket), dtype=np.float32)
        x[0, :t] = wav
        frames = int(np.ceil(t / 160))
        from pase_tpu.frontend import select_output
        if self.feature_type != "pase":
            from pase_tpu.ops import features as FT
            fn = {"mfcc": FT.mfcc, "fbank": FT.fbanks}[self.feature_type]
            y = np.asarray(fn(jnp.asarray(x)))[0, :t // 160]  # [F, D]
            y = np.asarray(select_output(
                jnp.asarray(y.T[None]), self.mode))[0].T
            return y
        y = np.asarray(self.encoder(x, mode=None))[:, :, :frames]  # (1,D,F)
        y = np.asarray(select_output(jnp.asarray(y), self.mode))
        return y[0].T

    def extract_file(self, path: str) -> np.ndarray:
        wav, _ = read_wav(path)
        return self.extract(wav)


def speaker_mean_norm(utt_feats: Dict[str, np.ndarray],
                      utt2spk: Dict[str, str]) -> Dict[str, np.ndarray]:
    """Per-speaker mean subtraction (run_TIMIT_full_decoding.py:158-200)."""
    sums: Dict[str, np.ndarray] = {}
    counts: Dict[str, int] = {}
    for utt, feats in utt_feats.items():
        spk = utt2spk[utt]
        sums[spk] = sums.get(spk, 0) + feats.sum(axis=0)
        counts[spk] = counts.get(spk, 0) + feats.shape[0]
    means = {s: sums[s] / counts[s] for s in sums}
    return {u: f - means[utt2spk[u]] for u, f in utt_feats.items()}
