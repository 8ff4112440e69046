"""On-device batch preparation: the transform stack of the reference
(train.py:make_transforms + dataset.__getitem__ tail) as one jittable fn.

Per step, given host-cropped raw chunks {chunk, chunk_ctxt, chunk_rand}:
  1. optional norm_and_scale (random gain, transforms.py:148-151)
  2. cchunk := clean chunk (denoising target, dataset.py:495)
  3. worker feature targets computed from the CLEAN chunk
  4. ZNorm of the targets (stats pkl semantics, transforms.py:183-205)
  5. distortion stack applied to 'chunk' only + overlap label
The ordering mirrors the reference exactly: targets come from clean
audio, the encoder sees the distorted chunk.
"""

import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pase_tpu.ops.features import feature_fn_for_worker
from pase_tpu.data.distortions import (DistortionConfig, DistortionAssets,
                                       apply_distortions)


def norm_and_scale(wav, key):
    """wav / max|wav| * U[0,1) per sample (transforms.py:148-151)."""
    mx = jnp.max(jnp.abs(wav), axis=-1, keepdims=True)
    g = jax.random.uniform(key, (wav.shape[0], 1))
    return wav / jnp.maximum(mx, 1e-12) * g


def make_prepare_fn(workers_meta: Dict[str, Any],
                    stats: Optional[Dict[str, Dict[str, np.ndarray]]] = None,
                    dist_cfg: Optional[DistortionConfig] = None,
                    assets: Optional[DistortionAssets] = None,
                    hop: int = 160,
                    random_scale: bool = False,
                    zs_bank=None,
                    zs_snrs=(0, 5, 10)) -> Callable:
    """Build prepare(batch, rng) -> model-ready batch dict.

    workers_meta: parse_workers_cfg output. stats: {key: {'mean','std'}}
    with 1-D per-dim arrays (reference stats pkl schema).

    zs_bank/zs_snrs: the optional zero-speech additive (reference
    config_zerospeech -> SimpleAdditive, train.py:139-143 +
    transforms.py:1576-1676): rows flagged by the batch's zs_mask skip
    the distortion stack and instead get noise added to the ENCODER
    INPUT only — worker targets and cchunk stay the silence, exactly
    the reference's post-transform zp_trans ordering
    (dataset.py:525-531).
    """
    feat_fns = {}
    for e in workers_meta.get("regr", []):
        name = e["name"]
        fn = feature_fn_for_worker(name, e.get("transform"), hop=hop)
        if fn is not None:
            feat_fns[name] = fn
    has_overlap = any(e["name"] == "overlap"
                      for e in workers_meta.get("cls", []))
    stats_dev = None
    if stats is not None:
        stats_dev = {k: (jnp.asarray(v["mean"], jnp.float32),
                         jnp.asarray(v["std"], jnp.float32))
                     for k, v in stats.items()}

    def prepare(batch: Dict[str, jnp.ndarray], rng: jax.Array):
        # int16 wire format (Trainer wire_dtype='int16'): waveforms
        # arrive on the PCM16 grid to halve H2D bytes; dequantize
        # losslessly on device (x/32768 is the exact read_wav value)
        batch = {k: (v.astype(jnp.float32) / 32768.0
                     if getattr(v, "dtype", None) == jnp.int16 else v)
                 for k, v in batch.items()}
        b, t = batch["chunk"].shape
        k_scale, k_dist, k_zs = jax.random.split(rng, 3)
        chunk = batch["chunk"]
        ctxt = batch["chunk_ctxt"]
        rand = batch["chunk_rand"]
        # parallel corpora (Genhancement/AMI) provide the aligned clean
        # recording explicitly; otherwise clean := the pre-distortion chunk
        cchunk_in = batch.get("cchunk")
        if random_scale:
            ks = jax.random.split(k_scale, 3)
            # chunk and the aligned clean share one gain so the
            # denoising pair stays consistent
            if cchunk_in is not None:
                mx = jnp.max(jnp.abs(chunk), axis=-1, keepdims=True)
                g = jax.random.uniform(ks[0], (b, 1))
                chunk = chunk / jnp.maximum(mx, 1e-12) * g
                cchunk_in = cchunk_in / jnp.maximum(mx, 1e-12) * g
            else:
                chunk = norm_and_scale(chunk, ks[0])
            ctxt = norm_and_scale(ctxt, ks[1])
            rand = norm_and_scale(rand, ks[2])
        cchunk = chunk if cchunk_in is None else cchunk_in
        out = {"chunk_ctxt": ctxt, "chunk_rand": rand, "cchunk": cchunk}
        # worker targets from the clean chunk; stored in the compute dtype
        # under a mixed-precision policy (losses re-cast to f32 at the
        # criterion, so precision of the reduction is unaffected)
        from pase_tpu.precision import get_compute_dtype
        cd = get_compute_dtype()
        for name, fn in feat_fns.items():
            # a target already present in the batch came from the
            # precomputed-feature cache (data/cache.py, the reference's
            # CachedCompose path) — ZNorm/cast still apply below
            feats = batch[name] if name in batch else fn(cchunk)
            if stats_dev is not None and name in stats_dev:
                mean, std = stats_dev[name]
                feats = (feats - mean) / std
            if cd is not None:
                feats = feats.astype(cd)
            out[name] = feats
        # distort the encoder input
        overlap = jnp.zeros((b, t // hop))
        zs_m = batch.get("zs_mask")
        if dist_cfg is not None and assets is not None:
            dchunk, overlap = apply_distortions(chunk, k_dist, dist_cfg,
                                                assets, dec_res=hop)
            if "dist_mask" in batch:
                # per-dataset distortion gating (MetaConcat dist_flags:
                # the reference's per-corpus distortion stacks, e.g.
                # Libri distorted + AMI sdm raw)
                m = batch["dist_mask"]
                dchunk = jnp.where(m[:, None] > 0, dchunk, chunk)
                overlap = overlap * m[:, None]
            if zs_m is not None:
                # the reference skips the distortion stack on zero-speech
                # rows (dataset.py:525: `if ... and not ZERO_SPEECH`)
                dchunk = jnp.where(zs_m[:, None] > 0, chunk, dchunk)
                overlap = overlap * (1.0 - zs_m[:, None])
            chunk = dchunk
        if zs_bank is not None and zs_m is not None:
            from pase_tpu.data.distortions import additive_one
            k_each = jax.random.split(k_zs, b)
            zs_noisy = jax.vmap(
                lambda w, kk: additive_one(w, kk, zs_bank,
                                           tuple(zs_snrs)))(chunk, k_each)
            chunk = jnp.where(zs_m[:, None] > 0, zs_noisy, chunk)
        out["chunk"] = chunk
        if has_overlap:
            # a batch-provided mask (precomputed cache / parity harness)
            # wins over the in-graph distortion engine's label
            out["overlap"] = batch.get("overlap", overlap)
        for k in ("spc_idx", "gap_idx"):
            # deterministic SPC/Gap frame indices (parity harnesses) ride
            # through to the model, which passes them to the minions
            if k in batch:
                out[k] = batch[k]
        return out

    return prepare


# ---------------------------------------------------------------------------
# trainset statistics (make_trainset_statistics.py:71-104 semantics)
# ---------------------------------------------------------------------------


def compute_stats(batcher, workers_meta, hop: int = 160,
                  max_batches: int = 20, random_scale: bool = False,
                  seed: int = 0):
    """Stream up to max_batches batches and reproduce the reference stats
    pkl EXACTLY (make_trainset_statistics.py:98-104):
      mean[d] = mean over samples of the per-sample temporal mean
      std[d]  = STD over samples of the per-sample temporal std
                (unbiased, torch.std default)
    Schema: {key: {'mean': [D], 'std': [D]}}."""
    prepare = make_prepare_fn(workers_meta, stats=None, dist_cfg=None,
                              assets=None, hop=hop,
                              random_scale=random_scale)
    prepare_j = jax.jit(prepare)
    rng = jax.random.PRNGKey(seed)
    per_sample = {}
    for bi, batch in enumerate(batcher):
        if bi >= max_batches:
            break
        rng, sub = jax.random.split(rng)
        dev = prepare_j({k: jnp.asarray(v) for k, v in batch.items()}, sub)
        for k, v in dev.items():
            if v.ndim != 3 or k in ("chunk", "cchunk"):
                continue
            m = np.asarray(jnp.mean(v, axis=1))               # [B, D]
            s = np.asarray(jnp.std(v, axis=1, ddof=1))        # [B, D]
            per_sample.setdefault(k, ([], []))
            per_sample[k][0].append(m)
            per_sample[k][1].append(s)
    stats = {}
    for k, (ms, ss) in per_sample.items():
        stats[k] = {"mean": np.concatenate(ms).mean(axis=0),
                    "std": np.concatenate(ss).std(axis=0, ddof=1)}
    return stats


def save_stats_pkl(stats, path):
    """Serialize stats in a pickle layout readable alongside the reference
    (per-key dict of 1-D arrays)."""
    import pickle
    with open(path, "wb") as f:
        pickle.dump({k: {"mean": np.asarray(v["mean"]),
                         "std": np.asarray(v["std"])}
                     for k, v in stats.items()}, f)


def load_stats_pkl(path):
    """Load a stats pkl — ours (numpy) or the reference's (torch tensors)."""
    import pickle
    try:
        with open(path, "rb") as f:
            stats = pickle.load(f)
    except Exception:
        import torch
        with open(path, "rb") as f:
            stats = torch.load(f, map_location="cpu", weights_only=False)
    out = {}
    for k, v in stats.items():
        mean, std = v["mean"], v["std"]
        if hasattr(mean, "numpy"):
            mean, std = mean.numpy(), std.numpy()
        out[k] = {"mean": np.asarray(mean, np.float32),
                  "std": np.asarray(std, np.float32)}
    return out
