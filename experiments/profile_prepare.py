"""Decompose the on-device prepare stage cost (distortions vs targets).

Each worker-target extractor and each distortion stage timed separately
on the real chip (sustained, device_get-synced).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pase_tpu.data.distortions import (DistortionConfig, DistortionAssets,
                                       apply_distortions)
from pase_tpu.ops import features as FT

B, T = 32, 32000
rng = np.random.RandomState(0)
wav = jnp.asarray(rng.randn(B, T).astype(np.float32))
key = jax.random.PRNGKey(0)

ir = np.zeros((4, 8000), np.float32)
ir[:, 0] = 1.0
assets = DistortionAssets(
    ir_bank=jnp.asarray(ir), ir_pmax=jnp.asarray([0, 0, 0, 0]),
    noise_bank=jnp.asarray(rng.randn(8, T * 2).astype(np.float32) * .1),
    overlap_bank=jnp.asarray(rng.randn(4, T * 2).astype(np.float32) * .1))


def timeit(fn, *args, n_warm=3, n_meas=25):
    for _ in range(n_warm):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32)).reshape(())))
    t0 = time.time()
    for _ in range(n_meas):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32)).reshape(())))
    return (time.time() - t0) / n_meas * 1e3


def stage(name, **kw):
    cfg = DistortionConfig(**kw)
    f = jax.jit(lambda w, k: apply_distortions(w, k, cfg, assets))
    print(f"  {name:<28s} {timeit(f, wav, key):7.2f} ms")


full = DistortionConfig(reverb_p=.5, overlap_p=.1, noises_p=.4,
                        clip_p=.2, chop_p=.2)
f_full = jax.jit(lambda w, k: apply_distortions(w, k, full, assets))
print(f"distortions (bench stack):     {timeit(f_full, wav, key):7.2f} ms")
stage("reverb only", reverb_p=.5)
stage("overlap only", overlap_p=.1)
stage("noise only", noises_p=.4)
stage("clip only", clip_p=.2)
stage("chop only", chop_p=.2)

print("worker targets:")
for name, fn in [
        ("lps", lambda w: FT.lps(w)),
        ("lps_long(512)", lambda w: FT.lps(w, win=512)),
        ("mfcc", lambda w: FT.mfcc(w)),
        ("mfcc_long", lambda w: FT.mfcc(w, win=2048, order=20)),
        ("fbank", lambda w: FT.fbanks(w)),
        ("fbank_long", lambda w: FT.fbanks(w, win=1024, n_fft=1024)),
        ("gtn", lambda w: FT.gammatone(w)),
        ("gtn_long", lambda w: FT.gammatone(w, win=2048)),
        ("prosody", lambda w: FT.prosody(w)),
]:
    try:
        f = jax.jit(fn)
        print(f"  {name:<28s} {timeit(f, wav):7.2f} ms")
    except Exception as e:
        print(f"  {name:<28s} failed: {type(e).__name__} {e}")
