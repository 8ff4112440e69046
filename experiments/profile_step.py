"""Decompose the full PASE+ train step cost on the real TPU chip.

Times (sustained, device_get-synced): the on-device prepare stage
(distortions + worker targets + ZNorm), the model forward, forward+
backward, and the complete train step — to locate the next perf lever
after the fused lps heads.
"""

import json
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

from pase_tpu.trainer import Trainer
from pase_tpu.parallel.mesh import get_mesh, shard_batch
from pase_tpu.data.dataset import SyntheticChunkBatcher
from pase_tpu.data.distortions import DistortionConfig, DistortionAssets
from pase_tpu.model import worker_losses
from pase_tpu.data.pipeline import compute_stats

B, T, SR = 32, 32000, 16000
root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
fe_cfg = json.load(open(os.path.join(root, "cfg/frontend/PASE+.cfg")))
wk_cfg = json.load(open(os.path.join(root, "cfg/workers/workers+.cfg")))

rng = np.random.RandomState(0)
ir = np.zeros((4, 8000), np.float32)
ir[:, 0] = 1.0
assets = DistortionAssets(
    ir_bank=jnp.asarray(ir), ir_pmax=jnp.asarray([0, 0, 0, 0]),
    noise_bank=jnp.asarray(rng.randn(8, T * 2).astype(np.float32) * .1),
    overlap_bank=jnp.asarray(rng.randn(4, T * 2).astype(np.float32) * .1))
dcfg = DistortionConfig(reverb_p=.5, overlap_p=.1, noises_p=.4,
                        clip_p=.2, chop_p=.2)

from pase_tpu.model import parse_workers_cfg
meta = parse_workers_cfg(wk_cfg)
stats = compute_stats(SyntheticChunkBatcher(8, T, seed=11), meta,
                      max_batches=2)
cfg = dict(backprop_mode="base", hop=160, bpe=100, epoch=400,
           batch_size=B, chunk_size=T, log_freq=100,
           compute_dtype="bfloat16", save_path="/tmp/pase_prof_ckpt")
tr = Trainer(fe_cfg, wk_cfg, cfg, stats=stats, dist_cfg=dcfg,
             dist_assets=assets, mesh=get_mesh())
state = tr.init_state(0)
step = tr._make_train_step()
raw = {k: jnp.asarray(v) for k, v in
       next(iter(SyntheticChunkBatcher(B, T, seed=0))).items()}
raw = shard_batch(raw, tr.mesh)


def timeit(fn, *args, n_warm=3, n_meas=25, donated=False):
    out = None
    for _ in range(n_warm):
        out = fn(*args)
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")][0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32)).reshape(())))
    t0 = time.time()
    for _ in range(n_meas):
        out = fn(*args)
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")][0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32)).reshape(())))
    return (time.time() - t0) / n_meas * 1e3


# 1. prepare only
from pase_tpu.precision import compute_dtype as cd_ctx
import pase_tpu.precision as prec


def prepare_only(raw, key):
    with cd_ctx(jnp.bfloat16):
        return tr.prepare(raw, key)


pj = jax.jit(prepare_only)
print(f"prepare (distortions+targets+znorm): "
      f"{timeit(pj, raw, jax.random.PRNGKey(0)):7.2f} ms")

batch = pj(raw, jax.random.PRNGKey(0))
rngs = {"sample": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}


def fwd(params, batch):
    with cd_ctx(jnp.bfloat16):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        (h, chunk, preds, labels), _ = tr.model.apply(
            variables, batch, 1.0, train=True, rngs=rngs,
            mutable=["batch_stats"])
        losses = worker_losses(tr.meta, preds, labels)
        return sum(v for v in losses.values())


fj = jax.jit(fwd)
print(f"model fwd + losses:                  "
      f"{timeit(fj, state.params, batch):7.2f} ms")

gj = jax.jit(jax.grad(fwd))
print(f"model fwd+bwd:                       "
      f"{timeit(gj, state.params, batch):7.2f} ms")


def fwd_enc(params, batch):
    with cd_ctx(jnp.bfloat16):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        x = jnp.concatenate([batch["chunk"], batch["chunk_ctxt"],
                             batch["chunk_rand"]], axis=0)
        h = tr.model.apply(variables, x, train=True,
                           method=tr.model.encode,
                           rngs=rngs, mutable=["batch_stats"])
        return jnp.sum(h[0].astype(jnp.float32))


ej = jax.jit(fwd_enc)
print(f"encoder fwd (3 streams):             "
      f"{timeit(ej, state.params, batch):7.2f} ms")
egj = jax.jit(jax.grad(fwd_enc))
print(f"encoder fwd+bwd (3 streams):         "
      f"{timeit(egj, state.params, batch):7.2f} ms")

# full step: carry the state (donated buffers)
st = state
for _ in range(3):
    st, losses = step(st, raw)
float(jax.device_get(losses["total"]))
t0 = time.time()
for _ in range(25):
    st, losses = step(st, raw)
float(jax.device_get(losses["total"]))
print(f"full train step:                     "
      f"{(time.time() - t0) / 25 * 1e3:7.2f} ms")
