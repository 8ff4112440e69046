"""End-to-end learning validation: pretrain a small PASE on synthetic
speech-like data and verify the self-supervision actually learns —
regression losses drop substantially and the LIM worker discriminates
positive/negative context pairs above chance. Writes JSON results.

  python experiments/learning_check.py --steps 300 --out results.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--chunk_size", type=int, default=16000)
    p.add_argument("--out", default="learning_check.json")
    opts = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    from pase_tpu.trainer import Trainer
    from pase_tpu.parallel.mesh import get_mesh, shard_batch
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.data.pipeline import compute_stats
    from pase_tpu.model import parse_workers_cfg

    workers = {
        "regr": [
            {"num_outputs": 39, "dropout": 0, "hidden_size": 128,
             "hidden_layers": 1, "name": "mfcc", "r": 1,
             "loss": "MSELoss", "skip": False},
            {"num_outputs": 12, "dropout": 0, "hidden_size": 128,
             "hidden_layers": 1, "name": "prosody", "r": 1,
             "loss": "MSELoss", "skip": False},
            {"num_outputs": 120, "dropout": 0, "hidden_size": 128,
             "hidden_layers": 1, "name": "fbank", "r": 1,
             "loss": "MSELoss", "skip": False},
        ],
        "cls": [
            {"num_outputs": 1, "dropout": 0, "hidden_size": 128,
             "hidden_layers": 1, "name": "mi",
             "loss": "BCEWithLogitsLoss", "skip": False},
        ],
    }
    fe = {"kwidths": [251, 20, 11, 11], "strides": [1, 10, 4, 4],
          "fmaps": [64, 64, 128, 128], "emb_dim": 128, "norm_out": True}

    b, t = opts.batch_size, opts.chunk_size
    meta = parse_workers_cfg(workers)
    stats = compute_stats(SyntheticChunkBatcher(8, t, seed=11), meta,
                          max_batches=4)
    # poly-LR horizon (epoch*bpe) set to 4x the run so lr stays healthy
    cfg = dict(backprop_mode="base", hop=160, bpe=50,
               epoch=max(opts.steps * 4 // 50, 1), batch_size=b,
               chunk_size=t, log_freq=50, fe_lr=1e-3, min_lr=1e-3,
               lr_mode="poly", save_path="/tmp/learning_check")
    tr = Trainer(fe, workers, cfg, stats=stats, mesh=get_mesh())
    state = tr.init_state(0)
    step = tr._make_train_step()
    batcher = iter(SyntheticChunkBatcher(b, t, seed=3))

    history = []
    t0 = time.time()
    for i in range(opts.steps):
        raw = shard_batch({k: jnp.asarray(v) for k, v in
                           next(batcher).items()}, tr.mesh)
        state, losses = step(state, raw)
        if i % 25 == 0 or i == opts.steps - 1:
            h = {k: float(v) for k, v in jax.device_get(losses).items()}
            h["step"] = i
            history.append(h)
            print(h, flush=True)
    wall = time.time() - t0

    # LIM discrimination accuracy on fresh batches
    eval_step = tr._make_eval_step()
    model = tr.model
    correct, total = 0, 0
    key = jax.random.PRNGKey(99)

    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}

    @jax.jit
    def mi_acc(params, batch_stats, batch, k):
        from pase_tpu.data.pipeline import make_prepare_fn
        prep = tr.prepare(batch, k)
        h, chunk, preds, labels = model.apply(
            {"params": params, "batch_stats": batch_stats}, prep, 1.0,
            train=False, rngs={"sample": k})
        pred = (preds["mi"] > 0).astype(jnp.float32)
        return jnp.mean((pred == labels["mi"]).astype(jnp.float32))

    accs = []
    for _ in range(5):
        key, sub = jax.random.split(key)
        raw = {k: jnp.asarray(v) for k, v in next(batcher).items()}
        accs.append(float(mi_acc(state.params, state.batch_stats, raw, sub)))

    first, last = history[0], history[-1]
    results = {
        "steps": opts.steps,
        "wall_sec": wall,
        "steps_per_sec": opts.steps / wall,
        "first": first, "last": last,
        "mfcc_drop": 1 - last["mfcc"] / first["mfcc"],
        "fbank_drop": 1 - last["fbank"] / first["fbank"],
        "mi_drop": 1 - last["mi"] / first["mi"],
        "mi_accuracy": float(np.mean(accs)),
    }
    print(json.dumps(results, indent=2))
    with open(opts.out, "w") as f:
        json.dump(results, f, indent=2)
    assert results["mfcc_drop"] > 0.2, "mfcc worker did not learn"
    assert results["mi_accuracy"] > 0.55, "LIM worker at chance"
    print("LEARNING CHECK PASSED")


if __name__ == "__main__":
    main()
