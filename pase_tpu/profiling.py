"""First-class throughput profiling (SURVEY.md §5.1).

The reference's profiling story is commented-out kernprof decorators
(transforms.py:190,220,...; trainer.py:199); here steps/sec and
audio-sec/sec are first-class trainer metrics (log.py) and this module
adds the canonical device-synced section timer plus a train-step
decomposition used by bench.py-style measurements.

Measurement rules for this hardware (see CLAUDE.md):
- `jax.block_until_ready` can return early on the axon backend — sync by
  `jax.device_get` of a reduced scalar instead.
- only sustained loops are meaningful; single-dispatch timings mislead.
- keep the chip otherwise idle; concurrent compiles contaminate 2-4x.
- `jax.profiler.trace` hangs over the axon tunnel — do not use it here.
"""

import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def device_timeit(fn, *args, n_warm: int = 3, n_meas: int = 20) -> float:
    """Mean wall-ms per call of fn(*args), synced via device_get of a
    scalar reduction of the first output leaf."""

    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jax.device_get(
            jnp.sum(leaf.astype(jnp.float32)).reshape(())))

    for _ in range(n_warm):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n_meas):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / n_meas * 1e3


def profile_train_step(trainer, batch_size: int, chunk_size: int,
                       seed: int = 0, n_meas: int = 20) -> Dict[str, float]:
    """Decompose the jitted train step of a Trainer into
    {prepare_ms, step_ms, model_opt_ms, steps_per_sec, audio_sec_per_sec}.

    prepare (distortions + targets + ZNorm) is timed standalone; the
    model fwd+bwd+optimizer cost is derived as step - prepare (the step
    is a single fused graph, so stage boundaries inside it are not
    directly observable — this matches benchmarks/README.md methodology).
    """
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.parallel.mesh import shard_batch

    raw = next(iter(SyntheticChunkBatcher(batch_size, chunk_size,
                                          seed=seed)))
    raw = shard_batch({k: jnp.asarray(v) for k, v in raw.items()},
                      trainer.mesh)
    state = trainer.init_state(seed)
    step = trainer._make_train_step()

    prepare_j = jax.jit(trainer.prepare)
    key = jax.random.PRNGKey(seed)
    prepare_ms = device_timeit(prepare_j, raw, key, n_meas=n_meas)

    # sustained loop over the full step; the jitted step donates its
    # state buffers, so the returned state must be threaded through
    carry = {"state": state}

    def stepped(raw):
        carry["state"], losses = step(carry["state"], raw)
        return losses["total"]

    step_ms = device_timeit(stepped, raw, n_meas=n_meas)
    sr = 16000
    return {
        "prepare_ms": round(prepare_ms, 3),
        "step_ms": round(step_ms, 3),
        "model_opt_ms": round(step_ms - prepare_ms, 3),
        "steps_per_sec": round(1e3 / step_ms, 3),
        "audio_sec_per_sec": round(1e3 / step_ms * batch_size
                                   * chunk_size / sr, 1),
    }
