"""Loss-trajectory regression gate.

A fixed-seed 40-step run of the full training pipeline (distortions +
on-device targets + fused wide head + scheduling + optimizer) must
reproduce the stored per-step, per-worker loss trajectory. This freezes
the TRAINING SIGNAL: any future perf work that accidentally changes the
math (kernel swap, fusion, precision, RNG threading) trips this gate
rather than silently degrading pretraining.

Regenerate (only after an INTENTIONAL semantics change) with:

    PASE_REGEN_FIXTURES=1 python -m pytest \
        tests/test_training_regression.py -q

and commit the refreshed fixture together with the change that
justifies it.
"""

import pytest

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from pase_tpu.trainer import Trainer
from pase_tpu.data.dataset import SyntheticChunkBatcher
from pase_tpu.data.distortions import DistortionConfig, DistortionAssets
from pase_tpu.parallel.mesh import get_mesh, shard_batch

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "loss_trajectory.json")

FRONTEND = {
    "kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
    "fmaps": [32, 32, 64, 64], "emb_dim": 64, "norm_out": True,
    "rnn_pool": True, "rnn_layers": 1, "denseskips": True,
}

# mfcc + prosody + a real-width fused lps head (r=7) + contrastive mi:
# every loss family the production bank uses
WORKERS = {
    "regr": [
        {"num_outputs": 39, "dropout": 0, "hidden_size": 64,
         "hidden_layers": 1, "name": "mfcc", "r": 1,
         "loss": "MSELoss", "skip": False},
        {"num_outputs": 12, "dropout": 0, "hidden_size": 64,
         "hidden_layers": 1, "name": "prosody", "r": 1,
         "loss": "MSELoss", "skip": False},
        {"num_outputs": 3075, "dropout": 0, "hidden_size": 64,
         "hidden_layers": 1, "name": "lps", "r": 7, "context": 1,
         "loss": "MSELoss", "skip": False},
    ],
    "cls": [
        {"num_outputs": 1, "dropout": 0, "hidden_size": 64,
         "hidden_layers": 1, "name": "mi", "loss": "BCEWithLogitsLoss",
         "skip": False},
    ],
}

N_STEPS = 40


def _synth_assets(t):
    rng = np.random.RandomState(0)
    ir = np.zeros((2, 1000), dtype=np.float32)
    ir[:, 0] = 1.0
    ir[0, 300] = 0.4
    ir[1, 700] = 0.2
    return DistortionAssets(
        ir_bank=jnp.asarray(ir), ir_pmax=jnp.asarray([0, 0]),
        noise_bank=jnp.asarray(rng.randn(3, t * 2).astype(np.float32) * 0.1),
        overlap_bank=jnp.asarray(
            rng.randn(2, t * 2).astype(np.float32) * 0.1))


def _run_trajectory():
    chunk, batch = 4800, 8
    cfg = dict(backprop_mode="base", hop=160, bpe=100, epoch=10,
               batch_size=batch, chunk_size=chunk, log_freq=1000,
               fe_lr=5e-4, min_lr=5e-4, lr_mode="poly",
               save_path="/tmp/pase_traj_ckpt")
    dcfg = DistortionConfig(reverb_p=0.5, overlap_p=0.3, noises_p=0.5,
                            clip_p=0.3, chop_p=0.3)
    tr = Trainer(FRONTEND, WORKERS, cfg, dist_cfg=dcfg,
                 dist_assets=_synth_assets(chunk), mesh=get_mesh())
    state = tr.init_state(0)
    step = tr._make_train_step()
    b = iter(SyntheticChunkBatcher(batch, chunk, seed=0))
    traj = []
    for _ in range(N_STEPS):
        raw = shard_batch({k: jnp.asarray(v) for k, v in next(b).items()},
                          tr.mesh)
        state, losses = step(state, raw)
        traj.append({k: float(v)
                     for k, v in jax.device_get(losses).items()})
    return traj


@pytest.mark.slow
def test_loss_trajectory_regression():
    traj = _run_trajectory()
    if os.environ.get("PASE_REGEN_FIXTURES"):
        with open(FIXTURE, "w") as f:
            json.dump(traj, f, indent=1)
        return
    assert os.path.exists(FIXTURE), (
        "fixture missing — regenerate with PASE_REGEN_FIXTURES=1")
    with open(FIXTURE) as f:
        want = json.load(f)
    assert len(traj) == len(want)
    for i, (got, ref) in enumerate(zip(traj, want)):
        assert set(got) == set(ref), (i, set(got) ^ set(ref))
        for k in ref:
            np.testing.assert_allclose(
                got[k], ref[k], rtol=1e-5, atol=1e-7,
                err_msg=f"step {i} worker {k!r}: training signal "
                        f"changed (got {got[k]!r}, fixture {ref[k]!r})")
    # the trajectory must also show learning, not just determinism
    first = np.mean([t["total"] for t in traj[:5]])
    last = np.mean([t["total"] for t in traj[-5:]])
    assert last < first, (first, last)
