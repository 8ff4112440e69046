"""Driver entry points: dryrun_multichip must pass in a clean process
(the exact check the driver runs), and the column-parallel model
sharding must not change the math."""

import pytest

import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_subprocess():
    """Run the driver's multi-chip check exactly as the driver does:
    fresh interpreter, no CPU forcing from outside — dryrun_multichip
    itself must configure the 8-device virtual CPU platform."""
    env = dict(os.environ)
    # strip the conftest's own CPU forcing so the entry must do it
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1100)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "ok" in proc.stdout, proc.stdout


def test_state_sharding_rule():
    from pase_tpu.parallel.mesh import get_mesh, state_shardings
    mesh = get_mesh(n_data=4, n_model=2)
    tree = {
        "kernel": jnp.zeros((5, 3, 128)),   # conv: shard lanes
        "bias": jnp.zeros((128,)),          # shard lanes
        "small": jnp.zeros((3,)),           # too small: replicate
        "odd": jnp.zeros((65,)),            # not divisible: replicate
        "count": jnp.zeros(()),             # scalar: replicate
    }
    sh = state_shardings(tree, mesh)
    assert sh["kernel"].spec == jax.sharding.PartitionSpec(
        None, None, "model")
    assert sh["bias"].spec == jax.sharding.PartitionSpec("model")
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert sh["odd"].spec == jax.sharding.PartitionSpec()
    assert sh["count"].spec == jax.sharding.PartitionSpec()


@pytest.mark.slow
def test_model_sharded_step_matches_replicated():
    """One train step with column-parallel param sharding (4x2 mesh)
    produces the same losses as the fully replicated step (8x1)."""
    from tests.test_train_step import _trainer
    from pase_tpu.parallel.mesh import get_mesh, shard_batch, shard_state
    from pase_tpu.data.dataset import SyntheticChunkBatcher

    raw_np = next(iter(SyntheticChunkBatcher(8, 4800, seed=13)))

    def one_step(n_model):
        tr = _trainer()
        tr.mesh = get_mesh(n_data=8 // n_model, n_model=n_model)
        state = tr.init_state(0)
        state = shard_state(state, tr.mesh)
        step = tr._make_train_step()
        raw = shard_batch({k: jnp.asarray(v) for k, v in raw_np.items()},
                          tr.mesh)
        state, losses = step(state, raw)
        return {k: float(v) for k, v in jax.device_get(losses).items()}

    l_dp = one_step(1)
    l_mp = one_step(2)
    assert set(l_dp) == set(l_mp)
    for k in l_dp:
        np.testing.assert_allclose(l_dp[k], l_mp[k], rtol=2e-4, atol=1e-5)
