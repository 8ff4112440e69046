"""Optimizer/LR-schedule parity with the reference LR_Scheduler math and
the fused multi-step trainer."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.mark.parametrize("mode", ["step", "poly", "cos"])
def test_lr_schedule_matches_reference(ref, mode):
    from pase.models.WorkerScheduler.lr_scheduler import LR_Scheduler

    class _Opt:  # minimal optimizer stub for the reference scheduler
        param_groups = [{"lr": 0.0}]

    from pase_tpu.optim import make_lr_schedule
    base_lr, epochs, bpe = 1e-3, 50, 100
    ref_sched = LR_Scheduler(mode, optim_name="x", base_lr=base_lr,
                             num_epochs=epochs, iters_per_epoch=bpe,
                             lr_step=30)
    ours = make_lr_schedule(mode, base_lr, epochs, bpe, lr_step=30)
    opt = _Opt()
    for epoch, i in [(0, 1), (0, 50), (3, 10), (10, 99), (31, 5), (49, 99)]:
        ref_lr = ref_sched(opt, i, epoch, 0.0)
        our_lr = float(ours(epoch * bpe + i))
        np.testing.assert_allclose(our_lr, ref_lr, rtol=3e-4, atol=1e-10,
                                   err_msg=f"{mode} e{epoch} i{i}")


@pytest.mark.slow
def test_multi_step_matches_single_steps():
    """K fused steps == K individual steps (same rng stream, batches)."""
    import sys
    sys.path.insert(0, "tests")
    from test_train_step import _trainer, SyntheticChunkBatcher
    from pase_tpu.parallel.mesh import shard_batch

    tr = _trainer()
    s1 = tr.init_state(0)
    s2 = tr.init_state(0)
    step = tr._make_train_step()
    multi = tr.make_multi_train_step(3)
    bs = [next(iter(SyntheticChunkBatcher(8, 4800, seed=s)))
          for s in range(3)]
    singles = []
    for b in bs:
        raw = shard_batch({k: jnp.asarray(v) for k, v in b.items()},
                          tr.mesh)
        s1, losses1 = step(s1, raw)
        singles.append(float(losses1["total"]))
    stacked = {k: jnp.stack([jnp.asarray(b[k]) for b in bs])
               for k in bs[0]}
    s2, totals = multi(s2, stacked)
    # loss trajectory identical step-for-step (params can differ at f32
    # noise level: device layouts change reduction order and Adam
    # normalizes near-zero grads)
    np.testing.assert_allclose(np.asarray(totals), np.asarray(singles),
                               rtol=1e-3)
    assert int(jax.device_get(s2.step)) == 3


def test_select_half_size_distribution():
    """select_half must match the reference's rejection-sampling law:
    P(|mask|=s) proportional to C(n,s) for s in {3,4}
    (worker_scheduler.py:132-136)."""
    from math import comb
    import jax
    import jax.numpy as jnp
    from pase_tpu.scheduling import apply_policy, init_policy_state

    n = 12
    state = init_policy_state(n)
    losses = jnp.ones((n,))

    def one(key):
        w, _, _ = apply_policy("select_half", losses, state, key)
        return jnp.sum(w)

    keys = jax.random.split(jax.random.PRNGKey(0), 4000)
    sizes = np.asarray(jax.vmap(one)(keys))
    assert set(np.unique(sizes)) <= {3.0, 4.0}
    p3_expected = comb(n, 3) / (comb(n, 3) + comb(n, 4))   # 220/715
    p3 = float(np.mean(sizes == 3.0))
    # 4000 draws: 3-sigma ~ 0.022
    assert abs(p3 - p3_expected) < 0.03, (p3, p3_expected)
