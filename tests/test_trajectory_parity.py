"""Compact CI gate for the reference-vs-repo TRAINING-TRAJECTORY parity
(the BASELINE north-star clause: worker losses within 1 % of reference
curves). The full 50-step protocol lives in
experiments/trajectory_parity.py; this runs the same identical-init,
identical-batch, identical-Adam comparison for 12 steps.

Trajectory agreement implies backward-pass + optimizer parity, not just
the forward: any gradient deviation compounds step over step and trips
the 1 % gate within a few steps.
"""

import importlib.util
import os

import pytest

pytestmark = pytest.mark.slow  # see tests/README.md

_EXP = os.path.join(os.path.dirname(__file__), "..", "experiments",
                    "trajectory_parity.py")


def _load_exp():
    spec = importlib.util.spec_from_file_location("trajectory_parity", _EXP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_training_trajectory_matches_reference(ref):
    tp = _load_exp()
    n = 12
    fns = tp.feature_fns()
    batches = tp.make_batches(n, fns)
    sd = {}
    ref_traj = tp.run_reference(batches, n, sd)
    our_traj = tp.run_ours(batches, n, sd)
    ok, stats = tp.compare(ref_traj, our_traj, tol=0.01)
    assert ok, f"per-worker relative loss deviation: {stats}"
    # over 12 steps the agreement should be float-noise tight, not just
    # inside 1 % (divergence compounds later — see compare())
    assert max(stats["max_rel"].values()) < 1e-3, stats


@pytest.mark.parametrize("policy", ["base", "adaptive"])
def test_full_production_bank_trajectory(ref, policy):
    """FULL-bank gate (north-star at production scale): PASE+ frontend +
    every workers+ loss + spc/gap/overlap (+ the cchunk regularizer
    under base), ZNorm on, against the reference's own
    backprop_scheduler (worker_scheduler.py:43-429) — including the
    'adaptive' policy's Q/pi recurrent state feeding the next step's
    per-worker frontend gradient scale. 50-step artifact:
    benchmarks/trajectory_parity_full_r5.json
    (experiments/trajectory_parity.py --bank full)."""
    tp = _load_exp()
    # 3 steps: any backward/optimizer/policy deviation compounds within
    # a step or two (see compare()); the torch full bank costs ~1 min a
    # step on a single-core host, so the gate stays slow-lane-sized
    n = 3
    fns = tp.feature_fns("full", policy)
    batches = tp.make_batches(n, fns, bank="full")
    stats_z = tp.compute_stats(batches)
    sd = {}
    ref_traj = tp.run_reference(batches, n, sd, bank="full",
                                policy=policy, stats=stats_z)
    our_traj = tp.run_ours(batches, n, sd, bank="full", policy=policy,
                           stats=stats_z)
    ok, stats = tp.compare(ref_traj, our_traj, tol=0.01)
    assert ok, f"per-worker relative loss deviation: {stats}"
    assert max(stats["max_rel"].values()) < 1e-3, stats
