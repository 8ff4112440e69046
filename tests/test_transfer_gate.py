"""Transfer gate: pretraining must IMPROVE a downstream probe.

The reference's capability anchors are probe accuracies from
pretrained encoders (spk_id/run_minivox_fast.py:54-311 protocol,
spk_id/out_ep29_mlp 42.50 %); this gate closes the self-supervision ->
representation-quality loop on a synthetic speaker-ID corpus a random
encoder does NOT saturate (experiments/transfer_gate.py builds it so
pitch and energy carry no identity). The full-scale evidence is
benchmarks/transfer_gate_r5.json (8 epochs x 250 steps: random 0.933 ->
pretrained 1.000, MFCC baseline 0.971 also beaten); this slimmed run
(2 epochs x 200 steps, measured margin +0.08) pins the property itself
in the suite: probe(frozen pretrained) > probe(random init), same
architecture, same probe protocol.
"""

import importlib.util
import json
import os

import jax
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_exp():
    spec = importlib.util.spec_from_file_location(
        "transfer_gate", os.path.join(_REPO, "experiments",
                                      "transfer_gate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_pretraining_beats_random_encoder(tmp_path):
    tg = _load_exp()
    from pase_tpu.checkpoint import save_variables
    from pase_tpu.data.pipeline import compute_stats
    from pase_tpu.model import parse_workers_cfg
    from pase_tpu.trainer import Trainer

    corpus = str(tmp_path / "probe_corpus")
    tg.build_probe_corpus(corpus, n_spk=25, n_train=8, n_test=4,
                          seed=100)

    epochs, bpe, bsz, chunk = 2, 200, 16, 8000
    save_path = str(tmp_path / "pretrain")
    wk = json.loads(json.dumps(tg.WORKERS_CFG))
    meta = parse_workers_cfg(json.loads(json.dumps(wk)))
    stats = compute_stats(tg.SpeakerFamilyBatcher(16, chunk, seed=7),
                          meta, max_batches=4)
    cfg = dict(backprop_mode="base", hop=160, bpe=bpe, epoch=epochs,
               batch_size=bsz, chunk_size=chunk, log_freq=bpe,
               fe_lr=5e-4, min_lr=5e-4, lr_mode="poly",
               save_path=save_path, seed=1)
    tr = Trainer(dict(tg.FE_CFG), wk, cfg, stats=stats)
    state = tr.init_state(1)

    # random-init snapshot of the SAME architecture
    host = jax.device_get(state)
    rand_ckpt = str(tmp_path / "FE_random.npz")
    save_variables(rand_ckpt,
                   {"params": host.params["frontend"],
                    "batch_stats": host.batch_stats.get("frontend", {})},
                   0)

    tr.train_(tg.SpeakerFamilyBatcher(bsz, chunk, seed=9), state=state,
              epochs=epochs, resume=False)

    acc_rand = tg.probe_acc(rand_ckpt, corpus, epochs=8)
    acc_pre = tg.probe_acc(os.path.join(save_path,
                                        f"FE_e{epochs - 1}.npz"),
                           corpus, epochs=8)
    # the probe must be non-trivial (random encoder below ceiling) and
    # pretraining must strictly improve it (measured margin +0.08)
    assert acc_rand < 1.0, acc_rand
    assert acc_pre > acc_rand, (acc_pre, acc_rand)
