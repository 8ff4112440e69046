"""TRANSFER GATE: prove self-supervised pretraining improves a
downstream probe over a random-init encoder.

The reference's capability anchors are probe accuracies from pretrained
encoders (/root/reference/spk_id/out_ep29_mlp 42.50 %,
/root/reference/emorec/emocap.res 51.3 %, README.md:185 TIMIT 17.2 %).
This experiment closes the self-supervision -> representation-quality
loop end to end on synthetic data this image can generate:

  1. Build a SPEAKER-ID probe corpus a random encoder does NOT
     saturate: many speakers drawn from a continuum (base f0 spacing
     far below the per-utterance f0 jitter, so pitch alone cannot
     identify a speaker), identity carried by an 8-harmonic timbre
     vector + spectral tilt, every utterance RMS-normalized so energy
     is uninformative.
  2. Pretrain PASE on fresh speakers from the SAME family (disjoint
     draws) with the mfcc/fbank/prosody regression + LIM contrastive
     workers (base policy) — the standard train loop, real FE_e{e}.npz
     snapshots per epoch.
  3. Probe every snapshot with the frozen-encoder speaker-ID MLP probe
     (probes/tasks.run_utt_classification, mode='avg_concat' — the
     spk_id/run_minivox_fast.py:54-311 protocol) and compare:
         pretrained(e) vs random-init(epoch -1) vs MFCC baseline.

Gate: the FINAL pretrained probe beats the random-init probe by
>= --min_margin sentence accuracy, and the margin is positive for the
last half of the snapshots (monotone-ish improvement, not a fluke).

Run:  python experiments/transfer_gate.py --epochs 8 --bpe 250 \
          --json benchmarks/transfer_gate_r5.json
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SR = 16000

FE_CFG = {
    "kwidths": [65, 20, 11, 11], "strides": [1, 10, 4, 4],
    "fmaps": [64, 64, 128, 128], "emb_dim": 128, "norm_out": True,
}

WORKERS_CFG = {
    "regr": [
        {"num_outputs": 39, "dropout": 0, "hidden_size": 128,
         "hidden_layers": 1, "name": "mfcc", "r": 1,
         "loss": "MSELoss", "skip": False},
        {"num_outputs": 120, "dropout": 0, "hidden_size": 128,
         "hidden_layers": 1, "name": "fbank", "r": 1,
         "loss": "MSELoss", "skip": False},
        {"num_outputs": 12, "dropout": 0, "hidden_size": 128,
         "hidden_layers": 1, "name": "prosody", "r": 1,
         "loss": "MSELoss", "skip": False},
    ],
    "cls": [
        {"num_outputs": 1, "dropout": 0, "hidden_size": 128,
         "hidden_layers": 1, "name": "mi",
         "loss": "BCEWithLogitsLoss", "skip": False},
    ],
}


# ---------------------------------------------------------------------------
# synthetic speaker family
# ---------------------------------------------------------------------------


def sample_speaker(rng):
    """A point on the speaker continuum: base pitch, an 8-harmonic
    timbre direction, spectral tilt, vibrato rate."""
    return {
        "f0": float(rng.uniform(105.0, 245.0)),
        "timbre": rng.dirichlet(np.ones(8) * 2.0),
        "tilt": float(rng.uniform(0.8, 1.4)),
        "vib": float(rng.uniform(3.0, 7.0)),
    }


def utterance(rng, spk, t, sr=SR):
    """One utterance: f0 contour around the speaker base (utterance
    shift ±7 % + vibrato + slow drift — far wider than the ~2 Hz
    speaker spacing, so mean pitch alone cannot identify the speaker),
    per-utterance jittered harmonic weights, random amplitude envelope,
    noise floor, RMS-normalized (energy carries no identity)."""
    n = np.arange(t) / sr
    f0u = spk["f0"] * rng.uniform(0.93, 1.07)
    contour = f0u * (1.0
                     + 0.02 * np.sin(2 * np.pi * spk["vib"] * n
                                     + rng.uniform(0, 2 * np.pi))
                     + 0.04 * np.sin(2 * np.pi * rng.uniform(0.3, 1.0) * n
                                     + rng.uniform(0, 2 * np.pi)))
    phase = 2 * np.pi * np.cumsum(contour) / sr
    w = spk["timbre"] * rng.uniform(0.8, 1.25, size=8)
    ks = np.arange(1, 9)
    sig = np.zeros(t)
    for k, wk in zip(ks, w):
        sig += wk * np.sin(k * phase + rng.uniform(0, 2 * np.pi)) \
            / (k ** spk["tilt"])
    env = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * n
                               + rng.uniform(0, 2 * np.pi))
    x = sig * env + rng.randn(t) * 0.01
    x = x / max(float(np.sqrt(np.mean(x ** 2))), 1e-8) * 0.1
    return x.astype(np.float32)


def build_probe_corpus(root, n_spk=30, n_train=20, n_test=8,
                       utt_sec=2.0, seed=100):
    """Disk corpus + train/test .lst files (probe protocol inputs)."""
    from pase_tpu.data.io import write_wav
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(seed)
    spks = [sample_speaker(rng) for _ in range(n_spk)]
    t = int(utt_sec * SR)
    lists = {"train": [], "test": []}
    for si, spk in enumerate(spks):
        for split, n_utt in (("train", n_train), ("test", n_test)):
            for u in range(n_utt):
                w = utterance(rng, spk, t)
                fname = f"{split}_spk{si:02d}_{u:02d}.wav"
                write_wav(os.path.join(root, fname), w)
                lists[split].append((fname, f"spk{si:02d}"))
    for split, entries in lists.items():
        with open(os.path.join(root, f"{split}.lst"), "w") as f:
            for path, lab in entries:
                f.write(f"{path} {lab}\n")
    return root


class SpeakerFamilyBatcher:
    """Pretraining batches from the same generative family, FRESH
    speaker draws every batch (disjoint RNG stream from the probe
    corpus): chunk/chunk_ctxt share a speaker, chunk_rand differs —
    the LibriSpeechSegTupleWavDataset tuple semantics."""

    def __init__(self, batch_size, chunk_size, seed=0, bpe=100):
        self.batch_size = batch_size
        self.chunk_size = chunk_size
        self.rng = np.random.RandomState(seed)
        self.bpe = bpe

    def _make_batch(self):
        b, t = self.batch_size, self.chunk_size
        chunk = np.zeros((b, t), np.float32)
        ctxt = np.zeros((b, t), np.float32)
        rand = np.zeros((b, t), np.float32)
        for i in range(b):
            spk = sample_speaker(self.rng)
            other = sample_speaker(self.rng)
            chunk[i] = utterance(self.rng, spk, t)
            ctxt[i] = utterance(self.rng, spk, t)
            rand[i] = utterance(self.rng, other, t)
        return {"chunk": chunk, "chunk_ctxt": ctxt, "chunk_rand": rand}

    def __iter__(self):
        while True:
            yield self._make_batch()


# ---------------------------------------------------------------------------
# protocol
# ---------------------------------------------------------------------------


def probe_acc(fe_ckpt, corpus, epochs=12, feature_type="pase", seed=0):
    from pase_tpu.probes.tasks import run_utt_classification
    m = run_utt_classification(
        dict(FE_CFG), fe_ckpt, os.path.join(corpus, "train.lst"),
        os.path.join(corpus, "test.lst"), data_root=corpus,
        mode="avg_concat", hidden=(256,), epochs=epochs, lr=0.05,
        batch_size=512, seed=seed, log=None, feature_type=feature_type)
    return float(m["test_sentence_acc"])


def run(opts, workdir):
    import jax
    import jax.numpy as jnp
    from pase_tpu.trainer import Trainer
    from pase_tpu.model import parse_workers_cfg
    from pase_tpu.data.pipeline import compute_stats
    from pase_tpu.checkpoint import save_variables

    corpus = os.path.join(workdir, "probe_corpus")
    print("[transfer] building probe corpus ...")
    build_probe_corpus(corpus, n_spk=opts.n_spk, n_train=opts.n_train,
                       n_test=opts.n_test, seed=100)

    save_path = os.path.join(workdir, "pretrain")
    meta = parse_workers_cfg(json.loads(json.dumps(WORKERS_CFG)))
    stat_src = SpeakerFamilyBatcher(16, opts.chunk_size, seed=7)
    stats = compute_stats(stat_src, meta, max_batches=4)
    cfg = dict(backprop_mode="base", hop=160, bpe=opts.bpe,
               epoch=opts.epochs, batch_size=opts.batch_size,
               chunk_size=opts.chunk_size, log_freq=max(opts.bpe // 2, 1),
               fe_lr=5e-4, min_lr=5e-4, lr_mode="poly",
               save_path=save_path, seed=1)
    tr = Trainer(dict(FE_CFG), json.loads(json.dumps(WORKERS_CFG)), cfg,
                 stats=stats)
    state = tr.init_state(1)

    # epoch -1 snapshot: the RANDOM-INIT encoder, identical architecture
    host = jax.device_get(state)
    rand_ckpt = os.path.join(workdir, "FE_random.npz")
    save_variables(rand_ckpt,
                   {"params": host.params["frontend"],
                    "batch_stats": host.batch_stats.get("frontend", {})},
                   0)

    batcher = SpeakerFamilyBatcher(opts.batch_size, opts.chunk_size,
                                   seed=9)
    print(f"[transfer] pretraining {opts.epochs} epochs x {opts.bpe} "
          f"steps ...")
    tr.train_(batcher, state=state, epochs=opts.epochs, resume=False)

    print("[transfer] probing snapshots ...")
    accs = {}
    accs["random"] = probe_acc(rand_ckpt, corpus,
                               epochs=opts.probe_epochs)
    curve = []
    for e in range(opts.epochs):
        ck = os.path.join(save_path, f"FE_e{e}.npz")
        acc = probe_acc(ck, corpus, epochs=opts.probe_epochs)
        curve.append({"epoch": e, "acc": acc,
                      "margin": acc - accs["random"]})
        print(f"[transfer]   epoch {e}: acc {acc:.3f} "
              f"(margin {acc - accs['random']:+.3f})")
    accs["pretrained_final"] = curve[-1]["acc"]
    accs["mfcc_baseline"] = probe_acc(None, corpus,
                                      epochs=opts.probe_epochs,
                                      feature_type="mfcc")
    n_spk = opts.n_spk
    out = {
        "n_speakers": n_spk,
        "chance": 1.0 / n_spk,
        "random_encoder_acc": accs["random"],
        "mfcc_baseline_acc": accs["mfcc_baseline"],
        "pretrained_final_acc": accs["pretrained_final"],
        "margin_final": accs["pretrained_final"] - accs["random"],
        "curve": curve,
        "epochs": opts.epochs, "bpe": opts.bpe,
        "batch_size": opts.batch_size, "chunk_size": opts.chunk_size,
    }
    tail = curve[len(curve) // 2:]
    out["tail_margins_positive"] = all(c["margin"] > 0 for c in tail)
    out["ok"] = (out["margin_final"] >= opts.min_margin
                 and out["tail_margins_positive"])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--bpe", type=int, default=250)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--chunk_size", type=int, default=16000)
    ap.add_argument("--n_spk", type=int, default=30)
    ap.add_argument("--n_train", type=int, default=20)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--probe_epochs", type=int, default=12)
    ap.add_argument("--min_margin", type=float, default=0.05)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--json", default=None)
    opts = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    workdir = opts.workdir or tempfile.mkdtemp(prefix="transfer_gate_")
    try:
        out = run(opts, workdir)
    finally:
        if opts.workdir is None:
            shutil.rmtree(workdir, ignore_errors=True)
    print(json.dumps({k: v for k, v in out.items() if k != "curve"},
                     indent=1))
    if opts.json:
        with open(opts.json, "w") as f:
            json.dump(out, f, indent=1)
    print("[transfer]", "PASS" if out["ok"] else "FAIL",
          f"(pretrained {out['pretrained_final_acc']:.3f} vs random "
          f"{out['random_encoder_acc']:.3f} vs mfcc "
          f"{out['mfcc_baseline_acc']:.3f}, chance {out['chance']:.3f})")
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
