"""Downstream probe tests on synthetic class-separable audio."""

import os
import jax.numpy as jnp

import numpy as np
import pytest
import jax.numpy as jnp

from pase_tpu.data.io import write_wav
from pase_tpu.probes.classifier import (context_window, train_mlp_probe,
                                        knn_classify, sentence_accuracy)
from pase_tpu.probes import tasks

SR = 16000


def test_context_window():
    f = np.arange(12, dtype=np.float32).reshape(4, 3)
    cw = context_window(f, 1, 1)
    assert cw.shape == (4, 9)
    np.testing.assert_allclose(cw[0, :3], f[0])   # edge replicated
    np.testing.assert_allclose(cw[1], np.concatenate([f[0], f[1], f[2]]))


def test_mlp_probe_learns():
    rng = np.random.RandomState(0)
    n, d = 4000, 16
    centers = rng.randn(4, d) * 2.0
    y = rng.randint(0, 4, n)
    x = centers[y] + rng.randn(n, d) * 0.5
    yd = rng.randint(0, 4, 800)
    xd = centers[yd] + rng.randn(800, d) * 0.5
    _, metrics = train_mlp_probe(x.astype(np.float32), y.astype(np.int32),
                                 xd.astype(np.float32), yd.astype(np.int32),
                                 num_classes=4, hidden=(32,), epochs=8,
                                 lr=0.05, batch_size=256, log=None)
    assert metrics["dev_frame_error"] < 0.1, metrics


def test_knn():
    rng = np.random.RandomState(1)
    centers = rng.randn(3, 8) * 3
    ytr = rng.randint(0, 3, 300)
    xtr = centers[ytr] + rng.randn(300, 8) * 0.3
    yte = rng.randint(0, 3, 100)
    xte = centers[yte] + rng.randn(100, 8) * 0.3
    pred = knn_classify(xtr.astype(np.float32), ytr,
                        xte.astype(np.float32), k=5)
    assert (pred == yte).mean() > 0.9


@pytest.fixture(scope="module")
def synth_corpus(tmp_path_factory):
    """Two 'speakers' with distinct f0 / spectral tilt."""
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.RandomState(0)
    lists = {"train": [], "test": []}
    for split, n_utts in (("train", 8), ("test", 4)):
        for u in range(n_utts):
            lab = u % 2
            f0 = 110 if lab == 0 else 240
            t = np.arange(SR)  # 1 s
            sig = sum(np.sin(2 * np.pi * f0 * k * t / SR) / k
                      for k in range(1, 5))
            sig = sig * 0.2 + rng.randn(SR) * 0.01
            fname = f"{split}_{u}.wav"
            write_wav(str(root / fname), sig.astype(np.float32))
            lists[split].append((fname, f"spk{lab}"))
    for split in lists:
        with open(root / f"{split}.lst", "w") as f:
            for path, lab in lists[split]:
                f.write(f"{path} {lab}\n")
    return root


SMALL_FE = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
            "fmaps": [32, 32, 64, 64], "emb_dim": 64, "norm_out": True}


def test_utt_classification_probe(synth_corpus):
    metrics = tasks.run_utt_classification(
        SMALL_FE, None, str(synth_corpus / "train.lst"),
        str(synth_corpus / "test.lst"), data_root=str(synth_corpus),
        hidden=(32,), epochs=6, lr=0.05, batch_size=128, log=None)
    # random encoder features still separate 110 vs 240 Hz trivially
    assert metrics["test_sentence_acc"] >= 0.75, metrics


def test_knn_probe(synth_corpus):
    metrics = tasks.run_knn_probe(
        SMALL_FE, None, str(synth_corpus / "train.lst"),
        str(synth_corpus / "test.lst"), data_root=str(synth_corpus),
        k=3, log=None)
    assert metrics["knn_test_acc"] >= 0.75, metrics


def test_frame_classification_probe(synth_corpus, tmp_path):
    # build frame alignments: class == speaker for every frame
    for split in ("train", "test"):
        lines = []
        with open(synth_corpus / f"{split}.lst") as f:
            for line in f:
                path, lab = line.split()
                ali = np.full(SR // 160, int(lab[-1]), dtype=np.int32)
                alifile = path.replace(".wav", ".ali")
                np.savetxt(synth_corpus / alifile, ali, fmt="%d")
                lines.append(f"{path} {alifile}\n")
        with open(synth_corpus / f"{split}_frames.lst", "w") as f:
            f.writelines(lines)
    metrics = tasks.run_frame_classification(
        SMALL_FE, None, str(synth_corpus / "train_frames.lst"),
        str(synth_corpus / "test_frames.lst"),
        data_root=str(synth_corpus), num_classes=2, left=2, right=2,
        hidden=(32,), epochs=12, lr=0.05, log=None)
    assert metrics["test_fer"] <= 0.35, metrics


@pytest.mark.parametrize("cell", ["gru", "lstm", "ligru"])
def test_rnn_classifier(cell):
    from pase_tpu.probes.classifier import RNNClassifier
    import jax
    m = RNNClassifier(num_classes=3, hidden=16, cell_type=cell)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 8)
                    .astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 20, 3)
    s = np.exp(np.asarray(y)).sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_kfold_classification_probe(synth_corpus):
    """Class-stratified k-fold linear-classifier suite
    (pase/utils.py kfold_data + spk_id LinearClassifier semantics)."""
    # single labeled list: train+test combined
    combined = synth_corpus / "all.lst"
    lines = []
    for split in ("train", "test"):
        lines += open(synth_corpus / f"{split}.lst").readlines()
    combined.write_text("".join(lines))
    metrics = tasks.run_kfold_classification(
        SMALL_FE, None, str(combined), data_root=str(synth_corpus),
        folds=3, hidden=(), epochs=8, lr=0.05, batch_size=256, log=None)
    assert metrics["folds"] == 3
    assert 0.0 <= metrics["sentence_acc_mean"] <= 1.0
    assert metrics["sentence_acc_mean"] >= 0.6, metrics


@pytest.mark.slow
def test_run_probe_cli_platform_cpu(synth_corpus, tmp_path):
    """run_probe.py --platform cpu forces the jax backend in a fresh
    process (the AuxiliarSuperviser pinning used by experiments/
    tpu_soak.py) and completes the utt probe end to end."""
    import json
    import subprocess
    import sys
    cfg = tmp_path / "fe.cfg"
    cfg.write_text(json.dumps(SMALL_FE))
    out = tmp_path / "probe.json"
    code = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "run_probe.py"),
         "utt", "--fe_cfg", str(cfg),
         "--train_list", str(synth_corpus / "train.lst"),
         "--test_list", str(synth_corpus / "test.lst"),
         "--data_root", str(synth_corpus),
         "--epochs", "3", "--platform", "cpu", "--out", str(out)],
        capture_output=True, text=True, timeout=580)
    assert code.returncode == 0, code.stderr[-2000:]
    m = json.loads(out.read_text())
    assert 0.0 <= m["test_sentence_acc"] <= 1.0
