"""Downstream probe tasks on frozen PASE features.

* utterance classification (speaker-ID / MiniVoxCeleb, language-ID /
  VoxForge, emotion / IEMOCAP): run_utt_classification — the
  run_minivox_fast.py / run_IEMOCAP_fast.py pattern (features in
  'avg_concat' mode, global mean/var norm, 1-hidden MLP, frame +
  sentence error).
* frame classification (TIMIT FER fast probe): run_frame_classification —
  the run_TIMIT_fast.py pattern (per-speaker mean norm, context window,
  MLP on frame alignments). Full Kaldi lattice decoding stays an external
  step (ASR/kaldi_decoding_scripts in the reference); this produces the
  log-posterior matrices it consumes (write_posteriors_ark).

List formats: text files with `wavpath label` per line (utterance tasks)
or `wavpath alifile` (frame tasks; alifile = one int per 10ms frame).
"""

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from pase_tpu.probes.extract import FeatureExtractor, speaker_mean_norm
from pase_tpu.probes.classifier import (train_mlp_probe, sentence_accuracy,
                                        context_window, knn_classify)
from pase_tpu.data.io import read_wav


def _read_list(path: str) -> List[Tuple[str, str]]:
    out = []
    with open(path) as f:
        for line in f:
            parts = line.strip().split()
            if len(parts) >= 2:
                out.append((parts[0], parts[1]))
    return out


def _global_norm(train_feats: List[np.ndarray]):
    allf = np.concatenate(train_feats, axis=0)
    mean = allf.mean(axis=0)
    std = allf.std(axis=0) + 1e-8
    return mean, std


def run_utt_classification(fe_cfg, fe_ckpt, train_list, test_list,
                           data_root: str = "", mode: str = "avg_concat",
                           hidden=(256,), epochs: int = 20, lr: float = 0.1,
                           batch_size: int = 2048, seed: int = 0,
                           max_utts: Optional[int] = None, log=print,
                           feature_type: str = "pase"):
    """Returns metrics dict with frame/sentence accuracies.
    feature_type='mfcc'/'fbank' runs the classical-feature baseline
    (spk_id/mfcc_baseline.py)."""
    ex = FeatureExtractor(fe_cfg, fe_ckpt, mode=mode,
                          feature_type=feature_type)
    tr = _read_list(train_list)[:max_utts]
    te = _read_list(test_list)[:max_utts]
    labels = sorted({l for _, l in tr})
    lab2i = {l: i for i, l in enumerate(labels)}

    unseen = sorted({l for _, l in te} - set(labels))
    if unseen:
        # a max_utts-truncated train list can miss classes present in
        # test; fail fast instead of a KeyError after extraction
        raise ValueError(f"test labels absent from the train list: "
                         f"{unseen} (raise --max_utts?)")

    def load(split):
        feats, ys = [], []
        for path, lab in split:
            f = ex.extract_file(os.path.join(data_root, path))
            feats.append(f)
            ys.append(lab2i[lab])
        return feats, ys

    tr_f, tr_y = load(tr)
    te_f, te_y = load(te)
    mean, std = _global_norm(tr_f)
    tr_f = [(f - mean) / std for f in tr_f]
    te_f = [(f - mean) / std for f in te_f]
    x_tr = np.concatenate(tr_f, axis=0)
    y_tr = np.concatenate([np.full(len(f), y) for f, y in zip(tr_f, tr_y)])
    x_te = np.concatenate(te_f, axis=0)
    y_te = np.concatenate([np.full(len(f), y) for f, y in zip(te_f, te_y)])
    model_vars, metrics = train_mlp_probe(
        x_tr, y_tr.astype(np.int32), x_te, y_te.astype(np.int32),
        num_classes=len(labels), hidden=hidden, epochs=epochs, lr=lr,
        batch_size=batch_size, seed=seed, log=log)
    metrics["test_frame_acc"] = 1.0 - metrics["dev_frame_error"]
    metrics["test_sentence_acc"] = sentence_accuracy(model_vars, te_f, te_y)
    if log:
        log(f"FINAL test sentence acc: {metrics['test_sentence_acc']:.4f}")
    return metrics


def run_knn_probe(fe_cfg, fe_ckpt, train_list, test_list, data_root="",
                  mode="avg_concat", k=5, max_utts=None, log=print):
    """Utterance-mean-embedding KNN (spk_id/knn.py pattern)."""
    ex = FeatureExtractor(fe_cfg, fe_ckpt, mode=mode)
    tr = _read_list(train_list)[:max_utts]
    te = _read_list(test_list)[:max_utts]
    labels = sorted({l for _, l in tr})
    lab2i = {l: i for i, l in enumerate(labels)}

    def embed(split):
        xs, ys = [], []
        for path, lab in split:
            f = ex.extract_file(os.path.join(data_root, path))
            xs.append(f.mean(axis=0))
            ys.append(lab2i[lab])
        return np.stack(xs), np.asarray(ys)

    xtr, ytr = embed(tr)
    xte, yte = embed(te)
    pred = knn_classify(xtr, ytr, xte, k=k, num_classes=len(labels))
    acc = float((pred == yte).mean())
    if log:
        log(f"KNN (k={k}) test acc: {acc:.4f}")
    return {"knn_test_acc": acc}


def run_frame_classification(fe_cfg, fe_ckpt, train_list, test_list,
                             data_root: str = "", num_classes: int = 48,
                             left: int = 8, right: int = 8,
                             hidden=(1024,), epochs: int = 10,
                             lr: float = 0.1, utt2spk: Optional[dict] = None,
                             max_utts: Optional[int] = None, log=print):
    """TIMIT-style frame error rate on alignments (FER fast probe)."""
    ex = FeatureExtractor(fe_cfg, fe_ckpt, mode=None)
    tr = _read_list(train_list)[:max_utts]
    te = _read_list(test_list)[:max_utts]

    def load(split):
        feats, alis = {}, {}
        for path, alifile in split:
            f = ex.extract_file(os.path.join(data_root, path))
            a = np.loadtxt(os.path.join(data_root, alifile),
                           dtype=np.int32).reshape(-1)
            n = min(len(f), len(a))
            feats[path] = f[:n]
            alis[path] = a[:n]
        return feats, alis

    tr_f, tr_a = load(tr)
    te_f, te_a = load(te)
    if utt2spk:
        tr_f = speaker_mean_norm(tr_f, utt2spk)
        te_f = speaker_mean_norm(te_f, utt2spk)
    x_tr = np.concatenate([context_window(f, left, right)
                           for f in tr_f.values()])
    y_tr = np.concatenate(list(tr_a.values()))
    x_te = np.concatenate([context_window(f, left, right)
                           for f in te_f.values()])
    y_te = np.concatenate(list(te_a.values()))
    _, metrics = train_mlp_probe(x_tr, y_tr, x_te, y_te,
                                 num_classes=num_classes, hidden=hidden,
                                 epochs=epochs, lr=lr, log=log)
    metrics["test_fer"] = metrics["dev_frame_error"]
    if log:
        log(f"FINAL test FER: {metrics['test_fer']:.4f}")
    return metrics


def write_posteriors_ark(model_vars, utt_feats: Dict[str, np.ndarray],
                         log_priors: np.ndarray, out_path: str,
                         left: int = 8, right: int = 8):
    """Dump Kaldi text-ark log-posteriors minus log-priors for external
    HMM decoding (run_TIMIT_full_decoding.py:426-559 contract)."""
    import jax.numpy as jnp
    model = model_vars["model"]
    with open(out_path, "w") as f:
        for utt, feats in utt_feats.items():
            x = context_window(feats, left, right)
            out = model.apply({"params": model_vars["params"],
                               "batch_stats": model_vars["batch_stats"]},
                              jnp.asarray(x), train=False)
            mat = np.asarray(out) - log_priors[None, :]
            f.write(f"{utt}  [\n")
            for row in mat:
                f.write("  " + " ".join(f"{v:.6f}" for v in row) + "\n")
            f.write("]\n")


def run_kfold_classification(fe_cfg, fe_ckpt, data_list, data_root="",
                             folds=10, valid_p=0.1, mode="avg_concat",
                             hidden=(), epochs: int = 15, lr: float = 0.05,
                             batch_size: int = 2048, seed: int = 0,
                             max_utts: Optional[int] = None, log=print,
                             feature_type: str = "pase"):
    """K-fold utterance classification (the emorec/train.py recipe over
    pase/utils.py kfold_data): class-stratified folds, a linear (or MLP,
    via ``hidden``) frame classifier on frozen features per fold —
    LinearClassifier semantics of spk_id/nnet.py:24-50 — reporting
    mean +- std frame/sentence accuracy across folds."""
    from pase_tpu.utils import kfold_data

    entries = _read_list(data_list)[:max_utts]
    utt2class = {p: l for p, l in entries}
    labels = sorted(set(utt2class.values()))
    lab2i = {l: i for i, l in enumerate(labels)}
    ex = FeatureExtractor(fe_cfg, fe_ckpt, mode=mode,
                          feature_type=feature_type)
    feats = {p: ex.extract_file(os.path.join(data_root, p))
             for p, _ in entries}
    splits = kfold_data([p for p, _ in entries], utt2class, folds=folds,
                        valid_p=valid_p, seed=seed)
    frame_accs, sent_accs = [], []
    for fi, (tr, va, te) in enumerate(splits):
        mean, std = _global_norm([feats[p] for p in tr])

        def flat(paths):
            fs = [(feats[p] - mean) / std for p in paths]
            ys = [lab2i[utt2class[p]] for p in paths]
            x = np.concatenate(fs, axis=0)
            y = np.concatenate([np.full(len(f), yy)
                                for f, yy in zip(fs, ys)])
            return fs, ys, x, y.astype(np.int32)

        _, _, x_tr, y_tr = flat(tr)
        te_f, te_y, x_te, y_te = flat(te)
        # the held-out valid_p slice drives lr halving / model
        # selection; test frames are only ever EVALUATED (falls back to
        # the test fold as dev when valid_p leaves nothing, preserving
        # the fast-probe recipe's monitor-on-test behavior)
        if va:
            _, _, x_dev, y_dev = flat(va)
        else:
            x_dev, y_dev = x_te, y_te
        model_vars, metrics = train_mlp_probe(
            x_tr, y_tr, x_dev, y_dev, num_classes=len(labels),
            hidden=tuple(hidden), epochs=epochs, lr=lr,
            batch_size=batch_size, seed=seed + fi, log=None)
        from pase_tpu.probes.classifier import frame_error_rate
        fa = 1.0 - frame_error_rate(model_vars, x_te, y_te)
        sa = sentence_accuracy(model_vars, te_f, te_y)
        frame_accs.append(fa)
        sent_accs.append(sa)
        if log:
            log(f"fold {fi}: frame acc {fa:.4f}, sentence acc {sa:.4f}")
    out = {
        "folds": folds,
        "frame_acc_mean": float(np.mean(frame_accs)),
        "frame_acc_std": float(np.std(frame_accs)),
        "sentence_acc_mean": float(np.mean(sent_accs)),
        "sentence_acc_std": float(np.std(sent_accs)),
    }
    if log:
        log(f"KFOLD: sentence acc {out['sentence_acc_mean']:.4f} "
            f"+- {out['sentence_acc_std']:.4f}")
    return out
