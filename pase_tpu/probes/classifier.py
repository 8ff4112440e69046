"""Downstream probe machinery: frozen-encoder features -> MLP / KNN.

Reproduces the shared pattern of the reference probes
(/root/reference/spk_id/run_minivox_fast.py:54-311,
emorec/run_IEMOCAP_fast.py:44-327, ASR/run_TIMIT_fast.py, and the
pytorch-kaldi MLP + context_window in pase/models/neural_networks.py:
21-35, 76-168): extract PASE features per utterance, optionally
context-window them, train a small MLP with NLL + SGD and lr halving on
dev error, report frame and sentence error rates.
"""

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
import optax


def context_window(feats: np.ndarray, left: int, right: int) -> np.ndarray:
    """[T, D] -> [T, D*(left+1+right)] frame stacking (edge replication),
    matching neural_networks.py:context_window semantics."""
    t, d = feats.shape
    idx = np.arange(t)[:, None] + np.arange(-left, right + 1)[None, :]
    idx = np.clip(idx, 0, t - 1)
    return feats[idx].reshape(t, d * (left + 1 + right))


class MLPClassifier(nn.Module):
    """Hidden ReLU/PReLU MLP + log-softmax output."""
    num_classes: int
    hidden: Sequence[int] = (256,)
    dropout: float = 0.0
    batch_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, h in enumerate(self.hidden):
            x = nn.Dense(h, name=f"dense_{i}")(x)
            if self.batch_norm:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.95, name=f"bn_{i}")(x)
            x = nn.relu(x)
            if self.dropout > 0 and train:
                x = nn.Dropout(self.dropout, deterministic=False)(x)
        x = nn.Dense(self.num_classes, name="out")(x)
        return nn.log_softmax(x)


class LiGRUCell(nn.RNNCellBase):
    """Light GRU cell (Ravanelli et al. 2018; the pytorch-kaldi zoo used
    by the reference probes, pase/models/neural_networks.py):
    z = sigmoid(Wz x + Uz h); hcand = relu(W x + U h);
    h' = z*h + (1-z)*hcand."""
    features: int

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        z = nn.sigmoid(nn.Dense(self.features, name="wz")(x) +
                       nn.Dense(self.features, use_bias=False,
                                name="uz")(h))
        hcand = nn.relu(nn.Dense(self.features, name="wh")(x) +
                        nn.Dense(self.features, use_bias=False,
                                 name="uh")(h))
        new_h = z * h + (1 - z) * hcand
        return new_h, new_h

    @nn.nowrap
    def initialize_carry(self, rng, input_shape):
        return jnp.zeros(input_shape[:-1] + (self.features,))

    @property
    def num_feature_axes(self):
        return 1


class RNNClassifier(nn.Module):
    """Sequence classifier head zoo (LSTM/GRU/liGRU) matching the
    reference's downstream neural_networks options; log-softmax out."""
    num_classes: int
    hidden: int = 256
    layers: int = 1
    cell_type: str = "gru"      # 'gru' | 'lstm' | 'ligru'

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, T, D]
        h = x
        for i in range(self.layers):
            if self.cell_type == "lstm":
                cell = nn.OptimizedLSTMCell(self.hidden, name=f"lstm_{i}")
            elif self.cell_type == "ligru":
                cell = LiGRUCell(self.hidden, name=f"ligru_{i}")
            else:
                cell = nn.GRUCell(self.hidden, name=f"gru_{i}")
            h = nn.RNN(cell, name=f"rnn_{i}")(h)
        out = nn.Dense(self.num_classes, name="out")(h)
        return nn.log_softmax(out)


def train_mlp_probe(train_x: np.ndarray, train_y: np.ndarray,
                    dev_x: np.ndarray, dev_y: np.ndarray,
                    num_classes: int, hidden: Sequence[int] = (256,),
                    epochs: int = 20, batch_size: int = 2048,
                    lr: float = 0.1, halving_factor: float = 0.5,
                    improvement_threshold: float = 0.001,
                    seed: int = 0, dropout: float = 0.0,
                    log=None) -> Tuple[dict, Dict[str, float]]:
    """SGD + NLL with dev-error lr halving (the pytorch-kaldi recipe used
    across all reference probes). Returns (variables, metrics)."""
    model = MLPClassifier(num_classes=num_classes, hidden=tuple(hidden),
                          dropout=dropout)
    rng = jax.random.PRNGKey(seed)
    variables = model.init({"params": rng, "dropout": rng},
                           jnp.zeros((2, train_x.shape[1])), train=False)
    params, batch_stats = variables["params"], variables.get("batch_stats",
                                                             {})
    lr_var = lr

    @jax.jit
    def step(params, batch_stats, opt_state, x, y, lr_now, key):
        def loss_fn(p):
            out, ups = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                rngs={"dropout": key}, mutable=["batch_stats"])
            nll = -jnp.mean(jnp.take_along_axis(out, y[:, None], axis=1))
            return nll, ups["batch_stats"]
        (nll, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        updates = jax.tree.map(lambda g: -lr_now * g, grads)
        return optax.apply_updates(params, updates), new_bs, nll

    @jax.jit
    def predict(params, batch_stats, x):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           x, train=False)

    def error_rate(params, batch_stats, x, y, bs=8192):
        errs, n = 0, 0
        for i in range(0, len(x), bs):
            out = predict(params, batch_stats, jnp.asarray(x[i:i + bs]))
            pred = np.asarray(jnp.argmax(out, axis=-1))
            errs += (pred != y[i:i + bs]).sum()
            n += len(pred)
        return errs / max(n, 1)

    nprng = np.random.RandomState(seed)
    best_dev = 1.0
    prev_dev = 1.0
    opt_state = None
    key = rng
    batch_size = min(batch_size, len(train_x))
    for e in range(epochs):
        order = nprng.permutation(len(train_x))
        tr_nll = []
        for i in range(0, len(order) - batch_size + 1, batch_size):
            sel = order[i:i + batch_size]
            key, sub = jax.random.split(key)
            params, batch_stats, nll = step(
                params, batch_stats, opt_state,
                jnp.asarray(train_x[sel]), jnp.asarray(train_y[sel]),
                lr_var, sub)
            tr_nll.append(float(nll))
        dev_err = error_rate(params, batch_stats, dev_x, dev_y)
        if log:
            log(f"epoch {e}: nll {np.mean(tr_nll):.4f} dev_err "
                f"{dev_err:.4f} lr {lr_var:.4f}")
        # lr halving on stagnating dev error (pytorch-kaldi recipe)
        if (prev_dev - dev_err) < improvement_threshold * prev_dev:
            lr_var *= halving_factor
        prev_dev = dev_err
        best_dev = min(best_dev, dev_err)
    metrics = {"dev_frame_error": float(prev_dev),
               "best_dev_frame_error": float(best_dev)}
    return {"params": params, "batch_stats": batch_stats,
            "model": model}, metrics


def frame_error_rate(model_vars, x, y, bs: int = 8192) -> float:
    """Frame error of a trained probe on held-out frames (module-level
    counterpart of train_mlp_probe's internal dev monitor)."""
    model = model_vars["model"]
    errs, n = 0, 0
    for i in range(0, len(x), bs):
        out = model.apply({"params": model_vars["params"],
                           "batch_stats": model_vars["batch_stats"]},
                          jnp.asarray(x[i:i + bs]), train=False)
        pred = np.asarray(jnp.argmax(out, axis=-1))
        errs += (pred != y[i:i + bs]).sum()
        n += len(pred)
    return float(errs) / max(n, 1)


def sentence_accuracy(model_vars, utt_feats: List[np.ndarray],
                      utt_labels: List[int]) -> float:
    """Sentence-level decision = argmax of mean per-frame log-posterior
    (run_minivox_fast.py / run_IEMOCAP_fast.py pattern)."""
    model = model_vars["model"]
    correct = 0
    for feats, lab in zip(utt_feats, utt_labels):
        out = model.apply({"params": model_vars["params"],
                           "batch_stats": model_vars["batch_stats"]},
                          jnp.asarray(feats), train=False)
        pred = int(jnp.argmax(jnp.mean(out, axis=0)))
        correct += int(pred == lab)
    return correct / max(len(utt_labels), 1)


def knn_classify(train_x, train_y, test_x, k: int = 5,
                 num_classes: Optional[int] = None) -> np.ndarray:
    """Batched KNN on device (spk_id/knn.py replacement): squared-L2
    distances as one matmul."""
    num_classes = num_classes or int(train_y.max()) + 1
    trx = jnp.asarray(train_x)
    tex = jnp.asarray(test_x)
    tr2 = jnp.sum(trx ** 2, axis=1)
    te2 = jnp.sum(tex ** 2, axis=1)
    d = te2[:, None] + tr2[None, :] - 2.0 * tex @ trx.T
    _, idx = jax.lax.top_k(-d, k)
    votes = jnp.asarray(train_y)[idx]                      # [n_test, k]
    onehot = jax.nn.one_hot(votes, num_classes).sum(axis=1)
    return np.asarray(jnp.argmax(onehot, axis=-1))
