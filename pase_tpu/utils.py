"""Misc utilities: AuxiliarSuperviser (async downstream probe launcher),
grad-norm introspection, zerospeech sampling."""

import os
import shlex
import subprocess
from typing import List

import jax
import numpy as np


class AuxiliarSuperviser:
    """After selected epochs, substitute $model/$cfg/$iteration/$save_path
    into command templates and spawn them asynchronously
    (/root/reference/pase/utils.py:164-185)."""

    def __init__(self, cmd_file: str, save_path: str = "."):
        self.cmd_file = cmd_file
        self.save_path = save_path
        with open(cmd_file) as f:
            self.cmds = [l.rstrip() for l in f
                         if l.strip() and not l.lstrip().startswith("#")]
        self.procs: List[subprocess.Popen] = []

    def __call__(self, iteration: int, ckpt_path: str, cfg_path: str):
        # reap finished children — unreaped Popen handles accumulate
        # zombies/fds over a multi-hundred-epoch run
        self.procs = [p for p in self.procs if p.poll() is None]
        for cmd in self.cmds:
            sub = cmd.replace("$model", ckpt_path)
            sub = sub.replace("$cfg", cfg_path)
            sub = sub.replace("$iteration", str(iteration))
            sub = sub.replace("$save_path", self.save_path)
            self.procs.append(subprocess.Popen(sub, shell=True))


def get_grad_norms(grads, keys=()):
    """Per-subtree gradient L2 norms for logging
    (/root/reference/pase/utils.py:188-203)."""
    from flax.traverse_util import flatten_dict
    from flax.core import unfreeze
    flat = flatten_dict(unfreeze(grads), sep="/")
    out = {}
    for k, v in flat.items():
        if keys and not any(s in k for s in keys):
            continue
        out[k] = float(jax.numpy.linalg.norm(v.reshape(-1)))
    return out


def sample_probable(p, rng=np.random):
    return rng.random_sample() < p


def zerospeech(n_samples: int, rng=np.random):
    return (rng.randn(n_samples) * 1e-5).astype(np.float32)


def kfold_data(data_list, utt2class, folds=10, valid_p=0.1, seed=0):
    """Class-stratified sliding-window k-fold splits
    (/root/reference/pase/utils.py:122-162): shuffle within class, slide
    a 1/folds test window per class, carve a valid split out of the
    remaining train items. Returns [[train, valid, test], ...] x folds.

    Deviation: the reference draws valid from the head of the ALREADY
    valid-trimmed train list, so its valid overlaps train; here valid
    and train are disjoint (the documented intent).
    """
    import numpy as np
    rng = np.random.RandomState(seed)
    classes = sorted(set(utt2class.values()))
    items = {k: [d for d in data_list if utt2class[d] == k]
             for k in classes}
    for k in classes:
        items[k] = [items[k][i] for i in rng.permutation(len(items[k]))]
    test_n = {k: max(int((1.0 / folds) * len(items[k])), 1)
              for k in classes}
    lists = []
    for fi in range(folds):
        train_split, valid_split, test_split = [], [], []
        for k in classes:
            data = items[k]
            beg = (fi * test_n[k]) % max(len(data), 1)
            te = data[beg:beg + test_n[k]]
            rest = data[:beg] + data[beg + test_n[k]:]
            nv = int(valid_p * len(rest))
            valid_split += rest[:nv]
            train_split += rest[nv:]
            test_split += te
        lists.append([train_split, valid_split, test_split])
    return lists
