"""Metrics logging: JSONL scalars + stdout (tensorboardX replacement;
reference: /root/reference/pase/log.py + trainer.py:387-451). Throughput
counters (steps/sec, audio-sec/sec) are first-class (SURVEY.md §5.1)."""

import json
import os
import sys
import time
from typing import Dict


class MetricLogger:

    def __init__(self, save_path: str, fname: str = "metrics.jsonl",
                 echo: bool = True):
        self.save_path = save_path
        os.makedirs(save_path, exist_ok=True)
        self.path = os.path.join(save_path, fname)
        self.echo = echo
        self._f = None

    def log(self, split: str, step: int, scalars: Dict[str, float]):
        # multi-host: only process 0 writes/echoes (same save_path on a
        # shared filesystem would interleave otherwise)
        import jax
        if jax.process_index() != 0:
            return
        rec = {"t": time.time(), "split": split, "step": int(step)}
        for k, v in scalars.items():
            if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0:
                rec[k] = [float(x) for x in v]     # histogram rows etc.
            else:
                rec[k] = float(v)
        if self._f is None:
            self._f = open(self.path, "a")
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.echo:
            msg = " ".join(f"{k}={v:.4f}" for k, v in rec.items()
                           if isinstance(v, float) and k != "t")
            print(f"[{split} @ {step}] {msg}", file=sys.stderr)
