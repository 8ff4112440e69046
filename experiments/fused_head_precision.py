"""Quantify the fused wide-head loss VALUE error vs matmul precision.

losses.framed_mse_linear computes mean((hW+b - frame_r(T))^2) via the
expansion ||p||^2 - 2<p,T_f> + ||T_f||^2, whose rounding error scales
with the TERM magnitudes, not the residual — so under the TPU default
(one bf16 pass) the reported value loses relative accuracy as pred
approaches target. This script measures that error at realistic
operating points (ZNorm'd targets, controlled residual RMS) on the real
chip, against a truth anchor that is residual-scaled by construction:
the materialized f32 prediction at Precision.HIGHEST, where the
subtraction (p - T) happens before any squaring.

Outcome (v5e, recorded benchmarks/README.md): the loss floor is O(1)
at every residual RMS — a rank-H head's r-framed prediction cannot
match all r shifted copies of the target at once, which matches real
lps training curves — and in that regime the DEFAULT value error is
5e-6..9e-6 relative, with HIGH no better (7e-6..1.3e-5). The deep-
cancellation regime the HIGH default guarded against is unreachable by
the model itself. That is why the Trainer reserves Precision.HIGH
(measured 4.3 ms/step at PASE+ shapes — the whole r3 bench regression)
for value-consuming policies and eval, and lets the hot base-policy
path use the backend default.

Run: python experiments/fused_head_precision.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from pase_tpu.losses import framed_mse_linear, contextualize_r

# lps-head-like shapes, small enough to compile in seconds
B, T, H, D, R = 8, 200, 256, 1025, 3


def materialized_loss(kernel, bias, h, target, r):
    p = jnp.matmul(h, kernel, precision=jax.lax.Precision.HIGHEST)
    p = p + bias
    tf = contextualize_r(target, r)
    return jnp.mean(jnp.square(p - tf))


def main():
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    kernel = jnp.asarray((rng.randn(H, D * R) / np.sqrt(H))
                         .astype(np.float32))
    bias = jnp.asarray(rng.randn(D * R).astype(np.float32) * 0.01)

    # target = (materialized prediction, unframed back) + residual noise:
    # builds an operating point where loss ~= residual_rms^2 against
    # z-scale targets, i.e. the late-training cancellation regime.
    pred = np.asarray(jnp.matmul(
        h, kernel, precision=jax.lax.Precision.HIGHEST) + bias)
    # take the center frame (j = r//2) as the unframed target basis
    ctr = pred.reshape(B, T, D, R)[..., R // 2]

    results = []
    for res_rms in (1.0, 0.3, 0.1, 0.03):
        tgt = jnp.asarray(ctr + rng.randn(B, T, D).astype(np.float32)
                          * res_rms)
        truth = float(jax.jit(materialized_loss, static_argnums=4)(
            kernel, bias, h, tgt, R))
        row = {"residual_rms": res_rms, "loss": truth}
        for label, prec in (("default", None),
                            ("high", jax.lax.Precision.HIGH),
                            ("highest", jax.lax.Precision.HIGHEST)):
            v = float(jax.jit(framed_mse_linear,
                              static_argnums=(4, 5))(
                kernel, bias, h, tgt, R, prec))
            row[f"rel_err_{label}"] = abs(v - truth) / max(truth, 1e-30)
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
