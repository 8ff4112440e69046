"""Does rematerialization beat the 72 ms step's HBM wall?

experiments/hlo_accounting.py certified the train step at 89 % of v5e
HBM peak with the MXU at 29 % — bandwidth-bound with FLOPs to spare.
Remat trades exactly the right way on paper (recompute instead of
store+reload of saved activations), so measure it on the dominant cost:
the PASE+ WaveFe encoder fwd+bwd at in-step shapes ([96, 32000]:
3 concatenated streams x batch 32, bf16 policy).

Variants:
  plain            — XLA's default saved-residual set
  remat            — jax.checkpoint, nothing saveable (recompute all)
  remat_dots       — dots_saveable (matmuls saved; convs + elementwise
                     chains recomputed in the bwd pass)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from pase_tpu.precision import set_compute_dtype
from pase_tpu.frontend import build_frontend_module, load_cfg

set_compute_dtype(jnp.bfloat16)


def timeit(fn, *args, n_warm=3, n_meas=25):
    for _ in range(n_warm):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32)).reshape(())))
    t0 = time.time()
    for _ in range(n_meas):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf.astype(jnp.float32)).reshape(())))
    return (time.time() - t0) / n_meas * 1e3


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_cfg(os.path.join(root, "cfg/frontend/PASE+.cfg"))
    mod = build_frontend_module(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(96, 32000).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, train=True)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def apply(params, x):
        out, _ = mod.apply({"params": params, **rest}, x, train=True,
                           mutable=[k for k in rest] + ["intermediates"])
        return out

    def make(f):
        def loss(params, x):
            return jnp.sum(f(params, x).astype(jnp.float32))
        return jax.jit(jax.grad(loss))

    variants = {
        "plain": apply,
        "remat": jax.checkpoint(
            apply, policy=jax.checkpoint_policies.nothing_saveable),
        "remat_dots": jax.checkpoint(
            apply, policy=jax.checkpoint_policies.dots_saveable),
    }
    for name, f in variants.items():
        g = make(f)
        ms = timeit(g, params, x)
        print(f"{name:12s} fwd+bwd {ms:7.2f} ms")


if __name__ == "__main__":
    main()
