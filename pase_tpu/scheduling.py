"""Multi-task loss weighting / backprop scheduling policies.

The reference implements 9 policies as imperative optimizer choreography
(/root/reference/pase/models/WorkerScheduler/worker_scheduler.py:9-429).
Here each policy is a pure function of the per-worker loss vector and a
small state pytree, producing:

  * ``weights``  — per-worker multipliers applied to the loss sum of THIS
                   step (select_one / select_half / dropout masks; ones
                   otherwise, matching the reference which backprops the
                   plain sum for base/hyper_volume/softmax/adaptive/MGD);
  * ``alpha``    — per-worker frontend-gradient scale consumed by the NEXT
                   step's forward via scale_grad (the reference's alphaSG);
  * new state.

Everything is traceable — policies run inside the jitted train step.

MGDA note: the reference re-forwards the whole model per worker and
min-norm-solves full frontend-parameter gradients (worker_scheduler.py:
348-421). We use the MGDA-UB form (Sener & Koltun 2018): gradients of each
worker loss w.r.t. the shared representation, obtained from one forward
with per-worker vjps, then Frank-Wolfe iterations in-graph.
"""

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PolicyState(NamedTuple):
    q: jnp.ndarray          # adaptive EMA reward
    last_loss: jnp.ndarray
    pi: jnp.ndarray
    count: jnp.ndarray      # select_one cycle counter


def init_policy_state(num_workers: int) -> PolicyState:
    return PolicyState(q=jnp.zeros((num_workers,)),
                       last_loss=jnp.zeros((num_workers,)),
                       pi=jnp.ones((num_workers,)),
                       count=jnp.zeros((), dtype=jnp.int32))


def apply_policy(mode: str, losses: jnp.ndarray, state: PolicyState,
                 rng: jax.Array, *, dropout_rate: float = 0.5,
                 delta: float = 1.5, temp: float = 1.0,
                 alpha_ema: float = 0.5,
                 mgda_alpha: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, PolicyState]:
    """Dispatch on the (static) policy mode string."""
    n = losses.shape[0]
    ones = jnp.ones((n,))

    if mode == "base":
        return ones, ones, state

    if mode == "select_one":
        count = state.count + 1
        sel = jnp.mod(count, n)
        w = jax.nn.one_hot(sel, n)
        return w, ones, state._replace(count=count)

    if mode == "select_half":
        # random 0/1 mask with 3-4 active workers (worker_scheduler.py:
        # 132-136). The reference rejection-samples uniform binary masks
        # until sum∈{3,4}, so P(|mask|=s) ∝ C(n,s); sample the size with
        # those exact weights (static n), then a uniform subset of it.
        from math import comb
        c3, c4 = comb(n, 3), (comb(n, 4) if n >= 4 else 0)
        p3 = c3 / max(c3 + c4, 1)
        k1, k2 = jax.random.split(rng)
        size = jnp.where(jax.random.uniform(k1, ()) < p3, 3, 4)
        order = jax.random.permutation(k2, n)
        ranks = jnp.argsort(order)
        w = (ranks < size).astype(jnp.float32)
        return w, ones, state

    if mode == "dropout":
        w = jax.random.bernoulli(rng, dropout_rate, (n,)).astype(jnp.float32)
        return w, ones, state

    if mode == "hyper_volume":
        eta = delta * jnp.max(jax.lax.stop_gradient(losses))
        alpha = 1.0 / (eta - jax.lax.stop_gradient(losses) + 1e-6)
        return ones, alpha, state

    if mode == "softmax":
        alpha = jax.nn.softmax(temp * jax.lax.stop_gradient(losses))
        return ones, alpha, state

    if mode == "adaptive":
        r_t = state.last_loss - jax.lax.stop_gradient(losses)
        q_t = alpha_ema * r_t + (1 - alpha_ema) * state.q
        pi = jax.nn.softmax(temp * q_t)
        new = state._replace(q=q_t,
                             last_loss=jax.lax.stop_gradient(losses), pi=pi)
        return ones, pi, new

    if mode == "MGD":
        assert mgda_alpha is not None, "MGD mode needs per-worker rep grads"
        return ones, mgda_alpha, state

    raise NotImplementedError(mode)


# ---------------------------------------------------------------------------
# MGDA-UB: min-norm element of the convex hull of per-worker rep-gradients
# ---------------------------------------------------------------------------


def min_norm_weights(grads: jnp.ndarray, iters: int = 20) -> jnp.ndarray:
    """Frank-Wolfe min-norm point in the convex hull of rows of ``grads``
    [n, d] (normalized like the reference's gradient_normalizers 'l2').
    Returns simplex weights [n]."""
    norms = jnp.linalg.norm(grads, axis=1, keepdims=True)
    g = grads / jnp.maximum(norms, 1e-8)
    gram = g @ g.T                                    # [n, n]
    n = gram.shape[0]
    w = jnp.ones((n,)) / n

    def body(_, w):
        v = gram @ w                                  # grad of 0.5 w'Gw
        t = jnp.argmin(v)
        e = jax.nn.one_hot(t, n)
        d = e - w
        # exact line search for quadratic: gamma = -(w'G d)/(d'G d)
        num = -jnp.dot(w, gram @ d)
        den = jnp.dot(d, gram @ d)
        gamma = jnp.clip(jnp.where(den > 1e-12, num / den, 0.0), 0.0, 1.0)
        return w + gamma * d

    w = jax.lax.fori_loop(0, iters, body, w)
    return w


def mgda_rep_weights(per_worker_rep_grads: jnp.ndarray) -> jnp.ndarray:
    """[n_workers, ...rep dims] -> simplex weights via MGDA-UB."""
    n = per_worker_rep_grads.shape[0]
    flat = per_worker_rep_grads.reshape(n, -1)
    return min_norm_weights(flat)
