"""Per-worker channel-selection variants.

* ``AttentionBlock`` (/root/reference/pase/models/attention_block.py:6-80):
  an MLP scores the emb channels from a pooled view of the hidden, an EMA
  ('running average') distribution is kept, and the top-K channels form a
  hard 0/1 mask multiplied onto the hidden. As in the reference, the mask
  is non-differentiable (the scoring MLP is not trained through it).
* ``pase_chunking``'s fixed random channel masks
  (/root/reference/pase/models/pase.py:133-236): K channels per worker,
  drawn once at init.
"""

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class AttentionBlock(nn.Module):
    emb_dim: int
    K: int = 40
    avg_factor: float = 0.0
    att_mode: str = "avg_time"     # 'concat' | 'avg_time' | 'avg_time_batch'
    hidden: Sequence[int] = (256,)

    @nn.compact
    def __call__(self, h, train: bool = False):
        """h: [B, F, D] -> (masked h, mask [B, D])."""
        b, f, d = h.shape
        if self.att_mode == "concat":
            feat = h.reshape(b, f * d)
        elif self.att_mode == "avg_time":
            feat = h.mean(axis=1)
        elif self.att_mode == "avg_time_batch":
            feat = h.mean(axis=1).mean(axis=0, keepdims=True)
        else:
            raise ValueError(self.att_mode)
        x = feat
        for i, hd in enumerate(self.hidden):
            x = nn.Dense(hd, name=f"mlp_{i}")(x)
            x = nn.relu(x)
        dist = jax.nn.softmax(nn.Dense(self.emb_dim, name="mlp_out")(x),
                              axis=-1)
        running = self.variable("batch_stats", "running_dist",
                                lambda: jnp.ones((self.emb_dim,))
                                / self.emb_dim)
        dist = (running.value[None, :] * self.avg_factor +
                dist * (1.0 - self.avg_factor))
        if train and not self.is_initializing():
            running.value = jax.lax.stop_gradient(jnp.mean(dist, axis=0))
        if dist.shape[0] != b:
            dist = jnp.broadcast_to(dist, (b, self.emb_dim))
        _, idx = jax.lax.top_k(jax.lax.stop_gradient(dist), self.K)
        mask = jnp.zeros((b, self.emb_dim)).at[
            jnp.arange(b)[:, None], idx].set(1.0)
        mask = jax.lax.stop_gradient(mask)
        return h * mask[:, None, :], mask


def make_chunk_masks(worker_names, emb_dim: int, K: int, seed: int = 0):
    """Fixed random per-worker channel masks (pase_chunking)."""
    rng = np.random.RandomState(seed)
    masks = {}
    for name in worker_names:
        sel = rng.choice(emb_dim, size=min(K, emb_dim), replace=False)
        m = np.zeros((emb_dim,), np.float32)
        m[sel] = 1.0
        masks[name] = jnp.asarray(m)
    return masks
