"""Device mesh + sharding helpers.

The reference has no distributed path (SURVEY.md §2.10: single-GPU
nn.DataParallel on a legacy branch only). Here scaling is mesh-native:
a ('data', 'model') mesh; batch-sharded data parallelism over ICI is the
primary strategy (gradient all-reduce happens inside XLA via GSPMD), with
the 'model' axis plumbed for larger encoders.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_data: Optional[int] = None, n_model: int = 1,
             devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis of every array over the 'data' axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / states) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
