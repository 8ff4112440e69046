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


def state_shardings(tree, mesh: Mesh, min_lanes: int = 64):
    """Column-parallel ('tensor parallel') sharding rule for a parameter /
    optimizer pytree: shard the trailing (output-channel / lane) axis of
    every large-enough leaf over the 'model' axis, replicate the rest.

    Conv kernels [K, Cin, Cout] and dense kernels [Cin, Cout] become
    column-parallel; biases / norm scales [C] shard along the same axis,
    so the blocks' outputs are lane-sharded and XLA/GSPMD inserts the
    all-gathers only where a consumer genuinely needs full lanes.
    Small leaves (scalars, per-worker alpha, opt counts) stay replicated.
    """
    n_model = mesh.shape.get("model", 1)
    rep = NamedSharding(mesh, P())

    def rule(x):
        shape = getattr(x, "shape", ())
        if (n_model > 1 and len(shape) >= 1
                and shape[-1] % n_model == 0 and shape[-1] >= min_lanes):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1)), "model"))
        return rep

    return jax.tree.map(rule, tree)


def shard_state(tree, mesh: Mesh, min_lanes: int = 64):
    """device_put a TrainState-like pytree with column-parallel model
    sharding (see state_shardings); pure data parallelism falls out as
    the special case n_model == 1 (everything replicated)."""
    shardings = state_shardings(tree, mesh, min_lanes)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)
