"""Device mesh + sharding helpers, single- and multi-host.

The reference has no distributed path (SURVEY.md §2.10: single-GPU
nn.DataParallel on a legacy branch only). Here scaling is mesh-native:
a ('data', 'model') mesh; batch-sharded data parallelism over ICI is the
primary strategy (gradient all-reduce happens inside XLA via GSPMD), with
the 'model' axis carrying column-parallel tensor sharding for larger
encoders.

Multi-host (DCN) story: call ``init_distributed`` FIRST (wraps
jax.distributed.initialize — must precede any backend use), build the
mesh from the global jax.devices(), have each process feed only its own
``host_batch_slice`` of the global batch, and let ``shard_batch``
assemble the global array via jax.make_array_from_process_local_data.
Everything under jit is then identical to the single-host path — GSPMD
places the gradient reduce-scatter/all-reduce on ICI within hosts and
DCN across them. ``train.py --coordinator_address ...`` wires this up
(validated by a 2-process CPU smoke test, tests/test_multihost.py).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids=None) -> bool:
    """Initialize the multi-process runtime (no-op for single process).

    Must be called before any jax backend initialization. On TPU pods
    the three arguments are inferable from the environment and may all
    be None; on CPU/GPU fleets pass them explicitly."""
    if num_processes in (None, 0, 1) and coordinator_address is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def host_batch_slice(global_batch: int,
                     process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> slice:
    """The contiguous slice of the global batch this host must load.

    The global batch must divide evenly (static shapes under jit)."""
    process_index = (jax.process_index() if process_index is None
                     else process_index)
    process_count = (jax.process_count() if process_count is None
                     else process_count)
    if global_batch % process_count != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{process_count} processes")
    per = global_batch // process_count
    return slice(process_index * per, (process_index + 1) * per)


def get_mesh(n_data: Optional[int] = None, n_model: int = 1,
             devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def shard_batch(batch, mesh: Mesh):
    """Shard the leading (batch) axis of every array over the 'data' axis.

    Single process: an async device_put scatter. Multi-process: each
    host contributes its local shard of the global batch
    (make_array_from_process_local_data over DCN-aware sharding)."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
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
