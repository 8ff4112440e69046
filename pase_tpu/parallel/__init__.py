from pase_tpu.parallel.mesh import get_mesh, shard_batch, replicate

__all__ = ["get_mesh", "shard_batch", "replicate"]
