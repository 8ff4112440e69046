"""pase_tpu — a TPU-native (JAX/XLA/Pallas) self-supervised speech representation
framework with the capabilities of PASE / PASE+ (santi-pdp/pase).

The package is a ground-up redesign, not a port:

* the compute path is pure-functional JAX (flax.linen modules, one jitted
  multi-task train step, optax multi-transform optimizers),
* waveform distortions and worker-target feature extraction run on-device as
  batched XLA ops instead of CPU DataLoader workers,
* the QRNN context layer's recurrence is a log-depth associative scan with an
  optional Pallas TPU kernel,
* scaling is expressed through ``jax.sharding.Mesh`` + ``NamedSharding``
  (batch-sharded data parallelism over ICI; model axes plumbed but unused at
  PASE scale).

Public API mirrors the reference (see /root/reference):
  ``wf_builder(cfg)``                 — pase/models/frontend.py:18
  ``Encoder.load_pretrained(ckpt)``   — pase/models/modules.py:267
  (1, 1, 100000) wav -> (1, 256, 625) features — README.md:36-39
"""

from pase_tpu.version import __version__
from pase_tpu.frontend import WaveFe, wf_builder, Encoder


def __getattr__(name):
    # lazy submodule-level conveniences (avoid importing the trainer stack
    # for encoder-only users)
    if name == "PASE":
        from pase_tpu.model import PASE
        return PASE
    if name == "build_pase":
        from pase_tpu.model import build_pase
        return build_pase
    if name == "Trainer":
        from pase_tpu.trainer import Trainer
        return Trainer
    if name == "StreamingEncoder":
        from pase_tpu.streaming import StreamingEncoder
        return StreamingEncoder
    if name == "ServingEncoder":
        from pase_tpu.serving import ServingEncoder
        return ServingEncoder
    if name == "export_encoder":
        from pase_tpu.serving import export_encoder
        return export_encoder
    if name == "ServingStreamingEncoder":
        from pase_tpu.serving import ServingStreamingEncoder
        return ServingStreamingEncoder
    if name == "export_streaming_encoder":
        from pase_tpu.serving import export_streaming_encoder
        return export_streaming_encoder
    if name == "encode_time_sharded":
        from pase_tpu.parallel.sp import encode_time_sharded
        return encode_time_sharded
    raise AttributeError(name)


__all__ = [
    "__version__",
    "WaveFe",
    "wf_builder",
    "Encoder",
    "PASE",
    "build_pase",
    "Trainer",
    "StreamingEncoder",
    "ServingEncoder",
    "export_encoder",
    "ServingStreamingEncoder",
    "export_streaming_encoder",
    "encode_time_sharded",
]
