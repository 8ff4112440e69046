from pase_tpu.ops.pad import pad_1d, feblock_pad, sinc_same_pad
from pase_tpu.ops.sinc import mel_init_hz, build_sinc_filters
from pase_tpu.ops.qrnn import forget_mult, qrnn_pool

__all__ = [
    "pad_1d",
    "feblock_pad",
    "sinc_same_pad",
    "mel_init_hz",
    "build_sinc_filters",
    "forget_mult",
    "qrnn_pool",
]
