"""Test harness config: force an 8-device CPU platform (TPU-style fake
backend — SURVEY.md §4) and full-precision matmuls for numerical parity
tests. Must run before any jax backend initialization."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the heavy graphs (full-bank train step,
# 8-device mesh) compile once per code change instead of once per run
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


def reference_available():
    return os.path.isdir("/root/reference/pase")


def load_reference():
    """Import the reference PyTorch implementation as a numerical oracle.

    Stubs torchvision/torchqrnn (absent in this image); the torchqrnn stub
    implements the documented QRNN window-2 fo-pool semantics so PASE+
    configs are usable as oracles. Never used outside tests.
    """
    import types
    import torch
    import torch.nn as torch_nn

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet34 = lambda pretrained=True: None
        tv.models = tvm
        tvt = types.ModuleType("torchvision.transforms")

        class _Compose:
            def __init__(self, transforms):
                self.transforms = transforms

            def __call__(self, x):
                for t in self.transforms:
                    x = t(x)
                return x

        tvt.Compose = _Compose
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.transforms"] = tvt

    if "soundfile" not in sys.modules:
        sf = types.ModuleType("soundfile")

        def _sf_read(path, *a, **k):
            from pase_tpu.data.io import read_wav
            w, sr = read_wav(path)
            return w, sr

        def _sf_write(path, data, sr, *a, **k):
            from pase_tpu.data.io import write_wav
            write_wav(path, data, sr)

        sf.read = _sf_read
        sf.write = _sf_write
        sys.modules["soundfile"] = sf

    if "torchqrnn" not in sys.modules:
        tq = types.ModuleType("torchqrnn")

        class QRNNLayer(torch_nn.Module):
            # window-2 QRNN per Bradbury et al. (arXiv:1611.01576) and the
            # torchqrnn README: z=tanh, f=sigmoid, fo-pool
            # c_t = f*z + (1-f)*c_{t-1}, h = sigmoid(o)*c.
            def __init__(self, input_size, hidden_size, window=2):
                super().__init__()
                self.window = window
                self.hidden_size = hidden_size
                self.linear = torch_nn.Linear(window * input_size,
                                              3 * hidden_size)

            def forward(self, x, hidden=None):
                # x: [T, B, C]
                if self.window == 2:
                    xm1 = torch.cat([x[:1] * 0, x[:-1]], dim=0)
                    src = torch.cat([x, xm1], dim=2)
                else:
                    src = x
                y = self.linear(src)
                z, f, o = y.chunk(3, dim=2)
                z = torch.tanh(z)
                f = torch.sigmoid(f)
                c = torch.zeros(x.shape[1], self.hidden_size)
                cs = []
                for t in range(x.shape[0]):
                    c = f[t] * z[t] + (1 - f[t]) * c
                    cs.append(c)
                c_seq = torch.stack(cs, dim=0)
                h = torch.sigmoid(o) * c_seq
                return h, c

        class QRNN(torch_nn.Module):
            def __init__(self, input_size, hidden_size, num_layers=1,
                         dropout=0, window=2, use_cuda=False):
                super().__init__()
                self.layers = torch_nn.ModuleList(
                    [QRNNLayer(input_size if i == 0 else hidden_size,
                               hidden_size, window=window)
                     for i in range(num_layers)])

            def forward(self, x, hidden=None):
                h = x
                for layer in self.layers:
                    h, c = layer(h)
                return h, c

        tq.QRNN = QRNN
        tq.QRNNLayer = QRNNLayer
        sys.modules["torchqrnn"] = tq

    # minimal stubs for pase.transforms' import-time deps that are absent
    # in this image (gammatone/pysptk/librosa/psf/ahoproc_tools). The
    # stubbed SYMBOLS raise if actually called — transforms that need
    # them can't be oracles here (documented image cap); everything else
    # in pase.transforms (distortions, chunkers, znorm) becomes usable.
    def _stub_module(name, **symbols):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        for k, v in symbols.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
        return mod

    def _unavailable(*a, **k):
        raise RuntimeError("stubbed dependency called (absent in image)")

    gt = _stub_module("gammatone")
    gt.gtgram = _stub_module("gammatone.gtgram", gtgram=_unavailable)
    _stub_module("pysptk", swipe=_unavailable, lpc=_unavailable,
                 blackman=_unavailable, hamming=_unavailable)
    _stub_module("python_speech_features", logfbank=_unavailable,
                 fbank=_unavailable)
    _stub_module("librosa", load=_unavailable,
                 feature=_stub_module("librosa.feature",
                                      mfcc=_unavailable,
                                      delta=_unavailable),
                 stft=_unavailable)
    aho = _stub_module("ahoproc_tools")
    aho.interpolate = _stub_module("ahoproc_tools.interpolate",
                                   interpolation=_unavailable)
    aho.io = _stub_module("ahoproc_tools.io", read_aco_file=_unavailable,
                          write_aco_file=_unavailable)

    import pase as ref_pase  # noqa: F401
    return ref_pase


@pytest.fixture(scope="session")
def ref():
    if not reference_available():
        pytest.skip("reference repo not mounted")
    return load_reference()
