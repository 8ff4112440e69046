"""Multi-host (DCN) wiring: per-host batch-slicing math and a real
2-process CPU smoke test of init_distributed + the multihost
shard_batch path (SURVEY §5.8 / §2.10)."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # see tests/README.md

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_host_batch_slice_math():
    from pase_tpu.parallel.mesh import host_batch_slice
    rows = []
    for pid in range(4):
        sl = host_batch_slice(32, process_index=pid, process_count=4)
        assert sl.stop - sl.start == 8
        rows.extend(range(sl.start, sl.stop))
    assert rows == list(range(32))           # exact disjoint cover
    with pytest.raises(ValueError):
        host_batch_slice(30, process_index=0, process_count=4)


def test_init_distributed_noop_single_process():
    from pase_tpu.parallel.mesh import init_distributed
    assert init_distributed(None, None, None) is False
    assert init_distributed(None, 1, 0) is False


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "@REPO@")
    pid = int(sys.argv[1]); port = sys.argv[2]
    from pase_tpu.parallel.mesh import (init_distributed, get_mesh,
                                        shard_batch, host_batch_slice,
                                        replicate)
    assert init_distributed("127.0.0.1:" + port, 2, pid)
    import numpy as np
    import jax.numpy as jnp
    assert jax.process_count() == 2
    mesh = get_mesh()          # 4 global devices -> (4, 1)
    assert mesh.shape["data"] == 4
    # global batch 8: this process materializes only its slice
    sl = host_batch_slice(8)
    global_rows = np.arange(8, dtype=np.float32)[:, None] * np.ones((1, 4))
    local = {"chunk": global_rows[sl]}
    batch = shard_batch(local, mesh)
    assert batch["chunk"].shape == (8, 4)     # global logical shape
    w = replicate(jnp.ones((4,)), mesh)
    total = jax.jit(lambda b, w: jnp.sum(b["chunk"] @ w))(batch, w)
    # sum over ALL hosts' rows: 4 * sum(0..7) = 112
    assert float(total) == 112.0, float(total)
    print("proc %d ok" % pid, flush=True)
""").replace("@REPO@", REPO)


def _run_two_procs(tmp_path, script_text, timeout=420):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(script_text)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(pid), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost test timed out")
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-3000:]
        assert "ok" in out
    return outs


def test_two_process_cpu_smoke(tmp_path):
    """Two real processes, gloo-coordinated, assemble one global batch
    and agree on a jitted global reduction."""
    _run_two_procs(tmp_path, _WORKER)


_TRAIN_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    sys.path.insert(0, "@REPO@")
    pid = int(sys.argv[1]); port = sys.argv[2]
    from pase_tpu.parallel.mesh import (init_distributed, get_mesh,
                                        shard_batch, host_batch_slice)
    assert init_distributed("127.0.0.1:" + port, 2, pid)
    import numpy as np
    import jax.numpy as jnp
    from pase_tpu.trainer import Trainer
    frontend = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
                "fmaps": [16, 16, 32, 32], "emb_dim": 32,
                "norm_out": True}
    workers = {"regr": [{"num_outputs": 39, "dropout": 0,
                         "hidden_size": 32, "hidden_layers": 1,
                         "name": "mfcc", "r": 1, "loss": "MSELoss",
                         "skip": False}],
               "cls": [{"num_outputs": 1, "dropout": 0,
                        "hidden_size": 32, "hidden_layers": 1,
                        "name": "mi", "loss": "BCEWithLogitsLoss",
                        "skip": False}]}
    cfg = dict(backprop_mode="base", hop=160, bpe=100, epoch=10,
               batch_size=8, chunk_size=4800, log_freq=2,
               save_path="/tmp/pase_mh_train_%d" % pid)
    mesh = get_mesh()                   # 4 global devices, dp over all
    tr = Trainer(frontend, workers, cfg, mesh=mesh)
    state = tr.init_state(0)            # same seed on both hosts
    step = tr._make_train_step()
    rng = np.random.RandomState(5)
    sl = host_batch_slice(8)
    for i in range(2):
        # the same deterministic GLOBAL batch on both hosts; each host
        # materializes only its slice (the DCN data path)
        glob = {k: rng.randn(8, 4800).astype(np.float32) * 0.1
                for k in ("chunk", "chunk_ctxt", "chunk_rand")}
        raw = shard_batch({k: jnp.asarray(v[sl]) for k, v in glob.items()},
                          mesh)
        state, losses = step(state, raw)
    tot = float(jax.device_get(losses["total"]))
    assert np.isfinite(tot)
    print("loss=%.10f" % tot, flush=True)
    print("proc %d ok" % pid, flush=True)
""").replace("@REPO@", REPO)


def test_two_process_two_train_steps(tmp_path):
    """Two REAL train steps of the jitted multi-task step across two
    processes (2 local devices each): both hosts must agree bitwise on
    the resulting global loss — the full DCN training path, not just
    shard math."""
    outs = _run_two_procs(tmp_path, _TRAIN_WORKER)
    losses = []
    for _, out in outs:
        line = [l for l in out.splitlines() if l.startswith("loss=")]
        assert line, out[-2000:]
        losses.append(line[0])
    assert losses[0] == losses[1], losses


_SHARDED_CORPUS_WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    sys.path.insert(0, "@REPO@")
    pid = int(sys.argv[1]); port = sys.argv[2]
    from pase_tpu.parallel.mesh import init_distributed, get_mesh
    assert init_distributed("127.0.0.1:" + port, 2, pid)
    import numpy as np
    import jax.numpy as jnp
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import LibriSpeechTupleDataset
    from pase_tpu.data.device_corpus import ShardedDeviceCorpusBatcher

    droot = "@DROOT@"
    ds = LibriSpeechTupleDataset(droot, os.path.join(droot, "data.cfg"),
                                 "train")
    mesh = get_mesh()                    # 4 global devices, dp over all
    b = ShardedDeviceCorpusBatcher(ds, batch_size=8, chunk_size=4800,
                                   mesh=mesh, seed=11)
    # per-host IO: this process decoded ONLY the shards its 2 local
    # devices own (2 of the 4) — the corpus never fully lands on one host
    assert len(b.owned_rows) == 2, b.owned_rows
    assert b.n_shards == 4
    frontend = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
                "fmaps": [16, 16, 32, 32], "emb_dim": 32,
                "norm_out": True}
    workers = {"regr": [{"num_outputs": 39, "dropout": 0,
                         "hidden_size": 32, "hidden_layers": 1,
                         "name": "mfcc", "r": 1, "loss": "MSELoss",
                         "skip": False}],
               "cls": [{"num_outputs": 1, "dropout": 0,
                        "hidden_size": 32, "hidden_layers": 1,
                        "name": "mi", "loss": "BCEWithLogitsLoss",
                        "skip": False}]}
    cfg = dict(backprop_mode="base", hop=160, bpe=100, epoch=10,
               batch_size=8, chunk_size=4800, log_freq=2,
               save_path="/tmp/pase_mh_sdc_%d" % pid)
    tr = Trainer(frontend, workers, cfg, mesh=mesh)
    state = tr.init_state(0)
    fused = tr.make_fused_feed_step(b.feed_fn)
    feed = b.feed_state()
    for i in range(2):
        state, losses, feed = fused(state, feed)
    tot = float(jax.device_get(losses["total"]))
    assert np.isfinite(tot)
    print("loss=%.10f" % tot, flush=True)
    print("proc %d ok" % pid, flush=True)
""").replace("@REPO@", REPO)


def test_two_process_sharded_device_corpus(tmp_path):
    """The SHARDED device corpus across two real processes: each host
    decodes only its own shards, the fused shard_map feed runs as one
    multi-controller SPMD program, and both hosts agree bitwise on the
    global loss after two train steps."""
    import json
    from pase_tpu.data.io import write_wav

    rng = np.random.RandomState(9)
    droot = tmp_path / "corpus"
    droot.mkdir()
    names = []
    for g in range(8):                    # >= 4 prefix groups (data=4)
        for u in range(2):
            nm = f"{400 + g}-3-{u:04d}.wav"
            write_wav(str(droot / nm),
                      rng.randn(9000).astype(np.float32) * 0.2)
            names.append(nm)
    dcfg = {"train": {"data": [{"filename": n} for n in names],
                      "total_wav_dur": 9000 * len(names)}}
    with open(droot / "data.cfg", "w") as f:
        json.dump(dcfg, f)

    script = _SHARDED_CORPUS_WORKER.replace("@DROOT@", str(droot))
    outs = _run_two_procs(tmp_path, script)
    losses = []
    for _, out in outs:
        line = [l for l in out.splitlines() if l.startswith("loss=")]
        assert line, out[-2000:]
        losses.append(line[0])
    assert losses[0] == losses[1], losses
