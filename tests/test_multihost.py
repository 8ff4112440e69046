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


def test_two_process_cpu_smoke(tmp_path):
    """Two real processes, gloo-coordinated, assemble one global batch
    and agree on a jitted global reduction."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(pid), port],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost smoke test timed out")
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-3000:]
        assert "ok" in out
