"""Serving-path throughput: the AOT-exported encoder on a real chip.

Exports the PASE+ encoder (pase_tpu/serving.py) for the current backend
and measures the sustained batch-encode rate of the deserialized
artifact — the number a deployment sees, as opposed to bench.py's
training-step rate. Two variants: the extraction contract
(precision=highest, matches forward-chunk bit-for-bit) and the
production default (backend matmul precision, bf16-ish on TPU).

Timing discipline per CLAUDE.md: sustained loops, sync via
jax.device_get of a scalar (block_until_ready can return early on the
axon backend), chip otherwise idle.

Usage: python experiments/profile_serving.py [--batch 32] [--bucket 32000]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--bucket", type=int, default=32000)
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out_dir", default="/tmp/pase_serving_bench")
    ap.add_argument("--force_cpu", action="store_true", default=False,
                    help="run on CPU (smoke test / tunnel outage)")
    ap.add_argument("--streaming_chunk", type=int, default=16000,
                    help="also probe the streaming artifact's steady-"
                         "state step rate at this chunk (0 disables)")
    opts = ap.parse_args()

    import jax
    if opts.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    from pase_tpu.frontend import wf_builder
    from pase_tpu.serving import export_encoder, ServingEncoder

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    fe_cfg = os.path.join(repo, "cfg", "frontend", "PASE+.cfg")
    platform = jax.devices()[0].platform
    results = {}
    for label, precision in (("highest", "highest"), ("default", None)):
        out = os.path.join(opts.out_dir, label)
        enc = wf_builder(fe_cfg)
        enc.init()
        export_encoder(enc, out, chunk_sizes=(opts.bucket,),
                       platforms=(platform,), precision=precision)
        srv = ServingEncoder(out)
        fn = srv._fns[opts.bucket]
        params = jax.device_put(srv.params)
        wav = jnp.asarray(np.random.RandomState(0).randn(
            opts.batch, opts.bucket).astype(np.float32) * 0.1)
        wav = jax.device_put(wav)

        def run_once():
            y = fn.call(params, wav)
            return float(jax.device_get(y[0, 0, 0]))

        for _ in range(opts.warm):
            run_once()
        t0 = time.perf_counter()
        for _ in range(opts.iters):
            run_once()
        dt = (time.perf_counter() - t0) / opts.iters
        audio_s = opts.batch * opts.bucket / 16000.0
        results[label] = {"ms_per_batch": dt * 1e3,
                          "audio_s_per_s": audio_s / dt}
        print(f"{label}: {dt * 1e3:.2f} ms / batch-{opts.batch} x "
              f"{opts.bucket / 16000:.1f}s -> "
              f"{audio_s / dt:.0f} audio-s/s ({platform})")
    if opts.streaming_chunk:
        # online path: sustained steady-state step rate of the
        # prime/step/flush artifact (the latency-bound deployment).
        # real-time factor = (chunk seconds) / (step wall time)
        from pase_tpu.serving import (export_streaming_encoder,
                                      ServingStreamingEncoder)
        out = os.path.join(opts.out_dir, "streaming")
        enc = wf_builder(fe_cfg)
        enc.init()
        export_streaming_encoder(enc, out, chunk=opts.streaming_chunk,
                                 platforms=(platform,))
        srv = ServingStreamingEncoder(out)
        wav = np.random.RandomState(0).randn(
            opts.batch, opts.streaming_chunk).astype(np.float32) * 0.1
        srv.reset()
        srv.push(wav)                          # prime (+ compile)
        for _ in range(opts.warm):
            srv.push(wav)
        t0 = time.perf_counter()
        for _ in range(opts.iters):
            y = srv.push(wav)
            float(y[0, 0, 0])                  # host sync
        dt = (time.perf_counter() - t0) / opts.iters
        chunk_s = opts.streaming_chunk / 16000.0
        # each of the `batch` concurrent streams advances chunk_s
        # seconds per dt-wall step -> per-stream realtime factor
        results["streaming"] = {
            "chunk_s": chunk_s, "ms_per_step": dt * 1e3,
            "rtf_per_stream": chunk_s / dt,
            "audio_s_per_s": opts.batch * chunk_s / dt}
        print(f"streaming: {dt * 1e3:.2f} ms / step "
              f"(batch {opts.batch} x {chunk_s:.1f}s) -> "
              f"{opts.batch * chunk_s / dt:.0f} audio-s/s, "
              f"{chunk_s / dt:.1f}x realtime per stream")
    print(json.dumps({"platform": platform, "batch": opts.batch,
                      "bucket": opts.bucket, **results}))


if __name__ == "__main__":
    main()
