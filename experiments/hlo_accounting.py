"""HLO-level FLOP/HBM accounting for the headline train step.

Certifies the MXU-ceiling analysis in benchmarks/README.md with
compiler-reported numbers instead of informal arithmetic: lowers and
compiles the exact bench.py train step, then prints XLA's
cost_analysis() — total FLOPs, bytes accessed — plus derived
utilization at the measured step time (VERDICT r2 item 8; the axon
tunnel does not support profiler traces or --xla_dump_to local dumps,
so the compiled executable's own cost model is the auditable artifact).

Usage:  python experiments/hlo_accounting.py [--step_ms 72.5]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# v5e chip peaks (public spec): 197 TFLOP/s bf16, ~0.82 TB/s HBM
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_TBPS = 0.82


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step_ms", type=float, default=None,
                    help="measured step time to derive utilization")
    ap.add_argument("--compute_dtype", default="bfloat16")
    opts = ap.parse_args()

    import bench
    jax = bench._setup_jax()
    import jax.numpy as jnp
    from pase_tpu.trainer import Trainer
    from pase_tpu.parallel.mesh import get_mesh, shard_batch
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.data.distortions import DistortionConfig, DistortionAssets
    from pase_tpu.model import parse_workers_cfg
    from pase_tpu.data.pipeline import compute_stats

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "cfg/frontend/PASE+.cfg")) as f:
        fe_cfg = json.load(f)
    with open(os.path.join(root, "cfg/workers/workers+.cfg")) as f:
        wk_cfg = json.load(f)
    B, T = bench.B, bench.T

    rng = np.random.RandomState(0)
    ir = np.zeros((4, 8000), np.float32)
    ir[:, 0] = 1.0
    assets = DistortionAssets(
        ir_bank=jnp.asarray(ir), ir_pmax=jnp.asarray([0, 0, 0, 0]),
        noise_bank=jnp.asarray(rng.randn(8, T * 2).astype(np.float32) * .1),
        overlap_bank=jnp.asarray(rng.randn(4, T * 2).astype(np.float32) * .1))
    dcfg = DistortionConfig(reverb_p=.5, overlap_p=.1, noises_p=.4,
                            clip_p=.2, chop_p=.2)
    meta = parse_workers_cfg(wk_cfg)
    stats = compute_stats(SyntheticChunkBatcher(8, T, seed=11), meta,
                          max_batches=2)
    cfg = dict(backprop_mode="base", hop=160, bpe=100, epoch=400,
               batch_size=B, chunk_size=T, log_freq=100,
               fe_lr=1e-3, min_lr=5e-4, lr_mode="poly",
               compute_dtype=opts.compute_dtype,
               save_path="/tmp/pase_hlo_ckpt")
    tr = Trainer(fe_cfg, wk_cfg, cfg, stats=stats, dist_cfg=dcfg,
                 dist_assets=assets, mesh=get_mesh())
    state = tr.init_state(0)
    step = tr._make_train_step()
    b = iter(SyntheticChunkBatcher(B, T, seed=0))
    raw = shard_batch({k: jnp.asarray(v) for k, v in next(b).items()},
                      tr.mesh)
    lowered = step.lower(state, raw)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    bytes_acc = float(ca.get("bytes accessed", float("nan")))
    out = {
        "flops_per_step": flops,
        "tflops_per_step": flops / 1e12,
        "bytes_accessed_per_step": bytes_acc,
        "gb_accessed_per_step": bytes_acc / 1e9,
    }
    mem = compiled.memory_analysis()
    for k in ("temp_size_in_bytes", "argument_size_in_bytes",
              "output_size_in_bytes"):
        v = getattr(mem, k, None)
        if v is not None:
            out[k] = int(v)
    if opts.step_ms:
        s = opts.step_ms / 1e3
        out["achieved_tflops_per_s"] = flops / 1e12 / s
        out["mxu_utilization_vs_bf16_peak"] = (
            flops / 1e12 / s / PEAK_BF16_TFLOPS)
        out["achieved_hbm_tbps"] = bytes_acc / 1e12 / s
        out["hbm_utilization_vs_peak"] = (
            bytes_acc / 1e12 / s / PEAK_HBM_TBPS)
    # also surface the per-key breakdown XLA exposes, for the record
    extras = {k: v for k, v in sorted(ca.items())
              if k not in ("flops", "bytes accessed")
              and not k.startswith("bytes accessed")}
    print(json.dumps(out, indent=1))
    if extras:
        print("cost_analysis extras:", json.dumps(extras, indent=1))


if __name__ == "__main__":
    main()
