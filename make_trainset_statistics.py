"""Compute worker-target normalization statistics (the reference stats
pkl: {key: {'mean': [D], 'std': [D]}} — /root/reference/
make_trainset_statistics.py:71-104). Feature extraction runs on-device.

  python make_trainset_statistics.py --data_root ... --data_cfg ... \\
      --net_cfg cfg/workers/workers+.cfg --out_file stats.pkl
"""

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--data_cfg", type=str, default=None)
    p.add_argument("--net_cfg", type=str, required=True)
    p.add_argument("--out_file", type=str, default="stats.pkl")
    p.add_argument("--max_batches", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--chunk_size", type=int, default=16000)
    p.add_argument("--hop", type=int, default=160)
    p.add_argument("--random_scale", type=str, default="False")
    p.add_argument("--synthetic", action="store_true", default=False)
    p.add_argument("--jax_cache_dir", type=str, default=".jax_cache",
                   help="persistent XLA compile cache (the remote axon "
                        "compile of the feature-extraction graph is "
                        "minutes-scale; cached repeats are seconds)")
    opts = p.parse_args()

    if opts.jax_cache_dir:
        import jax
        jax.config.update("jax_compilation_cache_dir", opts.jax_cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from pase_tpu.model import parse_workers_cfg
    from pase_tpu.data.pipeline import compute_stats, save_stats_pkl
    from pase_tpu.data.dataset import (LibriSpeechTupleDataset, ChunkBatcher,
                                       SyntheticChunkBatcher)

    meta = parse_workers_cfg(opts.net_cfg)
    if opts.synthetic:
        batcher = SyntheticChunkBatcher(opts.batch_size, opts.chunk_size)
    else:
        ds = LibriSpeechTupleDataset(opts.data_root, opts.data_cfg, "train")
        batcher = ChunkBatcher(ds, opts.batch_size, opts.chunk_size)
    stats = compute_stats(batcher, meta, hop=opts.hop,
                          max_batches=opts.max_batches,
                          random_scale=opts.random_scale.lower() in
                          ("true", "1"))
    save_stats_pkl(stats, opts.out_file)
    print(f"Wrote stats for {list(stats)} to {opts.out_file}")


if __name__ == "__main__":
    main()
