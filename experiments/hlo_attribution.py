"""Per-op / per-subsystem HBM-traffic attribution for the train step.

experiments/hlo_accounting.py certifies the roofline with XLA's
cost_analysis() TOTALS; this tool breaks the bytes down: it parses the
compiled executable's optimized HLO (compiled.as_text()), computes each
top-level instruction's HBM traffic (operand bytes + output bytes — the
standard fusion-boundary accounting; in-fusion intermediates never
touch HBM), and aggregates by the jax name-stack in the op metadata
into subsystems (prepare/features, encoder fwd, encoder bwd, each head,
loss, optimizer, ...). The parser's total is cross-checked against
cost_analysis()['bytes accessed'].

Usage:  python experiments/hlo_attribution.py [--top 30] [--json OUT]
        (compiles the exact bench.py train step; cached compiles are
         seconds, cold ~10 min over the axon compile service)
"""

import argparse
import json
import os
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16, "s4": 1, "u4": 1,
    "token": 0, "opaque": 0,
}

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (tuples summed)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        nb = _DTYPE_BYTES.get(dt)
        if nb is None:
            continue
        numel = 1
        if dims:
            for d in dims.split(","):
                numel *= int(d)
        total += numel * nb
    return total


_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%([^\s=]+)\s*=\s*(\([^)]*\)|\S+?)\s+([a-z0-9\-]+)\(")
_OPERAND_RE = re.compile(r"%([^\s,()]+)")
_META_RE = re.compile(r'metadata=\{[^}]*op_name="([^"]*)"')
_SRC_RE = re.compile(r'source_file="([^"]*)"')
_CC_TARGET_RE = re.compile(r'custom_call_target="([^"]*)"')

# custom-call targets that alias/annotate buffers without moving bytes:
# ConcatBitcast is a zero-copy concatenation VIEW, the in-bound marker
# is an identity compiler hint, AllocateBuffer reserves without reading
# (GatherScatterIndicesBitpacked stays counted — it writes packed
# indices, tiny but real)
_ALIAS_CUSTOM_CALLS = {"ConcatBitcast", "AssumeGatherIndicesInBound",
                       "AllocateBuffer"}


def parse_computations(hlo: str):
    """{comp_name: [(instr_name, shape_str, opcode, [operands], op_name)]}"""
    comps = {}
    cur = None
    for line in hlo.splitlines():
        if line.startswith("%") or line.startswith("ENTRY"):
            m = re.match(r"(?:ENTRY\s+)?%?([^\s(]+)\s*\(", line)
            if m:
                cur = m.group(1)
                comps[cur] = []
                comps[cur + "/__entry__"] = line.startswith("ENTRY")
            continue
        if cur is None:
            continue
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape, opcode = m.groups()
        rest = line[m.end():]
        # operands: %refs before any attribute section
        args_part = rest.split("),", 1)[0]
        operands = _OPERAND_RE.findall(args_part)
        meta = _META_RE.search(line)
        srcm = _SRC_RE.search(line)
        if opcode == "custom-call":
            ccm = _CC_TARGET_RE.search(line)
            if ccm and ccm.group(1) in _ALIAS_CUSTOM_CALLS:
                opcode = "custom-call-alias"    # counted as free below
        comps[cur].append((name, shape, opcode, operands,
                           meta.group(1) if meta else "",
                           srcm.group(1) if srcm else ""))
    return comps


# opcodes that move no HBM bytes at the top level
_FREE = {"parameter", "constant", "bitcast", "tuple", "get-tuple-element",
         "after-all", "partition-id", "replica-id", "iota",
         "custom-call-alias"}


def instruction_bytes(comps, comp_name):
    """[(bytes, opcode, op_name, instr_name)] for a computation's
    top-level instructions (fusion operand/output accounting)."""
    instrs = comps[comp_name]
    shapes = {n: s for n, s, _, _, _, _ in instrs}
    out = []
    for name, shape, opcode, operands, op_name, src_file in instrs:
        if opcode in _FREE:
            continue
        b = shape_bytes(shape)
        for o in operands:
            if o in shapes:
                b += shape_bytes(shapes[o])
        out.append((b, opcode, op_name, name, src_file))
    return out


def classify(op_name: str, opcode: str, src_file: str = "") -> str:
    """jax name-stack + source file -> subsystem bucket.

    The name stack alone misses the prepare stage (its ops carry bare
    names like `jit(train_step)/square`), so ops OUTSIDE the jvp(PASE)
    model scope are bucketed by their source module: ops/features.py /
    ops/signal.py / data/distortions.py / data/pipeline.py all belong
    to the prepare stage (distortions + worker targets + ZNorm)."""
    s = op_name
    bwd = "transpose(" in s
    low = s.lower()
    in_model = "jvp(pase)" in low
    src = src_file.rsplit("/", 1)[-1]

    def tag(base):
        return base + (" [bwd]" if bwd else " [fwd]")

    if opcode in ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute"):
        return "collectives"
    if "qrnn" in low or "forget_mult" in low or "pallas" in low:
        return tag("encoder/qrnn")
    if opcode == "custom-call" and not s:
        # TPU runtime custom-calls carrying NO op_name metadata (buffer
        # donation/annotation etc.) — keep them out of model buckets
        return "runtime custom-calls (unattributed)"
    if "/frontend/" in low or "sinc" in low or "feblock" in low \
            or "denseskip" in low or "wavefe" in low:
        return tag("encoder")
    for head in ("lps_long", "mfcc_long", "fbank_long", "gtn_long",
                 "lps", "mfcc", "fbank", "gtn", "prosody", "cchunk",
                 "chunk", "cmi", "mi", "spc", "gap", "overlap"):
        if f"/{head}/" in low or f"'{head}'" in low:
            return tag(f"head/{head}")
    if "framed_mse" in low or "loss" in low or src == "losses.py":
        return tag("loss")
    if "jit(fft)" in low:
        # the reverb distortion's FFT convolution (data/distortions.py)
        # loses its name stack inside jit(fft) — it is prepare-stage work
        return "prepare/targets"
    if not in_model and src in ("features.py", "signal.py",
                                "distortions.py", "pipeline.py",
                                "kaldi_feats.py"):
        return "prepare/targets"
    if "prepare" in low or "distort" in low or "stft" in low \
            or "feature" in low or "reverb" in low or "additive" in low \
            or "znorm" in low:
        return "prepare/targets"
    if any(k in low for k in ("adam", "optax", "apply_updates",
                              "update_moment", "bias_correction",
                              "scale_by")) or (
            not in_model and src in ("transform.py", "base.py",
                                     "combine.py", "alias.py")):
        return "optimizer"
    if opcode in ("copy", "copy-start", "copy-done", "transpose"):
        return "layout/copies"
    if in_model:
        return tag("model/glue")
    return tag("other")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--json", default=None)
    ap.add_argument("--dump_hlo", default=None,
                    help="write the optimized HLO text here for "
                         "offline inspection of specific instructions")
    ap.add_argument("--bucket_detail", default=None,
                    help="print EVERY instruction of one bucket (e.g. "
                         "'encoder/qrnn [fwd]') instead of only the "
                         "global top rows")
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
        fe_cfg = {k: v for k, v in json.load(f).items()
                  if not k.startswith("_")}
    with open(os.path.join(root, "cfg/workers/workers+.cfg")) as f:
        wk_cfg = {k: v for k, v in json.load(f).items()
                  if not k.startswith("_")}
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
    print("[attr] compiling the bench train step ...")
    compiled = step.lower(state, raw).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    xla_bytes = float(ca.get("bytes accessed", float("nan")))

    hlo = compiled.as_text()
    if opts.dump_hlo:
        with open(opts.dump_hlo, "w") as f:
            f.write(hlo)
        print(f"[attr] HLO text -> {opts.dump_hlo}")
    comps = parse_computations(hlo)
    # top-level = the entry computation plus while/cond bodies it calls
    entry = [c for c in comps
             if comps.get(c + "/__entry__") is True]
    assert entry, "no ENTRY computation found"
    rows = instruction_bytes(comps, entry[0])

    total = sum(r[0] for r in rows)
    print(f"[attr] parsed {len(rows)} top-level instructions; "
          f"sum {total / 1e9:.1f} GB vs cost_analysis "
          f"{xla_bytes / 1e9:.1f} GB "
          f"(ratio {total / max(xla_bytes, 1):.2f})")

    buckets = defaultdict(float)
    for by, opcode, op_name, _, src_file in rows:
        buckets[classify(op_name, opcode, src_file)] += by
    ranked = sorted(buckets.items(), key=lambda kv: -kv[1])
    print("\n[attr] per-subsystem HBM traffic:")
    for k, v in ranked:
        print(f"  {k:24s} {v / 1e9:7.2f} GB  ({100 * v / total:5.1f} %)")

    print(f"\n[attr] top {opts.top} instructions:")
    rows.sort(key=lambda r: -r[0])
    for by, opcode, op_name, name, src_file in rows[:opts.top]:
        print(f"  {by / 1e6:9.1f} MB  {opcode:14s} "
              f"{classify(op_name, opcode, src_file):22s} "
              f"{op_name[:80]} [{src_file.rsplit('/', 1)[-1]}]")

    if opts.bucket_detail:
        want = opts.bucket_detail
        print(f"\n[attr] '{want}' bucket rows:")
        for by, opcode, op_name, name, src_file in rows:
            if classify(op_name, opcode, src_file) == want:
                print(f"  {by / 1e6:9.1f} MB  {opcode:14s} "
                      f"{op_name[:90]} [{src_file.rsplit('/', 1)[-1]}]")

    if opts.json:
        with open(opts.json, "w") as f:
            json.dump({
                "xla_bytes_accessed": xla_bytes,
                "parsed_bytes_total": total,
                "buckets_gb": {k: v / 1e9 for k, v in ranked},
                "top_instructions": [
                    {"mb": by / 1e6, "opcode": opcode, "op_name": op_name,
                     "source": src_file.rsplit("/", 1)[-1]}
                    for by, opcode, op_name, _, src_file in rows[:opts.top]],
            }, f, indent=1)


if __name__ == "__main__":
    main()
