"""TPU soak: a long device-corpus training run on the real chip through
the PRODUCTION CLI, with the probe curve tracked across epochs.

The closest this environment allows to the reference's 400-epoch recipe
(/root/reference/README.md:121-131): build a speaker-consistent corpus,
train `train.py --device_corpus` for >= --min_steps steps with the
epoch-boundary speaker-ID probe firing via --sup_exec (AuxiliarSuperviser,
pase/utils.py:164-185), then audit the run:

  * steps/s stability per epoch (mean, CoV, min/max)
  * NaN-guard silence (the trainer raises on any non-finite total)
  * checkpoint cadence (rolling saver + FE_e{e}.npz every epoch)
  * probe-accuracy curve vs a random-init encoder baseline
    (the transfer gate margin, experiments/transfer_gate.py)

Writes the audit JSON to --json (benchmarks/tpu_soak_r5.json in round 5).

Usage:  python experiments/tpu_soak.py --hours 4 --epochs 45 \\
            --workdir /tmp/pase_soak --json benchmarks/tpu_soak_r5.json
"""

import argparse
import glob
import json
import os
import subprocess
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, log, **kw):
    print("[soak] $", " ".join(cmd))
    with open(log, "a") as f:
        subprocess.run(cmd, check=True, stdout=f, stderr=subprocess.STDOUT,
                       cwd=_REPO, **kw)


def build_probe_lists(work):
    import collections
    wavs = sorted(os.listdir(os.path.join(work, "corpus", "wavs")))
    by_spk = collections.defaultdict(list)
    for w in wavs:
        by_spk[w.split("-")[0]].append(w)
    tr, te = [], []
    # ALL speakers, few shots each — keeps the probe from saturating so
    # the per-epoch curve actually discriminates encoder quality, and
    # keeps the CPU-pinned probe cheap (this image has ONE host core)
    spks = sorted(by_spk.items())
    for spk, files in spks:
        te += [(f, spk) for f in files[:2]]
        tr += [(f, spk) for f in files[2:6]]
    for name, rows in (("probe_tr.lst", tr), ("probe_te.lst", te)):
        with open(os.path.join(work, name), "w") as f:
            f.write("".join(f"{w} {s}\n" for w, s in rows))
    return len(spks)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=4.0)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--chunk_size", type=int, default=32000)
    ap.add_argument("--sup_freq", type=int, default=15)
    ap.add_argument("--min_steps", type=int, default=10000)
    ap.add_argument("--workdir", default="/tmp/pase_soak")
    ap.add_argument("--json", default=None)
    opts = ap.parse_args()

    work = opts.workdir
    os.makedirs(work, exist_ok=True)
    log = os.path.join(work, "soak.log")
    fe_cfg = os.path.join(_REPO, "cfg/frontend/PASE+.cfg")
    wk_cfg = os.path.join(_REPO, "cfg/workers/workers+.cfg")

    if not os.path.exists(os.path.join(work, "corpus", "data.cfg")):
        sh([sys.executable, "experiments/make_bench_corpus.py",
            "--out_root", os.path.join(work, "corpus"),
            "--hours", str(opts.hours)], log)
    n_spk = build_probe_lists(work)
    if not os.path.exists(os.path.join(work, "stats.pkl")):
        sh([sys.executable, "make_trainset_statistics.py",
            "--data_root", os.path.join(work, "corpus", "wavs"),
            "--data_cfg", os.path.join(work, "corpus", "data.cfg"),
            "--net_cfg", wk_cfg, "--out_file",
            os.path.join(work, "stats.pkl"), "--max_batches", "10",
            "--chunk_size", str(opts.chunk_size)], log)

    sup_cmd = os.path.join(work, "sup_cmd.txt")
    with open(sup_cmd, "w") as f:
        f.write(
            f"{sys.executable} {_REPO}/run_probe.py utt --fe_cfg {fe_cfg} "
            f"--fe_ckpt $model --train_list {work}/probe_tr.lst "
            f"--test_list {work}/probe_te.lst "
            f"--data_root {work}/corpus/wavs --epochs 8 --platform cpu "
            f"--out $save_path/probe_$iteration.json\n")

    run_dir = os.path.join(work, "run")
    print(f"[soak] training {opts.epochs} epochs "
          f"(target >= {opts.min_steps} steps) ...")
    sh([sys.executable, "train.py",
        "--data_root", os.path.join(work, "corpus", "wavs"),
        "--data_cfg", os.path.join(work, "corpus", "data.cfg"),
        "--dtrans_cfg", os.path.join(work, "corpus", "dist.cfg"),
        "--net_cfg", wk_cfg, "--fe_cfg", fe_cfg,
        "--stats", os.path.join(work, "stats.pkl"),
        "--device_corpus", "--batch_size", str(opts.batch_size),
        "--chunk_size", str(opts.chunk_size),
        "--epoch", str(opts.epochs), "--seed", "7",
        "--log_freq", "50", "--save_path", run_dir,
        "--sup_exec", sup_cmd, "--sup_freq", str(opts.sup_freq)], log)

    # random-init encoder baseline on the same probe
    sh([sys.executable, "run_probe.py", "utt", "--fe_cfg", fe_cfg,
        "--train_list", os.path.join(work, "probe_tr.lst"),
        "--test_list", os.path.join(work, "probe_te.lst"),
        "--data_root", os.path.join(work, "corpus", "wavs"),
        "--epochs", "8", "--platform", "cpu",
        "--out", os.path.join(work, "probe_random.json")],
       log)

    # ---- audit ---------------------------------------------------------------
    perf, totals, steps_seen = [], [], 0
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            if row.get("split") == "perf":
                perf.append(row["steps_per_sec"])
            if row.get("split") == "train":
                steps_seen = max(steps_seen, int(row.get("step", 0)))
                if row.get("total") is not None:
                    totals.append(float(row["total"]))
    probes = []
    # wait for the last async probe to land
    import time
    for _ in range(600):
        outs = sorted(glob.glob(os.path.join(run_dir, "sup_aux",
                                             "probe_*.json")))
        if outs and all(os.path.getsize(o) > 0 for o in outs):
            break
        time.sleep(1)
    for o in sorted(glob.glob(os.path.join(run_dir, "sup_aux",
                                           "probe_*.json"))):
        it = int(o.rsplit("_", 1)[1].split(".")[0])
        probes.append({"epoch": it,
                       "acc": json.load(open(o))["test_sentence_acc"]})
    probes.sort(key=lambda p: p["epoch"])
    rnd = json.load(open(os.path.join(work, "probe_random.json")))[
        "test_sentence_acc"]

    ckpts = sorted(glob.glob(os.path.join(run_dir, "FE_e*.npz")))
    perf = np.asarray(perf)
    # the first perf row of the run amortizes the one-time XLA compile
    # (~40 s cached / minutes cold) — stability is judged on warm rows
    warm = perf[1:] if len(perf) > 1 else perf
    out = {
        "steps_total": steps_seen,
        "epochs": opts.epochs,
        "steps_per_sec_mean": float(warm.mean()),
        "steps_per_sec_cov": float(warm.std() / warm.mean()),
        "steps_per_sec_min": float(warm.min()),
        "steps_per_sec_max": float(warm.max()),
        "steps_per_sec_first_incl_compile": float(perf[0]),
        "audio_sec_per_sec_mean": float(
            warm.mean() * opts.batch_size * opts.chunk_size / 16000),
        "total_loss_first": totals[0], "total_loss_last": totals[-1],
        "all_losses_finite": bool(np.isfinite(totals).all()),
        "fe_snapshots": len(ckpts),
        "n_probe_speakers": n_spk,
        "probe_random_acc": rnd,
        "probe_curve": probes,
        "probe_final_acc": probes[-1]["acc"] if probes else None,
        "probe_margin_final": (probes[-1]["acc"] - rnd) if probes else None,
    }
    out["ok"] = (steps_seen >= opts.min_steps
                 and out["all_losses_finite"]
                 and out["fe_snapshots"] == opts.epochs
                 and out["steps_per_sec_cov"] < 0.15
                 and bool(probes)
                 and probes[-1]["acc"] >= rnd)
    print(json.dumps(out, indent=1))
    if opts.json:
        with open(opts.json, "w") as f:
            json.dump(out, f, indent=1)
    print("[soak]", "PASS" if out["ok"] else "FAIL")
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
