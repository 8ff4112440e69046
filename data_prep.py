"""Dataset preparation CLI (the reference's data/prep layer):

  build-cfg   — scp lists + speaker info -> data-config JSON with
                train/valid/test splits, per-split total durations and
                speakers (data/prep/unsupervised_data_cfg_librispeech.py:
                13-102).
  segment     — split long wavs into fixed-length segments named
                <prefix>-<idx>.wav so the LibriSpeech tuple sampler can
                find within-utterance neighbors
                (data/prep/prepare_segmented_dataset_libri.py).

  python data_prep.py build-cfg --data_root wavs/ --train_scp tr.scp \\
      --test_scp te.scp --libri_dict spk2info.json --cfg_file data.cfg \\
      --val_ratio 0.1
  python data_prep.py segment --data_root in/ --out_root out/ \\
      --seg_len 15.0
"""

import argparse
import json
import os
import random


def build_cfg(opts):
    from pase_tpu.data.io import read_wav

    def read_scp(path):
        with open(path) as f:
            return [l.strip() for l in f if l.strip()]

    spk_info = {}
    if opts.libri_dict and os.path.exists(opts.libri_dict):
        with open(opts.libri_dict) as f:
            spk_info = json.load(f)

    def spk_of(fname):
        base = os.path.basename(fname)
        return base.split("-")[0] if "-" in base else "unk"

    def build_split(files):
        data, spks, total = [], set(), 0
        for fname in files:
            path = os.path.join(opts.data_root, fname)
            try:
                wav, sr = read_wav(path)
            except Exception as e:
                print(f"skipping {fname}: {e}")
                continue
            spk = spk_of(fname)
            spks.add(spk)
            total += len(wav)
            data.append({"filename": fname, "speaker": spk})
        return {"data": data, "speakers": sorted(spks),
                "total_wav_dur": total}

    train_files = read_scp(opts.train_scp)
    rng = random.Random(opts.seed)
    rng.shuffle(train_files)
    # speaker-holdout validation split (README.md:67-69 semantics)
    spks = sorted({spk_of(f) for f in train_files})
    n_va_spk = max(int(len(spks) * opts.val_ratio), 1)
    va_spks = set(spks[:n_va_spk])
    va_files = [f for f in train_files if spk_of(f) in va_spks]
    tr_files = [f for f in train_files if spk_of(f) not in va_spks]

    cfg = {"speakers": spks,
           "train": build_split(tr_files),
           "valid": build_split(va_files)}
    if opts.test_scp:
        cfg["test"] = build_split(read_scp(opts.test_scp))
    if spk_info:
        cfg["spk2idx"] = {s: i for i, s in enumerate(spks)}
    with open(opts.cfg_file, "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"Wrote {opts.cfg_file}: "
          f"{len(cfg['train']['data'])} train / "
          f"{len(cfg['valid']['data'])} valid files, "
          f"{cfg['train']['total_wav_dur']/16000/3600.0:.2f} h train")


def segment(opts):
    from pase_tpu.data.io import read_wav, write_wav
    os.makedirs(opts.out_root, exist_ok=True)
    seg = int(opts.seg_len * 16000)
    count = 0
    for fname in sorted(os.listdir(opts.data_root)):
        if not fname.endswith(".wav"):
            continue
        wav, sr = read_wav(os.path.join(opts.data_root, fname))
        prefix = os.path.splitext(fname)[0]
        for i in range(0, max(len(wav) - seg // 2, 1), seg):
            piece = wav[i:i + seg]
            if len(piece) < seg // 4:
                continue
            write_wav(os.path.join(opts.out_root,
                                   f"{prefix}-{i // seg}.wav"), piece, sr)
            count += 1
    print(f"Wrote {count} segments to {opts.out_root}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build-cfg")
    b.add_argument("--data_root", required=True)
    b.add_argument("--train_scp", required=True)
    b.add_argument("--test_scp", default=None)
    b.add_argument("--libri_dict", default=None)
    b.add_argument("--cfg_file", required=True)
    b.add_argument("--val_ratio", type=float, default=0.1)
    b.add_argument("--seed", type=int, default=3)
    s = sub.add_parser("segment")
    s.add_argument("--data_root", required=True)
    s.add_argument("--out_root", required=True)
    s.add_argument("--seg_len", type=float, default=15.0)
    opts = p.parse_args()
    if opts.cmd == "build-cfg":
        build_cfg(opts)
    else:
        segment(opts)


if __name__ == "__main__":
    main()
