"""Dataset preparation CLI (the reference's data/prep layer):

  build-cfg   — scp lists + speaker info -> data-config JSON with
                train/valid/test splits, per-split total durations and
                speakers (data/prep/unsupervised_data_cfg_librispeech.py:
                13-102).
  segment     — split long wavs into fixed-length segments named
                <prefix>-<idx>.wav so the LibriSpeech tuple sampler can
                find within-utterance neighbors
                (data/prep/prepare_segmented_dataset_libri.py).
  probe-lists — build downstream-probe list assets (`wav label` train/
                test lists + utt2class.json) from a corpus, covering
                the reference's per-corpus asset formats: bare
                filename lists + utt2spk.npy maps
                (spk_id/minivoxceleb_*spk/, spk_id/minivoxforge) and
                directory-per-class layouts like IEMOCAP's
                session*/ang|hap|neu|sad/*.wav
                (emorec/prepare_iemocap.py, emorec/tr_lst.txt).

  python data_prep.py build-cfg --data_root wavs/ --train_scp tr.scp \\
      --test_scp te.scp --libri_dict spk2info.json --cfg_file data.cfg \\
      --val_ratio 0.1
  python data_prep.py segment --data_root in/ --out_root out/ \\
      --seg_len 15.0
  python data_prep.py probe-lists --data_root minivox/ \\
      --utt2class utt2spk.npy --train_list minivox_tr_list.txt \\
      --test_list minivox_test_list.txt --out_dir lists/
  python data_prep.py probe-lists --data_root IEMOCAP/ \\
      --class_from dirname --holdout session5 --out_dir lists/
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


def probe_lists(opts):
    """Emit run_probe.py-format lists (`relpath label` per line) plus
    utt2class.json / class_map.json from reference-style probe assets."""
    os.makedirs(opts.out_dir, exist_ok=True)

    def scan_wavs():
        out = []
        for dirpath, _, files in os.walk(opts.data_root):
            for f in sorted(files):
                if f.lower().endswith(".wav"):
                    out.append(os.path.relpath(os.path.join(dirpath, f),
                                               opts.data_root))
        return sorted(out)

    def read_list(path):
        with open(path) as f:
            return [l.strip() for l in f if l.strip()]

    # 1. utterance -> raw class label
    if opts.utt2class:
        from pase_tpu.data.dataset import _load_utt2class
        u2c = {k: str(v) for k, v in _load_utt2class(opts.utt2class).items()}
        lookup = dict(u2c)
        # reference lists index by bare filename; tolerate relpaths too
        for k, v in u2c.items():
            lookup.setdefault(os.path.basename(k), v)

        def label_of(rel):
            return lookup.get(rel, lookup.get(os.path.basename(rel)))
    elif opts.class_from == "dirname":
        def label_of(rel):
            d = os.path.dirname(rel)
            return os.path.basename(d) if d else None
    else:
        raise SystemExit("probe-lists needs --utt2class or "
                         "--class_from dirname")

    # 2. train/test membership
    if opts.train_list:
        tr = read_list(opts.train_list)
        te = read_list(opts.test_list) if opts.test_list else []
    else:
        wavs = [w for w in scan_wavs() if label_of(w) is not None]
        if not wavs:
            raise SystemExit(f"no labeled wavs under {opts.data_root}")
        if opts.holdout:
            # leave-matching-subtree-out (IEMOCAP leave-sessions-out)
            pats = opts.holdout.split(",")
            te = [w for w in wavs
                  if any(w.split(os.sep)[0] == p for p in pats)]
            tr = [w for w in wavs if w not in set(te)]
        else:
            # class-stratified random split
            rng = random.Random(opts.seed)
            byc = {}
            for w in wavs:
                byc.setdefault(label_of(w), []).append(w)
            tr, te = [], []
            for c in sorted(byc):
                fs = byc[c]
                rng.shuffle(fs)
                n_te = max(int(round(len(fs) * opts.test_ratio)), 1) \
                    if len(fs) > 1 else 0
                te += fs[:n_te]
                tr += fs[n_te:]
            tr.sort(), te.sort()

    # 3. contiguous class ids in sorted raw-label order
    labels = sorted({label_of(w) for w in tr + te if label_of(w)})
    cmap = {c: i for i, c in enumerate(labels)}

    def write_split(name, files):
        path = os.path.join(opts.out_dir, name)
        n = 0
        with open(path, "w") as f:
            for w in files:
                lab = label_of(w)
                if lab is None:
                    print(f"skipping {w}: no class label")
                    continue
                f.write(f"{w} {cmap[lab]}\n")
                n += 1
        return n

    n_tr = write_split("tr.lst", tr)
    n_te = write_split("te.lst", te)
    with open(os.path.join(opts.out_dir, "class_map.json"), "w") as f:
        json.dump(cmap, f, indent=2, sort_keys=True)
    with open(os.path.join(opts.out_dir, "utt2class.json"), "w") as f:
        json.dump({w: cmap[label_of(w)] for w in tr + te
                   if label_of(w) is not None}, f, indent=2, sort_keys=True)
    print(f"Wrote {opts.out_dir}: {n_tr} train / {n_te} test utts, "
          f"{len(cmap)} classes")


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
    pl = sub.add_parser("probe-lists")
    pl.add_argument("--data_root", required=True)
    pl.add_argument("--out_dir", required=True)
    pl.add_argument("--utt2class", default=None,
                    help="utt2spk/utt2lang map (.npy pickled dict or .json)")
    pl.add_argument("--class_from", default=None, choices=["dirname"],
                    help="infer label from parent directory name")
    pl.add_argument("--train_list", default=None,
                    help="existing bare filename list (reference asset)")
    pl.add_argument("--test_list", default=None)
    pl.add_argument("--holdout", default=None,
                    help="comma-sep top-level dirs held out as test "
                         "(e.g. session5 for IEMOCAP leave-session-out)")
    pl.add_argument("--test_ratio", type=float, default=0.2)
    pl.add_argument("--seed", type=int, default=0)
    opts = p.parse_args()
    if opts.cmd == "build-cfg":
        build_cfg(opts)
    elif opts.cmd == "segment":
        segment(opts)
    else:
        probe_lists(opts)


if __name__ == "__main__":
    main()
