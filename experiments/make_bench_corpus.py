"""Build an on-disk synthetic corpus + distortion assets in the exact
layout the reference's 50 h-LibriSpeech recipe consumes, so the REAL
data path (native wav decode -> tuple sampling -> threaded batching ->
host stage -> H2D -> on-device distortions/targets) can be benchmarked
end-to-end with `train.py` (BASELINE workload shape; reference hot loop
train.py:278-281).

Produces under --out_root:
  wavs/<spk>-<book>-<utt>.wav      Libri-style names (the filename-prefix
                                   neighboring scheme needs the trailing
                                   digit-run utterance index)
  data.cfg                         train/valid split via data_prep.build_cfg
  noises/*.wav                     noise bank for noises_dir
  irs/*.npy                        impulse responses for reverb
  filters/filter_16_to_8.npy       the downsample FIR
  dist.cfg                         pase+.cfg probabilities wired to the
                                   local assets

Usage:
  python experiments/make_bench_corpus.py --out_root /tmp/bench_corpus \
      --hours 2
  python train.py --net_cfg cfg/workers/workers+.cfg \
      --fe_cfg cfg/frontend/PASE+.cfg --data_root /tmp/bench_corpus/wavs \
      --data_cfg /tmp/bench_corpus/data.cfg \
      --dtrans_cfg /tmp/bench_corpus/dist.cfg \
      --batch_size 32 --chunk_size 32000 --epoch 2 \
      --save_path /tmp/bench_run --log_freq 25
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_root", required=True)
    ap.add_argument("--hours", type=float, default=2.0)
    ap.add_argument("--seg_s", type=float, default=8.0)
    ap.add_argument("--n_speakers", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    opts = ap.parse_args()

    from pase_tpu.data.io import write_wav
    from pase_tpu.data.dataset import SyntheticChunkBatcher

    sr = 16000
    seg = int(opts.seg_s * sr)
    n_utts = int(opts.hours * 3600 / opts.seg_s)
    wav_dir = os.path.join(opts.out_root, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    gen = SyntheticChunkBatcher(1, seg, seed=opts.seed)
    rng = np.random.RandomState(opts.seed + 1)

    print(f"writing {n_utts} x {opts.seg_s:.0f}s utterances "
          f"({opts.hours:.1f} h) ...")
    names = []
    # speaker-CONSISTENT voices: each filename speaker has fixed base
    # (f0, tilt), utterances jitter around it — so the filename label
    # actually identifies the voice and the rehearsal/soak speaker-ID
    # probes measure representation quality, not label noise
    spk_f0 = rng.uniform(95, 250, opts.n_speakers)
    spk_tilt = rng.uniform(0.75, 1.45, opts.n_speakers)
    # several utterances per (spk, book) so the prefix scheme finds
    # neighbors (rec strips the trailing digit-run)
    per_book = 10
    for i in range(n_utts):
        si = (i // (per_book * 4)) % opts.n_speakers
        spk = 100 + si
        book = 10000 + (i // per_book) % 4000
        utt = i % per_book
        f0 = np.array([[spk_f0[si] * rng.uniform(0.94, 1.06)]])
        tilt = np.array([[spk_tilt[si] + rng.uniform(-0.08, 0.08)]])
        wav = gen._speechlike(f0, tilt, seg)[0]
        name = f"{spk}-{book}-{utt:04d}.wav"
        write_wav(os.path.join(wav_dir, name), np.clip(wav, -1, 1), sr)
        names.append(name)
    scp = os.path.join(opts.out_root, "tr.scp")
    with open(scp, "w") as f:
        f.write("\n".join(names) + "\n")

    import argparse as _ap
    import data_prep
    cfg_file = os.path.join(opts.out_root, "data.cfg")
    data_prep.build_cfg(_ap.Namespace(
        data_root=wav_dir, train_scp=scp, test_scp=None, libri_dict=None,
        cfg_file=cfg_file, val_ratio=0.1, seed=3))

    # --- distortion assets -------------------------------------------------
    noise_dir = os.path.join(opts.out_root, "noises")
    os.makedirs(noise_dir, exist_ok=True)
    for i in range(12):
        n = rng.randn(4 * sr).astype(np.float32)
        # color the noise differently per file
        k = rng.randint(1, 5)
        n = np.convolve(n, np.ones(k) / k, mode="same")
        write_wav(os.path.join(noise_dir, f"noise_{i}.wav"),
                  np.clip(0.3 * n / np.abs(n).max(), -1, 1), sr)

    ir_dir = os.path.join(opts.out_root, "irs")
    os.makedirs(ir_dir, exist_ok=True)
    ir_files = []
    for i in range(16):
        ln = rng.randint(2000, 16000)
        ir = rng.randn(ln).astype(np.float32) * \
            np.exp(-np.arange(ln, dtype=np.float32) / rng.uniform(300, 3000))
        ir[0] = 1.0
        fn = f"IR_{i:03d}.npy"
        np.save(os.path.join(ir_dir, fn), ir)
        ir_files.append(fn)

    filt_dir = os.path.join(opts.out_root, "filters")
    os.makedirs(filt_dir, exist_ok=True)
    # linear-phase lowpass at 0.5 Nyquist (the 16->8 kHz antialias FIR)
    taps = 257
    t = np.arange(taps) - taps // 2
    h = np.sinc(t * 0.5) * np.hamming(taps)
    np.save(os.path.join(filt_dir, "filter_16_to_8.npy"),
            (h / h.sum()).astype(np.float32))

    overlap_list = os.path.join(opts.out_root, "overlap.scp")
    with open(overlap_list, "w") as f:
        f.write("\n".join(names[: min(200, len(names))]) + "\n")

    dist = {
        "_source": "pase+.cfg probabilities wired to synthetic local "
                   "assets (experiments/make_bench_corpus.py)",
        "overlap_dir": wav_dir,
        "overlap_list": overlap_list,
        "overlap_snrs": [5, 7.5, 10],
        "overlap_reverb": True,
        "overlap_p": 0.1,
        "noises_dir": [noise_dir],
        "noises_snrs": [0, 5, 10],
        "noises_p": 0.4,
        "clip_factors": [0.1, 0.3, 0.5],
        "clip_p": 0.2,
        "chop_factors": [[0.05, 0.025], [0.1, 0.05]],
        "chop_p": 0.2,
        "downsample_data_root": filt_dir,
        "downsample_fmt": "npy",
        "downsample_irfiles": ["filter_16_to_8.npy"],
        "downsample_p": 0.25,
        "bandrop_data_root": filt_dir,
        "bandrop_fmt": "npy",
        "bandrop_irfiles": [],
        "bandrop_p": 0.35,
        "reverb_data_root": ir_dir,
        "reverb_fmt": "npy",
        "reverb_p": 0.5,
        "reverb_irfiles": ir_files,
    }
    with open(os.path.join(opts.out_root, "dist.cfg"), "w") as f:
        json.dump(dist, f, indent=1)
    print(f"corpus ready under {opts.out_root}")


if __name__ == "__main__":
    main()
