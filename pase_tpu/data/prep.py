"""Corpus-preparation builders: the reference's data/prep + downstream_prep
layer, rebuilt host-side with vectorized numpy.

Covers:
* energy-VAD segmentation of long recordings
  (prepare_segmented_dataset_{swbd,ami}.py:32-122 ``segment_signal``) —
  the frame-energy + smoothing passes are vectorized (cumsum framing)
  instead of the reference's per-frame Python loop; the hysteresis
  state machine is kept as a faithful scalar pass (output-identical).
* AMI ihm/sdm parallel segmenting + data-cfg building
  (prepare_segmented_dataset_ami.py:126-266,
  unsupervised_data_cfg_ami.py:10-197): close-talk headsets are VADed,
  the same windows cut from the distant Array1 channels, and the cfg
  carries the sdm paths under per-channel keys so the aligned-window
  parallel dataset (pase_tpu/data/dataset.py) can sample cchunks from
  the distant mics.
* VCTK speaker-split cfg (unsupervised_data_cfg_vctk.py:11-137).
* OpenSLR-28 room-impulse-response bank -> reverb distortion cfg
  (prepare_openslr_rirs_cfg.py:10-86).
* VoxCeleb / VoxForge downstream probe prep
  (downstream_prep/prep_voxceleb.py, prep_voxforge.py): per-speaker /
  per-language fixed-length samples + train/test lists + utt2spk/
  utt2lang maps in the formats data_prep.py probe-lists consumes.
* CHiME-5 worn/array pairing from Kaldi data dirs
  (chime5_utils.py:251-417 ``PasePrep4Chime5``): utterances paired by
  (session, speaker, transcript) hash, emitted as a parallel data cfg
  + segment cut list.

All functions are importable and unit-tested on synthetic corpora
(tests/test_prep.py); data_prep.py exposes them as CLI subcommands.
"""

import json
import os
import random
import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from pase_tpu.data.io import (read_wav, read_wav_channels, write_wav)


# ---------------------------------------------------------------------------
# Energy VAD (segment_signal, prepare_segmented_dataset_swbd.py:32-122)
# ---------------------------------------------------------------------------

def energy_vad_segments(signal: np.ndarray, wlen: int = 3200,
                        wshift: int = 80, en_th: float = 0.3,
                        smooth_window: int = 40,
                        smooth_th_low: float = 0.25,
                        smooth_th_high: float = 0.6,
                        min_len: int = 24000) -> List[Tuple[int, int]]:
    """Energy-based VAD -> [(beg, end)] sample bounds of speech segments.

    Matches the reference pass exactly: mean-|x| energies over
    wlen/wshift frames, binarized at ``en_th * mean_energy``, smoothed
    with a FORWARD mean over ``smooth_window`` frames (truncated at the
    tail), then a high/low hysteresis with both bounds offset by +wlen
    samples, keeping segments strictly longer than ``min_len``.
    The energy and smoothing passes are cumsum-vectorized; only the
    (cheap) hysteresis walk stays scalar.
    """
    n = len(signal)
    if n <= wlen:
        return []
    # frame i covers [i*wshift, i*wshift+wlen); included iff end < n
    k = (n - 1 - wlen) // wshift + 1
    if k <= 0:
        return []
    cs = np.concatenate([[0.0], np.cumsum(np.abs(signal), dtype=np.float64)])
    begs = np.arange(k, dtype=np.int64) * wshift
    en = (cs[begs + wlen] - cs[begs]) / wlen
    en_bin = (en > en.mean() * en_th).astype(np.float64)
    # forward mean over [i, min(i+smooth_window, k))
    cb = np.concatenate([[0.0], np.cumsum(en_bin)])
    hi = np.minimum(np.arange(k) + smooth_window, k)
    smooth = (cb[hi] - cb[np.arange(k)]) / np.maximum(hi - np.arange(k), 1)

    segs: List[Tuple[int, int]] = []
    vad = False
    beg = 0
    for i in range(k):
        if not vad:
            if smooth[i] > smooth_th_high and i < k - 1:
                vad = True
                beg = int(begs[i]) + wlen
        else:
            if i == k - 1:
                segs.append((beg, int(begs[i]) + wlen))
                break
            if smooth[i] < smooth_th_low:
                vad = False
                segs.append((beg, int(begs[i]) + wlen))
    return [(b, e) for b, e in segs if e - b > min_len]


_CHANNEL_SIDES = {0: "A", 1: "B", 2: "C", 3: "D"}


def _pick_channel(wav: np.ndarray, channel: int) -> np.ndarray:
    if wav.ndim > 1:
        return wav[:, channel]
    if channel > 0:
        raise ValueError(f"asked for channel {channel} of a mono file")
    return wav


def vad_segment_corpus(data_root: str, file_list: Sequence[str],
                       out_root: str, channel: int = 0,
                       vad_list_path: Optional[str] = None,
                       **vad_kwargs) -> int:
    """Generic long-recording segmenter (SWBD flow,
    prepare_segmented_dataset_swbd.py:123-172): VAD each file, write the
    VAD list (``file beg end segid`` lines), then cut
    ``<name>-<side>-<segid>.wav`` segments under ``out_root`` (dir
    structure mirrored). Signals are peak-normalized before VAD and
    export, as the reference does."""
    if channel not in _CHANNEL_SIDES:
        # validate BEFORE the expensive VAD pass, not at export time
        raise ValueError(
            f"channel must be one of {sorted(_CHANNEL_SIDES)} "
            f"(segment names carry a side letter), got {channel}")
    entries = []
    for fname in file_list:
        wav, sr = read_wav_channels(os.path.join(data_root, fname))
        sig = _pick_channel(wav, channel)
        peak = np.max(np.abs(sig))
        if peak > 0:
            sig = sig / peak
        for seg_id, (b, e) in enumerate(energy_vad_segments(sig,
                                                            **vad_kwargs)):
            entries.append((fname, b, e, seg_id, sr))
    if vad_list_path:
        with open(vad_list_path, "w") as f:
            for fname, b, e, seg_id, _ in entries:
                f.write(f"{fname} {b} {e} {seg_id}\n")
    side = _CHANNEL_SIDES[channel]
    n_out = 0
    cur_name, cur_sig, cur_sr = None, None, 16000
    for fname, b, e, seg_id, sr in entries:
        if fname != cur_name:
            wav, cur_sr = read_wav_channels(os.path.join(data_root, fname))
            cur_sig = _pick_channel(wav, channel)
            peak = np.max(np.abs(cur_sig))
            if peak > 0:
                cur_sig = cur_sig / peak
            cur_name = fname
        stem = re.sub(r"\.(wav|sph)$", "", fname, flags=re.I)
        out_path = os.path.join(out_root, f"{stem}-{side}-{seg_id}.wav")
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        write_wav(out_path, cur_sig[b:e], cur_sr)
        n_out += 1
    return n_out


# ---------------------------------------------------------------------------
# AMI (prepare_segmented_dataset_ami.py + unsupervised_data_cfg_ami.py)
# ---------------------------------------------------------------------------

def ami_mic_path(meetid: str, chan, cond: str = "ihm") -> Tuple[str, str]:
    """(meeting-relative dir, wav name) for a headset or distant channel
    (mk_mic_path, prepare_segmented_dataset_ami.py:121-128)."""
    meetpath = f"{meetid}/audio"
    if cond == "ihm":
        return meetpath, f"{meetid}.Headset-{chan}.wav"
    if cond == "sdm":
        return meetpath, f"{meetid}.Array1-0{chan}.wav"
    raise ValueError(f"cond must be ihm or sdm, got {cond}")


def ami_segment(data_root: str, out_root: str, meetings: Sequence[str],
                map_ihm2sdm: str = "1,3,5,7",
                utt2spk_name: str = "utt2spk.npy",
                headsets: Sequence[int] = (0, 1, 2, 3),
                **vad_kwargs) -> Dict[str, str]:
    """AMI parallel segmenter: VAD the close-talk headsets of each
    meeting into a shared ``<meet>.Headset.vad`` list, cut IHM segments
    ``<meet>.Headset-<h>-<seg>.wav`` and, at the SAME windows, distant
    segments ``<meet>.Headset-<h>-<seg>.Arr1-0<c>.wav`` from the Array1
    channels. Returns (and saves) the utt2spk map (segment wav ->
    headset id, the reference's speaker proxy).
    Mirrors prepare_segmented_dataset_ami.py:130-246 (incl. joint VAD
    list across headsets and peak normalization)."""
    sdms = [s for s in map_ihm2sdm.split(",") if s != ""]
    for s in sdms:
        if s not in list("01234567"):
            raise ValueError(f"AMI has distant mics 0..7, got {s}")
    file2spk: Dict[str, str] = {}
    for meeting in meetings:
        vad_path = os.path.join(out_root, f"{meeting}.Headset.vad")
        os.makedirs(out_root, exist_ok=True)
        if not os.path.exists(vad_path):
            lines = []
            for h in headsets:
                meetpath, hs_file = ami_mic_path(meeting, h, "ihm")
                path = os.path.join(data_root, meetpath, hs_file)
                if not os.path.exists(path):
                    continue
                wav, sr = read_wav_channels(path)
                sig = _pick_channel(wav, 0)
                peak = np.max(np.abs(sig))
                if peak > 0:
                    sig = sig / peak
                for seg_id, (b, e) in enumerate(
                        energy_vad_segments(sig, **vad_kwargs)):
                    lines.append(f"{hs_file} {b} {e} {seg_id}\n")
            with open(vad_path, "w") as f:
                f.writelines(lines)
        with open(vad_path) as f:
            entries = [l.rstrip().split(" ") for l in f if l.rstrip()]

        for h in headsets:
            meetpath, hs_file = ami_mic_path(meeting, h, "ihm")
            path = os.path.join(data_root, meetpath, hs_file)
            if not os.path.exists(path):
                continue
            wav, sr = read_wav_channels(path)
            sig = _pick_channel(wav, 0)
            peak = np.max(np.abs(sig))
            if peak > 0:
                sig = sig / peak
            os.makedirs(os.path.join(out_root, meetpath), exist_ok=True)
            for wav_file, b, e, seg_id in entries:
                if wav_file != hs_file:
                    # joint VAD list across headsets (ami ref:189-194)
                    continue
                out_wav = wav_file.replace(".wav", f"-{seg_id}.wav")
                write_wav(os.path.join(out_root, meetpath, out_wav),
                          sig[int(b):int(e)], sr)
                file2spk[out_wav] = wav_file.replace(".wav", "")
        for sdm in sdms:
            meetpath, sdm_file = ami_mic_path(meeting, sdm, "sdm")
            path = os.path.join(data_root, meetpath, sdm_file)
            if not os.path.exists(path):
                continue
            wav, sr = read_wav_channels(path)
            sig = _pick_channel(wav, 0)
            peak = np.max(np.abs(sig))
            if peak > 0:
                sig = sig / peak
            os.makedirs(os.path.join(out_root, meetpath), exist_ok=True)
            for wav_file, b, e, seg_id in entries:
                stem = wav_file.replace(".wav", "")
                out_wav = f"{stem}-{seg_id}.Arr1-0{sdm}.wav"
                write_wav(os.path.join(out_root, meetpath, out_wav),
                          sig[int(b):int(e)], sr)
                file2spk[out_wav] = stem
    np.save(os.path.join(out_root, utt2spk_name), file2spk,
            allow_pickle=True)
    return file2spk


_AMI_IHM_RE = re.compile(r".*Headset\-\d\-(\d)*\.wav")
_AMI_SPK_RE = re.compile(r"(.*Headset\-\d).*")
_AMI_SDM_RE = re.compile(r"(.*Headset\-\d\-[\d)]*)(\.Arr1-0)(\d).*")


def _ami_parse_list(scp_path: str, chans: List[str]):
    """scp of segment wavs -> (utt2spk for headset segments,
    ihm -> {chan: sdm} map), dropping ihm utts missing any requested
    distant channel (unsupervised_data_cfg_ami.py:14-64)."""
    with open(scp_path) as f:
        entries = [l.strip() for l in f if l.strip()]
    ihms = [e for e in entries if _AMI_IHM_RE.search(e)]
    utt2spk = {}
    for p in ihms:
        bsn = os.path.basename(p)
        m = _AMI_SPK_RE.match(bsn)
        utt2spk[bsn] = m.group(1) if m else None
    ihm2sdms: Dict[str, Dict[str, str]] = {k: {} for k in utt2spk}
    if chans:
        for p in entries:
            m = _AMI_SDM_RE.match(os.path.basename(p))
            if not m:
                continue
            ihm = m.group(1) + ".wav"
            chan = m.group(3)
            sdm = m.group(1) + m.group(2) + m.group(3) + ".wav"
            if chan not in chans:
                continue
            if ihm in ihm2sdms:
                ihm2sdms[ihm][chan] = sdm
        for ihm in list(ihm2sdms):
            if len(ihm2sdms[ihm]) != len(chans):
                ihm2sdms.pop(ihm)
                utt2spk.pop(ihm, None)
    return utt2spk, ihm2sdms


def ami_path_of(utt: str) -> str:
    """segment basename -> '<meetid>/audio/<basename>' corpus-relative
    path (mk_ami_path, unsupervised_data_cfg_ami.py:66-76)."""
    m = re.match(r"(.*)\.Headset.*", os.path.basename(utt))
    if m is None:
        raise ValueError(f"cannot extract meeting id from {utt} — "
                         "is this an AMI segment name?")
    return f"{m.group(1)}/audio/{os.path.basename(utt)}"


def ami_data_cfg(data_root: str, train_scp: str, test_scp: str,
                 map_ihm2sdm: str = "1,3,5,7", val_ratio: float = 0.1,
                 seed: int = 3) -> dict:
    """Build the AMI data cfg with parallel distant-channel entries
    ({'filename': ihm, '1': sdm1, ..., 'spk': headset-id}) consumed by
    the aligned-window parallel dataset
    (unsupervised_data_cfg_ami.py:78-182 ``main``)."""
    rng = random.Random(seed)
    chans = [c for c in map_ihm2sdm.split(",") if c != ""]
    utt2spk, ihm2sdms = _ami_parse_list(train_scp, chans)
    utt2spk_te, ihm2sdms_te = _ami_parse_list(test_scp, chans)

    cfg = {s: {"data": [], "speakers": [], "total_wav_dur": 0}
           for s in ("train", "valid", "test")}
    cfg["speakers"] = []

    keys = list(utt2spk.keys())
    rng.shuffle(keys)
    n_valid = int(len(keys) * val_ratio)
    split_keys = {"valid": keys[:n_valid], "train": keys[n_valid:],
                  "test": list(utt2spk_te.keys())}
    maps = {"train": (utt2spk, ihm2sdms), "valid": (utt2spk, ihm2sdms),
            "test": (utt2spk_te, ihm2sdms_te)}
    for split in ("train", "valid", "test"):
        u2s, i2s = maps[split]
        dur = 0
        for utt in split_keys[split]:
            spk = u2s[utt]
            if spk not in cfg["speakers"]:
                cfg["speakers"].append(spk)
                cfg[split]["speakers"].append(spk)
            entry = {"filename": ami_path_of(utt), "spk": spk}
            for chan, sdm in i2s[utt].items():
                entry[chan] = ami_path_of(sdm)
            cfg[split]["data"].append(entry)
            wav, _ = read_wav(os.path.join(data_root, ami_path_of(utt)))
            dur += len(wav)
        cfg[split]["total_wav_dur"] = dur
    return cfg


# ---------------------------------------------------------------------------
# VCTK (unsupervised_data_cfg_vctk.py:11-137)
# ---------------------------------------------------------------------------

def vctk_data_cfg(data_root: str, train_split: float = 0.88,
                  valid_split: float = 0.06, min_len: int = 16000,
                  max_utts_spk: Optional[Dict[str, int]] = None) -> dict:
    """VCTK cfg builder: parse speaker-info.txt (whitespace table with a
    header row; trailing multi-word REGION merged with underscores),
    split SPEAKERS (not utts) into train/valid/test by list order, scan
    wav16/ (preferred) or wav48/ per speaker, drop utts shorter than
    ``min_len`` samples, cap per-split per-speaker utterance counts."""
    info_path = os.path.join(data_root, "speaker-info.txt")
    spks: Dict[str, dict] = {}
    ws = re.compile(r"\s+")
    with open(info_path) as f:
        header: List[str] = []
        for li, line in enumerate(f, start=1):
            content = ws.split(line.rstrip())
            content = [c for c in content if c != ""]
            if li == 1:
                header = content
                continue
            if not content:
                continue
            if len(content) > len(header):
                content = content[:len(header) - 1] + \
                    ["_".join(content[len(header) - 1:])]
            elif len(content) < len(header):
                content += ["UNK"] * (len(header) - len(content))
            spks[content[0]] = dict(zip(header[1:], content[1:]))

    spk_ids = list(spks.keys())
    n = len(spk_ids)
    n_train = int(np.floor(train_split * n))
    n_valid = int(np.floor(valid_split * n))
    wav_dir = "wav16" if os.path.exists(os.path.join(data_root, "wav16")) \
        else "wav48"
    caps = {"train": 0, "valid": 0, "test": 0}
    if max_utts_spk:
        caps.update(max_utts_spk)

    cfg = {"train": {"data": [], "speakers": []},
           "valid": {"data": [], "speakers": []},
           "test": {"data": [], "speakers": []},
           "speakers": spks}
    ptr = 0
    for split, split_n in (("train", n_train), ("valid", n_valid),
                           ("test", n - n_train - n_valid)):
        split_spks = spk_ids[ptr:ptr + split_n]
        total = 0
        cap = caps[split] if caps[split] > 0 else np.inf
        for spk in split_spks:
            spk_dir = os.path.join(data_root, wav_dir, "p" + spk)
            wavs = sorted(
                os.path.join(spk_dir, w) for w in os.listdir(spk_dir)
                if w.endswith(".wav")) if os.path.isdir(spk_dir) else []
            count = 0
            for wav_path in wavs:
                if count >= cap:
                    break
                count += 1
                x, _ = read_wav(wav_path)
                if len(x) < min_len:
                    continue
                total += len(x)
                cfg[split]["data"].append(
                    {"filename": os.path.join(wav_dir, "p" + spk,
                                              os.path.basename(wav_path)),
                     "spk": spk})
                if spk not in cfg[split]["speakers"]:
                    cfg[split]["speakers"].append(spk)
        cfg[split]["total_wav_dur"] = total
        ptr += split_n
    return cfg


# ---------------------------------------------------------------------------
# OpenSLR-28 RIRs (prepare_openslr_rirs_cfg.py:10-86)
# ---------------------------------------------------------------------------

def openslr_rirs_cfg(data_root: str, out_file: str,
                     small_room_ratio: float = 1.0,
                     medium_room_ratio: float = 1.0,
                     large_room_ratio: float = 1.0,
                     existing_cfg: Optional[str] = None,
                     seed: Optional[int] = None) -> dict:
    """Build (or extend) a distortion cfg whose reverb bank is the
    OpenSLR-28 simulated RIR corpus: each <room>/rir_list line's 5th
    field is a corpus-relative IR wav path; per-room subsampling by
    ratio. Writes reverb_data_root/fmt/irfiles into ``out_file``."""
    if existing_cfg is not None:
        with open(existing_cfg) as f:
            out = json.load(f)
        out["reverb_data_root"] = data_root
        out["reverb_fmt"] = "wav"
        out["reverb_irfiles"] = []
    else:
        out = {"reverb_data_root": data_root, "reverb_fmt": "wav",
               "reverb_irfiles": []}
    rng = random.Random(seed)
    final = []
    ratios = {"smallroom": small_room_ratio,
              "mediumroom": medium_room_ratio,
              "largeroom": large_room_ratio}
    for room, ratio in ratios.items():
        rir_list = os.path.join(data_root, room, "rir_list")
        if not os.path.exists(rir_list):
            continue
        with open(rir_list) as f:
            rirs = [line.split(" ")[4].strip() for line in f
                    if len(line.split(" ")) > 4]
        if ratio < 1.0:
            rng.shuffle(rirs)
            rirs = rirs[:int(len(rirs) * ratio)]
        final.extend(rirs)
    out["reverb_irfiles"].extend(sorted(final))
    with open(out_file, "w") as f:
        json.dump(out, f, indent=2)
    return out


# ---------------------------------------------------------------------------
# VoxCeleb / VoxForge downstream prep (downstream_prep/prep_voxceleb.py,
# prep_voxforge.py)
# ---------------------------------------------------------------------------

def _fixed_length(y: np.ndarray, n_samples: int, rng) -> np.ndarray:
    """Random n-sample crop, or tile short signals up to length
    (prep_rec, prep_voxceleb.py:7-32)."""
    if len(y) > n_samples:
        # high-exclusive: start in [0, len-n-1] (reference randint(0,
        # len-n)); len == n+1 must yield start 0, not a ValueError
        ridx = rng.randint(0, len(y) - n_samples)
        return y[ridx:ridx + n_samples]
    mul = int(np.ceil(n_samples / max(len(y), 1)))
    return np.tile(y, mul)[:n_samples]


def voxceleb_lists(path_to_data: str, out_path: str, nspk: int = 100,
                   out_length: int = 10, sr: int = 16000,
                   seed: Optional[int] = None) -> Tuple[list, list, dict]:
    """mini-VoxCeleb builder: sample ``nspk`` speaker dirs
    (spk/session/utt.wav layout), pick one train + one test recording
    per speaker, export fixed-length wavs named
    ``<spk>_-_<session>_-_<utt>`` under train/ test/, and write
    lists/train_list, lists/test_list, lists/utt2spk.npy — the asset
    format the spk-id probes consume (prep_voxceleb.py:50-120 +
    make_vox1.sh renaming)."""
    rng = np.random.RandomState(seed)
    spk_dirs = sorted(d for d in os.listdir(path_to_data)
                      if os.path.isdir(os.path.join(path_to_data, d)))
    if nspk > len(spk_dirs):
        raise ValueError(f"asked for {nspk} speakers, corpus has "
                         f"{len(spk_dirs)}")
    spk_list = rng.choice(spk_dirs, nspk, replace=False)
    for sub in ("train", "test", "lists"):
        os.makedirs(os.path.join(out_path, sub), exist_ok=True)
    train_list, test_list, utt2spk = [], [], {}
    n_samples = sr * out_length
    for i, spk in enumerate(spk_list):
        recs = []
        spk_root = os.path.join(path_to_data, spk)
        for sess in sorted(os.listdir(spk_root)):
            sess_dir = os.path.join(spk_root, sess)
            if not os.path.isdir(sess_dir):
                continue
            recs += [os.path.join(sess_dir, r)
                     for r in sorted(os.listdir(sess_dir))
                     if r.lower().endswith(".wav")]
        if len(recs) < 2:
            raise ValueError(f"speaker {spk} has <2 recordings")
        tr_rec, te_rec = rng.choice(recs, 2, replace=False)
        for rec, sub, lst in ((tr_rec, "train", train_list),
                              (te_rec, "test", test_list)):
            y, _ = read_wav(rec)
            y = _fixed_length(y, n_samples, rng)
            name = "_-_".join([spk, os.path.basename(os.path.dirname(rec)),
                               os.path.basename(rec)])
            write_wav(os.path.join(out_path, sub, name), y, sr)
            lst.append(name)
            utt2spk[name] = i
    _dump_list(train_list, os.path.join(out_path, "lists", "train_list"))
    _dump_list(test_list, os.path.join(out_path, "lists", "test_list"))
    np.save(os.path.join(out_path, "lists", "utt2spk.npy"), utt2spk,
            allow_pickle=True)
    return train_list, test_list, utt2spk


def _dump_list(items: Sequence[str], path: str):
    with open(path, "w") as f:
        for el in items:
            f.write(el + "\n")


def simple_frame_vad(y: np.ndarray, sr: int, win_s: float = 0.025,
                     hop_s: float = 0.010,
                     percent_thr: float = 0.5, nrg_thr: float = 0.0,
                     context: int = 5) -> np.ndarray:
    """Log-energy VAD keeping voiced samples (nrg_vad/deframe,
    prep_voxforge.py:36-67): normalized per-frame log energies, a frame
    is speech when >percent_thr of its +/-context neighborhood exceeds
    nrg_thr; the frame decision is painted back over samples."""
    win, hop = int(sr * win_s), int(sr * hop_s)
    if len(y) < win:
        return y
    k = 1 + (len(y) - win) // hop
    idx = np.arange(k)[:, None] * hop + np.arange(win)[None, :]
    frames = y[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)
    nrg = np.log(np.mean(frames * frames, axis=1) + 1e-10)
    nrg = (nrg - nrg.mean()) / (nrg.std() + 1e-10)
    above = (nrg > nrg_thr).astype(np.float64)
    ca = np.concatenate([[0.0], np.cumsum(above)])
    lo = np.maximum(np.arange(k) - context, 0)
    hi = np.minimum(np.arange(k) + context, k - 1)
    frac = (ca[hi] - ca[lo]) / np.maximum(hi - lo + 1, 1)
    vad_fr = frac > percent_thr
    mask = np.zeros(len(y), bool)
    for i in np.flatnonzero(vad_fr):
        mask[i * hop:i * hop + win] = True
    return y[mask]


def voxforge_lists(path_to_metadata: str, path_to_data: str, out_path: str,
                   nrecs: int = 30, out_length: int = 10, sr: int = 16000,
                   vad: bool = False, traintest: bool = True,
                   seed: Optional[int] = None) -> Tuple[list, list, dict]:
    """VoxForge LID prep: the metadata csv (``wav,Language,user,idx``
    rows, downstream_prep/voxforge_samples.csv) groups recordings by
    language; 1/3 of up-to-``nrecs`` sampled recordings per language go
    to test, the rest to train; each is optionally VADed and exported
    fixed-length as ``<lang>_-_<wav>``; lists + utt2lang.npy written
    under lists/ (prep_voxforge.py:120-194)."""
    rng = np.random.RandomState(seed)
    lang2rec: Dict[str, List[str]] = {}
    with open(path_to_metadata) as f:
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 2:
                continue
            lang2rec.setdefault(parts[1], []).append(parts[0])
    for sub in (("train", "test", "lists") if traintest else ()):
        os.makedirs(os.path.join(out_path, sub), exist_ok=True)
    train_list, test_list, utt2lang = [], [], {}
    n_samples = sr * out_length

    def prep_one(rec: str, dest: str):
        src = os.path.join(path_to_data, rec)
        if not os.path.exists(src):
            return False
        y, fs = read_wav(src)
        if len(y) <= fs * 2:
            return False
        if vad:
            y = simple_frame_vad(y, fs)
        if len(y) == 0:
            return False
        write_wav(dest, _fixed_length(y, n_samples, rng), sr)
        return True

    for i, lang in enumerate(lang2rec):
        recs = lang2rec[lang]
        if len(recs) < 2:
            raise ValueError(f"not enough recordings for language {lang}")
        if traintest:
            sel = rng.choice(recs, min(nrecs, len(recs)), replace=False)
            mid = len(sel) // 3
            for rec in sel[mid:]:
                name = f"{lang}_-_{rec}"
                if prep_one(rec, os.path.join(out_path, "train", name)):
                    train_list.append(name)
                    utt2lang[name] = i
            for rec in sel[:mid]:
                name = f"{lang}_-_{rec}"
                if prep_one(rec, os.path.join(out_path, "test", name)):
                    test_list.append(name)
                    utt2lang[name] = i
        else:
            os.makedirs(out_path, exist_ok=True)
            for rec in recs:
                prep_one(rec, os.path.join(out_path, f"{lang}_-_{rec}"))
    if traintest:
        _dump_list(train_list, os.path.join(out_path, "lists",
                                            "train_list"))
        _dump_list(test_list, os.path.join(out_path, "lists", "test_list"))
        np.save(os.path.join(out_path, "lists", "utt2lang.npy"), utt2lang,
                allow_pickle=True)
    return train_list, test_list, utt2lang


# ---------------------------------------------------------------------------
# CHiME-5 worn/array pairing (chime5_utils.py:251-417)
# ---------------------------------------------------------------------------

def chime5_pair(ihm_dir: str, sdm_dir: str,
                min_words_per_seg: int = 2) -> Dict[str, dict]:
    """Pair worn-mic (ihm) and array (sdm) utterances by
    (session, speaker, transcript) id — the two Kaldi dirs segment the
    same speech differently, so the reference matches them via a text
    hash (get_Us_for_worn_text, chime5_utils.py:185-268). Returns
    spk -> {'ihm': [utts], 'sdm': [utts]} with aligned lists."""
    from pase_tpu.data.kaldi_dir import KaldiDataDir
    ihm, sdm = KaldiDataDir(ihm_dir), KaldiDataDir(sdm_dir)

    def text_ids(dd):
        out = {}
        for utt, txt in dd.utt2text.items():
            if len(txt.split(" ")) < min_words_per_seg:
                continue
            ps = utt.split("_")
            key = f"{ps[0]}_{ps[1]} {txt}" if len(ps) > 1 else f"{utt} {txt}"
            # doubles dropped (first wins), as the reference does
            out.setdefault(key, utt)
        return out

    t_ihm, t_sdm = text_ids(ihm), text_ids(sdm)
    joint = sorted(set(t_ihm) & set(t_sdm))
    spk2chunks: Dict[str, dict] = {s: {"ihm": [], "sdm": []}
                                   for s in ihm.spk2utt}
    for key in joint:
        u_ihm, u_sdm = t_ihm[key], t_sdm[key]
        spk = ihm.utt2spk.get(u_ihm)
        if spk is None or spk != sdm.utt2spk.get(u_sdm):
            continue
        spk2chunks[spk]["ihm"].append(u_ihm)
        spk2chunks[spk]["sdm"].append(u_sdm)
    return spk2chunks


def chime5_data_cfg(ihm_dir: str, sdm_dir: str, out_dir: str,
                    valid_spk: str = "P42", test_spk: str = "P41",
                    fs: int = 16000, min_words_per_seg: int = 2,
                    cut_segments: bool = True) -> dict:
    """Build the CHiME-5 parallel data cfg ({'filename': ihm-seg,
    '1': sdm-seg, 'spk': spk}) and cut the paired segments from the
    session recordings (to_data_cfg + segment_audio,
    chime5_utils.py:270-380). Speakers ``valid_spk``/``test_spk`` go to
    valid/test as in the reference's fixed split."""
    from pase_tpu.data.kaldi_dir import KaldiDataDir, parse_wav_entry
    ihm, sdm = KaldiDataDir(ihm_dir), KaldiDataDir(sdm_dir)
    spk2chunks = chime5_pair(ihm_dir, sdm_dir, min_words_per_seg)

    cfg = {s: {"data": [], "speakers": [], "total_wav_dur": 0}
           for s in ("train", "valid", "test")}
    cfg["speakers"] = []
    cut_jobs: Dict[str, List[tuple]] = {}

    for spk in sorted(spk2chunks):
        for idx, (u_ihm, u_sdm) in enumerate(zip(spk2chunks[spk]["ihm"],
                                                 spk2chunks[spk]["sdm"])):
            reco_i, beg_i, end_i = ihm.utt2segments[u_ihm]
            reco_s, beg_s, end_s = sdm.utt2segments[u_sdm]
            out_ihm = f"{spk}-{idx}.wav"
            out_sdm = f"{spk}_{reco_s}-{idx}.wav"
            for reco, beg, end, out, dd in (
                    (reco_i, beg_i, end_i, out_ihm, ihm),
                    (reco_s, beg_s, end_s, out_sdm, sdm)):
                path, chan = parse_wav_entry(dd.utt2wav[reco])
                cut_jobs.setdefault(path, []).append(
                    (beg, end, chan, os.path.join(out_dir, out)))
            dset = "train"
            if spk == valid_spk:
                dset = "valid"
            elif spk == test_spk:
                dset = "test"
            cfg[dset]["data"].append({"filename": out_ihm, "1": out_sdm,
                                      "spk": spk})
            if spk not in cfg[dset]["speakers"]:
                cfg[dset]["speakers"].append(spk)
            if spk not in cfg["speakers"]:
                cfg["speakers"].append(spk)
            cfg[dset]["total_wav_dur"] += int((end_i - beg_i) * fs)

    if cut_segments:
        os.makedirs(out_dir, exist_ok=True)
        # one decode per session recording, all its segments cut from it
        for path, jobs in cut_jobs.items():
            if path is None or not os.path.exists(path):
                continue
            sig, sr = read_wav_channels(path)
            for beg, end, chan, out in jobs:
                b, e = int(beg * sr), int(end * sr)
                if b >= e or e > len(sig):
                    continue
                piece = sig[b:e, chan] if (sig.ndim > 1 and
                                           chan is not None) else \
                    (sig[b:e, 0] if sig.ndim > 1 else sig[b:e])
                write_wav(out, piece, sr)
    return cfg


# ---------------------------------------------------------------------------
# IEMOCAP emotion-probe prep (emorec/prepare_iemocap.py)
# ---------------------------------------------------------------------------

_IEMO_KEEP = ("neu", "hap", "sad", "ang", "exc")
_IEMO_LINE = re.compile(
    r"^\[(\d+\.\d+)\s*-\s*(\d+\.\d+)\]\t(\S+)\t(\w{3})\t\[")


def parse_emoevaluation(path: str) -> List[Tuple[float, float, str, str]]:
    """Parse one IEMOCAP EmoEvaluation dialog file into
    [(t_start, t_end, utt_id, emotion)] tuples.

    The reference extracts the same fields with a single flattened-file
    regex (prepare_iemocap.py:24-40 ``load_utterInfo``); per-line parsing
    of the '[t0 - t1]\\tutt\\temo\\t[v, a, d]' header rows is equivalent
    and keeps evaluator-comment lines out by construction."""
    out = []
    with open(path) as f:
        for line in f:
            m = _IEMO_LINE.match(line.strip())
            if m:
                out.append((float(m.group(1)), float(m.group(2)),
                            m.group(3), m.group(4)))
    return out


def iemocap_segment(iemocap_root: str, out_root: str,
                    keep: Sequence[str] = _IEMO_KEEP) -> Dict[str, Dict]:
    """Cut IEMOCAP session dialogs into per-utterance, per-class wavs.

    Rebuilds emorec/prepare_iemocap.py:24-146: each Session*/dialog
    EmoEvaluation file gives utterance windows inside the dialog's
    stereo recording; the speaker-gender char of the utterance id picks
    the channel (F -> left, M -> right; make5thWaves:46-52), only
    ``keep`` emotions survive, and 'exc' folds into 'hap'
    (save_wavFile:99-107). One decode per dialog (the reference re-reads
    the recording per utterance). Output layout
    ``<out>/session<k>/<label>/<utt>.wav`` is the directory-per-class
    tree ``data_prep.py probe-lists --class_from dirname`` consumes
    (--holdout session5 reproduces the leave-session-out split).

    Returns {'session<k>': {emotion: count}} (count_emotion:79-92).
    """
    counts: Dict[str, Dict[str, int]] = {}
    sessions = sorted(d for d in os.listdir(iemocap_root)
                      if d.lower().startswith("session") and
                      os.path.isdir(os.path.join(iemocap_root, d)))
    for sess in sessions:
        k = re.sub(r"\D", "", sess) or sess
        sess_out = f"session{k}"
        counts[sess_out] = {}
        emo_dir = os.path.join(iemocap_root, sess, "dialog",
                               "EmoEvaluation")
        wav_dir = os.path.join(iemocap_root, sess, "dialog", "wav")
        if not os.path.isdir(emo_dir):
            continue
        for emof in sorted(os.listdir(emo_dir)):
            epath = os.path.join(emo_dir, emof)
            if not (os.path.isfile(epath) and emof.endswith(".txt")):
                continue
            wpath = os.path.join(wav_dir, os.path.splitext(emof)[0] +
                                 ".wav")
            if not os.path.exists(wpath):
                continue
            sig, sr = read_wav_channels(wpath)
            for t0, t1, utt, emo in parse_emoevaluation(epath):
                if emo not in keep:
                    continue
                b, e = int(np.ceil(t0 * sr)), int(np.ceil(t1 * sr))
                if sig.ndim > 1:
                    chan = 0 if utt.split("_")[-1][:1] == "F" else 1
                    piece = sig[b:e, min(chan, sig.shape[1] - 1)]
                else:
                    piece = sig[b:e]
                if piece.size == 0:
                    continue
                label = "hap" if emo == "exc" else emo
                dest = os.path.join(out_root, sess_out, label)
                os.makedirs(dest, exist_ok=True)
                write_wav(os.path.join(dest, utt + ".wav"), piece, sr)
                # count only utterances actually written (a zero-length
                # annotation window writes no wav and must not inflate
                # the per-class tallies)
                counts[sess_out][emo] = counts[sess_out].get(emo, 0) + 1
    return counts


# ---------------------------------------------------------------------------
# openSMILE ARFF LLD -> npy (emorec/arff2npy.py, IS09 emotion baseline)
# ---------------------------------------------------------------------------

def read_arff(path: str) -> Tuple[List[str], np.ndarray]:
    """Minimal ARFF reader (the numeric-LLD subset openSMILE emits):
    returns (attribute names, [frames, attrs] object array). Replaces the
    ``arff`` package dependency (arff2npy.py:1,13-14); string cells
    (utterance name, class) stay as python strings."""
    attrs: List[str] = []
    rows: List[list] = []
    in_data = False
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("%"):
                continue
            low = line.lower()
            if low.startswith("@attribute"):
                name = line.split(None, 2)[1].strip("'\"")
                attrs.append(name)
            elif low.startswith("@data"):
                in_data = True
            elif in_data:
                cells = []
                for c in line.split(","):
                    c = c.strip().strip("'\"")
                    try:
                        cells.append(float(c))
                    except ValueError:
                        cells.append(c)
                rows.append(cells)
    return attrs, np.array(rows, dtype=object)


def _interp_sentinel(x: np.ndarray, sentinel: float = -1e10) -> np.ndarray:
    """Host-side ahoproc interpolation semantics (shared with
    ops/features._interpolate_unvoiced): linear across sentinel gaps,
    edge frames hold the nearest valid value."""
    voiced = x > sentinel / 2
    if not voiced.any() or voiced.all():
        return x
    idx = np.arange(len(x))
    return np.interp(idx, idx[voiced], x[voiced]).astype(x.dtype)


def arff_lld_to_npy(arff_files: Sequence[str],
                    out_stats: Optional[str] = None) -> List[str]:
    """openSMILE IS09 frame-level LLD ARFFs -> per-file ``.npy`` feature
    matrices, transposed to [feats, frames] (the emotion baseline's input
    layout), plus an optional {'mean','std'} stats pickle over all frames.

    Rebuilds emorec/arff2npy.py:10-39: the leading name/frameTime
    attributes and trailing class column are dropped, F0_sma is logged
    with -1e10 marking unvoiced frames and then linearly interpolated
    across them. Returns the written .npy paths.

    Deliberate divergence: the reference interpolates ``array[:, -1]``
    (arff2npy.py:28-29), i.e. whatever LLD happens to sit last before
    the class column — correct only for the shipped IS09 config where
    F0_sma is that column. Here the F0 column is located by attribute
    NAME, so configs with extra/appended LLDs (e.g. deltas) still
    interpolate the actual F0 track instead of an arbitrary one."""
    import pickle
    written, all_frames = [], []
    for afile in arff_files:
        attrs, data = read_arff(afile)
        f0_idx = attrs.index("F0_sma")
        feat = data[:, 2:-1].astype(np.float32)
        f0 = feat[:, f0_idx - 2]
        lf0 = np.where(f0 > 0, np.log(np.maximum(f0, 1e-12)), -1e10)
        feat[:, f0_idx - 2] = _interp_sentinel(lf0.astype(np.float32))
        if out_stats is not None:
            all_frames.append(feat)
        npy_path = os.path.splitext(afile)[0] + ".npy"
        np.save(npy_path, feat.T)
        written.append(npy_path)
    if out_stats is not None and all_frames:
        x = np.concatenate(all_frames, axis=0)
        with open(out_stats, "wb") as f:
            pickle.dump({"mean": np.mean(x, axis=0),
                         "std": np.std(x, axis=0)}, f)
    return written
