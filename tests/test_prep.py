"""Corpus-prep builders (pase_tpu/data/prep.py) on synthetic corpora.

The energy-VAD vectorization is checked against a naive per-frame
implementation of the published algorithm
(prepare_segmented_dataset_swbd.py:32-122 semantics); the corpus
builders are checked end-to-end: their outputs must be directly
consumable by the datasets / distortion cfg loaders.
"""

import json
import os

import numpy as np
import pytest

from pase_tpu.data.prep import (ami_data_cfg, ami_segment, chime5_data_cfg,
                                energy_vad_segments, openslr_rirs_cfg,
                                simple_frame_vad, vad_segment_corpus,
                                vctk_data_cfg, voxceleb_lists,
                                voxforge_lists)
from pase_tpu.data.io import read_wav, write_wav


def naive_vad(signal, wlen=3200, wshift=80, en_th=0.3, smooth_window=40,
              smooth_th_low=0.25, smooth_th_high=0.6, min_len=24000):
    """Frame-by-frame transliteration of the published VAD pass, used
    as the oracle for the vectorized implementation."""
    beg_fr, end_fr = [0], [wlen]
    count = 0
    en = []
    while end_fr[count] < len(signal):
        en.append(np.mean(np.abs(signal[beg_fr[count]:end_fr[count]])))
        beg_fr.append(beg_fr[count] + wshift)
        end_fr.append(beg_fr[count] + wlen + wshift)
        count += 1
    if count == 0:
        return []
    en = np.asarray(en)
    en_bin = (en > en.mean() * en_th).astype(int)
    smooth = np.zeros(count)
    for i in range(count):
        hi = count if i + smooth_window > count - 1 else i + smooth_window
        smooth[i] = np.mean(en_bin[i:hi])
    vad = False
    begs, ends = [], []
    for i in range(count):
        if not vad:
            if smooth[i] > smooth_th_high and i < count - 1:
                vad = True
                begs.append(beg_fr[i] + wlen)
        else:
            if i == count - 1:
                ends.append(end_fr[i])
                break
            if smooth[i] < smooth_th_low:
                vad = False
                ends.append(beg_fr[i] + wlen)
    return [(b, e) for b, e in zip(begs, ends) if e - b > min_len]


def bursty_signal(rng, n, n_bursts=3, burst=40000, gap=30000):
    """Silence with loud speech-like bursts."""
    x = rng.randn(n).astype(np.float32) * 1e-4
    pos = 5000
    for _ in range(n_bursts):
        m = min(burst, max(n - pos, 0))
        if m <= 0:
            break
        x[pos:pos + m] += rng.randn(m) * 0.5
        pos += burst + gap
    return np.clip(x, -1, 1)


def test_energy_vad_matches_naive():
    rng = np.random.RandomState(0)
    for n in (10000, 250000, 250007):
        x = bursty_signal(rng, n)
        got = energy_vad_segments(x)
        want = naive_vad(x)
        assert got == want
    # pure noise / too-short signals
    assert energy_vad_segments(np.zeros(100, np.float32)) == []
    assert energy_vad_segments(rng.randn(3100).astype(np.float32)) == []


def test_vad_segment_corpus(tmp_path):
    rng = np.random.RandomState(1)
    root = tmp_path / "raw"
    out = tmp_path / "seg"
    (root / "sub").mkdir(parents=True)
    write_wav(str(root / "sub" / "rec1.wav"), bursty_signal(rng, 200000))
    vad_list = tmp_path / "vad.lst"
    n = vad_segment_corpus(str(root), ["sub/rec1.wav"], str(out),
                           vad_list_path=str(vad_list))
    assert n >= 1
    lines = vad_list.read_text().strip().splitlines()
    assert len(lines) == n
    f, b, e, s = lines[0].split(" ")
    assert f == "sub/rec1.wav" and int(e) - int(b) > 24000
    seg_path = out / "sub" / "rec1-A-0.wav"
    assert seg_path.exists()
    wav, _ = read_wav(str(seg_path))
    assert len(wav) == int(e) - int(b)


@pytest.fixture
def ami_corpus(tmp_path):
    """Two synthetic AMI meetings: 2 headsets + 2 distant channels."""
    rng = np.random.RandomState(2)
    root = tmp_path / "amis"
    meetings = ["ES2002a", "ES2002b"]
    for meet in meetings:
        d = root / meet / "audio"
        d.mkdir(parents=True)
        base = bursty_signal(rng, 160000, n_bursts=2, burst=40000)
        for h in range(2):
            write_wav(str(d / f"{meet}.Headset-{h}.wav"),
                      np.roll(base, h * 3))
        for c in ("1", "3"):
            write_wav(str(d / f"{meet}.Array1-0{c}.wav"), base * 0.4)
    return root, meetings


def test_ami_segment_and_cfg(ami_corpus, tmp_path):
    root, meetings = ami_corpus
    out = tmp_path / "ami_seg"
    u2s = ami_segment(str(root), str(out), meetings, map_ihm2sdm="1,3",
                      headsets=(0, 1))
    assert (out / "ES2002a.Headset.vad").exists()
    ihm_segs = sorted(str(p.relative_to(out)) for p in out.rglob("*.wav")
                      if "Arr1" not in p.name)
    sdm_segs = sorted(str(p.relative_to(out)) for p in out.rglob("*.wav")
                      if "Arr1" in p.name)
    assert ihm_segs and len(sdm_segs) == 2 * len(ihm_segs)
    # naming + utt2spk: <meet>.Headset-<h>-<seg>.wav -> <meet>.Headset-<h>
    name0 = os.path.basename(ihm_segs[0])
    assert u2s[name0].startswith("ES2002a.Headset-")
    assert (out / "utt2spk.npy").exists()
    # ihm and sdm segments share the window => equal lengths
    b = os.path.basename(ihm_segs[0])
    sdm_b = b.replace(".wav", ".Arr1-01.wav")
    w_i, _ = read_wav(str(out / ihm_segs[0]))
    w_s, _ = read_wav(str(out / os.path.dirname(ihm_segs[0]) / sdm_b))
    assert len(w_i) == len(w_s)

    # cfg builder over the segmented tree
    all_segs = sorted(str(p.relative_to(out))
                      for p in out.rglob("*.wav"))
    tr_scp = tmp_path / "tr.scp"
    te_scp = tmp_path / "te.scp"
    tr = [s for s in all_segs if "ES2002a" in s]
    te = [s for s in all_segs if "ES2002b" in s]
    tr_scp.write_text("\n".join(tr))
    te_scp.write_text("\n".join(te))
    cfg = ami_data_cfg(str(out), str(tr_scp), str(te_scp),
                       map_ihm2sdm="1,3", val_ratio=0.34, seed=3)
    assert cfg["train"]["data"] and cfg["test"]["data"]
    entry = cfg["train"]["data"][0]
    assert set(entry) == {"filename", "spk", "1", "3"}
    assert entry["filename"].split("/")[1] == "audio"
    assert entry["1"].endswith(".Arr1-01.wav")
    assert cfg["train"]["total_wav_dur"] > 0

    # the channel-key cfg drives the AMI dataset + parallel batcher
    cfg_path = tmp_path / "ami.cfg"
    cfg_path.write_text(json.dumps(cfg))
    from pase_tpu.data.dataset import AmiSegTupleWavDataset, ChunkBatcher
    ds = AmiSegTupleWavDataset(str(out), None, str(cfg_path), "train",
                               ihm2sdm="1,3", seed=0)
    noisy, clean, rand, ctxt = ds.sample_tuple(0)
    assert len(noisy) == len(clean)
    # the contrastive ctxt must be a DISTANT-channel wav (same-prefix
    # neighbor or the current segment's own sdm), never the clean ihm
    entry = ds.wavs[0]
    prefix = ds.rec.sub("", entry["filename"])
    sdm_candidates = {e[c] for e in ds.neighbor_entries[prefix]
                      for c in ("1", "3")}
    assert any(np.array_equal(ctxt, ds._load(f)) for f in sdm_candidates)
    assert not np.array_equal(ctxt, clean)
    batch = next(iter(ChunkBatcher(ds, 4, 8000, seed=0)))
    assert set(batch) >= {"chunk", "chunk_ctxt", "chunk_rand", "cchunk"}
    assert batch["cchunk"].shape == (4, 8000)


def test_vctk_cfg(tmp_path):
    rng = np.random.RandomState(3)
    root = tmp_path / "VCTK"
    (root / "wav48").mkdir(parents=True)
    spks = ["225", "226", "227", "228", "229"]
    info = ["ID  AGE  GENDER  ACCENTS  REGION"]
    for s in spks:
        info.append(f"{s}  23  F  English  Southern  England")
        d = root / "wav48" / f"p{s}"
        d.mkdir()
        for i in range(3):
            n = 20000 if i < 2 else 8000     # third utt under min_len
            write_wav(str(d / f"p{s}_{i:03d}.wav"),
                      rng.randn(n).astype(np.float32) * 0.1)
    (root / "speaker-info.txt").write_text("\n".join(info) + "\n")
    cfg = vctk_data_cfg(str(root), train_split=0.6, valid_split=0.2)
    # 5 speakers -> 3 train / 1 valid / 1 test
    assert len(cfg["train"]["speakers"]) == 3
    assert len(cfg["valid"]["speakers"]) == 1
    assert len(cfg["test"]["speakers"]) == 1
    # 2 utts per spk survive min_len
    assert len(cfg["train"]["data"]) == 6
    assert cfg["train"]["total_wav_dur"] == 6 * 20000
    # speakers table parsed with merged multi-word REGION
    assert cfg["speakers"]["225"]["REGION"] == "Southern_England"
    e = cfg["train"]["data"][0]
    assert e["filename"].startswith("wav48/p") and "spk" in e


def test_openslr_rirs_cfg(tmp_path):
    root = tmp_path / "RIRS_NOISES"
    for room, n in (("smallroom", 4), ("mediumroom", 3), ("largeroom", 2)):
        d = root / room
        d.mkdir(parents=True)
        lines = [f"--rir-id {i:05d} --room-id R1 extra "
                 f"simulated_rirs_16k/{room}/Room001/Room001-{i:05d}.wav"
                 for i in range(n)]
        (d / "rir_list").write_text("\n".join(lines) + "\n")
    out_file = tmp_path / "revs.cfg"
    out = openslr_rirs_cfg(str(root), str(out_file),
                           small_room_ratio=0.5, seed=0)
    assert len(out["reverb_irfiles"]) == 2 + 3 + 2
    assert out["reverb_fmt"] == "wav"
    assert out["reverb_irfiles"] == sorted(out["reverb_irfiles"])
    # extend-an-existing-cfg mode preserves the other distortion keys
    base = {"noises_p": 0.4, "reverb_irfiles": ["old.npy"],
            "reverb_fmt": "npy", "reverb_data_root": "x"}
    base_path = tmp_path / "base.cfg"
    base_path.write_text(json.dumps(base))
    out2 = openslr_rirs_cfg(str(root), str(out_file),
                            existing_cfg=str(base_path))
    assert out2["noises_p"] == 0.4
    assert "old.npy" not in out2["reverb_irfiles"]
    assert len(out2["reverb_irfiles"]) == 9
    assert json.loads(out_file.read_text())["reverb_fmt"] == "wav"


def test_voxceleb_lists(tmp_path):
    rng = np.random.RandomState(4)
    data = tmp_path / "vox1"
    for spk in ("id001", "id002", "id003"):
        for sess in ("a", "b"):
            d = data / spk / sess
            d.mkdir(parents=True)
            write_wav(str(d / "u.wav"),
                      rng.randn(50000).astype(np.float32) * 0.1)
    out = tmp_path / "mini"
    tr, te, u2s = voxceleb_lists(str(data), str(out), nspk=2,
                                 out_length=2, seed=0)
    assert len(tr) == len(te) == 2
    assert set(u2s.values()) == {0, 1}
    for name in tr:
        spk, sess, utt = name.split("_-_")
        assert spk.startswith("id") and utt == "u.wav"
        wav, _ = read_wav(str(out / "train" / name))
        assert len(wav) == 2 * 16000
    # the emitted assets feed data_prep probe-lists / _load_utt2class
    from pase_tpu.data.dataset import _load_utt2class
    loaded = _load_utt2class(str(out / "lists" / "utt2spk.npy"))
    assert {str(k): v for k, v in loaded.items()} == \
        {k: v for k, v in u2s.items()}


def test_voxforge_lists(tmp_path):
    rng = np.random.RandomState(5)
    data = tmp_path / "vf"
    data.mkdir()
    rows = []
    for lang in ("Italian", "French"):
        for i in range(3):
            name = f"{lang[:2].lower()}-{i}.wav"
            write_wav(str(data / name),
                      bursty_signal(rng, 60000, n_bursts=2, burst=20000,
                                    gap=5000))
            rows.append(f"{name},{lang},user{i},{i}")
    meta = tmp_path / "voxforge.csv"
    meta.write_text("\n".join(rows) + "\n")
    out = tmp_path / "lid"
    tr, te, u2l = voxforge_lists(str(meta), str(data), str(out),
                                 nrecs=3, out_length=2, vad=True, seed=0)
    # 3 recs per lang -> 1 test, 2 train
    assert len(tr) == 4 and len(te) == 2
    assert set(u2l.values()) == {0, 1}
    name = tr[0]
    assert name.split("_-_")[0] in ("Italian", "French")
    wav, _ = read_wav(str(out / "train" / name))
    assert len(wav) == 2 * 16000
    assert (out / "lists" / "utt2lang.npy").exists()


def test_simple_frame_vad_removes_silence():
    rng = np.random.RandomState(6)
    sr = 16000
    sil = np.zeros(sr, np.float32)
    speech = (rng.randn(sr) * 0.3).astype(np.float32)
    y = np.concatenate([sil, speech, sil])
    kept = simple_frame_vad(y, sr)
    assert 0 < len(kept) < len(y)
    assert len(kept) < 1.6 * sr     # most silence dropped


def test_shipped_distortion_cfgs_parse():
    """Every cfg/distortions/*.cfg must load through the distortion
    config parser (the reference's 14-variant library)."""
    from pase_tpu.data.distortions import config_from_json
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_dir = os.path.join(repo, "cfg", "distortions")
    cfgs = [f for f in os.listdir(cfg_dir) if f.endswith(".cfg")]
    assert len(cfgs) >= 14
    for name in cfgs:
        with open(os.path.join(cfg_dir, name)) as f:
            d = json.load(f)
        cfg = config_from_json(d)
        for p in ("reverb_p", "noises_p", "overlap_p", "clip_p",
                  "chop_p", "downsample_p", "bandrop_p"):
            assert 0.0 <= getattr(cfg, p) <= 1.0, (name, p)


def test_kaldi_dir_roundtrip(tmp_path):
    from pase_tpu.data.kaldi_dir import KaldiDataDir, parse_wav_entry
    d = KaldiDataDir.__new__(KaldiDataDir)
    d.directory = str(tmp_path / "kd")
    d.utt2spk = {"P09_S03-001": "P09", "P10_S03-001": "P10"}
    d.utt2wav = {"S03_P09": "/x/S03_P09.wav",
                 "S03_U01": "sox /x/S03_U01.wav -t wav - remix 2 |"}
    d.utt2text = {"P09_S03-001": "hello there",
                  "P10_S03-001": "general kenobi"}
    d.utt2segments = {"P09_S03-001": ("S03_P09", 0.5, 2.0)}
    d.spk2utt = {}
    d.utt2dur = {"P09_S03-001": 1.5}
    d.write()
    r = KaldiDataDir(d.directory)
    assert r.utt2spk == d.utt2spk
    assert r.utt2segments["P09_S03-001"] == ("S03_P09", 0.5, 2.0)
    assert r.spk2utt["P09"] == ["P09_S03-001"]
    assert r.num_spk == 2 and r.num_utt == 2
    assert r.total_duration == 1.5
    assert parse_wav_entry(r.utt2wav["S03_P09"]) == ("/x/S03_P09.wav", None)
    assert parse_wav_entry(r.utt2wav["S03_U01"]) == ("/x/S03_U01.wav", 1)
    with pytest.raises(FileNotFoundError):
        KaldiDataDir(str(tmp_path / "nope"))


def test_chime5_cfg(tmp_path):
    """Synthetic worn/array Kaldi dirs -> parallel data cfg + cut wavs."""
    from pase_tpu.data.kaldi_dir import KaldiDataDir
    rng = np.random.RandomState(7)
    sess_dir = tmp_path / "audio"
    sess_dir.mkdir()
    fs = 16000
    worn = rng.randn(6 * fs).astype(np.float32) * 0.2
    arr = np.stack([worn * 0.3, worn * 0.5], 1)   # 2-channel array file
    write_wav(str(sess_dir / "S03_P09.wav"), worn)
    import wave
    with wave.open(str(sess_dir / "S03_U01.wav"), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes((np.clip(arr, -1, 1) * 32767).astype("<i2")
                      .tobytes())

    def mk_dir(path, reco, wav_entry, spk_pref):
        d = KaldiDataDir.__new__(KaldiDataDir)
        d.directory = str(path)
        d.utt2wav = {reco: wav_entry}
        d.utt2spk, d.utt2text, d.utt2segments = {}, {}, {}
        d.spk2utt, d.utt2dur = {}, {}
        for i, (spk, txt) in enumerate((("P09", "hello there friend"),
                                        ("P09", "short"),
                                        ("P41", "the test speaker talks"))):
            utt = f"{spk}_S03_{i:03d}{spk_pref}"
            d.utt2spk[utt] = spk
            d.utt2text[utt] = txt
            d.utt2segments[utt] = (reco, 0.5 + i, 1.4 + i)
        d.write()
        return d

    mk_dir(tmp_path / "worn", "S03_P09", str(sess_dir / "S03_P09.wav"),
           "")
    mk_dir(tmp_path / "uall", "S03_U01",
           f"sox {sess_dir / 'S03_U01.wav'} -t wav - remix 2 |", ".CH2")
    out_dir = tmp_path / "chime5_seg"
    cfg = chime5_data_cfg(str(tmp_path / "worn"), str(tmp_path / "uall"),
                          str(out_dir), test_spk="P41")
    # "short" has <2 words and is dropped; P41 goes to test
    assert len(cfg["train"]["data"]) == 1
    assert len(cfg["test"]["data"]) == 1
    entry = cfg["train"]["data"][0]
    assert set(entry) == {"filename", "1", "spk"}
    assert entry["spk"] == "P09"
    w_ihm, _ = read_wav(str(out_dir / entry["filename"]))
    w_sdm, _ = read_wav(str(out_dir / entry["1"]))
    b, e = int(0.5 * fs), int(1.4 * fs)
    assert len(w_ihm) == len(w_sdm) == e - b
    # array cut took channel 2 (1-based) => 0.5x scale of worn
    assert np.allclose(w_sdm, worn[b:e] * 0.5, atol=2e-4)
    assert cfg["train"]["total_wav_dur"] == int((1.4 - 0.5) * fs)
