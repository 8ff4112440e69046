"""Emotion-probe prep builders: IEMOCAP session carving
(emorec/prepare_iemocap.py) and the openSMILE ARFF LLD -> npy baseline
converter (emorec/arff2npy.py), on synthetic fixtures."""

import os
import pickle
import wave

import numpy as np

from pase_tpu.data.prep import (arff_lld_to_npy, iemocap_segment,
                                parse_emoevaluation, read_arff)
from pase_tpu.data.io import read_wav


def _write_stereo(path, left, right, sr=16000):
    pcm = np.stack([left, right], axis=1)
    pcm = (np.clip(pcm, -1, 1) * 32767.0).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


_EMOEVAL = """% IEMOCAP evaluation file (header junk the parser must skip)
[START_TIME - END_TIME] TURN_NAME EMOTION [V, A, D]

[0.1000 - 0.3000]\tSes01F_impro01_F000\tneu\t[2.5000, 2.5000, 2.5000]
C-E1:\tNeutral;\t()
[0.4000 - 0.6000]\tSes01F_impro01_M001\texc\t[3.0000, 3.0000, 3.0000]
[0.7000 - 0.9000]\tSes01F_impro01_F002\tfru\t[2.0000, 2.0000, 2.0000]
"""


def _iemocap_tree(tmp_path):
    root = tmp_path / "IEMOCAP_full_release"
    emo = root / "Session1" / "dialog" / "EmoEvaluation"
    wavd = root / "Session1" / "dialog" / "wav"
    os.makedirs(emo)
    os.makedirs(wavd)
    (emo / "Ses01F_impro01.txt").write_text(_EMOEVAL)
    n = 16000
    _write_stereo(wavd / "Ses01F_impro01.wav",
                  np.full(n, 0.5, np.float32),       # left = F channel
                  np.full(n, -0.5, np.float32))      # right = M channel
    return root


def test_parse_emoevaluation(tmp_path):
    root = _iemocap_tree(tmp_path)
    rows = parse_emoevaluation(
        str(root / "Session1" / "dialog" / "EmoEvaluation" /
            "Ses01F_impro01.txt"))
    assert rows == [(0.1, 0.3, "Ses01F_impro01_F000", "neu"),
                    (0.4, 0.6, "Ses01F_impro01_M001", "exc"),
                    (0.7, 0.9, "Ses01F_impro01_F002", "fru")]


def test_iemocap_segment(tmp_path):
    root = _iemocap_tree(tmp_path)
    out = tmp_path / "emo"
    counts = iemocap_segment(str(root), str(out))
    # fru filtered out; exc kept and folded into hap on disk
    assert counts == {"session1": {"neu": 1, "exc": 1}}
    neu = out / "session1" / "neu" / "Ses01F_impro01_F000.wav"
    hap = out / "session1" / "hap" / "Ses01F_impro01_M001.wav"
    assert neu.exists() and hap.exists()
    assert not (out / "session1" / "fru").exists()
    # F utt cut from the left channel, M utt from the right
    y_f, sr = read_wav(str(neu))
    y_m, _ = read_wav(str(hap))
    assert sr == 16000
    assert len(y_f) == int(0.2 * sr) and len(y_m) == int(0.2 * sr)
    assert np.all(y_f > 0.4) and np.all(y_m < -0.4)


_ARFF = """@relation emo_lld

@attribute name string
@attribute frameTime numeric
@attribute pcm_RMSenergy_sma numeric
@attribute F0_sma numeric
@attribute class numeric

@data
'utt1',0.00,0.5,100.0,0
'utt1',0.01,0.6,0.0,0
'utt1',0.02,0.7,200.0,0
"""


def test_read_arff(tmp_path):
    af = tmp_path / "utt1.arff"
    af.write_text(_ARFF)
    attrs, data = read_arff(str(af))
    assert attrs == ["name", "frameTime", "pcm_RMSenergy_sma", "F0_sma",
                     "class"]
    assert data.shape == (3, 5)
    assert data[0, 0] == "utt1" and data[2, 3] == 200.0


def test_arff_lld_to_npy(tmp_path):
    af = tmp_path / "utt1.arff"
    af.write_text(_ARFF)
    stats = tmp_path / "stats.pkl"
    written = arff_lld_to_npy([str(af)], out_stats=str(stats))
    assert written == [str(tmp_path / "utt1.npy")]
    feat = np.load(written[0])
    # [feats, frames]: name/frameTime/class dropped
    assert feat.shape == (2, 3)
    np.testing.assert_allclose(feat[0], [0.5, 0.6, 0.7], rtol=1e-6)
    # F0: log'd, unvoiced mid frame linearly interpolated between
    # its voiced neighbours
    lf0 = feat[1]
    np.testing.assert_allclose(lf0[0], np.log(100.0), rtol=1e-6)
    np.testing.assert_allclose(lf0[2], np.log(200.0), rtol=1e-6)
    np.testing.assert_allclose(
        lf0[1], 0.5 * (np.log(100.0) + np.log(200.0)), rtol=1e-6)
    with open(stats, "rb") as f:
        st = pickle.load(f)
    np.testing.assert_allclose(st["mean"], feat.T.mean(axis=0), rtol=1e-6)
    np.testing.assert_allclose(st["std"], feat.T.std(axis=0), rtol=1e-6)


def test_arff_edge_hold_unvoiced_tail(tmp_path):
    arff = _ARFF.replace("'utt1',0.02,0.7,200.0,0",
                         "'utt1',0.02,0.7,0.0,0")
    af = tmp_path / "utt2.arff"
    af.write_text(arff)
    (path,) = arff_lld_to_npy([str(af)])
    lf0 = np.load(path)[1]
    # single voiced frame: edges hold its value
    np.testing.assert_allclose(lf0, np.log(100.0), rtol=1e-6)
