"""TIMIT full-decoding pipeline (probes/timit_decode.py): prior counts,
binary ark format, dec_cfg.ini, decode_dnn.sh orchestration — integration
tested up to (and across, via a fake script) the subprocess boundary."""

import json
import os
import stat
import subprocess

import numpy as np
import pytest

from pase_tpu.data.io import write_wav
from pase_tpu.probes.timit_decode import (
    write_kaldi_mat, read_kaldi_ark, compute_prior_counts,
    reconcile_lengths, write_dec_cfg_ini, build_decode_command,
    parse_best_wer, run_timit_full_decoding)

SR = 16000
SMALL_FE = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
            "fmaps": [32, 32, 64, 64], "emb_dim": 64, "norm_out": True}


def test_kaldi_binary_ark_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    mats = {"spk1_utt0": rng.randn(7, 5).astype(np.float32),
            "spk2_utt1": rng.randn(3, 5).astype(np.float32)}
    path = str(tmp_path / "post.ark")
    with open(path, "wb") as fd:
        for k, m in mats.items():
            write_kaldi_mat(fd, m, k)
    back = read_kaldi_ark(path)
    assert set(back) == set(mats)
    for k in mats:
        np.testing.assert_allclose(back[k], mats[k])
    # wire format spot check: 'key \0B FM \4<rows>\4<cols>'
    raw = open(path, "rb").read()
    assert raw.startswith(b"spk1_utt0 \0BFM \x04\x07\x00\x00\x00\x04"
                          b"\x05\x00\x00\x00")


def test_prior_counts(tmp_path):
    labs = [np.array([3, 3, 4, 5]), np.array([5, 5, 6])]
    unique, counts = compute_prior_counts(labs, str(tmp_path))
    # min-normalized: ids 0..3 with counts 2,1,3,1
    np.testing.assert_array_equal(unique, [0, 1, 2, 3])
    np.testing.assert_array_equal(counts, [2, 1, 3, 1])
    np.testing.assert_array_equal(np.load(tmp_path / "count.npy"), counts)
    np.testing.assert_array_equal(np.load(tmp_path / "ids.npy"), unique)


def test_reconcile_lengths():
    f = np.zeros((103, 4))
    assert reconcile_lengths(f, np.zeros(100)).shape[0] == 100
    assert reconcile_lengths(f, np.zeros(101)).shape[0] == 101
    assert reconcile_lengths(f, np.zeros(103)).shape[0] == 103
    with pytest.raises(ValueError):
        reconcile_lengths(f, np.zeros(90))


def test_dec_cfg_ini_and_command(tmp_path):
    dec_cfg = {"decoding_script_folder": "kaldi_decoding_scripts/",
               "decoding_script": "decode_dnn.sh", "beam": "13.0"}
    ini = str(tmp_path / "dec_cfg.ini")
    write_dec_cfg_ini(dec_cfg, ini)
    content = open(ini).read()
    assert content.startswith("[decoding]\n")
    assert "beam=13.0\n" in content
    cmd = build_decode_command(dec_cfg, str(tmp_path), "post.ark")
    assert cmd == ("kaldi_decoding_scripts//decode_dnn.sh "
                   + os.path.abspath(str(tmp_path / "dec_cfg.ini"))
                   + " " + str(tmp_path / "dec") + ' "post.ark"')


def test_parse_best_wer(tmp_path):
    d = tmp_path / "dec" / "scoring_kaldi"
    d.mkdir(parents=True)
    (d / "wer_5").write_text("%WER 21.3 [ 1543 / 7215 ]\n")
    (d / "wer_7").write_text("%WER 18.6 [ 1342 / 7215 ]\n")
    assert parse_best_wer(str(tmp_path / "dec")) == 18.6


@pytest.fixture(scope="module")
def timit_like_corpus(tmp_path_factory):
    """Tiny TIMIT-shaped corpus: spk dirs, wavs, per-frame alignments
    with 3 classes tied to band-limited content."""
    root = tmp_path_factory.mktemp("timit")
    rng = np.random.RandomState(0)
    lists = {"train": [], "test": []}
    for split, n in (("train", 6), ("test", 3)):
        for u in range(n):
            spk = f"spk{u % 3}"
            os.makedirs(root / spk, exist_ok=True)
            f0 = [110, 180, 260][u % 3]
            t = np.arange(SR)
            sig = sum(np.sin(2 * np.pi * f0 * k * t / SR) / k
                      for k in range(1, 4))
            sig = (sig * 0.2 + rng.randn(SR) * 0.01).astype(np.float32)
            wav = f"{spk}/{split}_{u}.wav"
            write_wav(str(root / wav), sig)
            ali = np.full(SR // 160, u % 3, dtype=np.int32)
            alifile = wav.replace(".wav", ".ali")
            np.savetxt(root / alifile, ali, fmt="%d")
            lists[split].append(f"{wav} {alifile}\n")
    for split in lists:
        with open(root / f"{split}.lst", "w") as f:
            f.writelines(lists[split])
    return root


def test_timit_full_pipeline_with_fake_decoder(timit_like_corpus, tmp_path):
    """End-to-end: features -> MLP -> counts -> binary ark -> dec_cfg.ini
    -> decode script invocation (a fake decode_dnn.sh that validates its
    inputs and emits a scoring file)."""
    scripts = tmp_path / "kaldi_scripts"
    scripts.mkdir()
    fake = scripts / "decode_dnn.sh"
    fake.write_text(
        "#!/bin/bash\n"
        "cfg=$1; out=$2; ark=$3\n"
        "[ -f \"$cfg\" ] || exit 2\n"
        "[ -f \"$ark\" ] || exit 3\n"
        "grep -q '^\\[decoding\\]' \"$cfg\" || exit 4\n"
        "mkdir -p \"$out/scoring_kaldi\"\n"
        "echo '%WER 17.9 [ fake ]' > \"$out/scoring_kaldi/wer_4\"\n")
    fake.chmod(fake.stat().st_mode | stat.S_IEXEC)

    out_folder = str(tmp_path / "exp")
    mlp_cfg = {"N_epochs": "4", "seed": "1", "batch_size": "64",
               "halving_factor": "0.5", "lr": "0.05", "left": "2",
               "right": "2", "avg_spk": "True", "dnn_lay": "32,3",
               "dnn_drop": "0.0,0.0"}
    dec_cfg = {"decoding_script_folder": str(scripts),
               "decoding_script": "decode_dnn.sh",
               "beam": "13.0", "acwt": "0.2"}
    res = run_timit_full_decoding(
        SMALL_FE, None, str(timit_like_corpus),
        str(timit_like_corpus / "train.lst"),
        str(timit_like_corpus / "test.lst"),
        out_folder, mlp_cfg, dec_cfg, log=None)
    assert res["decode_rc"] == 0
    assert res["best_wer"] == 17.9
    # artifacts: counts, ark (readable, finite, prior-corrected), ini
    counts = np.load(os.path.join(out_folder, "count.npy"))
    assert counts.sum() > 0 and len(counts) == 3
    ark = read_kaldi_ark(res["ark_file"])
    assert len(ark) == 3
    for utt, mat in ark.items():
        assert "_" in utt                    # spk_utt ids
        assert mat.shape[1] == 3
        assert np.all(np.isfinite(mat))
    assert os.path.exists(os.path.join(out_folder, "dec_cfg.ini"))
    # the probe actually learned something on this separable toy task
    assert res["dev_frame_error"] < 0.45, res


def test_timit_full_skips_without_kaldi(timit_like_corpus, tmp_path):
    """No decoding script present: pipeline completes, rc is None, the
    ark and cfg artifacts are still produced."""
    out_folder = str(tmp_path / "exp2")
    mlp_cfg = {"N_epochs": "2", "batch_size": "64", "lr": "0.05",
               "left": "1", "right": "1", "avg_spk": "False",
               "dnn_lay": "16,3", "dnn_drop": "0.0,0.0"}
    dec_cfg = {"decoding_script_folder": str(tmp_path / "nowhere"),
               "decoding_script": "decode_dnn.sh"}
    res = run_timit_full_decoding(
        SMALL_FE, None, str(timit_like_corpus),
        str(timit_like_corpus / "train.lst"),
        str(timit_like_corpus / "test.lst"),
        out_folder, mlp_cfg, dec_cfg, log=None)
    assert res["decode_rc"] is None
    assert os.path.exists(res["ark_file"])
    assert os.path.exists(os.path.join(out_folder, "dec_cfg.ini"))
