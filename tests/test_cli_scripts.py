"""End-to-end CLI smoke tests: data prep, stats, training, util scripts.
Run in-process (imports) to share the CPU test platform."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pase_tpu.data.io import write_wav

SR = 16000
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_corpus")
    wavdir = root / "wavs"
    wavdir.mkdir()
    rng = np.random.RandomState(0)
    files = []
    for spk in ("1001", "2002", "3003"):
        for utt in range(2):
            for seg in range(2):
                fname = f"{spk}-13470{utt}-000{seg}.wav"
                n = SR + rng.randint(0, SR // 2)
                write_wav(str(wavdir / fname),
                          rng.randn(n).astype(np.float32) * 0.1)
                files.append(fname)
    with open(root / "tr.scp", "w") as f:
        f.write("\n".join(files))
    return root, wavdir, files


def test_data_prep_build_cfg(corpus):
    root, wavdir, files = corpus
    sys.path.insert(0, REPO)
    import data_prep
    import argparse
    opts = argparse.Namespace(data_root=str(wavdir),
                              train_scp=str(root / "tr.scp"),
                              test_scp=None, libri_dict=None,
                              cfg_file=str(root / "data.cfg"),
                              val_ratio=0.34, seed=3)
    data_prep.build_cfg(opts)
    with open(root / "data.cfg") as f:
        cfg = json.load(f)
    assert cfg["train"]["total_wav_dur"] > 0
    assert len(cfg["train"]["data"]) + len(cfg["valid"]["data"]) == 12
    # speaker holdout: train/valid speakers disjoint
    tr_spk = {d["speaker"] for d in cfg["train"]["data"]}
    va_spk = {d["speaker"] for d in cfg["valid"]["data"]}
    assert not (tr_spk & va_spk)


@pytest.mark.slow
def test_train_cli_synthetic(tmp_path):
    """One tiny epoch of the training CLI end to end (synthetic data)."""
    sys.path.insert(0, REPO)
    import train as train_cli
    wk = {"regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                    "hidden_layers": 1, "name": "mfcc", "r": 1,
                    "loss": "MSELoss", "skip": False}],
          "cls": [{"num_outputs": 1, "dropout": 0, "hidden_size": 32,
                   "hidden_layers": 1, "name": "mi",
                   "loss": "BCEWithLogitsLoss", "skip": False}]}
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    wk_path, fe_path = str(tmp_path / "wk.cfg"), str(tmp_path / "fe.cfg")
    with open(wk_path, "w") as f:
        json.dump(wk, f)
    with open(fe_path, "w") as f:
        json.dump(fe, f)
    argv = ["--net_cfg", wk_path, "--fe_cfg", fe_path, "--synthetic",
            "--batch_size", "8", "--chunk_size", "4800", "--epoch", "1",
            "--log_freq", "2", "--save_path", str(tmp_path / "ckpt"),
            "--fe_lr", "0.0005", "--min_lr", "0.0005"]
    opts = train_cli.build_argparser().parse_args(argv)
    opts.epoch = 1
    # shrink bpe via monkeypatching the synthetic batcher path
    from pase_tpu.trainer import Trainer
    orig_train = Trainer.train_

    def short_train(self, *a, **k):
        self.bpe = 3
        return orig_train(self, *a, **k)
    Trainer.train_ = short_train
    try:
        train_cli.train(opts)
    finally:
        Trainer.train_ = orig_train
    assert os.path.exists(tmp_path / "ckpt" / "FE_e0.npz")
    assert os.path.exists(tmp_path / "ckpt" / "metrics.jsonl")


def test_eval_ckpts_and_export(tmp_path):
    sys.path.insert(0, REPO)
    # reuse the checkpoint from a fresh mini-run
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    wk = {"regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                    "hidden_layers": 1, "name": "mfcc", "r": 1,
                    "loss": "MSELoss", "skip": False}],
          "cls": []}
    cfg = dict(backprop_mode="base", hop=160, bpe=2, epoch=1, batch_size=4,
               chunk_size=4800, log_freq=1, save_path=str(tmp_path))
    tr = Trainer(fe, wk, cfg)
    state = tr.init_state(0)
    tr.save(state, epoch=0)
    # export to torch format and reload through the torch converter
    import util_scripts
    import argparse
    opts = argparse.Namespace(in_ckpt=str(tmp_path / "FE_e0.npz"),
                              out_ckpt=str(tmp_path / "FE_e0.ckpt"))
    util_scripts.export_torch(opts)
    from pase_tpu.frontend import wf_builder
    enc = wf_builder(fe)
    enc.init(example_len=4800)
    enc.load_pretrained(str(tmp_path / "FE_e0.ckpt"), load_last=True)
    y = enc(np.zeros((1, 1, 4800), np.float32))
    assert y.shape == (1, 32, 30)


def test_kmeans():
    from util_scripts import kmeans
    rng = np.random.RandomState(0)
    centers = rng.randn(3, 8) * 5
    x = np.concatenate([centers[i] + rng.randn(50, 8) * 0.2
                        for i in range(3)]).astype(np.float32)
    c, a = kmeans(jnp.asarray(x), k=3, iters=20)
    # each true cluster maps to one kmeans cluster
    for i in range(3):
        seg = a[i * 50:(i + 1) * 50]
        assert (seg == np.bincount(seg).argmax()).mean() > 0.95


@pytest.mark.slow
def test_histogram_logging(tmp_path):
    """cfg log_histograms=True emits [lo, hi, counts...] rows per worker
    (reference tensorboard add_histogram parity, trainer.py:398-413)."""
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.parallel.mesh import get_mesh, shard_batch
    from tests.test_train_step import SMALL_WORKERS, SMALL_FRONTEND
    cfg = dict(backprop_mode="base", hop=160, bpe=2, epoch=1,
               batch_size=8, chunk_size=4800, log_freq=1,
               save_path=str(tmp_path), log_histograms=True)
    tr = Trainer(SMALL_FRONTEND, SMALL_WORKERS, cfg, mesh=get_mesh())
    state = tr.init_state(0)
    step = tr._make_train_step()
    raw = shard_batch({k: jnp.asarray(v) for k, v in
                       next(iter(SyntheticChunkBatcher(8, 4800))).items()},
                      tr.mesh)
    state, losses = step(state, raw)
    l = jax.device_get(losses)
    for name in ("mfcc", "mi"):
        h = np.asarray(l[f"hist/{name}"])
        g = np.asarray(l[f"hist/gtruth_{name}"])
        assert h.shape == (26,) and g.shape == (26,)   # lo, hi, 24 bins
        assert h[1] >= h[0]                            # hi >= lo
        assert h[2:].sum() > 0 and g[2:].sum() > 0
    # the logger serializes array-valued scalars as JSON lists
    tr.logger.log("train", 1, l)
    import json as _json
    rec = _json.loads(open(tmp_path / "metrics.jsonl").read().splitlines()[-1])
    assert isinstance(rec["hist/mfcc"], list) and len(rec["hist/mfcc"]) == 26


def test_encode_codec2_cli(tmp_path):
    import argparse
    import util_scripts
    ind = tmp_path / "in"
    outd = tmp_path / "out"
    ind.mkdir()
    for i in range(3):
        write_wav(str(ind / f"u{i}.wav"),
                  np.random.RandomState(i).randn(3200).astype(np.float32)
                  * 0.1)
    opts = argparse.Namespace(input_dir=str(ind), output_dir=str(outd),
                              kbps=1600, num_workers=2)
    util_scripts.encode_codec2(opts)
    assert sorted(os.listdir(outd)) == ["u0.wav", "u1.wav", "u2.wav"]


@pytest.mark.slow
def test_prosodic_eval_cli(tmp_path):
    """Train one tiny step with a prosody worker, save, then evaluate the
    prosody head via the CLI path (util_scripts/prosodic_eval.py)."""
    import argparse
    import util_scripts
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import SyntheticChunkBatcher
    from pase_tpu.parallel.mesh import get_mesh, shard_batch
    # r=7 exercises the d-major multi-frame head layout (channel
    # c = d*r + j) the evaluator must center-slice
    wk = {"regr": [{"num_outputs": 12, "dropout": 0, "hidden_size": 32,
                    "hidden_layers": 1, "name": "prosody", "r": 7,
                    "loss": "MSELoss", "skip": False}],
          "cls": []}
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    cfg = dict(backprop_mode="base", hop=160, bpe=1, epoch=1,
               batch_size=8, chunk_size=3200, log_freq=1,
               save_path=str(tmp_path / "ck"))
    tr = Trainer(fe, wk, cfg, mesh=get_mesh())
    state = tr.init_state(0)
    step = tr._make_train_step()
    raw = shard_batch({k: jnp.asarray(v) for k, v in
                       next(iter(SyntheticChunkBatcher(8, 3200))).items()},
                      tr.mesh)
    state, _ = step(state, raw)
    tr.save(state, 0)
    ckpt = os.path.join(cfg["save_path"],
                        "weights_PASE-Pase_base-1.npz")
    assert os.path.exists(ckpt)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    lines = []
    for i in range(2):
        write_wav(str(wav_dir / f"u{i}.wav"),
                  (np.sin(2 * np.pi * 150 * np.arange(4800) / 16000)
                   * 0.2).astype(np.float32))
        lines.append(f"u{i}.wav\n")
    lst = tmp_path / "wavs.lst"
    lst.write_text("".join(lines))
    fe_p, wk_p = str(tmp_path / "fe.cfg"), str(tmp_path / "wk.cfg")
    json.dump(fe, open(fe_p, "w"))
    json.dump(wk, open(wk_p, "w"))
    import pickle
    stats_p = str(tmp_path / "st.pkl")
    with open(stats_p, "wb") as f:
        pickle.dump({"prosody": {"mean": np.zeros(12, np.float32),
                                 "std": np.ones(12, np.float32)}}, f)
    opts = argparse.Namespace(fe_cfg=fe_p, net_cfg=wk_p, ckpt=ckpt,
                              wav_list=str(lst), data_root=str(wav_dir),
                              stats=stats_p, max_utts=None,
                              out_file=str(tmp_path / "proso.json"))
    res = util_scripts.prosodic_eval(opts)
    for k in ("lf0_rmse", "egy_rmse", "zcr_rmse", "uv_acc"):
        assert np.isfinite(res[k]), res
    assert os.path.exists(tmp_path / "proso.json")


def test_data_prep_probe_lists(tmp_path):
    """probe-lists covers both reference asset styles: utt2class map +
    bare lists (minivoxceleb) and directory-per-class with session
    holdout (IEMOCAP)."""
    import argparse

    import data_prep

    rng = np.random.RandomState(0)
    # style A: flat wavs + utt2spk json + bare filename lists
    flat = tmp_path / "minivox"
    flat.mkdir()
    names = [f"id{i:03d}_u{j}.wav" for i in range(3) for j in range(2)]
    for n in names:
        write_wav(str(flat / n), rng.randn(SR // 4).astype(np.float32) * .1)
    with open(flat / "u2c.json", "w") as f:
        json.dump({n: n[2:5] for n in names}, f)
    (flat / "trl.txt").write_text("\n".join(names[:4]) + "\n")
    (flat / "tel.txt").write_text("\n".join(names[4:]) + "\n")
    opts = argparse.Namespace(
        data_root=str(flat), out_dir=str(flat / "lists"),
        utt2class=str(flat / "u2c.json"), class_from=None,
        train_list=str(flat / "trl.txt"), test_list=str(flat / "tel.txt"),
        holdout=None, test_ratio=0.2, seed=0)
    data_prep.probe_lists(opts)
    tr = [(l.split()[0], int(l.split()[1])) for l in
          (flat / "lists" / "tr.lst").read_text().splitlines()]
    te = [(l.split()[0], int(l.split()[1])) for l in
          (flat / "lists" / "te.lst").read_text().splitlines()]
    assert len(tr) == 4 and len(te) == 2
    cmap = json.loads((flat / "lists" / "class_map.json").read_text())
    assert sorted(cmap.values()) == [0, 1, 2]
    # labels consistent with the map
    for w, lab in tr + te:
        assert cmap[w[2:5]] == lab

    # style B: session*/class/*.wav tree, leave-session-out
    tree = tmp_path / "iemocap"
    for sess in ("session1", "session2"):
        for cls in ("ang", "neu"):
            d = tree / sess / cls
            d.mkdir(parents=True)
            for k in range(2):
                write_wav(str(d / f"u{k}.wav"),
                          rng.randn(SR // 4).astype(np.float32) * .1)
    opts = argparse.Namespace(
        data_root=str(tree), out_dir=str(tree / "lists"),
        utt2class=None, class_from="dirname", train_list=None,
        test_list=None, holdout="session2", test_ratio=0.2, seed=0)
    data_prep.probe_lists(opts)
    tr = (tree / "lists" / "tr.lst").read_text().splitlines()
    te = (tree / "lists" / "te.lst").read_text().splitlines()
    assert len(tr) == 4 and len(te) == 4
    assert all(l.startswith("session1") for l in tr)
    assert all(l.startswith("session2") for l in te)
    u2c = json.loads((tree / "lists" / "utt2class.json").read_text())
    assert len(u2c) == 8 and set(u2c.values()) == {0, 1}


@pytest.mark.slow
def test_train_cli_att_cfg_flag(tmp_path):
    """--att_cfg / --chunking_K CLI flags select the pase_attention /
    pase_chunking variants (reference train.py:312-321,432-434)."""
    sys.path.insert(0, REPO)
    import train as train_cli
    wk = {"regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                    "hidden_layers": 1, "name": "mfcc", "r": 1,
                    "loss": "MSELoss", "skip": False}],
          "cls": []}
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    att = {"K": 8, "avg_factor": 0.3, "att_mode": "avg_time",
           "hidden": [32]}
    paths = {}
    for name, cfg in (("wk", wk), ("fe", fe), ("att", att)):
        paths[name] = str(tmp_path / f"{name}.cfg")
        with open(paths[name], "w") as f:
            json.dump(cfg, f)
    argv = ["--net_cfg", paths["wk"], "--fe_cfg", paths["fe"],
            "--att_cfg", paths["att"], "--synthetic",
            "--batch_size", "8", "--chunk_size", "4800", "--epoch", "1",
            "--log_freq", "2", "--save_path", str(tmp_path / "ckpt")]
    opts = train_cli.build_argparser().parse_args(argv)
    from pase_tpu.trainer import Trainer
    orig_train = Trainer.train_

    def short_train(self, *a, **k):
        # the variant reached the model: attention blocks were built
        assert self.model.att_cfg is not None
        self.bpe = 2
        return orig_train(self, *a, **k)
    Trainer.train_ = short_train
    try:
        train_cli.train(opts)
    finally:
        Trainer.train_ = orig_train
    assert os.path.exists(tmp_path / "ckpt" / "FE_e0.npz")


def test_train_cli_cached_targets(corpus, tmp_path):
    """precompute-feats -> train.py --cache_feats_dir end to end: the
    CachedCompose path (transforms.py:253-292) on a real tiny corpus."""
    root, wavdir, files = corpus
    sys.path.insert(0, REPO)
    import data_prep
    import train as train_cli
    import util_scripts
    import argparse

    cfg_file = str(tmp_path / "data.cfg")
    data_prep.build_cfg(argparse.Namespace(
        data_root=str(wavdir), train_scp=str(root / "tr.scp"),
        test_scp=None, libri_dict=None, cfg_file=cfg_file,
        val_ratio=0.34, seed=3))

    wk = {"regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                    "hidden_layers": 1, "name": "mfcc", "r": 1,
                    "loss": "MSELoss", "skip": False}],
          "cls": []}
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    wk_path, fe_path = str(tmp_path / "wk.cfg"), str(tmp_path / "fe.cfg")
    with open(wk_path, "w") as f:
        json.dump(wk, f)
    with open(fe_path, "w") as f:
        json.dump(fe, f)

    cache_dir = str(tmp_path / "featcache")
    util_scripts.precompute_feats(argparse.Namespace(
        net_cfg=wk_path, data_root=str(wavdir), wav_list=None,
        data_cfg=cfg_file, out_dir=cache_dir, hop=160, overwrite=False))
    assert len(os.listdir(cache_dir)) == 12

    argv = ["--net_cfg", wk_path, "--fe_cfg", fe_path,
            "--data_root", str(wavdir), "--data_cfg", cfg_file,
            "--cache_feats_dir", cache_dir, "--num_workers", "1",
            "--batch_size", "8", "--chunk_size", "4800", "--epoch", "1",
            "--log_freq", "2", "--save_path", str(tmp_path / "ckpt")]
    opts = train_cli.build_argparser().parse_args(argv)
    from pase_tpu.trainer import Trainer
    orig_train = Trainer.train_

    def short_train(self, *a, **k):
        self.bpe = 2
        return orig_train(self, *a, **k)
    Trainer.train_ = short_train
    try:
        train_cli.train(opts)
    finally:
        Trainer.train_ = orig_train
    assert os.path.exists(tmp_path / "ckpt" / "FE_e0.npz")


@pytest.mark.slow
def test_profile_step_cli(tmp_path, capsys):
    """profile-step emits the step decomposition JSON
    (pase_tpu/profiling.py device-synced methodology)."""
    import argparse
    import util_scripts
    wk = {"regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                    "hidden_layers": 1, "name": "mfcc", "r": 1,
                    "loss": "MSELoss", "skip": False}],
          "cls": []}
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    wk_path, fe_path = str(tmp_path / "wk.cfg"), str(tmp_path / "fe.cfg")
    with open(wk_path, "w") as f:
        json.dump(wk, f)
    with open(fe_path, "w") as f:
        json.dump(fe, f)
    util_scripts.profile_step(argparse.Namespace(
        net_cfg=wk_path, fe_cfg=fe_path, batch_size=8, chunk_size=4800,
        compute_dtype=None, n_meas=2, bare=False))
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"prepare_ms", "step_ms", "model_opt_ms",
                        "steps_per_sec", "audio_sec_per_sec"}
    assert out["step_ms"] > 0 and out["prepare_ms"] > 0


def test_train_cli_multi_corpus_ami(corpus, tmp_path):
    """Repeated --data_root/--data_cfg/--dataset triples concatenate
    corpora with per-dataset distortion gating (the reference's
    Libri+AMI recipe, run_pase_libri_ami_ihm_sdm.sh): dataset 2 is an
    AmiSegTupleWavDataset whose --dtrans_cfg entry is 'None'."""
    import shutil
    import argparse as _ap
    sys.path.insert(0, REPO)
    import data_prep
    import train as train_cli

    root, wavdir, files = corpus
    cfg1 = str(tmp_path / "libri.cfg")
    data_prep.build_cfg(_ap.Namespace(
        data_root=str(wavdir), train_scp=str(root / "tr.scp"),
        test_scp=None, libri_dict=None, cfg_file=cfg1,
        val_ratio=0.34, seed=3))
    # "AMI": sdm tree = ihm tree + offset, same filenames
    ihm = tmp_path / "ihm"
    sdm = tmp_path / "sdm"
    ihm.mkdir()
    sdm.mkdir()
    from pase_tpu.data.io import read_wav, write_wav
    for f in files[:6]:
        w, _ = read_wav(str(wavdir / f))
        write_wav(str(ihm / f), w)
        write_wav(str(sdm / f), w * 0.5)
    cfg2 = str(tmp_path / "ami.cfg")
    (tmp_path / "ami.scp").write_text("\n".join(files[:6]))
    data_prep.build_cfg(_ap.Namespace(
        data_root=str(sdm), train_scp=str(tmp_path / "ami.scp"),
        test_scp=None, libri_dict=None, cfg_file=cfg2,
        val_ratio=0.34, seed=3))

    wk = {"regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                    "hidden_layers": 1, "name": "mfcc", "r": 1,
                    "loss": "MSELoss", "skip": False}],
          "cls": []}
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    wk_path, fe_path = str(tmp_path / "wk.cfg"), str(tmp_path / "fe.cfg")
    with open(wk_path, "w") as f:
        json.dump(wk, f)
    with open(fe_path, "w") as f:
        json.dump(fe, f)
    dcfg = str(tmp_path / "dist.cfg")
    with open(dcfg, "w") as f:
        json.dump({"clip_p": 0.5, "clip_factors": [0.3]}, f)

    argv = ["--net_cfg", wk_path, "--fe_cfg", fe_path,
            "--data_root", str(wavdir), "--data_cfg", cfg1,
            "--dtrans_cfg", dcfg,
            "--dataset", "LibriSpeechSegTupleWavDataset",
            "--data_root", str(sdm), "--data_cfg", cfg2,
            "--dtrans_cfg", "None",
            "--dataset", "AmiSegTupleWavDataset",
            "--clean_root", str(ihm),
            "--num_workers", "1", "--batch_size", "8",
            "--chunk_size", "4800", "--epoch", "1", "--log_freq", "2",
            "--save_path", str(tmp_path / "ckpt")]
    opts = train_cli.build_argparser().parse_args(argv)
    from pase_tpu.trainer import Trainer
    orig_train = Trainer.train_

    def short_train(self, *a, **k):
        self.bpe = 2
        return orig_train(self, *a, **k)
    Trainer.train_ = short_train
    try:
        train_cli.train(opts)
    finally:
        Trainer.train_ = orig_train
    assert os.path.exists(tmp_path / "ckpt" / "FE_e0.npz")


@pytest.mark.slow
def test_train_cli_device_corpus(corpus, tmp_path):
    """train.py --device_corpus end to end on a real tiny corpus: the
    HBM-resident int16 buffer + on-device crop gather replaces the host
    feed (device_corpus.py; the measured H2D-bottleneck fix)."""
    root, wavdir, files = corpus
    sys.path.insert(0, REPO)
    import data_prep
    import train as train_cli
    import argparse

    cfg_file = str(tmp_path / "data.cfg")
    data_prep.build_cfg(argparse.Namespace(
        data_root=str(wavdir), train_scp=str(root / "tr.scp"),
        test_scp=None, libri_dict=None, cfg_file=cfg_file,
        val_ratio=0.34, seed=3))

    wk = {"regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                    "hidden_layers": 1, "name": "mfcc", "r": 1,
                    "loss": "MSELoss", "skip": False}],
          "cls": [{"num_outputs": 1, "dropout": 0, "hidden_size": 32,
                   "hidden_layers": 1, "name": "mi",
                   "loss": "BCEWithLogitsLoss", "skip": False}]}
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    wk_path, fe_path = str(tmp_path / "wk.cfg"), str(tmp_path / "fe.cfg")
    with open(wk_path, "w") as f:
        json.dump(wk, f)
    with open(fe_path, "w") as f:
        json.dump(fe, f)

    argv = ["--net_cfg", wk_path, "--fe_cfg", fe_path,
            "--data_root", str(wavdir), "--data_cfg", cfg_file,
            "--device_corpus", "--num_workers", "1",
            "--batch_size", "8", "--chunk_size", "4800", "--epoch", "1",
            "--log_freq", "2", "--save_path", str(tmp_path / "ckpt")]
    opts = train_cli.build_argparser().parse_args(argv)
    from pase_tpu.trainer import Trainer
    orig_train = Trainer.train_

    def short_train(self, *a, **k):
        self.bpe = 2
        return orig_train(self, *a, **k)
    Trainer.train_ = short_train
    try:
        train_cli.train(opts)
    finally:
        Trainer.train_ = orig_train
    assert os.path.exists(tmp_path / "ckpt" / "FE_e0.npz")
    with open(tmp_path / "ckpt" / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f if l.strip()]
    tr_rows = [r for r in rows if r.get("split") == "train"]
    assert tr_rows and all(np.isfinite(r["total"]) for r in tr_rows)


def test_train_cli_shard_device_corpus(tmp_path):
    """train.py --device_corpus --shard_device_corpus: corpus sharded
    over the 8-device CPU mesh's data axis, fused shard_map feed, one
    short epoch end to end."""
    sys.path.insert(0, REPO)
    import train as train_cli
    from pase_tpu.data.io import write_wav

    rng = np.random.RandomState(4)
    wavdir = tmp_path / "wavs"
    wavdir.mkdir()
    names = []
    for g in range(16):                    # >= 8 prefix groups
        for u in range(2):
            nm = f"{300 + g}-9-{u:04d}.wav"
            write_wav(str(wavdir / nm),
                      rng.randn(9000).astype(np.float32) * 0.2)
            names.append(nm)
    dcfg = {"speakers": [str(300 + g) for g in range(16)],
            "train": {"data": [{"filename": n} for n in names],
                      "total_wav_dur": 9000 * len(names)},
            "valid": {"data": [{"filename": n} for n in names[:4]],
                      "total_wav_dur": 9000 * 4},
            "test": {"data": [{"filename": n} for n in names[:2]],
                     "total_wav_dur": 9000 * 2}}
    cfg_file = str(tmp_path / "data.cfg")
    with open(cfg_file, "w") as f:
        json.dump(dcfg, f)

    wk = {"regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                    "hidden_layers": 1, "name": "mfcc", "r": 1,
                    "loss": "MSELoss", "skip": False}],
          "cls": [{"num_outputs": 1, "dropout": 0, "hidden_size": 32,
                   "hidden_layers": 1, "name": "mi",
                   "loss": "BCEWithLogitsLoss", "skip": False}]}
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    wk_path, fe_path = str(tmp_path / "wk.cfg"), str(tmp_path / "fe.cfg")
    with open(wk_path, "w") as f:
        json.dump(wk, f)
    with open(fe_path, "w") as f:
        json.dump(fe, f)

    argv = ["--net_cfg", wk_path, "--fe_cfg", fe_path,
            "--data_root", str(wavdir), "--data_cfg", cfg_file,
            "--device_corpus", "--shard_device_corpus",
            "--num_workers", "1",
            "--batch_size", "16", "--chunk_size", "4800", "--epoch", "1",
            "--log_freq", "2", "--save_path", str(tmp_path / "ckpt")]
    opts = train_cli.build_argparser().parse_args(argv)
    from pase_tpu.trainer import Trainer
    orig_train = Trainer.train_

    def short_train(self, *a, **k):
        self.bpe = 2
        return orig_train(self, *a, **k)
    Trainer.train_ = short_train
    try:
        train_cli.train(opts)
    finally:
        Trainer.train_ = orig_train
    assert os.path.exists(tmp_path / "ckpt" / "FE_e0.npz")
    with open(tmp_path / "ckpt" / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f if l.strip()]
    tr_rows = [r for r in rows if r.get("split") == "train"]
    assert tr_rows and all(np.isfinite(r["total"]) for r in tr_rows)


@pytest.mark.slow
def test_train_cli_device_corpus_parallel(corpus, tmp_path):
    """train.py --device_corpus with a parallel clean/noisy tree
    (GenhancementDataset): both trees live in HBM; the batch carries
    the aligned cchunk from the clean buffer."""
    root, wavdir, files = corpus
    sys.path.insert(0, REPO)
    import data_prep
    import train as train_cli
    import argparse
    from pase_tpu.data.io import read_wav, write_wav

    noisy = tmp_path / "noisy"
    clean = tmp_path / "clean"
    noisy.mkdir()
    clean.mkdir()
    for f in files:
        w, _ = read_wav(os.path.join(str(wavdir), f))
        write_wav(str(clean / f), w)
        write_wav(str(noisy / f), w + 0.05)

    cfg_file = str(tmp_path / "data.cfg")
    data_prep.build_cfg(argparse.Namespace(
        data_root=str(noisy), train_scp=str(root / "tr.scp"),
        test_scp=None, libri_dict=None, cfg_file=cfg_file,
        val_ratio=0.34, seed=3))

    wk = {"regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 32,
                    "hidden_layers": 1, "name": "mfcc", "r": 1,
                    "loss": "MSELoss", "skip": False}],
          "cls": [{"num_outputs": 1, "dropout": 0, "hidden_size": 32,
                   "hidden_layers": 1, "name": "mi",
                   "loss": "BCEWithLogitsLoss", "skip": False}]}
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [16, 16, 32, 32], "emb_dim": 32, "norm_out": True}
    wk_path, fe_path = str(tmp_path / "wk.cfg"), str(tmp_path / "fe.cfg")
    with open(wk_path, "w") as f:
        json.dump(wk, f)
    with open(fe_path, "w") as f:
        json.dump(fe, f)

    argv = ["--net_cfg", wk_path, "--fe_cfg", fe_path,
            "--data_root", str(noisy), "--data_cfg", cfg_file,
            "--dataset", "GenhancementDataset",
            "--clean_root", str(clean),
            "--device_corpus", "--num_workers", "1",
            "--batch_size", "8", "--chunk_size", "4800", "--epoch", "1",
            "--log_freq", "2", "--save_path", str(tmp_path / "ckpt")]
    opts = train_cli.build_argparser().parse_args(argv)
    from pase_tpu.trainer import Trainer
    orig_train = Trainer.train_

    def short_train(self, *a, **k):
        self.bpe = 2
        return orig_train(self, *a, **k)
    Trainer.train_ = short_train
    try:
        train_cli.train(opts)
    finally:
        Trainer.train_ = orig_train
    assert os.path.exists(tmp_path / "ckpt" / "FE_e0.npz")
    with open(tmp_path / "ckpt" / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f if l.strip()]
    tr_rows = [r for r in rows if r.get("split") == "train"]
    assert tr_rows and all(np.isfinite(r["total"]) for r in tr_rows)


@pytest.mark.slow
def test_train_cli_n_model_2(tmp_path):
    """--n_model 2 on the 8-device CPU mesh: 4x2 data x model mesh,
    column-parallel params (Trainer.init_state auto-applies
    shard_state), fused synthetic feed — one tiny epoch end to end."""
    sys.path.insert(0, REPO)
    import train as train_cli
    wk = {"regr": [{"num_outputs": 39, "dropout": 0, "hidden_size": 128,
                    "hidden_layers": 1, "name": "mfcc", "r": 1,
                    "loss": "MSELoss", "skip": False}],
          "cls": [{"num_outputs": 1, "dropout": 0, "hidden_size": 128,
                   "hidden_layers": 1, "name": "mi",
                   "loss": "BCEWithLogitsLoss", "skip": False}]}
    fe = {"kwidths": [65, 10, 5, 5], "strides": [1, 10, 4, 4],
          "fmaps": [64, 64, 128, 128], "emb_dim": 128, "norm_out": True}
    wk_path, fe_path = str(tmp_path / "wk.cfg"), str(tmp_path / "fe.cfg")
    with open(wk_path, "w") as f:
        json.dump(wk, f)
    with open(fe_path, "w") as f:
        json.dump(fe, f)
    argv = ["--net_cfg", wk_path, "--fe_cfg", fe_path, "--synthetic",
            "--n_model", "2", "--batch_size", "8", "--chunk_size", "4800",
            "--epoch", "1", "--log_freq", "2",
            "--save_path", str(tmp_path / "ckpt")]
    opts = train_cli.build_argparser().parse_args(argv)
    from pase_tpu.trainer import Trainer
    orig_train = Trainer.train_

    def short_train(self, *a, **k):
        self.bpe = 3
        return orig_train(self, *a, **k)
    Trainer.train_ = short_train
    try:
        train_cli.train(opts)
    finally:
        Trainer.train_ = orig_train
    assert os.path.exists(tmp_path / "ckpt" / "FE_e0.npz")
    with open(tmp_path / "ckpt" / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert any(r.get("split") == "train" and np.isfinite(r["total"])
               for r in rows)
