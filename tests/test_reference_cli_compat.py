"""Reference-CLI compatibility: the reference train.py argparse surface
(/root/reference/train.py:336-441) is accepted verbatim — mapped flags
get real semantics, dead flags get loud no-op notes — and the
--zerospeech_cfg capability (config_zerospeech -> SimpleAdditive on
zero-speech rows, reference train.py:139-143 + dataset.py:525-531) works
end to end through dataset -> batcher zs_mask -> device pipeline."""

import json
import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import train as train_cli

REF_TRAIN = "/root/reference/train.py"


def _parse(argv):
    return train_cli.build_argparser().parse_args(argv)


BASE = ("--net_cfg cfg/workers/workers.cfg --fe_cfg cfg/frontend/PASE.cfg "
        "--data_cfg d.cfg --data_root w/ --stats s.pkl").split()


def test_reference_argparse_surface_fully_accepted():
    """Every flag the reference train.py declares parses here."""
    ref_flags = set(re.findall(r"add_argument\('(--[\w-]+)'",
                               open(REF_TRAIN).read()))
    assert ref_flags, "could not introspect the reference argparse"
    p = train_cli.build_argparser()
    actions = {o for a in p._actions for o in a.option_strings}
    missing = ref_flags - actions
    assert not missing, f"reference flags not accepted: {sorted(missing)}"


def test_readme_pase_plus_recipe_parses_verbatim(capsys):
    """The reference README's PASE+ training command (README.md:121-131)."""
    argv = ("--batch_size 16 --epoch 400 --save_path /tmp/x "
            "--num_workers 4 --warmup 10000000 "
            "--net_cfg cfg/workers/workers+.cfg "
            "--fe_cfg cfg/frontend/PASE+.cfg --data_cfg d.cfg "
            "--min_lr 0.0005 --fe_lr 0.001 --data_root w/ "
            "--dtrans_cfg cfg/distortions/pase+.cfg --stats s.pkl "
            "--chunk_size 32000 --tensorboard False "
            "--backprop_mode base --random_scale True --lr_mode poly"
            ).split()
    opts = _parse(argv)
    train_cli.apply_reference_compat(opts)
    # --warmup 10000000 >= --epoch 400: z adv never activates (core.py:302)
    assert train_cli.compat_z_gan_cfg(opts, bpe=100) is None
    assert "[compat]" in capsys.readouterr().out  # tensorboard note, loud


def test_legacy_z_adversarial_flags_synthesize_gan_cfg():
    opts = _parse(BASE + ["--epoch", "150", "--warmup", "3",
                          "--cchunk_prior", "--adv_loss", "L2",
                          "--zinc", "0.001"])
    train_cli.apply_reference_compat(opts)
    g = train_cli.compat_z_gan_cfg(opts, bpe=50)
    # epoch_+1 >= warmup -> active from 0-based epoch 2 -> step 100
    # "lr" (not the dead "z_lr") so Trainer's D optimizer honors --z_lr
    # (reference core.py:216 builds D's Adam from cfg['z_lr'])
    assert g == {"type": "z", "warmup": 100, "zinit_weight": 1.0,
                 "zinc": 0.001, "lr": 0.0004, "loss": "LSGAN",
                 "cchunk_prior": True}


def test_warmup_equal_to_epoch_still_activates():
    """Reference core.py:378 applies the z loss when epoch_+1 >= warmup,
    so --warmup == --epoch activates on the FINAL epoch (0-based
    epoch_ = epoch-1 -> epoch_+1 = epoch >= warmup)."""
    opts = _parse(BASE + ["--epoch", "5", "--warmup", "5",
                          "--cchunk_prior"])
    train_cli.apply_reference_compat(opts)
    g = train_cli.compat_z_gan_cfg(opts, bpe=10)
    assert g is not None and g["warmup"] == 40   # epoch_ 4 -> step 40


def test_z_flags_conflict_with_gan_cfg():
    opts = _parse(BASE + ["--epoch", "150", "--warmup", "3",
                          "--gan_cfg", '{"type": "z"}'])
    with pytest.raises(ValueError, match="not both"):
        train_cli.compat_z_gan_cfg(opts, bpe=10)


def test_rndmin_train_maps_to_select_one():
    opts = _parse(BASE + ["--rndmin_train"])
    train_cli.apply_reference_compat(opts)
    assert opts.backprop_mode == "select_one"
    opts2 = _parse(BASE + ["--rndmin_train", "--backprop_mode", "softmax"])
    with pytest.raises(ValueError, match="conflicts"):
        train_cli.apply_reference_compat(opts2)


def test_dead_reference_flags_note_loudly(capsys):
    opts = _parse(BASE + ["--nfft", "2048", "--noise_folder", "/tmp/n"])
    train_cli.apply_reference_compat(opts)
    out = capsys.readouterr().out
    assert out.count("NO-OP") == 2


def test_trans_cache_maps_to_cache_feats_dir():
    opts = _parse(BASE + ["--trans_cache", "/tmp/tc"])
    train_cli.apply_reference_compat(opts)
    assert opts.cache_feats_dir == "/tmp/tc"
    opts2 = _parse(BASE + ["--trans_cache", "/tmp/tc",
                           "--cache_feats_dir", "/tmp/other"])
    with pytest.raises(ValueError, match="same capability"):
        train_cli.apply_reference_compat(opts2)


def test_lrdecay_honored_as_step_gamma():
    from pase_tpu.optim import make_lr_schedule
    s_legacy = make_lr_schedule("step", 1.0, epochs=90, bpe=10,
                                lr_step=30, lr_gamma=0.5)
    s_modern = make_lr_schedule("step", 1.0, epochs=90, bpe=10, lr_step=30)
    # epoch 30 -> one decay
    assert float(s_legacy(300)) == pytest.approx(0.5)
    assert float(s_modern(300)) == pytest.approx(0.1)


def test_attention_flag_overrides(tmp_path):
    acfg = tmp_path / "att.cfg"
    acfg.write_text(json.dumps({"K": 40, "att_mode": "avg_time"}))
    opts = _parse(BASE + ["--att_cfg", str(acfg), "--att_K", "16",
                          "--att_mode", "concat", "--avg_factor", "0.3"])
    train_cli.apply_reference_compat(opts)
    assert opts.att_cfg == {"K": 16, "att_mode": "concat",
                            "avg_factor": 0.3}
    with pytest.raises(ValueError, match="require --att_cfg"):
        train_cli.apply_reference_compat(_parse(BASE + ["--att_K", "8"]))


def test_pretrained_ckpt_flag_reaches_trainer_cfg():
    opts = _parse(BASE + ["--pretrained_ckpt", "/tmp/FE.ckpt"])
    assert vars(opts)["pretrained_ckpt"] == "/tmp/FE.ckpt"


# ---------------------------------------------------------------------------
# zero-speech additive (config_zerospeech)
# ---------------------------------------------------------------------------


def _write_corpus(tmp_path, n=6, sr=16000):
    from pase_tpu.data.prep import write_wav
    wavs = tmp_path / "wavs"
    wavs.mkdir()
    rng = np.random.RandomState(0)
    entries = []
    for i in range(n):
        name = f"spk{i % 2}-{i:03d}.wav"
        write_wav(str(wavs / name), rng.randn(sr).astype(np.float32) * 0.1)
        entries.append({"filename": name, "spk": str(i % 2)})
    cfg = {"speakers": ["0", "1"],
           "train": {"data": entries, "total_wav_dur": n * sr,
                     "speakers": ["0", "1"]}}
    cfg_file = tmp_path / "data.cfg"
    cfg_file.write_text(json.dumps(cfg))
    return str(wavs), str(cfg_file)


def test_dataset_reports_zero_speech_draws(tmp_path):
    from pase_tpu.data.dataset import LibriSpeechTupleDataset
    root, cfg = _write_corpus(tmp_path)
    ds = LibriSpeechTupleDataset(root, cfg, "train", zero_speech_p=1.0,
                                 seed=0)
    info = {}
    wav, cwav, _ = ds.sample_tuple(0, info=info)
    assert info["zs"] is True
    assert np.abs(wav).max() < 1e-3 and wav is cwav  # near-silence
    ds0 = LibriSpeechTupleDataset(root, cfg, "train", zero_speech_p=0.0,
                                  seed=0)
    info0 = {}
    ds0.sample_tuple(0, info=info0)
    assert "zs" not in info0


def test_batcher_emits_zs_mask(tmp_path):
    from pase_tpu.data.dataset import LibriSpeechTupleDataset, ChunkBatcher
    root, cfg = _write_corpus(tmp_path)
    ds = LibriSpeechTupleDataset(root, cfg, "train", zero_speech_p=0.5,
                                 seed=0)
    batch = ChunkBatcher(ds, 16, 8000, seed=0)._make_batch()
    assert "zs_mask" in batch and set(np.unique(batch["zs_mask"])) <= {0., 1.}
    assert 0 < batch["zs_mask"].sum() < 16  # p=0.5 over 16 draws
    # zs rows are the near-silent ones
    amp = np.abs(batch["chunk"]).max(axis=1)
    assert (amp[batch["zs_mask"] > 0] < 1e-3).all()
    assert (amp[batch["zs_mask"] == 0] > 1e-3).all()
    # no zs_mask key when the capability is off (stable batch pytree)
    ds0 = LibriSpeechTupleDataset(root, cfg, "train", zero_speech_p=0.0,
                                  seed=0)
    assert "zs_mask" not in ChunkBatcher(ds0, 4, 8000, seed=0)._make_batch()


def test_prepare_zs_rows_skip_distortions_and_get_noise():
    import jax
    import jax.numpy as jnp
    from pase_tpu.data.distortions import config_from_json, DistortionAssets
    from pase_tpu.data.pipeline import make_prepare_fn

    b, t = 4, 4000
    rng = np.random.RandomState(1)
    chunk = (rng.randn(b, t) * 0.1).astype(np.float32)
    zs = np.array([0, 1, 0, 1], np.float32)
    chunk[zs > 0] = (rng.randn(2, t) * 1e-5)     # the zs rows are silence
    batch = {"chunk": jnp.asarray(chunk),
             "chunk_ctxt": jnp.asarray(chunk),
             "chunk_rand": jnp.asarray(chunk),
             "zs_mask": jnp.asarray(zs)}
    meta = {"regr": [], "cls": []}
    dist_cfg = config_from_json({"clip_p": 1.0, "clip_factors": [0.5]})
    assets = DistortionAssets(ir_bank=None, ir_pmax=None, noise_bank=None,
                              overlap_bank=None, bandrop_bank=None,
                              bandrop_lens=None, downsample_bank=None,
                              downsample_lens=None, resample_filters=None)
    noise_bank = jnp.asarray(rng.randn(3, 2 * t).astype(np.float32))

    prep = make_prepare_fn(meta, dist_cfg=dist_cfg, assets=assets,
                           zs_bank=noise_bank, zs_snrs=(0, 5))
    out = jax.jit(prep)(batch, jax.random.PRNGKey(0))
    got = np.asarray(out["chunk"])
    # non-zs rows: distorted (clip changes them)
    assert not np.allclose(got[0], chunk[0])
    assert not np.allclose(got[2], chunk[2])
    # zs rows: NOT clipped but noisified by the zs additive —
    # different samples, same energy (SimpleAdditive norm_energy,
    # transforms.py:1660-1666)
    for i in (1, 3):
        assert not np.allclose(got[i], chunk[i])
        e_in = float(np.dot(chunk[i], chunk[i]))
        e_out = float(np.dot(got[i], got[i]))
        assert e_out == pytest.approx(e_in, rel=1e-3)
    # targets/cchunk side stays the silence (input-only additive)
    assert np.allclose(np.asarray(out["cchunk"])[1], chunk[1])


def test_prepare_zs_rows_skip_distortions_without_bank():
    import jax
    import jax.numpy as jnp
    from pase_tpu.data.distortions import config_from_json, DistortionAssets
    from pase_tpu.data.pipeline import make_prepare_fn

    b, t = 2, 2000
    rng = np.random.RandomState(2)
    chunk = (rng.randn(b, t) * 0.1).astype(np.float32)
    batch = {"chunk": jnp.asarray(chunk),
             "chunk_ctxt": jnp.asarray(chunk),
             "chunk_rand": jnp.asarray(chunk),
             "zs_mask": jnp.asarray(np.array([0, 1], np.float32))}
    dist_cfg = config_from_json({"clip_p": 1.0, "clip_factors": [0.5]})
    assets = DistortionAssets(ir_bank=None, ir_pmax=None, noise_bank=None,
                              overlap_bank=None, bandrop_bank=None,
                              bandrop_lens=None, downsample_bank=None,
                              downsample_lens=None, resample_filters=None)
    prep = make_prepare_fn({"regr": [], "cls": []}, dist_cfg=dist_cfg,
                           assets=assets)
    out = jax.jit(prep)(batch, jax.random.PRNGKey(3))
    got = np.asarray(out["chunk"])
    assert not np.allclose(got[0], chunk[0])   # distorted
    assert np.allclose(got[1], chunk[1])       # zs row untouched


def test_build_zerospeech_gates(tmp_path):
    zcfg = tmp_path / "zs.cfg"
    noise_dir = tmp_path / "noises"
    noise_dir.mkdir()
    from pase_tpu.data.prep import write_wav
    write_wav(str(noise_dir / "n0.wav"),
              np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1)
    zcfg.write_text(json.dumps({"noises_dir": str(noise_dir),
                                "noises_snrs": [0, 5]}))
    # gated on zero_speech_p like the reference (train.py:195)
    o = _parse(BASE + ["--zerospeech_cfg", str(zcfg)])
    bank, _ = train_cli.build_zerospeech(o, 8000)
    assert bank is None
    o2 = _parse(BASE + ["--zerospeech_cfg", str(zcfg),
                        "--zero_speech_p", "0.1"])
    bank2, snrs2 = train_cli.build_zerospeech(o2, 8000)
    assert bank2.shape == (1, 16000) and snrs2 == (0, 5)
    o3 = _parse(BASE + ["--zerospeech_cfg", str(zcfg),
                        "--zero_speech_p", "0.1", "--device_corpus"])
    with pytest.raises(ValueError, match="host feed"):
        train_cli.build_zerospeech(o3, 8000)
    zbad = tmp_path / "bad.cfg"
    zbad.write_text(json.dumps({"noise_dir": str(noise_dir)}))
    o4 = _parse(BASE + ["--zerospeech_cfg", str(zbad),
                        "--zero_speech_p", "0.1"])
    with pytest.raises(ValueError, match="unknown zerospeech"):
        train_cli.build_zerospeech(o4, 8000)
