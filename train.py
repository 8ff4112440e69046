"""Self-supervised PASE/PASE+ pretraining CLI.

Mirrors the reference entrypoint (/root/reference/train.py:336-465):
  python train.py --data_root data/LibriSpeech_50h/wav_sel \\
      --data_cfg data/librispeech_data_50h.cfg \\
      --net_cfg cfg/workers/workers+.cfg \\
      --fe_cfg cfg/frontend/PASE+.cfg \\
      --dtrans_cfg cfg/distortions/pase+.cfg \\
      --stats data/librispeech_50h_stats.pkl \\
      --batch_size 16 --chunk_size 32000 --epoch 400 \\
      --fe_lr 0.001 --min_lr 0.0005 --lr_mode poly

Differences from the reference (TPU-native design):
  * feature targets + distortions run on-device inside the jitted step
    (--num_workers spawns host prefetch threads that only decode/crop
    wavs — each with its own batcher RNG over the shared dataset),
  * training is batch-sharded over all available devices (ICI data
    parallelism) automatically.
"""

import argparse
import json
import os

import numpy as np


def str2bool(v):
    return str(v).lower() in ("yes", "true", "t", "1")


# Flags declared by the reference's argparse but consumed NOWHERE on its
# modern WorkerScheduler path: the per-feature kwargs feed only
# commented-out code (/root/reference/train.py:73-123), the
# noise/whisper contaminated-tree caches are populated but never read
# (/root/reference/pase/dataset.py:216-231, no consumer in any
# __getitem__), and net_ckpt/log_grad_keys/dout reach vars(opts) without
# a reader. Accepted so reference commands parse verbatim; each use
# prints a loud no-op note (never a silent ignore).
_DEAD_REFERENCE_FLAGS = [
    ("--distortion_p", dict(type=float, default=None)),
    ("--noise_folder", dict(type=str, default=None)),
    ("--whisper_folder", dict(type=str, default=None)),
    ("--net_ckpt", dict(type=str, default=None)),
    ("--log_grad_keys", dict(type=str, nargs="+", default=None)),
    ("--dout", dict(type=float, default=None)),
    ("--nfft", dict(type=int, default=None)),
    ("--fbank_filters", dict(type=int, default=None)),
    ("--gtn_fmin", dict(type=float, default=None)),
    ("--gtn_channels", dict(type=int, default=None)),
    ("--lpc_order", dict(type=int, default=None)),
    ("--hidden_layers", dict(type=int, default=None)),
    ("--hidden_size", dict(type=int, default=None)),
    ("--kaldi_root", dict(type=str, default=None)),
]


def apply_reference_compat(opts):
    """Resolve the reference-CLI compatibility tier (mutates opts).

    Every flag of the reference train.py argparse
    (/root/reference/train.py:336-441) is accepted so its README recipes
    and template_scripts run verbatim. Tiers: mapped (real semantics
    here), informational (the capability is always-on or lives
    elsewhere), dead (no-op in the reference itself — loud note). The
    legacy z-adversarial flags are resolved later by compat_z_gan_cfg
    (they need bpe for the epoch->step conversion).
    """
    def note(msg):
        print(f"[compat] {msg}")

    for flag, _ in _DEAD_REFERENCE_FLAGS:
        name = flag.lstrip("-")
        if getattr(opts, name) is not None:
            note(f"--{name} accepted but a NO-OP: the reference itself "
                 "never consumes it on the WorkerScheduler path "
                 "(feature kwargs are commented out at its "
                 "train.py:73-123; contaminated-tree caches are never "
                 "read). Worker-target parameters come from --net_cfg.")
    if opts.no_cuda:
        note("--no-cuda: device selection is JAX's (TPU when present, "
             "else CPU)")
    if opts.tensorboard is not None:
        note("--tensorboard: metrics are always JSONL under save_path "
             "(pase_tpu/log.py); no TensorBoard dependency")
    if opts.cache_on_load:
        note("--cache_on_load: lazy wav caching is always on here "
             "(LibriSpeechTupleDataset cache_on_load=True)")
    if opts.do_eval:
        note("--do_eval: the valid split is always evaluated once per "
             "epoch here")
    if opts.trans_cache:
        if opts.cache_feats_dir:
            raise ValueError("--trans_cache and --cache_feats_dir are "
                             "the same capability; pass one")
        note(f"--trans_cache -> --cache_feats_dir {opts.trans_cache}")
        opts.cache_feats_dir = opts.trans_cache
    if opts.vq or opts.vq_K is not None:
        note("--vq/--vq_K: VQ-EMA is configured in --fe_cfg here (e.g. "
             "cfg/frontend/PASE+_resblocks_VQ8192.cfg); the reference "
             "flags only reached its legacy core.py trainer")
    if opts.lrdecay:
        if opts.lr_mode != "step":
            note(f"--lrdecay {opts.lrdecay} only affects --lr_mode step "
                 f"(you passed {opts.lr_mode})")
        else:
            note(f"--lrdecay {opts.lrdecay}: honored as the step-mode "
                 "gamma (legacy core.py StepLR semantics; the modern "
                 "reference path ignores this flag and decays 0.1)")
    if opts.rndmin_train:
        if opts.backprop_mode not in ("base", "select_one"):
            raise ValueError("--rndmin_train (legacy random-minion "
                             "training = select_one) conflicts with "
                             f"--backprop_mode {opts.backprop_mode}")
        note("--rndmin_train -> --backprop_mode select_one")
        opts.backprop_mode = "select_one"
    if (opts.att_K is not None or opts.att_mode is not None
            or opts.avg_factor is not None):
        if not opts.att_cfg:
            raise ValueError(
                "--att_K/--att_mode/--avg_factor require --att_cfg (the "
                "reference reads them only for the attention variant, "
                "WorkerScheduler/trainer.py:56-62)")
        with open(opts.att_cfg) as f:
            acfg = json.load(f)
        if opts.att_K is not None:
            acfg["K"] = opts.att_K
        if opts.att_mode is not None:
            acfg["att_mode"] = opts.att_mode
        if opts.avg_factor is not None:
            acfg["avg_factor"] = opts.avg_factor
        opts.att_cfg = acfg   # build_pase accepts dicts
        note(f"attention overrides applied: K={acfg.get('K')} "
             f"att_mode={acfg.get('att_mode')} "
             f"avg_factor={acfg.get('avg_factor')}")


def compat_z_gan_cfg(opts, bpe):
    """Legacy z-adversarial flags -> a gan_cfg dict (or None).

    Reference semantics (core.py:302,378): the z loss activates from
    epoch_+1 >= --warmup; the default 1e9 means never (the README PASE+
    recipe passes --warmup 10000000 exactly to keep it off). The
    trainer's gan_cfg warmup is in steps, so convert with bpe.
    """
    # epoch_+1 >= warmup (core.py:378): --warmup == --epoch still
    # activates on the final epoch, so <= not <.
    active = opts.warmup <= opts.epoch
    z_flags_given = (opts.zinit_weight != 1.0 or opts.zinc != 0.0002
                     or opts.z_lr != 0.0004 or opts.adv_loss != "BCE"
                     or opts.cchunk_prior)
    if not active:
        if z_flags_given:
            print(f"[compat] z-adversarial flags given but --warmup "
                  f"{opts.warmup} >= --epoch {opts.epoch}: the z loss "
                  "never activates (core.py:302 'epoch to begin' "
                  "semantics)")
        return None
    if opts.gan_cfg:
        raise ValueError("pass either --gan_cfg or the legacy z flags "
                         "(--warmup/--zinit_weight/--zinc/--z_lr/"
                         "--adv_loss/--cchunk_prior), not both")
    loss = {"BCE": "BCE", "L2": "LSGAN"}.get(opts.adv_loss)
    if loss is None:
        raise ValueError(f"--adv_loss {opts.adv_loss}: the reference "
                         "supports BCE or L2 (train.py:406)")
    cfg = {"type": "z",
           "warmup": max(opts.warmup - 1, 0) * bpe,
           "zinit_weight": opts.zinit_weight, "zinc": opts.zinc,
           "lr": opts.z_lr, "loss": loss,
           "cchunk_prior": bool(opts.cchunk_prior)}
    print(f"[compat] legacy z-adversarial flags -> gan_cfg {cfg}")
    return cfg


def build_argparser():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", action="append", default=[])
    p.add_argument("--data_cfg", action="append", default=[])
    p.add_argument("--dtrans_cfg", action="append", default=[])
    p.add_argument("--net_cfg", type=str, default=None)
    p.add_argument("--fe_cfg", type=str, default=None)
    p.add_argument("--stats", type=str, default=None)
    p.add_argument("--save_path", type=str, default="ckpt")
    p.add_argument("--max_ckpts", type=int, default=5)
    p.add_argument("--num_workers", type=int, default=2)
    p.add_argument("--seed", type=int, default=2)
    p.add_argument("--random_scale", type=str, default="False")
    p.add_argument("--chunk_size", type=int, default=16000)
    p.add_argument("--log_freq", type=int, default=100)
    p.add_argument("--epoch", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=100)
    p.add_argument("--fe_opt", type=str, default="Adam")
    p.add_argument("--min_opt", type=str, default="Adam")
    p.add_argument("--lrdec_step", type=int, default=30)
    p.add_argument("--fe_lr", type=float, default=0.0001)
    p.add_argument("--min_lr", type=float, default=0.0004)
    p.add_argument("--lr_mode", type=str, default="step")
    p.add_argument("--backprop_mode", type=str, default="base")
    p.add_argument("--dropout_rate", type=float, default=0.5)
    p.add_argument("--delta", type=float, default=None)
    p.add_argument("--temp", type=float, default=None)
    p.add_argument("--alpha", type=float, default=None)
    p.add_argument("--hop", type=int, default=160)
    p.add_argument("--no_continue", type=str, default="False")
    p.add_argument("--zero_speech_p", type=float, default=0.0)
    p.add_argument("--sup_exec", type=str, default=None)
    p.add_argument("--sup_freq", type=int, default=1)
    p.add_argument("--preload_wav", action="store_true", default=False)
    p.add_argument("--synthetic", action="store_true", default=False,
                   help="use synthetic data (smoke/bench runs)")
    p.add_argument("--dataset", action="append", default=[],
                   help="LibriSpeechSegTupleWavDataset (default) | "
                        "PairWavDataset | GenhancementDataset | "
                        "AmiSegTupleWavDataset (sdm root + ihm "
                        "clean_root)")
    p.add_argument("--clean_root", type=str, default=None,
                   help="clean tree for GenhancementDataset")
    p.add_argument("--ihm2sdm", type=str, default=None,
                   help="AMI distant channels for channel-key cfg "
                        "entries, e.g. 1,3,5,7 (reference "
                        "train.py --ihm2sdm)")
    p.add_argument("--cache_feats_dir", type=str, default=None,
                   help="precomputed-target cache dir from "
                        "`util_scripts.py precompute-feats` "
                        "(CachedCompose path, transforms.py:253-292)")
    p.add_argument("--fast_loader", action="store_true", default=False,
                   help="use the native C++ decode/crop loader")
    p.add_argument("--compute_dtype", type=str, default=None,
                   help="bfloat16 for mixed-precision MXU passes")
    p.add_argument("--loss_precision", type=str, default=None,
                   help="fused wide-head loss matmul precision "
                        "(default|high|highest); unset = high only for "
                        "value-consuming policies + eval")
    p.add_argument("--n_model", type=int, default=1,
                   help="model-parallel mesh width (column-parallel "
                        "params over the 'model' axis); devices/n_model "
                        "become the data-parallel width")
    p.add_argument("--no_fused_feed", action="store_true", default=False,
                   help="keep the dispatch-per-batch staged feed even "
                        "for device-side batchers (debugging)")
    p.add_argument("--jax_cache_dir", type=str,
                   default=os.path.join(os.path.dirname(
                       os.path.abspath(__file__)), ".jax_cache"),
                   help="persistent XLA compile cache ('' disables)")
    p.add_argument("--device_corpus", action="store_true", default=False,
                   help="keep the WHOLE corpus in HBM as int16 and "
                        "gather crops on device (host ships only "
                        "indices; kills the H2D bottleneck; "
                        "single-tree corpora up to ~37 h/process)")
    p.add_argument("--shard_device_corpus", action="store_true",
                   default=False,
                   help="with --device_corpus: SHARD the corpus over "
                        "the mesh's data axis (shard_map sampling; "
                        "capacity scales linearly with chips, no "
                        "buffer broadcast)")
    p.add_argument("--wire_dtype", type=str, default="float32",
                   choices=["float32", "int16"],
                   help="int16 ships waveform batches on the PCM16 grid "
                        "(lossless for PCM-sourced corpora; halves "
                        "host->device transfer). Avoid with "
                        "--zero_speech_p (sub-quantum synthetic silence)")
    p.add_argument("--gan_cfg", type=str, default=None,
                   help="JSON: {worker, loss, lr, weight} GAN worker; "
                        "type='z' also takes warmup/zinit_weight/zinc "
                        "(legacy ramp) and cchunk_prior (real = "
                        "PASE(cchunk), core.py:381-384)")
    # model-variant selection (reference train.py:312-321,432-434):
    # att_cfg JSON switches to the pase_attention variant,
    # chunking_K to pase_chunking fixed channel masks
    p.add_argument("--att_cfg", type=str, default=None,
                   help="attention-blocks cfg JSON (pase_attention)")
    p.add_argument("--chunking_K", type=int, default=None,
                   help="channels kept per fixed mask (pase_chunking)")
    # multi-host (DCN) scale-out: jax.distributed.initialize wiring.
    # batch_size is GLOBAL; each process loads its host_batch_slice.
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (multi-host runs)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # ---- reference CLI compatibility (apply_reference_compat) ----------
    # the rest of the reference train.py argparse surface
    # (/root/reference/train.py:336-441), so its recipes run verbatim
    g = p.add_argument_group("reference CLI compatibility")
    g.add_argument("--warmup", type=int, default=1000000000,
                   help="epoch to begin the legacy z-adversarial loss "
                        "(core.py:302); < --epoch synthesizes a z "
                        "gan_cfg (compat_z_gan_cfg)")
    g.add_argument("--zinit_weight", type=float, default=1.0)
    g.add_argument("--zinc", type=float, default=0.0002)
    g.add_argument("--z_lr", type=float, default=0.0004)
    g.add_argument("--adv_loss", type=str, default="BCE",
                   help="BCE or L2 (reference train.py:406)")
    g.add_argument("--cchunk_prior", action="store_true", default=False)
    g.add_argument("--rndmin_train", action="store_true", default=False,
                   help="legacy random-minion training "
                        "(= --backprop_mode select_one)")
    g.add_argument("--pretrained_ckpt", type=str, default=None,
                   help="warm-start the frontend from a torch/jax "
                        "encoder ckpt (trainer.py consumes it)")
    g.add_argument("--att_K", type=int, default=None)
    g.add_argument("--att_mode", type=str, default=None)
    g.add_argument("--avg_factor", type=float, default=None)
    g.add_argument("--zerospeech_cfg", action="append", default=None,
                   help="JSON {noises_dir, noises_snrs}: additive noise "
                        "on zero-speech inputs (config_zerospeech)")
    g.add_argument("--do_eval", action="store_true", default=False)
    g.add_argument("--tensorboard", type=str, default=None)
    g.add_argument("--no-cuda", dest="no_cuda", action="store_true",
                   default=False)
    g.add_argument("--cache_on_load", action="store_true", default=False)
    g.add_argument("--trans_cache", type=str, default=None)
    g.add_argument("--vq", action="store_true", default=False)
    g.add_argument("--vq_K", type=int, default=None)
    g.add_argument("--lrdecay", type=float, default=0,
                   help="step-mode LR gamma (legacy core.py StepLR; 0 "
                        "keeps LR_Scheduler's 0.1)")
    for flag, kw in _DEAD_REFERENCE_FLAGS:
        g.add_argument(flag, **kw)
    return p


def build_distortions(opts, chunk_size):
    from pase_tpu.data.distortions import (config_from_json,
                                           DistortionAssets, load_ir_bank,
                                           load_wav_bank)
    import glob
    # first real cfg wins (a per-dataset entry may be the sentinel
    # "None" to disable distortions for that corpus — see make_ds)
    real = [c for c in (opts.dtrans_cfg or [])
            if str(c) not in ("None", "none", "")]
    if not real:
        return None, None, None
    with open(real[0]) as f:
        dcfg_json = json.load(f)
    cfg = config_from_json(dcfg_json)
    # host-side distortions (codec2 / whisperize) run on raw batches
    # before device transfer (reference transforms.py:38-146 keys)
    from pase_tpu.data.host_distortions import build_host_stage
    host_stage = build_host_stage(dcfg_json, seed=getattr(opts, "seed", 0))
    ir_bank = ir_pmax = noise_bank = overlap_bank = None
    bandrop_bank = downsample_bank = None
    bandrop_lens = downsample_lens = None
    if cfg.reverb_p > 0:
        root = dcfg_json.get("reverb_data_root", ".")
        fmt = dcfg_json.get("reverb_fmt", "npy")
        files = dcfg_json.get("reverb_irfiles") or [
            os.path.basename(f) for f in glob.glob(
                os.path.join(root, f"*.{fmt}"))]
        if files:
            ir_bank, ir_pmax, _ = load_ir_bank(files, root, fmt)
    if cfg.noises_p > 0 and dcfg_json.get("noises_dir"):
        dirs = dcfg_json["noises_dir"]
        dirs = dirs if isinstance(dirs, list) else [dirs]
        files = [f for d in dirs for f in glob.glob(os.path.join(d, "*.wav"))]
        if files:
            noise_bank = load_wav_bank(files, 2 * chunk_size)
    if cfg.overlap_p > 0 and dcfg_json.get("overlap_dir"):
        if dcfg_json.get("overlap_list"):
            with open(dcfg_json["overlap_list"]) as f:
                files = [os.path.join(dcfg_json["overlap_dir"], l.strip())
                         for l in f if l.strip()]
        else:
            files = glob.glob(os.path.join(dcfg_json["overlap_dir"], "*.wav"))
        if files:
            overlap_bank = load_wav_bank(files, 2 * chunk_size)
    for key, pkey in (("bandrop", "bandrop_p"), ("downsample",
                                                 "downsample_p")):
        if getattr(cfg, pkey) > 0:
            root = dcfg_json.get(f"{key}_data_root", ".")
            fmt = dcfg_json.get(f"{key}_fmt", "npy")
            files = dcfg_json.get(f"{key}_irfiles") or []
            if files:
                bank, _, lens = load_ir_bank(files, root, fmt)
                if key == "bandrop":
                    bandrop_bank, bandrop_lens = bank, lens
                else:
                    downsample_bank, downsample_lens = bank, lens
    resample_filters = None
    if cfg.resample_p > 0 and cfg.resample_factors:
        from pase_tpu.data.distortions import build_resample_filters
        resample_filters = build_resample_filters(cfg.resample_factors)
    assets = DistortionAssets(ir_bank=ir_bank, ir_pmax=ir_pmax,
                              noise_bank=noise_bank,
                              overlap_bank=overlap_bank,
                              bandrop_bank=bandrop_bank,
                              bandrop_lens=bandrop_lens,
                              downsample_bank=downsample_bank,
                              downsample_lens=downsample_lens,
                              resample_filters=resample_filters)
    return cfg, assets, host_stage


def build_zerospeech(opts, chunk_size):
    """--zerospeech_cfg JSON {noises_dir, noises_snrs} -> (bank, snrs).

    The reference's config_zerospeech (train.py:139-143) builds a
    SimpleAdditive applied ONLY to zero-speech samples (noise-shaped
    inputs at silence energy, targets stay silence); gated on
    zero_speech_p > 0 like the reference (train.py:195-197).
    """
    cfgs = [c for c in (opts.zerospeech_cfg or [])
            if str(c) not in ("None", "none", "")]
    if not cfgs:
        return None, (0, 5, 10)
    if opts.zero_speech_p <= 0:
        print("[compat] --zerospeech_cfg given but --zero_speech_p is 0: "
              "zero-speech samples never occur (the reference gates the "
              "transform on zero_speech_p too, train.py:195)")
        return None, (0, 5, 10)
    if opts.device_corpus or opts.synthetic:
        raise ValueError("--zerospeech_cfg needs the host feed (the HBM "
                         "device-corpus / synthetic paths carry no "
                         "zero-speech mask); drop --device_corpus/"
                         "--synthetic")
    if len(set(cfgs)) > 1:
        raise ValueError("one global --zerospeech_cfg is supported "
                         "(repeat the same file per corpus if needed)")
    with open(cfgs[0]) as f:
        z = json.load(f)
    unknown = [k for k in z if k not in ("noises_dir", "noises_snrs")]
    if unknown:
        raise ValueError(f"unknown zerospeech cfg keys {unknown}: "
                         "config_zerospeech takes noises_dir, noises_snrs "
                         "(reference train.py:139-143)")
    import glob
    from pase_tpu.data.distortions import load_wav_bank
    dirs = z.get("noises_dir")
    dirs = dirs if isinstance(dirs, list) else [dirs]
    files = [f for d in dirs for f in glob.glob(os.path.join(d, "*.wav"))]
    if not files:
        raise ValueError(f"no noise wavs under {dirs}")
    bank = load_wav_bank(files, 2 * chunk_size)
    snrs = tuple(z.get("noises_snrs", (0, 5, 10)))
    print(f"Zero-speech additive: {len(files)} noises, snrs {snrs}")
    return bank, snrs


def train(opts):
    apply_reference_compat(opts)
    # persistent compile cache: the full train-step graph is minutes of
    # (remote) XLA compile; cache it so restarts/resumes pay seconds.
    # NOTE: importing jax here does NOT initialize the backend — config
    # updates and process_count checks below stay pre-init safe.
    import jax
    if opts.jax_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser(opts.jax_cache_dir))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    # multi-host runtime must come up before any backend use; with it,
    # jax.devices() is the global pod and each process feeds only its
    # own host_batch_slice of the (global) --batch_size
    from pase_tpu.parallel.mesh import init_distributed, host_batch_slice
    multihost = init_distributed(opts.coordinator_address,
                                 opts.num_processes, opts.process_id)
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import (LibriSpeechTupleDataset, ChunkBatcher,
                                       SyntheticChunkBatcher)
    from pase_tpu.data.pipeline import load_stats_pkl
    local_bs = opts.batch_size
    if multihost:
        sl = host_batch_slice(opts.batch_size)
        local_bs = sl.stop - sl.start
        print(f"multihost: process {jax.process_index()}/"
              f"{jax.process_count()} loads batch rows "
              f"[{sl.start}:{sl.stop}] of {opts.batch_size}")

    with open(opts.fe_cfg) as f:
        fe_cfg = json.load(f)
    with open(opts.net_cfg) as f:
        wk_cfg = json.load(f)

    mesh = None
    if opts.n_model > 1 or opts.shard_device_corpus:
        from pase_tpu.parallel.mesh import get_mesh
        mesh = get_mesh(n_model=opts.n_model)
        print(f"mesh: {dict(mesh.shape)} (data x model)")
    if opts.shard_device_corpus and not opts.device_corpus:
        raise ValueError("--shard_device_corpus requires --device_corpus")

    # per-host seeds keep multi-host sampling disjoint
    seed0 = opts.seed + (0 if not multihost else 1000 * sl.start)
    if opts.synthetic:
        # synthetic batches are generated ON the accelerator (host-side
        # harmonic stacks are GIL-bound numpy and would starve the chip)
        from pase_tpu.data.dataset import DeviceSyntheticBatcher
        batcher = DeviceSyntheticBatcher(local_bs, opts.chunk_size,
                                         seed=seed0)
        va_batcher = DeviceSyntheticBatcher(local_bs, opts.chunk_size,
                                            seed=seed0 + 1)
        bpe = 100
    else:
        from pase_tpu.data import dataset as ds_mod
        _DS_CLS = {"LibriSpeechSegTupleWavDataset":
                   ds_mod.LibriSpeechTupleDataset,
                   "PairWavDataset": ds_mod.PairWavDataset,
                   "GenhancementDataset": ds_mod.GenhancementDataset,
                   "AmiSegTupleWavDataset": ds_mod.AmiSegTupleWavDataset,
                   }
        # repeated --data_root/--data_cfg/--dataset triples concatenate
        # corpora (MetaWavConcatDataset; the reference's Libri+AMI
        # recipes, template_scripts/run_pase_libri_ami_ihm_sdm.sh); a
        # per-dataset --dtrans_cfg of "None" disables distortions for
        # that corpus's samples (per-sample dist_mask through the batch)
        n_ds = max(len(opts.data_root), 1)

        def _nth(lst, i, default=None):
            return lst[i] if i < len(lst) else (
                lst[0] if lst else default)

        def make_one(i, split, seed):
            name = _nth(opts.dataset, i, "LibriSpeechSegTupleWavDataset")
            cls = _DS_CLS[name]
            if cls is ds_mod.AmiSegTupleWavDataset:
                return cls(opts.data_root[i], opts.clean_root,
                           _nth(opts.data_cfg, i), split, seed=seed,
                           ihm2sdm=opts.ihm2sdm)
            if issubclass(cls, ds_mod.GenhancementDataset):
                return cls(opts.data_root[i], opts.clean_root,
                           _nth(opts.data_cfg, i), split, seed=seed)
            return cls(opts.data_root[i], _nth(opts.data_cfg, i), split,
                       zero_speech_p=opts.zero_speech_p
                       if split == "train" else 0.0, seed=seed)

        def make_ds(split, seed):
            parts = [make_one(i, split, seed + 101 * i)
                     for i in range(n_ds)]
            if len(parts) == 1:
                return parts[0]
            flags = [str(_nth(opts.dtrans_cfg, i, "None")) not in
                     ("None", "none", "") for i in range(n_ds)]
            return ds_mod.MetaConcatDataset(parts, dist_flags=flags)

        ds = make_ds("train", opts.seed)
        va_ds = make_ds("valid", opts.seed + 1)
        batcher_cls = (ds_mod.FastChunkBatcher if opts.fast_loader
                       else ChunkBatcher)
        if opts.cache_feats_dir:
            # precomputed-target cache (CachedCompose path; see
            # pase_tpu/data/cache.py for the semantics + limitations)
            if opts.fast_loader or str2bool(opts.random_scale) \
                    or opts.zero_speech_p:
                raise ValueError("--cache_feats_dir is incompatible with "
                                 "--fast_loader / --random_scale / "
                                 "--zero_speech_p")
            from pase_tpu.data.cache import CachedTargetBatcher
            from pase_tpu.model import parse_workers_cfg
            from pase_tpu.ops.features import feature_fn_for_worker
            cached_names = [
                e["name"] for e in parse_workers_cfg(wk_cfg)["regr"]
                if feature_fn_for_worker(e["name"], e.get("transform"),
                                         hop=opts.hop) is not None]
            import functools
            batcher_cls = functools.partial(
                CachedTargetBatcher, cache_dir=opts.cache_feats_dir,
                worker_names=cached_names, hop=opts.hop)
            print(f"Cached targets: {cached_names} "
                  f"from {opts.cache_feats_dir}")
        if opts.device_corpus:
            # corpus lives in HBM; host ships only crop indices
            # (device_corpus.py — the H2D bottleneck fix). Eval stays on
            # the host path (once an epoch).
            ds0 = _nth(opts.dataset, 0, "LibriSpeechSegTupleWavDataset")
            if n_ds != 1 or opts.cache_feats_dir or \
                    ds0 not in ("LibriSpeechSegTupleWavDataset",
                                "GenhancementDataset",
                                "AmiSegTupleWavDataset") or \
                    (opts.ihm2sdm and ds0 == "AmiSegTupleWavDataset"):
                raise ValueError(
                    "--device_corpus supports a single corpus: "
                    "LibriSpeechSegTupleWavDataset, or a parallel "
                    "clean/noisy tree (GenhancementDataset / AMI tree "
                    "mode — channel-key --ihm2sdm stays on the host "
                    "path); no MetaConcat / --cache_feats_dir")
            if jax.process_count() > 1 and not opts.shard_device_corpus:
                # the single-buffer fused feed is single-process only;
                # falling through to the staged path would device_get
                # every HBM-gathered batch back to the host and
                # re-upload it — reinstating the exact H2D bottleneck
                # --device_corpus exists to remove (trainer.py gate)
                raise ValueError(
                    "single-buffer --device_corpus is single-process "
                    "only; multi-host runs use --shard_device_corpus "
                    "(corpus sharded over the pod, per-host IO) or "
                    "--wire_dtype int16")
            from pase_tpu.data.device_corpus import (
                DeviceCorpusBatcher, ShardedDeviceCorpusBatcher)
            if opts.shard_device_corpus:
                # corpus sharded over the mesh's data axis: capacity
                # scales with chips, sub-batches land pre-sharded.
                # GLOBAL batch + base seed: the seeded partition and
                # the feed PRNG must agree across processes (each host
                # decodes only the shards its devices own)
                batcher = ShardedDeviceCorpusBatcher(
                    ds, opts.batch_size, opts.chunk_size, mesh=mesh,
                    seed=opts.seed)
                print(f"Sharded device corpus: {batcher.buf_gb:.2f} GB "
                      f"int16 over {batcher.n_shards} shards")
            else:
                batcher = DeviceCorpusBatcher(ds, local_bs,
                                              opts.chunk_size, seed=seed0)
                print(f"Device corpus: {batcher.buf_gb:.2f} GB int16 "
                      "in HBM")
        else:
            batcher = batcher_cls(ds, local_bs, opts.chunk_size,
                                  seed=seed0)
        bpe = batcher.bpe
        if not opts.device_corpus and opts.num_workers > 1:
            # replicate the reference's DataLoader num_workers: N
            # independent producers (per-thread RNG) into one queue
            from pase_tpu.data.dataset import ThreadedPrefetcher
            batcher = ThreadedPrefetcher(
                lambda tid: iter(batcher_cls(
                    ds, local_bs, opts.chunk_size,
                    seed=seed0 + 13 * tid)._make_batch, None),
                n_threads=opts.num_workers, bpe=bpe)
        if opts.device_corpus:
            # eval from HBM too (the valid split is small; avoids the
            # host wire for the once-per-epoch eval pass)
            if opts.shard_device_corpus:
                try:
                    va_batcher = ShardedDeviceCorpusBatcher(
                        va_ds, opts.batch_size, opts.chunk_size,
                        mesh=mesh, seed=opts.seed + 1)
                except ValueError as e:
                    # ONLY the too-few-prefix-groups case falls back;
                    # any other build error (header/decode mismatch,
                    # per-shard 2^31 cap) must stay loud
                    if "prefix groups" not in str(e) or \
                            jax.process_count() > 1:
                        raise
                    # valid split too small to shard: single buffer
                    va_batcher = DeviceCorpusBatcher(
                        va_ds, local_bs, opts.chunk_size, seed=seed0 + 1)
            else:
                va_batcher = DeviceCorpusBatcher(va_ds, local_bs,
                                                 opts.chunk_size,
                                                 seed=seed0 + 1)
        else:
            va_batcher = batcher_cls(va_ds, local_bs, opts.chunk_size,
                                     seed=seed0 + 1)
        print(f"Dataset: {ds.total_wav_dur/16000/3600.0:.1f} h train audio, "
              f"bpe={bpe}")

    stats = load_stats_pkl(opts.stats) if opts.stats and \
        os.path.exists(opts.stats) else None
    dist_cfg, dist_assets, host_stage = build_distortions(opts,
                                                          opts.chunk_size)
    if host_stage is not None and opts.device_corpus:
        raise ValueError("--device_corpus is incompatible with host-stage "
                         "distortions (codec2/whisperize need host "
                         "waveforms); drop them from --dtrans_cfg")
    if host_stage is not None:
        from pase_tpu.data.host_distortions import StagedBatcher
        print("Host distortion stage enabled "
              f"(probs={host_stage.probs})")
        batcher = StagedBatcher(batcher, host_stage)

    if opts.wire_dtype == "int16" and opts.zero_speech_p > 0:
        print("WARNING: --wire_dtype int16 quantizes zero-speech samples "
              "(~1e-5 amplitude) to silence; prefer float32 here")
    cfg = vars(opts).copy()
    cfg.update(bpe=bpe, va_bpe=max(bpe // 10, 1),
               random_scale=str2bool(opts.random_scale),
               ckpt_continue=not str2bool(opts.no_continue))
    gan_cfg = json.loads(opts.gan_cfg) if opts.gan_cfg else None
    z_compat = compat_z_gan_cfg(opts, bpe)
    if z_compat is not None:
        gan_cfg = z_compat
    zs_bank, zs_snrs = build_zerospeech(opts, opts.chunk_size)
    tr = Trainer(fe_cfg, wk_cfg, cfg, stats=stats, dist_cfg=dist_cfg,
                 dist_assets=dist_assets, gan_cfg=gan_cfg, mesh=mesh,
                 zs_bank=zs_bank, zs_snrs=zs_snrs)
    tr.train_(batcher, va_batcher, resume=cfg["ckpt_continue"])


if __name__ == "__main__":
    opts = build_argparser().parse_args()
    if opts.net_cfg is None:
        raise ValueError("Please specify a net_cfg file")
    os.makedirs(opts.save_path, exist_ok=True)
    with open(os.path.join(opts.save_path, "train.opts"), "w") as f:
        f.write(json.dumps(vars(opts), indent=2))
    train(opts)
