"""Downstream probe CLI — the fast-probe entrypoints of the reference
(spk_id/run_minivox_fast.py, emorec/run_IEMOCAP_fast.py,
ASR/run_TIMIT_fast.py) unified:

  python run_probe.py utt --fe_cfg cfg/frontend/PASE+.cfg \\
      --fe_ckpt FE_e199.ckpt --train_list tr.lst --test_list te.lst \\
      --data_root wavs/           # speaker-ID / language-ID / emotion

  python run_probe.py frames --num_classes 48 ...   # TIMIT FER
  python run_probe.py knn ...                        # KNN on embeddings

plus the FULL decoding pipeline (ASR/run_TIMIT_full_decoding.py):

  python run_probe.py timit-full --fe_cfg ... --fe_ckpt ... \\
      --train_list tr.lst --test_list te.lst --data_root TIMIT/ \\
      --mlp_cfg cfg/probes/MLP_PASE.cfg --dec_cfg cfg/probes/decoder.cfg \\
      --out_folder timit_exp      # trains MLP, writes post.ark + dec_cfg.ini,
                                  # runs decode_dnn.sh when Kaldi is present

List format: `wavpath label` (utt/knn) or `wavpath alifile`
(frames/timit-full).
"""

import argparse
import json
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["utt", "frames", "knn", "timit-full",
                                    "kfold"])
    p.add_argument("--folds", type=int, default=10)
    p.add_argument("--valid_p", type=float, default=0.1)
    p.add_argument("--fe_cfg", required=True)
    p.add_argument("--fe_ckpt", default=None)
    p.add_argument("--train_list", required=True)
    p.add_argument("--test_list", required=False, default=None,
                   help="required for all tasks except kfold")
    p.add_argument("--data_root", default="")
    p.add_argument("--mode", default="avg_concat")
    p.add_argument("--feature_type", default="pase",
                   help="pase | mfcc | fbank (classical baseline)")
    p.add_argument("--hidden", type=int, nargs="+", default=None,
                   help="MLP hidden sizes; default 256 for utt/frames, "
                        "linear classifier for kfold (pass sizes to "
                        "request an MLP)")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=0.1)
    p.add_argument("--batch_size", type=int, default=2048)
    p.add_argument("--num_classes", type=int, default=48)
    p.add_argument("--left", type=int, default=8)
    p.add_argument("--right", type=int, default=8)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max_utts", type=int, default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--mlp_cfg", default=None,
                   help="timit-full: MLP cfg JSON (ASR/cfg/MLP_PASE.cfg)")
    p.add_argument("--dec_cfg", default=None,
                   help="timit-full: decoder cfg JSON (ASR/cfg/decoder.cfg)")
    p.add_argument("--out_folder", default="timit_full_exp")
    p.add_argument("--platform", default="auto",
                   choices=["auto", "cpu", "tpu"],
                   help="force the jax backend; 'cpu' keeps an async "
                        "probe (AuxiliarSuperviser) off the training "
                        "chip, like the reference pinning probes to a "
                        "spare CUDA device")
    opts = p.parse_args()

    if opts.platform == "cpu":
        # must land before any jax backend init (the axon sitecustomize
        # pins the platform via jax config, so env JAX_PLATFORMS alone
        # is ignored); 'tpu' keeps whatever the site pins (the chip)
        import jax
        jax.config.update("jax_platforms", "cpu")

    from pase_tpu.probes import tasks

    if opts.task != "kfold" and not opts.test_list:
        p.error(f"task {opts.task} requires --test_list")

    if opts.task == "timit-full":
        from pase_tpu.probes.timit_decode import run_timit_full_decoding
        if not (opts.mlp_cfg and opts.dec_cfg):
            p.error("timit-full requires --mlp_cfg and --dec_cfg")
        metrics = run_timit_full_decoding(
            opts.fe_cfg, opts.fe_ckpt, opts.data_root, opts.train_list,
            opts.test_list, opts.out_folder, opts.mlp_cfg, opts.dec_cfg,
            max_utts=opts.max_utts, epochs=opts.epochs)
        print(json.dumps({k: v for k, v in metrics.items()
                          if isinstance(v, (int, float, str, type(None)))}))
        if opts.out:
            with open(opts.out, "w") as f:
                json.dump({k: v for k, v in metrics.items()
                           if isinstance(v, (int, float, str, type(None)))},
                          f)
        return

    if opts.task == "kfold":
        # class-stratified k-fold LinearClassifier suite (emorec recipe);
        # --train_list doubles as the single labeled list
        metrics = tasks.run_kfold_classification(
            opts.fe_cfg, opts.fe_ckpt, opts.train_list,
            data_root=opts.data_root, folds=opts.folds,
            valid_p=opts.valid_p, mode=opts.mode,
            hidden=tuple(opts.hidden) if opts.hidden else (),
            epochs=opts.epochs, lr=opts.lr, batch_size=opts.batch_size,
            seed=opts.seed, max_utts=opts.max_utts,
            feature_type=opts.feature_type)
    elif opts.task == "utt":
        metrics = tasks.run_utt_classification(
            opts.fe_cfg, opts.fe_ckpt, opts.train_list, opts.test_list,
            data_root=opts.data_root, mode=opts.mode,
            hidden=tuple(opts.hidden or [256]), epochs=opts.epochs,
            lr=opts.lr, batch_size=opts.batch_size, seed=opts.seed,
            max_utts=opts.max_utts, feature_type=opts.feature_type)
    elif opts.task == "frames":
        metrics = tasks.run_frame_classification(
            opts.fe_cfg, opts.fe_ckpt, opts.train_list, opts.test_list,
            data_root=opts.data_root, num_classes=opts.num_classes,
            left=opts.left, right=opts.right,
            hidden=tuple(opts.hidden or [256]),
            epochs=opts.epochs, lr=opts.lr, max_utts=opts.max_utts)
    else:
        metrics = tasks.run_knn_probe(
            opts.fe_cfg, opts.fe_ckpt, opts.train_list, opts.test_list,
            data_root=opts.data_root, mode=opts.mode, k=opts.k,
            max_utts=opts.max_utts)
    print(json.dumps(metrics))
    if opts.out:
        with open(opts.out, "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    main()
