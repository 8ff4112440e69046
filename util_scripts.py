"""Utility CLI — the reference's util_scripts/ capabilities:

  forward-chunk  — chunked streaming encode of arbitrary-length wavs with
                   a frozen encoder (util_scripts/forward_chunk.py)
  eval-ckpts     — sweep saved FE_e*.npz checkpoints against a validation
                   set, loss per checkpoint (util_scripts/eval_ckpts.py)
  clusterize     — KMeans over frame embeddings
                   (util_scripts/clusterize_frontend.py)
  make-fbanks    — dump fbank features for a wav list
                   (util_scripts/make_fbanks.py)
  export-torch   — export our encoder checkpoint as a torch state dict
                   (interop with reference downstream tooling)
"""

import argparse
import glob
import json
import os
import re

import numpy as np


def _encode_wav_list(opts, encode_fn):
    """Shared --wav_list batch loop: one .npy per list entry under
    --out_dir, PRESERVING each entry's relative path (basenames alone
    would silently clobber spk1/utt.wav vs spk2/utt.wav)."""
    out_dir = opts.out_dir or "."
    with open(opts.wav_list) as f:
        files = [ln.strip() for ln in f if ln.strip()]
    for rel in files:
        key = os.path.splitext(rel)[0].lstrip(os.sep)
        out_file = os.path.join(out_dir, key + ".npy")
        os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
        encode_fn(os.path.join(opts.files_root or "", rel), out_file)


def forward_chunk(opts):
    import jax
    import jax.numpy as jnp
    # feature extraction runs at full precision: the TPU default
    # bf16-ish convs add O(1e-2) noise that differs between blocked
    # (streaming) and full-sequence evaluation and breaks the torch
    # parity contract; at 'highest' streaming==offline to ~2e-7
    # (measured on a real chip)
    jax.config.update("jax_default_matmul_precision", "highest")
    if not getattr(opts, "wav_list", None) and not (
            getattr(opts, "in_wav", None) and
            getattr(opts, "out_file", None)):
        raise SystemExit(
            "forward-chunk needs --in_wav + --out_file, or --wav_list")
    from pase_tpu.frontend import wf_builder
    from pase_tpu.data.io import read_wav
    enc = wf_builder(opts.fe_cfg)
    if opts.fe_ckpt:
        enc.load_pretrained(opts.fe_ckpt, load_last=True)
    else:
        enc.init()
    chunk = opts.chunk_size

    def encode_one(in_wav, out_file):
        wav, sr = read_wav(in_wav)
        feats = []
        if getattr(opts, "time_shard", False):
            # sequence parallelism: the whole utterance forwarded ONCE
            # with the time axis sharded over every device
            # (parallel/sp.py); numerically equal to the offline forward
            from pase_tpu.parallel.mesh import get_mesh
            from pase_tpu.parallel.sp import encode_time_sharded
            mesh = get_mesh()
            D = mesh.shape["data"]
            # zero-pad up to the shard grid (reference forward_chunk
            # tail semantics) and trim frames back, so the frame count
            # matches the non-sharded path for any length
            n = -(-len(wav) // (D * 160)) * (D * 160)
            piece = np.pad(wav.astype(np.float32), (0, n - len(wav)))
            y = np.asarray(jax.device_get(encode_time_sharded(
                enc, piece[None], mesh)))
            out = np.transpose(y[0][:len(wav) // 160])    # [emb, F]
            np.save(out_file, out)
            print(f"{in_wav}: {out.shape} -> {out_file} "
                  f"(time-sharded over {D} devices)")
            return
        if getattr(opts, "streaming", False):
            # stateful exact-online encode: identical frames to one full
            # forward, O(chunk) memory (pase_tpu/streaming.py)
            from pase_tpu.streaming import StreamingEncoder
            st = StreamingEncoder(enc)
            for beg in range(0, len(wav), chunk):
                y = st.push(wav[None, beg:beg + chunk])
                if y is not None:
                    feats.append(np.asarray(y)[0])
            y = st.flush()
            if y is not None:
                feats.append(np.asarray(y)[0])
        else:
            # reference semantics: independent windows (zero-padded
            # tail), boundary frames see reflect pads
            # (util_scripts/forward_chunk.py)
            for beg in range(0, len(wav), chunk):
                piece = wav[beg:beg + chunk]
                if len(piece) < chunk:
                    piece = np.pad(piece, (0, chunk - len(piece)))
                y = np.asarray(enc(piece[None, None, :]))[0]   # [D, F]
                feats.append(y)
        out = np.concatenate(feats, axis=1)[:, :len(wav) // 160]
        np.save(out_file, out)
        print(f"{in_wav}: {out.shape} -> {out_file}")

    if getattr(opts, "wav_list", None):
        # batch mode (the reference forward_chunk consumes file lists,
        # util_scripts/forward_chunk.py:50-58): same encode-mode flags,
        # ONE encoder build for the whole list
        _encode_wav_list(opts, encode_one)
        return
    encode_one(opts.in_wav, opts.out_file)


def export_jax(opts):
    """AOT-export the frozen encoder as a StableHLO serving artifact
    (pase_tpu/serving.py): per-bucket exported functions + shared
    params.npz + meta.json; serve-encode (or any jax-only host) loads
    it with no model code."""
    from pase_tpu.frontend import wf_builder
    from pase_tpu.serving import export_encoder
    enc = wf_builder(opts.fe_cfg)
    if opts.fe_ckpt:
        enc.load_pretrained(opts.fe_ckpt, load_last=True)
    else:
        enc.init()
    chunk_sizes = [int(t) for t in opts.chunk_sizes.split(",") if t]
    precision = None if opts.precision in ("default", "none") \
        else opts.precision
    export_encoder(enc, opts.out_dir, chunk_sizes=chunk_sizes,
                   platforms=tuple(opts.platforms.split(",")),
                   precision=precision,
                   weights_dtype=getattr(opts, "weights_dtype", None))
    n = len(glob.glob(os.path.join(opts.out_dir, "encoder_T*.jaxexp")))
    print(f"exported {n} bucket(s) {chunk_sizes} for "
          f"{opts.platforms} -> {opts.out_dir}")
    if getattr(opts, "streaming_chunk", None):
        from pase_tpu.serving import export_streaming_encoder
        export_streaming_encoder(
            enc, opts.out_dir, chunk=int(opts.streaming_chunk),
            platforms=tuple(opts.platforms.split(",")),
            precision=precision,
            weights_dtype=getattr(opts, "weights_dtype", None))
        print(f"exported streaming prime/step/flush graphs "
              f"(chunk {opts.streaming_chunk}) -> {opts.out_dir}")


def serve_encode(opts):
    """Encode wav(s) with an export-jax artifact (no model code/cfg):
    same [emb, F] .npy contract (and --wav_list batch mode) as
    forward-chunk."""
    from pase_tpu.serving import ServingEncoder, ServingStreamingEncoder
    from pase_tpu.data.io import read_wav
    if not getattr(opts, "wav_list", None) and not (
            getattr(opts, "in_wav", None) and
            getattr(opts, "out_file", None)):
        raise SystemExit(
            "serve-encode needs --in_wav + --out_file, or --wav_list")
    if getattr(opts, "streaming", False):
        # online path: prime/step/flush graphs, state carried between
        # chunks; zero-padded tail trimmed to len//hop (the same
        # pad-and-trim window contract as the offline bucket path)
        if getattr(opts, "batch_size", 1) > 1:
            raise SystemExit("--streaming does not batch a wav list; "
                             "stream each file (batch_size 1)")
        srv = ServingStreamingEncoder(opts.export_dir)
        hop = int(srv.meta["hop"])

        def one(in_wav, out_file):
            wav, sr = read_wav(in_wav)
            c = srv.chunk
            pad = (-len(wav)) % c
            padded = np.pad(wav, (0, pad)) if pad else wav
            srv.reset()
            ys = [srv.push(padded[i:i + c])
                  for i in range(0, len(padded), c)] + [srv.flush()]
            out = np.concatenate(ys, axis=2)[0][:, :len(wav) // hop]
            np.save(out_file, out)
            print(f"{in_wav}: {out.shape} -> {out_file} "
                  f"(streaming chunk {c})")
    else:
        srv = ServingEncoder(opts.export_dir)

        def one(in_wav, out_file):
            wav, sr = read_wav(in_wav)
            out = srv.encode(wav)
            np.save(out_file, out)
            print(f"{in_wav}: {out.shape} -> {out_file} "
                  f"(buckets {srv.buckets})")

    if getattr(opts, "wav_list", None):
        if getattr(opts, "batch_size", 1) > 1:
            # server-side batching: same-bucket utterances go through
            # one exported call (ServingEncoder.encode_batch)
            out_dir = opts.out_dir or "."
            with open(opts.wav_list) as f:
                files = [ln.strip() for ln in f if ln.strip()]
            bs = opts.batch_size
            for beg in range(0, len(files), bs):
                chunk_files = files[beg:beg + bs]
                wavs = [read_wav(os.path.join(opts.files_root or "",
                                              rel))[0]
                        for rel in chunk_files]
                outs = srv.encode_batch(wavs)
                for rel, out in zip(chunk_files, outs):
                    key = os.path.splitext(rel)[0].lstrip(os.sep)
                    out_file = os.path.join(out_dir, key + ".npy")
                    os.makedirs(os.path.dirname(out_file) or ".",
                                exist_ok=True)
                    np.save(out_file, out)
                    print(f"{rel}: {out.shape} -> {out_file}")
            return
        _encode_wav_list(opts, one)
        return
    one(opts.in_wav, opts.out_file)


def eval_ckpts(opts):
    import jax
    import jax.numpy as jnp
    from pase_tpu.trainer import Trainer
    from pase_tpu.data.dataset import (LibriSpeechTupleDataset, ChunkBatcher,
                                       SyntheticChunkBatcher)
    from pase_tpu.checkpoint import load_variables
    with open(opts.fe_cfg) as f:
        fe_cfg = json.load(f)
    with open(opts.net_cfg) as f:
        wk_cfg = json.load(f)
    cfg = dict(backprop_mode="base", hop=160, bpe=opts.n_batches, epoch=1,
               batch_size=opts.batch_size, chunk_size=opts.chunk_size,
               log_freq=100, save_path=opts.save_path or "/tmp/eval_ckpts")
    tr = Trainer(fe_cfg, wk_cfg, cfg)
    state = tr.init_state(0)
    if opts.synthetic:
        batcher = SyntheticChunkBatcher(opts.batch_size, opts.chunk_size)
    else:
        ds = LibriSpeechTupleDataset(opts.data_root, opts.data_cfg, "valid")
        batcher = ChunkBatcher(ds, opts.batch_size, opts.chunk_size)
    results = {}
    for ck in sorted(glob.glob(os.path.join(opts.ckpt_dir, "FE_e*.npz"))):
        variables, meta = load_variables(ck)
        from flax.core import unfreeze
        params = unfreeze(state.params)
        params["frontend"] = variables["params"]
        bs = unfreeze(state.batch_stats)
        if "batch_stats" in variables and variables["batch_stats"]:
            bs["frontend"] = variables["batch_stats"]
        st = state._replace(params=params, batch_stats=bs)
        m = tr.evaluate(st, batcher, n_batches=opts.n_batches)
        results[os.path.basename(ck)] = m["total"]
        print(f"{ck}: total loss {m['total']:.4f}")
    with open(opts.out_file, "w") as f:
        json.dump(results, f, indent=2)


def kmeans(x, k, iters=50, seed=0):
    """Plain device KMeans (clusterize_frontend.py replacement)."""
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(seed)
    idx = jax.random.choice(key, x.shape[0], (k,), replace=False)
    centers = x[idx]

    @jax.jit
    def step(centers):
        d = (jnp.sum(x ** 2, 1)[:, None] + jnp.sum(centers ** 2, 1)[None]
             - 2 * x @ centers.T)
        assign = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(assign, k)
        counts = onehot.sum(0)
        new = (onehot.T @ x) / jnp.maximum(counts[:, None], 1)
        new = jnp.where(counts[:, None] > 0, new, centers)
        return new, assign

    for _ in range(iters):
        centers, assign = step(centers)
    return np.asarray(centers), np.asarray(assign)


def clusterize(opts):
    import jax.numpy as jnp
    from pase_tpu.probes.extract import FeatureExtractor
    ex = FeatureExtractor(opts.fe_cfg, opts.fe_ckpt)
    feats = []
    with open(opts.wav_list) as f:
        paths = [l.split()[0] for l in f if l.strip()]
    for p in paths[:opts.max_utts or None]:
        feats.append(ex.extract_file(os.path.join(opts.data_root, p)))
    x = jnp.asarray(np.concatenate(feats, axis=0))
    centers, assign = kmeans(x, opts.k)
    np.savez(opts.out_file, centers=centers, assignments=assign)
    print(f"KMeans k={opts.k}: inertia counts "
          f"{np.bincount(assign, minlength=opts.k)}")


def make_fbanks(opts):
    import jax.numpy as jnp
    from pase_tpu.ops.features import fbanks
    from pase_tpu.data.io import read_wav
    os.makedirs(opts.out_dir, exist_ok=True)
    with open(opts.wav_list) as f:
        paths = [l.split()[0] for l in f if l.strip()]
    for p in paths:
        wav, _ = read_wav(os.path.join(opts.data_root, p))
        y = np.asarray(fbanks(jnp.asarray(wav[None]),
                              n_filters=opts.n_filters))[0]
        np.save(os.path.join(opts.out_dir,
                             os.path.splitext(os.path.basename(p))[0]
                             + ".npy"), y)
    print(f"Wrote {len(paths)} fbank files to {opts.out_dir}")


def precompute_feats(opts):
    """Precompute every regression worker's target features over whole
    utterances into a .feats.npz cache for CachedTargetBatcher
    (precompute_aco_data.py:1-120 + CachedCompose transforms.py:253-292
    equivalents; see pase_tpu/data/cache.py)."""
    import json as _json

    from pase_tpu.data.cache import precompute_features
    from pase_tpu.model import parse_workers_cfg
    with open(opts.net_cfg) as f:
        meta = parse_workers_cfg(_json.load(f))
    if opts.wav_list:
        with open(opts.wav_list) as f:
            files = [l.split()[0] for l in f if l.strip()]
    else:
        from pase_tpu.data.io import load_data_cfg
        cfg = load_data_cfg(opts.data_cfg)
        files = [d["filename"] for split in ("train", "valid")
                 if split in cfg for d in cfg[split]["data"]]
    n = precompute_features(opts.data_root, files, meta, opts.out_dir,
                            hop=opts.hop, overwrite=opts.overwrite)
    print(f"Cached features for {n} new / {len(files)} listed utts "
          f"in {opts.out_dir}")


def profile_step(opts):
    """Device-synced train-step decomposition (pase_tpu/profiling.py):
    prepare vs model+opt cost, steps/s, audio-s/s. One JSON line.

    By default the prepare stage includes the bench.py distortion stack
    (synthetic assets) AND ZNorm so the decomposition measures the FULL
    pipeline; --bare drops both (model+targets only)."""
    import json as _json

    import jax.numpy as jnp

    from pase_tpu.profiling import profile_train_step
    from pase_tpu.trainer import Trainer
    with open(opts.net_cfg) as f:
        wk = json.load(f)
    with open(opts.fe_cfg) as f:
        fe = json.load(f)
    cfg = dict(backprop_mode="base", hop=160, bpe=1, epoch=1,
               batch_size=opts.batch_size, chunk_size=opts.chunk_size,
               log_freq=100, save_path="/tmp/profile_step",
               compute_dtype=opts.compute_dtype)
    dcfg = assets = stats = None
    if not opts.bare:
        from pase_tpu.data.dataset import SyntheticChunkBatcher
        from pase_tpu.data.distortions import (DistortionConfig,
                                               DistortionAssets)
        from pase_tpu.data.pipeline import compute_stats
        from pase_tpu.model import parse_workers_cfg
        T = opts.chunk_size
        rng = np.random.RandomState(0)
        ir = np.zeros((4, 8000), np.float32)
        ir[:, 0] = 1.0
        ir[0, 1000] = 0.4
        ir[1, 2000] = 0.2
        assets = DistortionAssets(
            ir_bank=jnp.asarray(ir), ir_pmax=jnp.asarray([0, 0, 0, 0]),
            noise_bank=jnp.asarray(
                rng.randn(8, T * 2).astype(np.float32) * .1),
            overlap_bank=jnp.asarray(
                rng.randn(4, T * 2).astype(np.float32) * .1))
        dcfg = DistortionConfig(reverb_p=.5, overlap_p=.1, noises_p=.4,
                                clip_p=.2, chop_p=.2)
        stats = compute_stats(SyntheticChunkBatcher(8, T, seed=11),
                              parse_workers_cfg(wk), max_batches=2)
    tr = Trainer(fe, wk, cfg, stats=stats, dist_cfg=dcfg,
                 dist_assets=assets)
    out = profile_train_step(tr, opts.batch_size, opts.chunk_size,
                             n_meas=opts.n_meas)
    print(_json.dumps(out))


def vadproc(opts):
    """Energy-VAD segmentation of a wav list: writes per-utterance speech
    region files `beg end` in samples (util_scripts/vadproc.py
    replacement; WebRTC VAD -> frame-energy VAD)."""
    from pase_tpu.data.io import read_wav
    os.makedirs(opts.out_dir, exist_ok=True)
    with open(opts.wav_list) as f:
        paths = [l.split()[0] for l in f if l.strip()]
    win = 160
    for p in paths:
        wav, _ = read_wav(os.path.join(opts.data_root, p))
        n = len(wav) // win
        fe = 10 * np.log10(
            np.mean(wav[:n * win].reshape(n, win) ** 2, axis=1) + 1e-12)
        thresh = max(fe.max() + opts.thresh_db, -55.0)
        speech = fe > thresh
        regions = []
        beg = None
        for i, s in enumerate(speech):
            if s and beg is None:
                beg = i
            elif not s and beg is not None:
                regions.append((beg * win, i * win))
                beg = None
        if beg is not None:
            regions.append((beg * win, n * win))
        out = os.path.join(opts.out_dir,
                           os.path.splitext(os.path.basename(p))[0] + ".vad")
        with open(out, "w") as f:
            for b, e in regions:
                f.write(f"{b} {e}\n")
    print(f"Wrote VAD regions for {len(paths)} files to {opts.out_dir}")


def make_contaminated(opts):
    """Apply the on-device distortion stack offline to a wav list
    (util_scripts/make_contaminated_trainset.py replacement)."""
    import json as _json
    import jax
    import jax.numpy as jnp
    from pase_tpu.data.io import read_wav, write_wav
    from pase_tpu.data.distortions import apply_distortions, config_from_json
    import importlib
    train_mod = importlib.import_module("train")
    with open(opts.dtrans_cfg) as f:
        dj = _json.load(f)
    cfg = config_from_json(dj)

    class _O:
        dtrans_cfg = [opts.dtrans_cfg]
    _, assets = train_mod.build_distortions(_O(), opts.chunk_size)
    os.makedirs(opts.out_dir, exist_ok=True)
    with open(opts.wav_list) as f:
        paths = [l.split()[0] for l in f if l.strip()]
    key = jax.random.PRNGKey(opts.seed)
    for p in paths:
        wav, sr = read_wav(os.path.join(opts.data_root, p))
        t = (len(wav) // 160) * 160
        key, sub = jax.random.split(key)
        y, _ = apply_distortions(jnp.asarray(wav[None, :t]), sub, cfg,
                                 assets)
        write_wav(os.path.join(opts.out_dir, os.path.basename(p)),
                  np.asarray(y)[0], sr)
    print(f"Contaminated {len(paths)} files -> {opts.out_dir}")


def select_ckpt(opts):
    """Pick the best checkpoint from probe metric JSONs
    (spk_id/select_supervised_ckpt.py replacement)."""
    best, best_v = None, None
    for f in glob.glob(opts.metrics_glob):
        with open(f) as fh:
            m = json.load(fh)
        v = m.get(opts.metric)
        if v is None:
            continue
        better = (best_v is None or
                  (v > best_v if opts.maximize else v < best_v))
        if better:
            best, best_v = f, v
    print(json.dumps({"best": best, opts.metric: best_v}))


def project_features(opts):
    """PCA projection of frame embeddings to n_components for inspection
    (util_scripts/project_features.py replacement)."""
    import jax.numpy as jnp
    from pase_tpu.probes.extract import FeatureExtractor
    ex = FeatureExtractor(opts.fe_cfg, opts.fe_ckpt)
    with open(opts.wav_list) as f:
        paths = [l.split()[0] for l in f if l.strip()]
    feats = [ex.extract_file(os.path.join(opts.data_root, p))
             for p in paths[:opts.max_utts or None]]
    x = np.concatenate(feats, axis=0)
    x = x - x.mean(axis=0)
    cov = jnp.asarray(x.T @ x / len(x))
    w, v = np.linalg.eigh(np.asarray(cov))
    proj = x @ np.asarray(v[:, ::-1][:, :opts.n_components])
    np.save(opts.out_file, proj)
    ev = w[::-1][:opts.n_components] / w.sum()
    print(f"projected {x.shape} -> {proj.shape}; explained var "
          f"{ev.round(3).tolist()}")


def encode_codec2(opts):
    """Pre-encode a wav directory through the codec2 round trip — the
    distortion-cache builder (util_scripts/encode_codec2.py). Degrades to
    identity (with a warning) when codec2 tooling is absent."""
    import glob
    from concurrent.futures import ThreadPoolExecutor
    from pase_tpu.data.host_distortions import Codec2RoundTrip
    from pase_tpu.data.io import read_wav, write_wav

    c2 = Codec2RoundTrip(kbps=opts.kbps)
    wavs = sorted(glob.glob(os.path.join(opts.input_dir, "*.wav")))
    os.makedirs(opts.output_dir, exist_ok=True)

    def one(path):
        x, sr = read_wav(path)
        y = c2(x.astype(np.float32))
        write_wav(os.path.join(opts.output_dir, os.path.basename(path)),
                  y, sr)

    with ThreadPoolExecutor(max_workers=opts.num_workers) as pool:
        list(pool.map(one, wavs))
    print(f"encoded {len(wavs)} wavs -> {opts.output_dir}"
          + ("" if c2.available else " (identity: codec2 unavailable)"))


def prosodic_eval(opts):
    """Prosody-worker regression quality on a wav list
    (util_scripts/prosodic_eval.py): forward encoder + prosody head,
    z-denorm, report logF0/energy/zcr RMSE and U/V accuracy against the
    on-device ground-truth prosody targets. Column order [lf0, uv, egy,
    zcr] (ops/features.prosody)."""
    import json as _json
    import jax
    import jax.numpy as jnp
    from pase_tpu.model import build_pase
    from pase_tpu.checkpoint import load_variables
    from pase_tpu.ops.features import prosody
    from pase_tpu.data.io import read_wav
    from pase_tpu.data.pipeline import load_stats_pkl

    with open(opts.net_cfg) as f:
        wk_cfg = json.load(f)
    model, meta = build_pase(json.load(open(opts.fe_cfg)), wk_cfg)
    tree, _ = load_variables(opts.ckpt)
    variables = {"params": tree["params"],
                 "batch_stats": tree.get("batch_stats", {})}
    stats = load_stats_pkl(opts.stats) if opts.stats else None

    idx = [e["name"] for e in meta["regr"]].index("prosody")

    def fwd(wav):
        h = model.apply(variables, wav,
                        method=lambda m, w: m.frontend(w, train=False))
        return model.apply(
            variables, h,
            method=lambda m, hh: m.regression_workers[idx](
                hh, 1.0, train=False))

    rmse = {"lf0": [], "egy": [], "zcr": []}
    uv_acc = []
    with open(opts.wav_list) as f:
        paths = [l.split()[0] for l in f if l.strip()][:opts.max_utts]
    for p in paths:
        wav, _ = read_wav(os.path.join(opts.data_root, p))
        t = (len(wav) // 160) * 160
        x = jnp.asarray(wav[None, :t], jnp.float32)
        pred = np.asarray(fwd(x))[0]          # [F, D*r] d-major r-framed
        truth = np.asarray(prosody(x))[0]     # [F, D]
        r = int(meta["regr"][idx].get("r", 1) or 1)
        if r > 1:
            # multi-frame head (ContextualizedLoss layout: channel
            # c = d*r + j) — evaluate the center-offset prediction
            pred = pred.reshape(len(pred), -1, r)[..., r // 2]
        if stats and "prosody" in stats:
            mean = np.asarray(stats["prosody"]["mean"]).reshape(-1)
            std = np.asarray(stats["prosody"]["std"]).reshape(-1)
            pred = pred * std[:pred.shape[1]] + mean[:pred.shape[1]]
        n = min(len(pred), len(truth))
        pred, truth = pred[:n], truth[:n]
        for col, name in ((0, "lf0"), (2, "egy"), (3, "zcr")):
            rmse[name].append(
                float(np.sqrt(np.mean((pred[:, col] - truth[:, col]) ** 2))))
        uv_acc.append(float((np.round(np.clip(pred[:, 1], 0, 1))
                             == truth[:, 1]).mean()))
    res = {f"{k}_rmse": float(np.mean(v)) for k, v in rmse.items()}
    res["uv_acc"] = float(np.mean(uv_acc))
    res["n_utts"] = len(paths)
    print(_json.dumps(res))
    if opts.out_file:
        with open(opts.out_file, "w") as f:
            _json.dump(res, f)
    return res


def export_torch(opts):
    """Export a native FE_e*.npz encoder ckpt to a torch state dict with
    reference key names, so reference-side tooling can consume it."""
    import torch
    from pase_tpu.checkpoint import load_variables
    from flax.traverse_util import flatten_dict
    from flax.core import unfreeze
    variables, meta = load_variables(opts.in_ckpt)
    flat = flatten_dict(unfreeze(variables), sep=".")
    out = {}
    for k, v in flat.items():
        arr = np.asarray(v)
        tk = (k.replace("params.", "").replace("batch_stats.", "")
              .replace("blocks_", "blocks.").replace("denseskips_",
                                                     "denseskips."))
        tk = tk.replace("layers_0_linear", "layers.0.linear")
        # BiRNN (lstm/gru rnn_type) params carry torch's layout already:
        # rnn.l<k>_{fw,bw}_{w,b}_{ih,hh} -> rnn.{weight,bias}_{ih,hh}_l<k>[_reverse]
        m = re.search(r"\.l(\d+)_(fw|bw)_([wb])_(ih|hh)$", tk)
        if m:
            lnum, d, kind, side = m.groups()
            suffix = "_reverse" if d == "bw" else ""
            out[tk[:m.start()] +
                f".{'weight' if kind == 'w' else 'bias'}_{side}_l{lnum}"
                f"{suffix}"] = torch.tensor(arr)
            continue
        if tk.endswith(".kernel"):
            base = tk[:-7]
            if arr.ndim == 3:
                arr = arr.transpose(2, 1, 0)
            elif arr.ndim == 2:
                arr = arr.T
            tk = base + ".weight"
        elif tk.endswith(".low_hz"):
            tk = tk[:-7] + ".low_hz_"
        elif tk.endswith(".band_hz"):
            tk = tk[:-8] + ".band_hz_"
        elif tk.endswith(".mean"):
            tk = tk[:-5] + ".running_mean"
        elif tk.endswith(".var"):
            tk = tk[:-4] + ".running_var"
        out[tk] = torch.tensor(arr)
    # torch BatchNorm state dicts carry a num_batches_tracked buffer per
    # norm; the reference's load_pretrained_ckpt REQUIRES the filtered
    # key count to equal the model's (modules.py:290-291), so emit them
    # (zeros — unused numerically: torch momentum defaults to 0.1)
    for tk in [k for k in out if k.endswith(".running_mean")]:
        out[tk[:-13] + ".num_batches_tracked"] = torch.tensor(
            0, dtype=torch.long)
    torch.save(out, opts.out_ckpt)
    print(f"Exported {len(out)} tensors -> {opts.out_ckpt}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    fc = sub.add_parser("forward-chunk")
    fc.add_argument("--fe_cfg", required=True)
    fc.add_argument("--fe_ckpt", default=None)
    fc.add_argument("--in_wav", default=None)
    fc.add_argument("--out_file", default=None)
    fc.add_argument("--wav_list", default=None,
                    help="batch mode: file of wav paths (one per line); "
                         "writes <out_dir>/<basename>.npy per wav "
                         "(reference forward_chunk list semantics)")
    fc.add_argument("--files_root", default="",
                    help="prefix joined to each --wav_list entry")
    fc.add_argument("--out_dir", default=".",
                    help="output dir for --wav_list mode")
    fc.add_argument("--chunk_size", type=int, default=160000)
    fc.add_argument("--streaming", action="store_true", default=False,
                    help="stateful exact-online encode (bit-equal to one "
                         "full forward) instead of independent windows")
    fc.add_argument("--time_shard", action="store_true", default=False,
                    help="sequence parallelism: one forward with the "
                         "time axis sharded over all devices "
                         "(parallel/sp.py). Equals the offline forward; "
                         "lengths off the n_devices*160 grid get a "
                         "zero-padded tail (reference forward_chunk "
                         "semantics) and frames trimmed to len//160")

    ec = sub.add_parser("eval-ckpts")
    ec.add_argument("--fe_cfg", required=True)
    ec.add_argument("--net_cfg", required=True)
    ec.add_argument("--ckpt_dir", required=True)
    ec.add_argument("--data_root", default=None)
    ec.add_argument("--data_cfg", default=None)
    ec.add_argument("--out_file", default="ckpt_losses.json")
    ec.add_argument("--batch_size", type=int, default=16)
    ec.add_argument("--chunk_size", type=int, default=16000)
    ec.add_argument("--n_batches", type=int, default=10)
    ec.add_argument("--save_path", default=None)
    ec.add_argument("--synthetic", action="store_true")

    cl = sub.add_parser("clusterize")
    cl.add_argument("--fe_cfg", required=True)
    cl.add_argument("--fe_ckpt", default=None)
    cl.add_argument("--wav_list", required=True)
    cl.add_argument("--data_root", default="")
    cl.add_argument("--k", type=int, default=128)
    cl.add_argument("--max_utts", type=int, default=None)
    cl.add_argument("--out_file", default="clusters.npz")

    mf = sub.add_parser("make-fbanks")
    mf.add_argument("--wav_list", required=True)
    mf.add_argument("--data_root", default="")
    mf.add_argument("--out_dir", required=True)
    mf.add_argument("--n_filters", type=int, default=40)

    et = sub.add_parser("export-torch")
    et.add_argument("--in_ckpt", required=True)
    et.add_argument("--out_ckpt", required=True)

    pc = sub.add_parser("precompute-feats")
    pc.add_argument("--net_cfg", required=True)
    pc.add_argument("--data_root", required=True)
    pc.add_argument("--wav_list", default=None)
    pc.add_argument("--data_cfg", default=None,
                    help="alternative to --wav_list: cache every "
                         "train+valid utterance of a data cfg")
    pc.add_argument("--out_dir", required=True)
    pc.add_argument("--hop", type=int, default=160)
    pc.add_argument("--overwrite", action="store_true", default=False)

    ps = sub.add_parser("profile-step")
    ps.add_argument("--fe_cfg", required=True)
    ps.add_argument("--net_cfg", required=True)
    ps.add_argument("--batch_size", type=int, default=32)
    ps.add_argument("--chunk_size", type=int, default=32000)
    ps.add_argument("--compute_dtype", default=None)
    ps.add_argument("--n_meas", type=int, default=20)
    ps.add_argument("--bare", action="store_true", default=False,
                    help="skip distortions + ZNorm (model+targets only)")

    vp = sub.add_parser("vadproc")
    vp.add_argument("--wav_list", required=True)
    vp.add_argument("--data_root", default="")
    vp.add_argument("--out_dir", required=True)
    vp.add_argument("--thresh_db", type=float, default=-40.0)

    mc = sub.add_parser("make-contaminated")
    mc.add_argument("--wav_list", required=True)
    mc.add_argument("--data_root", default="")
    mc.add_argument("--out_dir", required=True)
    mc.add_argument("--dtrans_cfg", required=True)
    mc.add_argument("--chunk_size", type=int, default=32000)
    mc.add_argument("--seed", type=int, default=0)

    sc = sub.add_parser("select-ckpt")
    sc.add_argument("--metrics_glob", required=True)
    sc.add_argument("--metric", default="test_sentence_acc")
    sc.add_argument("--maximize", action="store_true", default=True)

    pf = sub.add_parser("project-features")
    pf.add_argument("--fe_cfg", required=True)
    pf.add_argument("--fe_ckpt", default=None)
    pf.add_argument("--wav_list", required=True)
    pf.add_argument("--data_root", default="")
    pf.add_argument("--n_components", type=int, default=2)
    pf.add_argument("--max_utts", type=int, default=None)
    pf.add_argument("--out_file", default="projected.npy")

    ec = sub.add_parser("encode-codec2")
    ec.add_argument("input_dir")
    ec.add_argument("output_dir")
    ec.add_argument("--kbps", type=int, default=1600)
    ec.add_argument("--num_workers", type=int, default=8)

    ej = sub.add_parser("export-jax")
    ej.add_argument("--fe_cfg", required=True)
    ej.add_argument("--fe_ckpt", default=None)
    ej.add_argument("--out_dir", required=True)
    ej.add_argument("--chunk_sizes", default="8000,16000,32000,64000",
                    help="comma-separated static time buckets (samples)")
    ej.add_argument("--platforms", default="cpu,tpu")
    ej.add_argument("--precision", default="highest",
                    help="'highest' (extraction contract) or 'default' "
                         "(backend matmul default — faster on TPU)")
    ej.add_argument("--weights_dtype", default=None,
                    help="quantize weights, e.g. bfloat16 (halves "
                         "serving-time weight HBM traffic; compute "
                         "upcasts to f32 in-graph)")
    ej.add_argument("--streaming_chunk", type=int, default=None,
                    help="also export the EXACT online encoder as "
                         "prime/step/flush graphs with explicit FIFO "
                         "state, at this fixed chunk size (samples)")

    se = sub.add_parser("serve-encode")
    se.add_argument("--export_dir", required=True)
    se.add_argument("--in_wav", default=None)
    se.add_argument("--out_file", default=None)
    se.add_argument("--wav_list", default=None,
                    help="batch mode: file of wav paths (one per line); "
                         "writes <out_dir>/<basename>.npy per wav")
    se.add_argument("--files_root", default="")
    se.add_argument("--out_dir", default=".")
    se.add_argument("--batch_size", type=int, default=1,
                    help=">1 batches same-bucket list entries through "
                         "one exported call (server-side throughput)")
    se.add_argument("--streaming", action="store_true",
                    help="drive the streaming (prime/step/flush) "
                         "artifact instead of the offline buckets")

    pe = sub.add_parser("prosodic-eval")
    pe.add_argument("--fe_cfg", required=True)
    pe.add_argument("--net_cfg", required=True)
    pe.add_argument("--ckpt", required=True,
                    help="full PASE checkpoint (weights_PASE-*.npz)")
    pe.add_argument("--wav_list", required=True)
    pe.add_argument("--data_root", default="")
    pe.add_argument("--stats", default=None)
    pe.add_argument("--max_utts", type=int, default=None)
    pe.add_argument("--out_file", default=None)

    opts = p.parse_args()
    {"forward-chunk": forward_chunk, "eval-ckpts": eval_ckpts,
     "clusterize": clusterize, "make-fbanks": make_fbanks,
     "export-torch": export_torch, "vadproc": vadproc,
     "precompute-feats": precompute_feats, "profile-step": profile_step,
     "make-contaminated": make_contaminated, "select-ckpt": select_ckpt,
     "project-features": project_features, "encode-codec2": encode_codec2,
     "prosodic-eval": prosodic_eval, "export-jax": export_jax,
     "serve-encode": serve_encode}[opts.cmd](opts)


if __name__ == "__main__":
    main()
