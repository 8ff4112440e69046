"""TIMIT full ASR decoding pipeline on frozen PASE features.

Reproduces /root/reference/ASR/run_TIMIT_full_decoding.py end to end:

1. PASE feature extraction per utterance; either per-speaker mean
   normalization (avg_spk, lines 497-545) or 'avg_norm' encoder output;
2. context windowing (left/right from the MLP cfg);
3. frame alignments loaded and length-reconciled against the features
   (the 1/2/3-frame tolerance of lines 236-271);
4. state-prior counts from the concatenated min-normalized train labels
   (np.unique counts -> count.npy / ids.npy, lines 294-302);
5. MLP training with dev-error lr halving (probes.classifier);
6. Kaldi BINARY ark of log-posteriors minus log-priors
   (pout - log(counts/sum), lines 433-434, 552-558; format of
   ASR/data_io.py write_mat);
7. dec_cfg.ini ([decoding] section from the decoder cfg JSON, lines
   448-452) and the decode_dnn.sh command line (lines 561-566), run via
   subprocess when the Kaldi scripts exist — skipped gracefully (with
   the exact command printed) when they don't;
8. best-WER scan of the scoring output (ASR/best_wer.sh semantics).

The heavy lift (feature extraction + MLP) runs on device; only the HMM
lattice decoding remains external, exactly as in the reference.
"""

import json
import os
import struct
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

from pase_tpu.probes.extract import FeatureExtractor
from pase_tpu.probes.classifier import context_window, train_mlp_probe


# ---------------------------------------------------------------------------
# Kaldi binary ark IO (ASR/data_io.py write_mat/read_mat format)
# ---------------------------------------------------------------------------

def write_kaldi_mat(fd, mat: np.ndarray, key: str):
    """Append one float matrix to a binary Kaldi ark stream."""
    mat = np.ascontiguousarray(mat, dtype=np.float32)
    fd.write((key + " ").encode("latin1"))
    fd.write(b"\0B")
    fd.write(b"FM ")
    fd.write(b"\x04" + struct.pack("<i", mat.shape[0]))
    fd.write(b"\x04" + struct.pack("<i", mat.shape[1]))
    fd.write(mat.tobytes())


def read_kaldi_ark(path: str) -> Dict[str, np.ndarray]:
    """Read a binary float-matrix ark written by write_kaldi_mat."""
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as fd:
        while True:
            key = b""
            c = fd.read(1)
            if not c:
                break
            while c not in (b" ", b""):
                key += c
                c = fd.read(1)
            assert fd.read(2) == b"\0B", "not a binary kaldi ark"
            fmt = fd.read(3)
            assert fmt == b"FM ", fmt
            assert fd.read(1) == b"\x04"
            rows = struct.unpack("<i", fd.read(4))[0]
            assert fd.read(1) == b"\x04"
            cols = struct.unpack("<i", fd.read(4))[0]
            data = np.frombuffer(fd.read(rows * cols * 4), dtype=np.float32)
            out[key.decode("latin1")] = data.reshape(rows, cols).copy()
    return out


# ---------------------------------------------------------------------------
# pipeline pieces
# ---------------------------------------------------------------------------

def reconcile_lengths(feat: np.ndarray, lab: np.ndarray,
                      utt: str = "?") -> np.ndarray:
    """Trim the PASE features to the alignment length, tolerating the
    1..3 trailing-frame surplus of the reference (lines 236-271)."""
    diff = feat.shape[0] - lab.shape[0]
    if diff in (1, 2, 3):
        return feat[:-diff]
    if diff == 0:
        return feat
    raise ValueError(f"length error: {utt} feats {feat.shape[0]} vs "
                     f"alignment {lab.shape[0]}")


def compute_prior_counts(train_labels: List[np.ndarray],
                         out_folder: Optional[str] = None
                         ) -> Tuple[np.ndarray, np.ndarray]:
    """State-prior counts from concatenated, min-normalized train labels
    (lines 292-302). Saves count.npy/ids.npy when out_folder given."""
    lab_conc = np.concatenate(train_labels)
    lab_conc = lab_conc - lab_conc.min()
    unique, counts = np.unique(lab_conc, return_counts=True)
    if out_folder:
        np.save(os.path.join(out_folder, "count.npy"), counts)
        np.save(os.path.join(out_folder, "ids.npy"), unique)
    return unique, counts


def write_dec_cfg_ini(dec_cfg: Dict[str, str], path: str):
    """decoder cfg JSON -> dec_cfg.ini [decoding] section (448-452)."""
    with open(path, "w") as f:
        f.write("[decoding]\n")
        for key in dec_cfg.keys():
            f.write("%s=%s\n" % (key, dec_cfg[key]))


def build_decode_command(dec_cfg: Dict[str, str], out_folder: str,
                         ark_file: str) -> str:
    """The exact decode_dnn.sh command line (561-566)."""
    return (dec_cfg["decoding_script_folder"] + "/"
            + dec_cfg["decoding_script"] + " "
            + os.path.abspath(os.path.join(out_folder, "dec_cfg.ini")) + " "
            + os.path.join(out_folder, "dec") + ' "' + ark_file + '"')


def run_decoding(dec_cfg: Dict[str, str], out_folder: str, ark_file: str,
                 log=print) -> Optional[int]:
    """Run the Kaldi decoding script; returns its rc, or None when the
    script is absent (no Kaldi in the environment)."""
    cmd = build_decode_command(dec_cfg, out_folder, ark_file)
    script = os.path.join(dec_cfg["decoding_script_folder"],
                          dec_cfg["decoding_script"])
    if log:
        log(cmd)
    if not os.path.exists(script):
        if log:
            log(f"[timit-full] decoding script {script} not found — "
                "skipping the external Kaldi stage (ark + cfg are ready)")
        return None
    proc = subprocess.run(cmd, shell=True, capture_output=True)
    if log and proc.stdout:
        log(proc.stdout.decode(errors="replace")[-2000:])
    return proc.returncode


def parse_best_wer(dec_dir: str) -> Optional[float]:
    """Scan kaldi scoring outputs (dec_dir/scoring_kaldi/... or wer_*)
    for the best %WER — the ASR/best_wer.sh scan."""
    import re
    best = None
    for root, _, files in os.walk(dec_dir):
        for fn in files:
            if not (fn.startswith("wer_") or fn == "best_wer"):
                continue
            try:
                with open(os.path.join(root, fn), errors="replace") as f:
                    for line in f:
                        # WER only — the same files carry %SER lines
                        # (best_wer.sh greps WER)
                        m = re.search(r"\bWER (\S+)", line)
                        if m:
                            try:
                                v = float(m.group(1).rstrip("%,"))
                            except ValueError:
                                continue
                            if best is None or v < best:
                                best = v
            except OSError:
                continue
    return best


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def _utt_id(wav_path: str) -> str:
    """spk_utt id from the TIMIT path layout (line 505-506)."""
    parts = wav_path.split("/")
    base = os.path.splitext(parts[-1])[0]
    return (parts[-2] + "_" + base) if len(parts) >= 2 else base


def _load_split(ex: FeatureExtractor, entries, data_root: str,
                avg_spk: bool):
    """Extract features per utterance; returns ({utt: feats}, {utt: ali}).
    avg_spk=True: raw features, per-speaker mean subtracted after;
    avg_spk=False: 'avg_norm' applied inside the encoder (line 521-527)."""
    from pase_tpu.data.io import read_wav
    feats, alis = {}, {}
    for path, alifile in entries:
        wav, _ = read_wav(os.path.join(data_root, path))
        wav = wav / (np.abs(wav).max() + 1e-9)     # line 500 normalization
        utt = _utt_id(path)
        if avg_spk:
            f = ex.extract(wav)
        else:
            f = np.asarray(ex.encoder(
                wav[None], mode="avg_norm"))[0].T
        a = np.loadtxt(os.path.join(data_root, alifile),
                       dtype=np.int64).reshape(-1)
        feats[utt] = f
        alis[utt] = a
    return feats, alis


def speaker_mean_norm_utts(feats: Dict[str, np.ndarray]):
    """Per-speaker mean subtraction; speaker = utt id prefix before '_'
    (lines 508-545; std computed but unused in the reference, ditto)."""
    spk_means: Dict[str, list] = {}
    for utt, f in feats.items():
        spk_means.setdefault(utt.split("_")[0], []).append(f.mean(axis=0))
    mean = {s: np.mean(np.stack(v), axis=0) for s, v in spk_means.items()}
    return {u: f - mean[u.split("_")[0]] for u, f in feats.items()}


def run_timit_full_decoding(fe_cfg, fe_ckpt, data_root: str,
                            train_list: str, test_list: str,
                            out_folder: str, mlp_cfg, dec_cfg,
                            max_utts: Optional[int] = None,
                            epochs: Optional[int] = None,
                            log=print) -> Dict[str, object]:
    """Full pipeline: train the MLP on alignments, dump the decode-ready
    ark, orchestrate decode_dnn.sh. List files: `wavpath alifile` lines
    (alifile: one int per 10 ms frame, the kaldi ali-to-pdf dump)."""
    from pase_tpu.probes.tasks import _read_list
    os.makedirs(out_folder, exist_ok=True)
    if isinstance(mlp_cfg, str):
        with open(mlp_cfg) as f:
            mlp_cfg = json.load(f)
    if isinstance(dec_cfg, str):
        with open(dec_cfg) as f:
            dec_cfg = json.load(f)
    left, right = int(mlp_cfg.get("left", 8)), int(mlp_cfg.get("right", 8))
    avg_spk = str(mlp_cfg.get("avg_spk", "True")) == "True"
    hidden = [int(h) for h in
              str(mlp_cfg.get("dnn_lay", "1024,1973")).split(",")][:-1]
    n_epochs = epochs if epochs is not None else int(
        mlp_cfg.get("N_epochs", 24))

    ex = FeatureExtractor(fe_cfg, fe_ckpt, mode=None)
    tr_f, tr_a = _load_split(ex, _read_list(train_list)[:max_utts],
                             data_root, avg_spk)
    te_f, te_a = _load_split(ex, _read_list(test_list)[:max_utts],
                             data_root, avg_spk)
    if avg_spk:
        tr_f = speaker_mean_norm_utts(tr_f)
        te_f = speaker_mean_norm_utts(te_f)

    # length reconciliation + dataset assembly (lines 236-285). The
    # reference context_window DROPS the first `left` / last `right`
    # frames; ours edge-replicates, so trim both sides explicitly
    # (interior rows are identical windows).
    def trim(x):
        return x[left:-right] if right > 0 else x[left:]

    def assemble(feats, alis):
        fl, ll = [], []
        for utt in feats:
            f = reconcile_lengths(feats[utt], alis[utt], utt)
            fl.append(trim(context_window(f, left, right)))
            ll.append(trim(alis[utt]))
        return np.concatenate(fl), np.concatenate(ll)

    x_tr, y_tr = assemble(tr_f, tr_a)
    x_te, y_te = assemble(te_f, te_a)
    y_tr = y_tr - y_tr.min()
    y_te = y_te - y_te.min()
    unique, counts = compute_prior_counts(list(tr_a.values()), out_folder)
    num_classes = int(max(y_tr.max(), y_te.max())) + 1

    model_vars, metrics = train_mlp_probe(
        x_tr, y_tr.astype(np.int32), x_te, y_te.astype(np.int32),
        num_classes=num_classes, hidden=hidden, epochs=n_epochs,
        lr=float(mlp_cfg.get("lr", 0.036)),
        halving_factor=float(mlp_cfg.get("halving_factor", 0.5)),
        improvement_threshold=0.0025,
        batch_size=int(mlp_cfg.get("batch_size", 128)),
        seed=int(mlp_cfg.get("seed", 1234)),
        dropout=float(str(mlp_cfg.get("dnn_drop", "0.15")).split(",")[0]),
        log=log)

    # decode-ready posteriors: log-softmax minus log-priors (433-434)
    log_counts = np.log(counts / counts.sum()).astype(np.float32)
    ark_file = os.path.join(out_folder, "post.ark")
    import jax.numpy as jnp
    model = model_vars["model"]
    with open(ark_file, "wb") as fd:
        for utt in te_f:
            # decode path: full (un-reconciled) features, reference rows
            # = len(f) - left - right (lines 543-558)
            x = trim(context_window(te_f[utt], left, right))
            out = model.apply({"params": model_vars["params"],
                               "batch_stats": model_vars["batch_stats"]},
                              jnp.asarray(x), train=False)
            pout = np.asarray(out)
            if pout.shape[1] == len(log_counts):
                pout = pout - log_counts[None, :]
            write_kaldi_mat(fd, pout, utt)

    write_dec_cfg_ini(dec_cfg, os.path.join(out_folder, "dec_cfg.ini"))
    rc = run_decoding(dec_cfg, out_folder, ark_file, log=log)
    result: Dict[str, object] = dict(metrics)
    result["ark_file"] = ark_file
    result["decode_rc"] = rc
    if rc == 0:
        wer = parse_best_wer(os.path.join(out_folder, "dec"))
        result["best_wer"] = wer
        if log and wer is not None:
            log(f"BEST WER/PER: {wer:.2f}%")
    return result
