"""Quantify the prosody F0 tracker's deviation on SPEECH-LIKE signals
(VERDICT r3 #7).

The reference's Prosody worker uses pysptk SWIPE' (transforms.py:950-954);
pysptk is absent in this image, so pase_tpu uses a normalized-
autocorrelation tracker (ops/features._autocorr_f0). Harmonic-stack
tests showed statistical parity; this evaluates the tracker on
formant-synthesized speech: glottal impulse trains with known
time-varying F0 (glides + jitter) through cascaded second-order formant
resonators, interleaved with fricative noise and silence, so ground
truth is exact and the signal has speech's spectral tilt and formant
structure.

Reports, per test case and pooled:
  * voiced-frame F0 RMSE (Hz) and mean absolute error,
  * gross pitch error rate (GPE: >20% off on both-voiced frames),
  * voicing decision accuracy/recall/precision (UV flag).

Run: python experiments/prosody_f0_eval.py [--json OUT]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

SR = 16000
HOP = 160


def formant_filter(src, formants=((730, 90), (1090, 110), (2440, 170))):
    """Cascaded 2nd-order resonators (the classic /a/ formants)."""
    from scipy.signal import lfilter
    y = src.astype(np.float64)
    for fc, bw in formants:
        r = np.exp(-np.pi * bw / SR)
        th = 2 * np.pi * fc / SR
        y = lfilter([1.0], [1.0, -2 * r * np.cos(th), r * r], y)
    return y


def glottal_source(f0_track):
    """Impulse train with instantaneous rate f0_track (phase accumulator);
    f0_track==0 means unvoiced (no pulses)."""
    phase = np.cumsum(f0_track / SR)
    return (np.diff(np.floor(phase), prepend=0.0) > 0).astype(np.float64)


def make_case(kind, seed=0, dur_s=2.0):
    """Returns (wav [T], f0_true per frame [F], voiced_true per frame [F])."""
    rng = np.random.RandomState(seed)
    t = int(dur_s * SR)
    n = np.arange(t)
    if kind == "glide_up":
        f0 = np.linspace(100, 280, t)
    elif kind == "glide_down":
        f0 = np.linspace(250, 90, t)
    elif kind == "jitter":
        # 150 Hz with 2% cycle-level jitter + slow vibrato
        f0 = 150 * (1 + 0.04 * np.sin(2 * np.pi * 5 * n / SR))
        f0 = f0 * (1 + 0.02 * rng.randn(t).cumsum() / np.sqrt(n + 1))
        f0 = np.clip(f0, 80, 290)
    elif kind == "vuv":
        # voiced 120 Hz / fricative noise / silence / voiced 220 Hz
        f0 = np.zeros(t)
        q = t // 4
        f0[:q] = 120.0
        f0[3 * q:] = 220.0
    else:
        raise ValueError(kind)

    voiced_mask = f0 > 0
    wav = formant_filter(glottal_source(f0))
    wav = wav / (np.abs(wav).max() + 1e-9)
    if kind == "vuv":
        q = t // 4
        # fricative: high-passed noise at lower level
        noise = rng.randn(q)
        from scipy.signal import lfilter
        noise = noise - lfilter([1], [1, -0.95], noise)  # crude high-pass
        wav[q:2 * q] = 0.15 * noise / (np.abs(noise).max() + 1e-9)
        wav[2 * q:3 * q] = 0.0
    # frame-center ground truth
    nf = t // HOP
    centers = np.arange(nf) * HOP + HOP // 2
    return (wav.astype(np.float32), f0[centers].astype(np.float32),
            voiced_mask[centers])


def evaluate(cases=("glide_up", "glide_down", "jitter", "vuv")):
    import jax.numpy as jnp
    from pase_tpu.ops.features import _autocorr_f0
    results = {}
    pooled = {"abs_err": [], "gross": [], "v_true": [], "v_pred": []}
    for kind in cases:
        wav, f0_true, v_true = make_case(kind)
        nf = len(f0_true)
        f0_hat, uv = _autocorr_f0(jnp.asarray(wav[None]), SR, HOP, nf,
                                  60, 300)
        f0_hat = np.asarray(f0_hat)[0]
        v_pred = np.asarray(uv)[0] > 0.5
        both = v_true & v_pred
        err = np.abs(f0_hat[both] - f0_true[both])
        gross = err > 0.2 * f0_true[both]
        res = {
            "frames": int(nf),
            "f0_rmse_hz": float(np.sqrt(np.mean(err ** 2))) if both.any()
            else None,
            "f0_mae_hz": float(err.mean()) if both.any() else None,
            "gpe_pct": float(100 * gross.mean()) if both.any() else None,
            "voicing_acc_pct": float(100 * (v_pred == v_true).mean()),
            "voiced_recall_pct": float(100 * (v_pred & v_true).sum() /
                                       max(v_true.sum(), 1)),
            "voiced_precision_pct": float(100 * (v_pred & v_true).sum() /
                                          max(v_pred.sum(), 1)),
        }
        results[kind] = res
        pooled["abs_err"].extend(err.tolist())
        pooled["gross"].extend(gross.tolist())
        pooled["v_true"].extend(v_true.tolist())
        pooled["v_pred"].extend(v_pred.tolist())
    ae = np.array(pooled["abs_err"])
    vt = np.array(pooled["v_true"])
    vp = np.array(pooled["v_pred"])
    results["pooled"] = {
        "f0_rmse_hz": float(np.sqrt(np.mean(ae ** 2))),
        "f0_mae_hz": float(ae.mean()),
        "gpe_pct": float(100 * np.mean(pooled["gross"])),
        "voicing_acc_pct": float(100 * (vt == vp).mean()),
    }
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    import jax
    jax.config.update("jax_platforms", "cpu")
    res = evaluate()
    for k, v in res.items():
        print(f"[f0-eval] {k}: " + ", ".join(
            f"{m}={x:.2f}" if isinstance(x, float) else f"{m}={x}"
            for m, x in v.items()))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
