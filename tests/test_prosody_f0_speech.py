"""Prosody F0 tracker on SPEECH-LIKE signals (VERDICT r3 #7): formant-
synthesized glides/jitter/V-UV alternation with exact ground truth
(experiments/prosody_f0_eval.py). Pins the deviation bounds reported in
the README deviations table — pysptk SWIPE' is absent in this image, so
the tracker itself is the parity surface.

Measured (this harness): pooled F0 RMSE 0.95 Hz, GPE 0.0 %, voicing
accuracy 99.4 % over 800 frames of glides (100-280 Hz up, 250-90 Hz
down), 2 %-jitter+vibrato 150 Hz, and voiced/fricative/silence
alternation through /a/ formant resonators.
"""

import importlib.util
import os


def _load_eval():
    path = os.path.join(os.path.dirname(__file__), "..", "experiments",
                        "prosody_f0_eval.py")
    spec = importlib.util.spec_from_file_location("prosody_f0_eval", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_f0_tracker_speechlike_bounds():
    ev = _load_eval()
    res = ev.evaluate()
    pooled = res["pooled"]
    assert pooled["f0_rmse_hz"] < 3.0, pooled          # measured 0.95
    assert pooled["gpe_pct"] < 1.0, pooled             # measured 0.0
    assert pooled["voicing_acc_pct"] > 97.0, pooled    # measured 99.4
    # V/UV case specifically: fricatives + silence must not be voiced
    vuv = res["vuv"]
    assert vuv["voiced_precision_pct"] > 90.0, vuv
    assert vuv["voiced_recall_pct"] > 95.0, vuv
