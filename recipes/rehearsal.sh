#!/usr/bin/env bash
# Full-system production rehearsal: every subsystem surviving each other
# in one process lifecycle (reference train loop + AuxiliarSuperviser,
# /root/reference/pase/utils.py:164-185, trainer.py:263-278).
#
#   1. build a synthetic on-disk corpus (+ distortion assets)
#   2. compute ZNorm trainset statistics
#   3. control run A: train --device_corpus N epochs, uninterrupted
#   4. rehearsal run B: same seed/corpus, with --sup_exec firing a REAL
#      speaker-ID probe (run_probe.py utt) on epoch boundaries;
#      kill -9 mid-run; resume; finish
#   5. assert A and B final weights are BITWISE equal (preemption is
#      transparent: full-TrainState resume + step-indexed feed keys)
#   6. export-jax AOT serving artifact from B's final checkpoint
#   7. assert serve-encode == forward-chunk on a held-out wav
#   8. assert the supervised probe actually ran and logged accuracy
#
# Usage:  bash recipes/rehearsal.sh [WORK_DIR]
#   HOURS=2 EPOCHS=5 control corpus size / run length (defaults).
# Writes a PASS/FAIL transcript to $WORK/rehearsal.log.
set -euo pipefail

REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-/tmp/pase_rehearsal}
HOURS=${HOURS:-2}
EPOCHS=${EPOCHS:-5}
BATCH=${BATCH:-32}
CHUNK=${CHUNK:-32000}
FE_CFG=$REPO/cfg/frontend/PASE+.cfg
WK_CFG=$REPO/cfg/workers/workers+.cfg
LOG=$WORK/rehearsal.log

cd "$REPO"
mkdir -p "$WORK"
: > "$LOG"
note() { echo "[rehearsal] $*" | tee -a "$LOG"; }

# ---- 1. corpus ------------------------------------------------------------
if [ ! -f "$WORK/corpus/data.cfg" ]; then
    note "building ${HOURS}h synthetic corpus"
    python experiments/make_bench_corpus.py --out_root "$WORK/corpus" \
        --hours "$HOURS" | tee -a "$LOG"
fi

# ---- 2. trainset statistics ------------------------------------------------
if [ ! -f "$WORK/stats.pkl" ]; then
    note "computing ZNorm statistics"
    python make_trainset_statistics.py --data_root "$WORK/corpus/wavs" \
        --data_cfg "$WORK/corpus/data.cfg" --net_cfg "$WK_CFG" \
        --out_file "$WORK/stats.pkl" --max_batches 10 \
        --chunk_size "$CHUNK" | tail -2 | tee -a "$LOG"
fi

# ---- probe lists: speaker-ID on the synthetic corpus -----------------------
python - "$WORK" <<'PY'
import os, sys, collections
work = sys.argv[1]
wavs = sorted(os.listdir(os.path.join(work, "corpus", "wavs")))
by_spk = collections.defaultdict(list)
for w in wavs:
    by_spk[w.split("-")[0]].append(w)
tr, te = [], []
for spk, files in sorted(by_spk.items())[:10]:   # 10 speakers is plenty
    te += [(f, spk) for f in files[:2]]
    tr += [(f, spk) for f in files[2:8]]
with open(os.path.join(work, "probe_tr.lst"), "w") as f:
    f.write("".join(f"{w} {s}\n" for w, s in tr))
with open(os.path.join(work, "probe_te.lst"), "w") as f:
    f.write("".join(f"{w} {s}\n" for w, s in te))
print(f"[rehearsal] probe lists: {len(tr)} train / {len(te)} test utts")
PY

cat > "$WORK/sup_cmd.txt" <<EOF
python $REPO/run_probe.py utt --fe_cfg $FE_CFG --fe_ckpt \$model --train_list $WORK/probe_tr.lst --test_list $WORK/probe_te.lst --data_root $WORK/corpus/wavs --epochs 5 --out \$save_path/probe_\$iteration.json
EOF

TRAIN_ARGS=(--data_root "$WORK/corpus/wavs" --data_cfg "$WORK/corpus/data.cfg"
    --dtrans_cfg "$WORK/corpus/dist.cfg" --net_cfg "$WK_CFG"
    --fe_cfg "$FE_CFG" --stats "$WORK/stats.pkl" --device_corpus
    --batch_size "$BATCH" --chunk_size "$CHUNK" --epoch "$EPOCHS"
    --seed 42 --log_freq 20)

# ---- 3. control run A (uninterrupted) --------------------------------------
if [ ! -f "$WORK/runA/FE_e$((EPOCHS - 1)).npz" ]; then
    note "run A: $EPOCHS uninterrupted epochs"
    python train.py "${TRAIN_ARGS[@]}" --save_path "$WORK/runA" \
        >> "$LOG" 2>&1
fi

# ---- 4. rehearsal run B: probes + kill -9 + resume --------------------------
note "run B: launching with --sup_exec; will kill -9 after epoch 1 saves"
rm -rf "$WORK/runB"
python train.py "${TRAIN_ARGS[@]}" --save_path "$WORK/runB" \
    --sup_exec "$WORK/sup_cmd.txt" --sup_freq 2 \
    >> "$LOG" 2>&1 &
echo $! > "$WORK/runB.pid"

# wait for the epoch-1 artifact, then kill mid-flight (SIGKILL: no
# cleanup, exactly a preemption)
for _ in $(seq 1 2400); do
    [ -f "$WORK/runB/FE_e1.npz" ] && break
    if ! kill -0 "$(cat "$WORK/runB.pid")" 2>/dev/null; then
        note "FAIL: run B exited before epoch 1 completed"; exit 1
    fi
    sleep 0.5
done
sleep 3        # a few steps into the next epoch
if [ -f "$WORK/runB/FE_e$((EPOCHS - 1)).npz" ]; then
    note "FAIL: run B finished before the kill landed — raise HOURS/EPOCHS"
    exit 1
fi
kill -9 "$(cat "$WORK/runB.pid")" 2>/dev/null || true
wait "$(cat "$WORK/runB.pid")" 2>/dev/null || true
note "run B killed (-9) after FE_e1; resuming"

python train.py "${TRAIN_ARGS[@]}" --save_path "$WORK/runB" \
    --sup_exec "$WORK/sup_cmd.txt" --sup_freq 2 \
    >> "$LOG" 2>&1
note "run B resumed and finished"

# ---- 5. bitwise A == B ------------------------------------------------------
python - "$WORK" "$((EPOCHS - 1))" <<'PY'
import sys, numpy as np
work, last = sys.argv[1], sys.argv[2]
a = np.load(f"{work}/runA/FE_e{last}.npz")
b = np.load(f"{work}/runB/FE_e{last}.npz")
assert sorted(a.files) == sorted(b.files)
bad = [k for k in a.files if not np.array_equal(a[k], b[k])]
assert not bad, f"weights differ after preemption+resume: {bad[:5]}"
print(f"[rehearsal] PASS: FE_e{last} bitwise equal across kill -9 + resume "
      f"({len(a.files)} arrays)")
PY

# ---- 6.-7. AOT export + serving parity --------------------------------------
note "export-jax from run B final checkpoint"
python util_scripts.py export-jax --fe_cfg "$FE_CFG" \
    --fe_ckpt "$WORK/runB/FE_e$((EPOCHS - 1)).npz" \
    --out_dir "$WORK/export" --chunk_sizes 128000 >> "$LOG" 2>&1

HELD=$(ls "$WORK/corpus/wavs" | tail -1)
python util_scripts.py serve-encode --export_dir "$WORK/export" \
    --in_wav "$WORK/corpus/wavs/$HELD" --out_file "$WORK/served.npy" \
    >> "$LOG" 2>&1
python util_scripts.py forward-chunk --fe_cfg "$FE_CFG" \
    --fe_ckpt "$WORK/runB/FE_e$((EPOCHS - 1)).npz" \
    --in_wav "$WORK/corpus/wavs/$HELD" --out_file "$WORK/direct.npy" \
    >> "$LOG" 2>&1
python - "$WORK" <<'PY'
import sys, numpy as np
work = sys.argv[1]
served = np.load(f"{work}/served.npy")
direct = np.load(f"{work}/direct.npy")
assert served.shape == direct.shape, (served.shape, direct.shape)
err = float(np.abs(served - direct).max())
assert err < 2e-4, f"serving mismatch: max|err|={err}"
print(f"[rehearsal] PASS: serve-encode == forward-chunk "
      f"(shape {served.shape}, max|err|={err:.2e})")
PY

# ---- 8. the probe ran AND pretraining beats a random encoder ----------------
for _ in $(seq 1 600); do
    ls "$WORK"/runB/sup_aux/probe_*.json >/dev/null 2>&1 && break
    sleep 1
done
# transfer margin: the same probe with an untrained (random-init)
# encoder of the same architecture (the experiments/transfer_gate.py
# gate, rehearsal-sized)
python run_probe.py utt --fe_cfg "$FE_CFG" \
    --train_list "$WORK/probe_tr.lst" --test_list "$WORK/probe_te.lst" \
    --data_root "$WORK/corpus/wavs" --epochs 5 \
    --out "$WORK/probe_random.json" >> "$LOG" 2>&1
python - "$WORK" <<'PY'
import glob, json, sys
work = sys.argv[1]
outs = sorted(glob.glob(f"{work}/runB/sup_aux/probe_*.json"))
assert outs, "no probe output — AuxiliarSuperviser never fired"
m = json.load(open(outs[-1]))
acc = m.get("test_sentence_acc")
assert acc is not None and 0.0 <= acc <= 1.0, m
rnd = json.load(open(f"{work}/probe_random.json"))["test_sentence_acc"]
chance = 1.0 / 10                       # 10-speaker lists above
# the trained encoder must (a) beat chance decisively and (b) not be
# WORSE than random init; strict improvement is asserted only when the
# random encoder hasn't already saturated the (small) rehearsal corpus
# (the full-scale margin evidence is experiments/transfer_gate.py)
assert acc > chance + 0.15, (acc, chance)
assert acc >= rnd - 1e-9, (acc, rnd)
if rnd < 0.95:
    assert acc > rnd, f"pretraining did not improve the probe: {acc} vs {rnd}"
print(f"[rehearsal] PASS: probe ran ({len(outs)} firings); pretrained "
      f"acc {acc:.3f} vs random-init {rnd:.3f} (chance {chance:.2f})")
PY

note "REHEARSAL COMPLETE — all assertions passed"
