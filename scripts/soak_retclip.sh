#!/bin/bash
# Retclip soak (round-5): a multi-epoch 2-tower CLIP train on the real
# chip through the PRODUCTION CLI path — full ViT-L octcube_ir geometry
# (60x256^2 OCT + 384^2 enface towers), feature-cached accum_freq=4,
# LiT partition lock (9 unlocked groups), per-epoch retrieval eval,
# orbax checkpointing — with a mid-epoch SIGTERM and a --resume latest
# relaunch.  The pretrain loop soaked in round 4 (scripts/soak_drive.sh);
# this covers the CLIP engine's accum/lock/resume composition, which had
# never survived a kill on hardware (round-4 verdict item 5).
# Reference loop: retinal-COEM train_retclip.py:64-241.
#
# Kill discipline per the verify skill: only after epoch-1's checkpoint
# exists (all compiles done), never mid-compile.
set -u
OUT=${SOAK_OUT:-/tmp/soak_retclip}
EPOCHS=${SOAK_EPOCHS:-6}
N=${SOAK_N:-200}          # synthetic pairs; 0.8 train split
BATCH=${SOAK_BATCH:-8}    # x accum_freq 4 = effective 32 (ref bsz 32)
rm -rf "$OUT"
mkdir -p "$OUT"
ARGS=(--preset octcube_ir --synthetic --synthetic_n "$N"
      --batch_size "$BATCH" --epochs "$EPOCHS" --output_dir "$OUT")
echo "=== phase A: fresh run (will be SIGTERMed mid-flight) ==="
python -m octcubem_tpu.cli.retclip "${ARGS[@]}" > "$OUT/phaseA.log" 2>&1 &
echo $! > /tmp/soak_retclip.pid
# wait for epoch 1's checkpoint (save_frequency=1 -> ckpt/0, ckpt/1)
for i in $(seq 1 720); do
  [ -d "$OUT/ckpt/1" ] && break
  sleep 10
done
if [ ! -d "$OUT/ckpt/1" ]; then
  echo "SOAK FAIL: no epoch-1 checkpoint after 2h"
  kill "$(cat /tmp/soak_retclip.pid)"; exit 1
fi
sleep 20   # into epoch 2's stepping
kill "$(cat /tmp/soak_retclip.pid)" || true
wait "$(cat /tmp/soak_retclip.pid)" 2>/dev/null
echo "=== phase A killed; checkpoints on disk: ==="
ls "$OUT/ckpt" || true
echo "=== phase B: --resume latest to completion ==="
python -m octcubem_tpu.cli.retclip "${ARGS[@]}" --resume latest \
  > "$OUT/phaseB.log" 2>&1
rc=$?
echo "=== phase B exit: $rc ==="
echo "=== per-epoch retrieval metrics (loss continuity + R@k): ==="
cat "$OUT/results.jsonl" || true
echo "=== train-loss meter tail, both phases: ==="
grep -h "Epoch \[" "$OUT/phaseA.log" "$OUT/phaseB.log" | tail -20 || true
exit $rc
