#!/bin/bash
# Soak drive (round-4): a multi-hundred-step joint pretrain on the real
# chip through the PRODUCTION CLI path — accum_2d=4, in-step premask,
# SPL updates, async checkpointing — with a mid-run SIGTERM and a
# --resume latest relaunch.  Asserts the loop survives a hard stop and
# the resumed run continues from the last committed checkpoint.
#
# The kill happens only AFTER epoch-1's checkpoint exists (all compiles
# done, steady stepping) — never mid-compile (verify skill: a SIGKILL
# mid-compile can wedge the axon grant).  SIGTERM does NOT run python
# atexit, so an in-flight async checkpoint write may be truncated —
# exercising exactly the commit-barrier guarantee the restore path
# claims (core/checkpoint.py).
set -u
OUT=${SOAK_OUT:-/tmp/soak_joint}
EPOCHS=${SOAK_EPOCHS:-8}
SPE=${SOAK_SPE:-40}
# loader length = synthetic_n / batch caps the epoch; size the synthetic
# pool so each epoch really steps SPE times (volumes are generated
# on the fly per item — no host-memory cost)
N=$((SPE * 4))
rm -rf "$OUT"
mkdir -p "$OUT"
ARGS=(--preset vitl_joint_pretrain --synthetic --synthetic_n "$N"
      --batch_size 4 --steps_per_epoch "$SPE" --epochs "$EPOCHS"
      --output_dir "$OUT")
echo "=== phase A: fresh run (will be SIGTERMed mid-flight) ==="
python -m octcubem_tpu.cli.pretrain "${ARGS[@]}" > "$OUT/phaseA.log" 2>&1 &
echo $! > /tmp/soak.pid
# wait for epoch 1's checkpoint (compiles finished, >= 2 epochs stepped)
for i in $(seq 1 720); do
  [ -d "$OUT/ckpt/1" ] && break
  sleep 10
done
if [ ! -d "$OUT/ckpt/1" ]; then
  echo "SOAK FAIL: no epoch-1 checkpoint after 2h"; kill "$(cat /tmp/soak.pid)"; exit 1
fi
sleep 25   # into the next epoch's stepping
kill "$(cat /tmp/soak.pid)" || true
wait "$(cat /tmp/soak.pid)" 2>/dev/null
echo "=== phase A killed; checkpoints on disk: ==="
ls "$OUT/ckpt" || true
echo "=== phase B: --resume latest to completion ==="
python -m octcubem_tpu.cli.pretrain "${ARGS[@]}" --resume latest \
  > "$OUT/phaseB.log" 2>&1
rc=$?
echo "=== phase B exit: $rc; log tail: ==="
tail -5 "$OUT/phaseB.log"
grep -h '"epoch"' "$OUT/log.txt" || true
exit $rc
