#!/bin/bash
# Re-measure every docs/perf/recorded.json extras row on the chip, so each
# key carries a fresh in-round timestamp (round-4 verdict weak #2: bench
# extras must be live, not archival).  Serial on purpose — the chip
# serializes work and host-core contention corrupts timings
# (NOTES_ROUND5.md).  ~45-60 min warm-cache total.
#
# Usage: PYTHONPATH=/root/.axon_site:/root/repo bash scripts/refresh_ledger.sh
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH=${PYTHONPATH:-/root/.axon_site:/root/repo}

run() {
    echo "=== $* ==="
    env "$@" || echo "FAILED rc=$? : $*"
}

# joint production steps (ViT-L): TPU-native, parity, enc8 geometries
run BJ_DEC_HEADS=4 BJ_ACCUM2D=4 BJ_PREMASK=1 python -u scripts/bench_joint.py
run BJ_DEC_HEADS=16 BJ_ACCUM2D=4 BJ_PREMASK=1 python -u scripts/bench_joint.py
run BJ_ENC_HEADS=8 BJ_DEC_HEADS=4 BJ_ACCUM2D=4 BJ_PREMASK=1 python -u scripts/bench_joint.py
# serving ladder: parity, enc8, enc8+int8
run python -u scripts/bench_infer.py
run IB_NUM_HEADS=8 python -u scripts/bench_infer.py
run IB_NUM_HEADS=8 IB_QUANT=1 python -u scripts/bench_infer.py
# retrieval-encode serving (COEM towers)
run python -u scripts/bench_retclip_encode.py
# ViT-H 3D-only scaling point (enc-10 repartition)
run VH_ENC_HEADS=10 python -u scripts/bench_vith.py
# enc8 headline row (records native_enc8_b8 from inside bench.py)
run BENCH_ENC_HEADS=8 BENCH_DEC_HEADS=4 BENCH_BATCH=8 python -u bench.py
echo "=== refresh done ==="
