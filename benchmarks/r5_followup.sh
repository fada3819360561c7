#!/bin/bash
# Round-5 follow-up chip work, run AFTER r5_chip_program.sh completes
# (one chip; serialize).  Stages:
#   fixtest — re-run the one stale TPU test fixed in 23c8545
#   train   — bench_train (VERDICT item 8): the sweep's run crashed in
#             the megakernel JVP (fixed: freeze_params + has_tangents
#             gates), so the train-step numbers are still owed
#   attnab  — bench_train with the trainable fused attention OFF (A/B)
#   trprof  — transformer 64k block attribution (profile_transformer)
#   bench   — one more routed bench.py for the record
set -x
cd "$(dirname "$0")/.."
STAGES="${@:-fixtest train attnab trprof models fusionw bench}"
LOG=results/logs/r5_followup_$(date +%m%d_%H%M)
mkdir -p "$LOG"

health() {
  timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('OK', float((x@x).sum()))
" >/dev/null 2>&1
}
gate() {
  for i in $(seq 1 15); do
    health && { sleep "${PCI_TPU_CLIENT_SETTLE:-60}"; return 0; }
    echo "gate wait $i/15" | tee -a "$LOG/summary.txt"; sleep 180
  done
  echo "gate: chip still wedged after 45 min" | tee -a "$LOG/summary.txt"
  return 1
}
run() {
  local name=$1 to=$2; shift 2
  timeout --signal=INT --kill-after=30 "$to" "$@" 2>&1 \
    | tee "$LOG/$name.log" | tail -20
  local rc=${PIPESTATUS[0]}
  echo "stage $name rc=$rc" | tee -a "$LOG/summary.txt"
  return $rc
}

for s in $STAGES; do
gate || { echo "abort before stage $s" | tee -a "$LOG/summary.txt"; exit 1; }
case $s in
  fixtest) run fixtest 1800 env PCI_TPU_TESTS=1 python -m pytest \
             tests/test_pallas_tpu.py -k fused_attention -x -q ;;
  train)   run train 2400 python -m benchmarks.bench_train ;;
  attnab)  run attnab 2400 env PCI_TPU_FUSED_ATTN_TRAIN=0 python -m benchmarks.bench_train ;;
  trprof)  run trprof 2400 python -m benchmarks.profile_transformer ;;
  models)  run models 2400 python -m benchmarks.profile_models ;;  # f1/f2 e2e POST route-fix (decodeab's 62.69 predates ab736f2)
  fusionw) run fusionw 1800 env PCI_TPU_MID_KERNEL=1 PCI_TPU_ENC_KERNEL=1 \
             PCI_TPU_FUSION_ONESHOT=1 PCI_TPU_FUSION_BUCKET=64 \
             PCI_TPU_FUSION_WINNERS=2 python bench.py ;;
  bench)   run bench 1800 python bench.py ;;
esac; done
echo "followup done; logs in $LOG"
