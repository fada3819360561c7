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
#   trainf2b — RESUME the flagship f2 training to the full 60 epochs with
#             the content-keyed FPS cache (d9185ca): the chip-program run
#             paid ~9.5 s/step of host FPS (1 vCPU); with the cache warm,
#             epochs drop from ~780 s to ~60 s, so the remaining ~47
#             epochs fit in ~1.5 h including the warmup epoch
#   evalf2b — re-eval best checkpoint + baselines after the full train
#   benchfinal — routed bench.py for the record after everything
set -x
cd "$(dirname "$0")/.."
STAGES="${@:-fixtest train attnab trprof models fusionw bench trainf2b evalf2b benchfinal}"
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
  trainf2b)
    SYNTH=runs/synth_scenes
    run trainf2b 7200 env PCI_TPU_FPS_CACHE_DIR=runs/.fps_cache \
      python -m pci_tpu.cli.train --model isapci --field 2 \
      --npoints 16384 --interval 3 --epochs 60 \
      --root $SYNTH/lidar --scenes_list $SYNTH/train.txt \
      --scene_split_lib $SYNTH/split \
      --pretrained_flow_model results/checkpoints/flownet3d_synth16k \
      --save_dir results/checkpoints/isapci_f2_train \
      --log_dir results/logs --resume ;;
  evalf2b)
    SYNTH=runs/synth_scenes
    BEST=$(python - <<'EOF'
from pci_tpu.train.checkpoints import BestKeeper
p = BestKeeper.best_path("results/checkpoints/isapci_f2_train", "field_2")
print(p or "")
EOF
)
    if [ -n "$BEST" ]; then
      run evalf2b 2400 env PCI_TPU_FPS_CACHE_DIR=runs/.fps_cache \
        python -m pci_tpu.cli.test --field 2 --npoints 16384 \
        --interval 3 --root $SYNTH/lidar --scenes_list $SYNTH/val.txt \
        --scene_split_lib $SYNTH/split --pretrained_self_model "$BEST" \
        --log_dir results/logs
    else
      echo "evalf2b: no field_2 checkpoint" | tee -a "$LOG/summary.txt"
    fi ;;
  benchfinal) run benchfinal 1800 python bench.py ;;
esac; done
echo "followup done; logs in $LOG"
