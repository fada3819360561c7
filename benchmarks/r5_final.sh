#!/bin/bash
# Round-5 FINAL chip work, run AFTER r5_followup.sh completes (one chip;
# serialize).  Stages:
#   fixtest2 — the 23c8545 stale-test fix, with the CORRECT -k pattern
#              (the followup's fixtest used -k fused_attention, which
#              matches nothing: rc=5)
#   trainbig — generalization-gap mitigation (CLAUDE.md r5): warm-start
#              fine-tune the best 60-epoch f2 checkpoint on train_big
#              (32 scenes, ~600 windows, 4x the data) at a reduced LR;
#              flow stays frozen (megakernel train path, freeze_params)
#   evalbig  — eval the best isapci_f2_big checkpoint on the same val
#              scenes (identity 0.1455/0.1452, oracle 0.1031 already
#              measured in results/logs/eval_isapci_f2_baselines.log)
#   benchfinal2 — one routed bench.py for the record
set -x
cd "$(dirname "$0")/.."
STAGES="${@:-fixtest2 fusionw2 trgap trainbig evalbig benchfinal2}"
LOG=results/logs/r5_final_$(date +%m%d_%H%M)
mkdir -p "$LOG"
SYNTH=runs/synth_scenes

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
best_f2() {
  python - "$1" <<'EOF'
import sys
from pci_tpu.train.checkpoints import BestKeeper
p = BestKeeper.best_path(sys.argv[1], "field_2")
print(p or "")
EOF
}

for s in $STAGES; do
gate || { echo "abort before stage $s" | tee -a "$LOG/summary.txt"; exit 1; }
case $s in
  fixtest2) run fixtest2 1800 env PCI_TPU_TESTS=1 python -m pytest \
              tests/test_pallas_tpu.py -k transformer_fused -x -q ;;
  fusionw2) # retry of the wedge-blocked followup fusionw: routed bench
            # with the W=2 extraction so the CD gate rules on l=64/W=2
    run fusionw2 1800 env PCI_TPU_MID_KERNEL=1 PCI_TPU_ENC_KERNEL=1 \
      PCI_TPU_FUSION_ONESHOT=1 PCI_TPU_FUSION_BUCKET=64 \
      PCI_TPU_FUSION_WINNERS=2 python bench.py ;;
  trainbig)
    BEST=$(best_f2 results/checkpoints/isapci_f2_train)
    if [ -z "$BEST" ]; then
      echo "trainbig: no field_2 checkpoint to warm-start" \
        | tee -a "$LOG/summary.txt"
    else
      echo "trainbig: warm-start from $BEST" | tee -a "$LOG/summary.txt"
      run trainbig 12000 env PCI_TPU_FPS_CACHE_DIR=runs/.fps_cache \
        python -m pci_tpu.cli.train --model isapci --field 2 \
        --npoints 16384 --interval 3 --epochs 18 --init_lr 0.002 \
        --root $SYNTH/lidar --scenes_list $SYNTH/train_big.txt \
        --scene_split_lib $SYNTH/split \
        --pretrained_self_model "$BEST" \
        --save_dir results/checkpoints/isapci_f2_big \
        --log_dir results/logs --resume
    fi ;;
  evalbig)
    BEST=$(best_f2 results/checkpoints/isapci_f2_big)
    if [ -n "$BEST" ]; then
      run evalbig 2400 env PCI_TPU_FPS_CACHE_DIR=runs/.fps_cache \
        python -m pci_tpu.cli.test --field 2 --npoints 16384 \
        --interval 3 --root $SYNTH/lidar --scenes_list $SYNTH/val.txt \
        --scene_split_lib $SYNTH/split --pretrained_self_model "$BEST" \
        --log_dir results/logs
    else
      echo "evalbig: no field_2 checkpoint in isapci_f2_big" \
        | tee -a "$LOG/summary.txt"
    fi ;;
  benchfinal2) run benchfinal2 1800 python bench.py ;;
  trgap) # attribute the ~10 ms gap between the 64k layer (25.51) and
         # its measured pieces (15.2) via the compose rows
    run trgap 2400 python -m benchmarks.profile_transformer ;;
esac; done
echo "r5_final done; logs in $LOG"
