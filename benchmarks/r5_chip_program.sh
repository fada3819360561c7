#!/bin/bash
# Round-5 whole-chip program: everything the round owes the judge, in
# priority order, serialized on the one chip (two processes contend).
# Every stage is bounded; a wedge mid-program leaves the later stages
# unrun but the logs name the last stage started.
#
#   bash benchmarks/r5_chip_program.sh [stage...]
#
# Stages: sweep trainf2 evalf2 bench
set -x
cd "$(dirname "$0")/.."
STAGES="${@:-sweep trainf2 evalf2 bench}"
LOG=results/logs
mkdir -p "$LOG"
SYNTH=runs/synth_scenes

health() {
  timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('OK', float((x@x).sum()))
" >/dev/null 2>&1
}
gate() { # wait up to ~45 min for worker self-heal between stages
  # on success, settle: a reconnect within ~a minute of a successful
  # client's exit hangs forever (r5 wedge_experiment.log)
  for i in $(seq 1 15); do
    health && { sleep "${PCI_TPU_CLIENT_SETTLE:-60}"; return 0; }
    echo "gate wait $i/15"; sleep 180
  done
  return 1
}

for s in $STAGES; do
gate || { echo "abort: chip never healed before stage $s"; exit 1; }
case $s in
  sweep)
    # the full measurement program (probes gate heavier stages)
    bash benchmarks/r5_tpu_sweep.sh ;;
  trainf2)
    # VERDICT r4 item 5: flagship ISAPCInet field=2 @16k, f1 recipe
    # (results/RESULTS.md).  --resume makes re-runs continue, so a
    # timeout mid-training is recoverable by running the stage again.
    python -m benchmarks.prep_synth
    timeout --signal=INT --kill-after=60 10800 python -m pci_tpu.cli.train --model isapci --field 2 \
      --npoints 16384 --interval 3 --epochs 60 \
      --root $SYNTH/lidar --scenes_list $SYNTH/train.txt \
      --scene_split_lib $SYNTH/split \
      --pretrained_flow_model results/checkpoints/flownet3d_synth16k \
      --save_dir results/checkpoints/isapci_f2_train \
      --log_dir results/logs --resume \
      2>&1 | tee "$LOG/train_isapci_f2.log" | tail -5
    echo "trainf2 rc=${PIPESTATUS[0]}" ;;
  evalf2)
    BEST=$(python - <<'EOF'
from pci_tpu.train.checkpoints import BestKeeper
p = BestKeeper.best_path("results/checkpoints/isapci_f2_train", "field_2")
print(p or "")
EOF
)
    if [ -n "$BEST" ]; then
      timeout --signal=INT --kill-after=60 2400 python -m pci_tpu.cli.test --field 2 --npoints 16384 \
        --interval 3 --root $SYNTH/lidar --scenes_list $SYNTH/val.txt \
        --scene_split_lib $SYNTH/split --pretrained_self_model "$BEST" \
        --log_dir results/logs 2>&1 | tee "$LOG/eval_isapci_f2_val.log" | tail -5
      # identity + oracle baselines for the table
      timeout --signal=INT --kill-after=60 2400 python -m benchmarks.eval_isapci_baselines --field 2 \
        --interval 3 2>&1 | tee "$LOG/eval_isapci_f2_baselines.log" | tail -5 || true
    else
      echo "evalf2: no field_2 checkpoint found"
    fi ;;
  bench)
    timeout --signal=INT --kill-after=60 1800 python bench.py 2>&1 | tee "$LOG/bench_final.log" | tail -3 ;;
esac; done
echo "chip program done"
