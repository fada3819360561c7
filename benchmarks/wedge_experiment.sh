#!/bin/bash
# Controlled wedge attribution (VERDICT r4 item 4).
#
# Today's timeline gave a new hypothesis: the axon worker wedges after an
# UNCLEAN CLIENT DEATH (crash / timeout-kill), then self-heals after
# ~10-20 min idle.  Evidence: probes ran green (backend 31.7 s, setconv
# x2) until a Mosaic lowering error crashed the probe process at
# 04:39:30; the very next subprocess probe hung >5 min.  Earlier the
# same morning the wedge cleared ~8 min after the last killed probe.
#
# This script discriminates the trigger:
#   E1  fetch OK + clean exit(0)      -> immediate reconnect probe
#   E2  fetch OK + uncaught exception -> immediate reconnect probe
#   E3  fetch OK + os._exit(1)        -> immediate reconnect probe
# After each E that wedges, we wait for self-heal (probe every 3 min)
# and log the heal time.  All findings -> results/logs/wedge_experiment.log
#
#   bash benchmarks/wedge_experiment.sh [then_program]
# If "then_program" is passed, launches benchmarks/r5_chip_program.sh
# once the final state is healthy.
set -u
cd "$(dirname "$0")/.."
LOG=results/logs/wedge_experiment.log
mkdir -p results/logs
say() { echo "$(date +%H:%M:%S) $*" | tee -a "$LOG"; }

probe() { # bounded health probe; rc 0 = healthy
  timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('OK', float((x@x).sum()))
" >/dev/null 2>&1
}

wait_heal() { # probe every 3 min until healthy; logs heal time
  local t0=$(date +%s)
  while ! probe; do
    say "  still wedged ($((($(date +%s)-t0)/60)) min)"
    sleep 180
  done
  say "  healed after $((($(date +%s)-t0)/60)) min"
}

say "wedge experiment start; waiting for initial heal"
wait_heal

run_e() { # run_e <name> <py_tail>
  local name=$1 tail=$2
  say "$name: client + fetch + $tail"
  timeout 240 python -u -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('fetch', float((x@x).sum()))
$tail
" >>"$LOG" 2>&1
  say "$name exit rc=$?"
  sleep 5
  if probe; then
    say "$name -> reconnect HEALTHY (no wedge)"
  else
    say "$name -> reconnect WEDGED"
    wait_heal
  fi
}

run_e E1 "import sys; sys.exit(0)"
run_e E2 "raise RuntimeError('deliberate crash')"
run_e E3 "import os; os._exit(1)"

say "wedge experiment done"
if [ "${1:-}" = "then_program" ]; then
  say "launching r5_chip_program"
  nohup bash benchmarks/r5_chip_program.sh > /tmp/r5_program.out 2>&1 &
  echo $! > /tmp/r5_program.pid
fi
