#!/bin/bash
# probe the TPU every 5 min; on recovery, stop probing and launch the
# staged r5 sweep (serialized, bounded) in the background.
# Probe is a bounded SUBPROCESS (a wedged PJRT client hangs in-process
# forever) and requires a VALUE FETCH to declare recovery — client
# creation alone succeeds even while compute is wedged (r5 observation).
while true; do
  ts=$(date +%H:%M:%S)
  out=$(timeout 180 python -u -c "
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128,128)); print('OK', float((x@x).sum()), d[0].platform)
" 2>&1 | grep -E "^OK" | head -1)
  case "$out" in
    OK*)
      echo "$ts TPU RECOVERED: $out" >> /tmp/tpu_watch.log
      touch /tmp/tpu_recovered
      cd /root/repo
      nohup bash benchmarks/r5_chip_program.sh > /tmp/r5_sweep.out 2>&1 &
      echo $! > /tmp/r5_sweep.pid
      echo "$ts sweep launched pid $(cat /tmp/r5_sweep.pid)" >> /tmp/tpu_watch.log
      exit 0;;
    *) echo "$ts down" >> /tmp/tpu_watch.log;;
  esac
  sleep 300
done
