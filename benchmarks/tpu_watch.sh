#!/bin/bash
# probe the TPU every 5 min; on recovery, stop probing and launch the
# staged r4 sweep (serialized, bounded) in the background.
while true; do
  ts=$(date +%H:%M:%S)
  out=$(timeout 120 python -u -c "
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128,128)); print('OK', float((x@x).sum()), d[0].platform)
" 2>&1 | grep -E "^OK" | head -1)
  case "$out" in
    OK*)
      echo "$ts TPU RECOVERED: $out" >> /tmp/tpu_watch.log
      touch /tmp/tpu_recovered
      cd /root/repo
      nohup bash benchmarks/r4_tpu_sweep.sh > /tmp/r4_sweep.out 2>&1 &
      echo $! > /tmp/r4_sweep.pid
      echo "$ts sweep launched pid $(cat /tmp/r4_sweep.pid)" >> /tmp/tpu_watch.log
      exit 0;;
    *) echo "$ts down" >> /tmp/tpu_watch.log;;
  esac
  sleep 300
done
