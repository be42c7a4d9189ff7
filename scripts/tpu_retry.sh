#!/bin/bash
# Run a TPU command with automatic tunnel-wedge detection and retry.
# usage: tpu_retry.sh <logfile> <cmd...>
# The axon tunnel client intermittently wedges at startup (process stuck
# in futex_wait at ~0% CPU); this watches CPU-time progress every 60 s
# and restarts the command (after a rest) when it stops accumulating.
LOG=$1; shift
for attempt in 1 2 3 4 5; do
  "$@" > "$LOG" 2>&1 &
  PID=$!
  last_cpu=-1
  wedged=0
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    kill -0 $PID 2>/dev/null || break
    CPU=$(ps -o time= -p $PID | awk -F: '{print $1*3600+$2*60+$3}')
    W=$(cat /proc/$PID/wchan 2>/dev/null)
    if [ "${CPU:-0}" = "$last_cpu" ] && [ "$W" = "futex_do_wait" ]; then
      wedged=1
      echo "[retry] attempt $attempt wedged (cpu stuck at ${CPU}s), killing $PID" >> "$LOG"
      kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null
      break
    fi
    last_cpu=$CPU
  done
  if [ "$wedged" = "0" ]; then
    wait $PID
    exit $?
  fi
  sleep 90
done
echo "[retry] all attempts wedged" >> "$LOG"; exit 1
