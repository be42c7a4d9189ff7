#!/bin/bash
# usage: tpu_retry.sh <logfile> <cmd...>
LOG=$1; shift
for attempt in 1 2 3 4 5; do
  "$@" > "$LOG" 2>&1 &
  PID=$!
  sleep 150
  if ! kill -0 $PID 2>/dev/null; then wait $PID; exit $?; fi
  CPU=$(ps -o time= -p $PID | awk -F: '{print $1*3600+$2*60+$3}')
  W=$(cat /proc/$PID/wchan 2>/dev/null)
  if [ "${CPU:-0}" -lt 15 ] && [ "$W" = "futex_do_wait" ]; then
    echo "[retry] attempt $attempt wedged (cpu=${CPU}s), killing $PID" >> "$LOG"
    kill $PID 2>/dev/null; sleep 5; kill -9 $PID 2>/dev/null
    sleep 90
    continue
  fi
  wait $PID; exit $?
done
echo "[retry] all attempts wedged" >> "$LOG"; exit 1
