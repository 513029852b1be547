#!/bin/bash
# Unattended probe loop for the scaling sweep: every $SLEEP seconds run the
# GEMM host-load control; the first time the window is genuinely fast
# (factor < $THRESH) fire ONE keep-if-better sweep via sweep_when_quiet.sh
# and wait for it to settle before probing again.  At most $MAX_SWEEPS
# sweeps per invocation so a long watch can't monopolize the host.
# Log: /tmp/sweep_watch.log.  Intended usage: nohup tools/sweep_watch.sh &
cd "$(dirname "$0")/.."
THRESH=${1:-0.95}
SLEEP=${2:-300}
MAX_SWEEPS=${3:-3}
DEADLINE=${4:-18000}   # stop probing after this many seconds
START=$(date +%s)
fired=0
while :; do
  NOW=$(date +%s)
  if [ $((NOW - START)) -gt "$DEADLINE" ]; then
    echo "$(date +%T) watch deadline reached ($fired sweeps fired)"
    break
  fi
  if [ "$fired" -ge "$MAX_SWEEPS" ]; then
    echo "$(date +%T) max sweeps fired"
    break
  fi
  if bash tools/sweep_when_quiet.sh "$THRESH"; then
    fired=$((fired + 1))
    # sweep runs detached; wait for its compare step to write a verdict
    for i in $(seq 1 120); do
      sleep 30
      STATUS=$(cat /tmp/sweep_status.txt 2>/dev/null)
      case "$STATUS" in
        kept:*|restored:*) break ;;
      esac
    done
    echo "$(date +%T) sweep #$fired settled: $(cat /tmp/sweep_status.txt 2>/dev/null)"
    case "$(cat /tmp/sweep_status.txt 2>/dev/null)" in
      kept:*) echo "$(date +%T) improvement kept; stopping watch"; break ;;
    esac
  fi
  sleep "$SLEEP"
done
