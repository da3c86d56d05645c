#!/bin/bash
# Probe-gated 4->16 scaling pair hunter. Fires a PairBench pair ONLY when
# both the tag-loop CPU probe and the memory-bandwidth probe read clean
# (the tag probe alone is blind to bandwidth steal - see BASELINE.md r5
# adjudication). Appends everything to the log; exits on time budget.
# Usage: gated416.sh <budget_sec> <log>
set -u
BUDGET=${1:-4800}
LOG=${2:-/tmp/gated416.log}
CPU_GATE=2450000      # texts/s at 16 threads (clean phases: 2.7-2.9M)
BW_GATE=140           # GiB/s at 16 threads (clean probe today: 171)
cd /root/repo
echo "=== gated416 start $(date +%T) budget=${BUDGET}s cpu_gate=$CPU_GATE bw_gate=$BW_GATE ===" >> "$LOG"
START=$SECONDS
while [ $((SECONDS - START)) -lt "$BUDGET" ]; do
  touch /tmp/graft-bench.lock
  OUT=$(sbt -batch "runMain graft.tools.CpuScale 16 16" "runMain graft.tools.MemBw 16" 2>&1)
  CPU=$(echo "$OUT" | grep -o 'texts/s=[ ]*[0-9]*' | grep -o '[0-9]*$' | sort -n | tail -1)
  BW=$(echo "$OUT" | grep -o 'bandwidth=[ ]*[0-9]*\.[0-9]*' | grep -o '[0-9.]*$' | sort -n | tail -1 | cut -d. -f1)
  CPU=${CPU:-0}; BW=${BW:-0}
  echo "$(date +%T) probe cpu16=$CPU bw16=$BW" >> "$LOG"
  if [ "$CPU" -ge "$CPU_GATE" ] && [ "$BW" -ge "$BW_GATE" ]; then
    echo "$(date +%T) GATE OPEN - firing pair" >> "$LOG"
    sbt -batch "runMain graft.tools.PairBench /dev/shm/graft-bench1x partcache 1 4 16" 2>&1 \
      | grep -E "PAIR|BEST" >> "$LOG"
    POST=$(sbt -batch "runMain graft.tools.CpuScale 16" "runMain graft.tools.MemBw 16" 2>&1)
    PC=$(echo "$POST" | grep -o 'texts/s=[ ]*[0-9]*' | grep -o '[0-9]*$' | sort -n | tail -1)
    PB=$(echo "$POST" | grep -o 'bandwidth=[ ]*[0-9]*\.[0-9]*' | grep -o '[0-9.]*$' | sort -n | tail -1 | cut -d. -f1)
    echo "$(date +%T) post-probe cpu16=${PC:-0} bw16=${PB:-0}" >> "$LOG"
  else
    rm -f /tmp/graft-bench.lock
    sleep 120
  fi
done
rm -f /tmp/graft-bench.lock
echo "=== gated416 done $(date +%T) ===" >> "$LOG"
