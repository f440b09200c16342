#!/bin/bash
# Wait for the axon relay to come back, then collect all pending on-chip
# measurements via chip_session.sh. Designed to run detached (nohup).
#
# Probe protocol (see ROUND_NOTES "Ops gotcha" + outage postmortem):
# - TCP-connect poll is free and holds no claim.
# - A jax.devices() probe that hangs PRE-claim is safe to timeout-kill;
#   only mid-compile clients must never be killed. chip_session.sh runs
#   every real workload as a clean-exiting process, never killed.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_session.log
echo "=== chip_wait start $(date) ===" >> "$LOG"
while true; do
  if (exec 3<>/dev/tcp/127.0.0.1/8082) 2>/dev/null; then
    exec 3>&- 2>/dev/null
    echo "port 8082 open at $(date); verifying with jax probe" >> "$LOG"
    sleep 20
    if timeout 240 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
      echo "probe ok; starting chip session" >> "$LOG"
      bash scripts/chip_session.sh >> "$LOG" 2>&1
      echo "=== chip_wait done $(date) ===" >> "$LOG"
      exit 0
    fi
    echo "probe hung (pre-claim); relay not really up, re-polling" >> "$LOG"
  fi
  sleep 60
done
