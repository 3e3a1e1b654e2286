#!/bin/bash
# Tunnel-wedge watchdog for the r5full 20k run (BENCHMARKS.md round-5
# infrastructure incident). The axon tunnel's far end stopped responding at
# 07:17 with the trainer blocked in a device call and NO checkpoint on disk.
#
# Policy (per 60 s tick):
#   * training log advanced            -> healthy, keep waiting
#   * trainer process died             -> tunnel sent an error; relaunch fresh
#   * log stale: run a 120 s tiny-op probe in a subprocess.
#     Probe SUCCESS means the tunnel serves new clients while the trainer is
#     still stuck. Three consecutive successful probes >=5 min apart with no
#     log progress = the old client session is permanently wedged -> kill it
#     (pid file only, never pattern-kill) and relaunch fresh.
# The 3-probe delay exists because a genuinely-resumed run may spend minutes
# in the pending vis compile before its next log line.
set -u
cd "$(dirname "$0")/.."
LOG=${F2_WD_TRAINLOG:-/tmp/full20k_r5full.log}
PIDFILE=${F2_WD_PIDFILE:-/tmp/r5full.pid}
WDLOG=/tmp/r5_watchdog.log
EXP=${F2_WD_EXP:-r5full}
PROBE_OK=0

say() { echo "$(date -u +%H:%M:%S) $*" >> "$WDLOG"; }

probe() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
assert float((x @ x).sum()) > 0
EOF
}

relaunch() {
  say "relaunching ${EXP} (resumes from the latest checkpoint when one exists)"
  mv "$LOG" "${LOG}.wedged.$(date -u +%H%M%S)" 2>/dev/null || true
  # plain `cmd &` (no && chain): $! must be the timeout pid itself — a
  # compound list backgrounds an intermediate subshell and the pid file
  # then points at the wrong process (the 09:25 double-watchdog incident)
  RESUME=""
  [ -d "exp/ngp_fox/${EXP}/checkpoints" ] && RESUME="is_continue=true"
  nohup timeout 23000 python scripts/run.py \
      --config-name=wanjinyou dataset_name=example case_name=ngp_fox \
      mode=train train.save_freq=2500 +work_dir=/root/repo \
      exp_name="${EXP}" ${RESUME} > "$LOG" 2>&1 &
  echo $! > "$PIDFILE"
  say "relaunched, pid $(cat "$PIDFILE")"
  PROBE_OK=0
}

say "watchdog start (log=$LOG pid=$(cat "$PIDFILE" 2>/dev/null))"
LAST_MTIME=$(stat -c %Y "$LOG" 2>/dev/null || echo 0)
while true; do
  sleep 60
  PID=$(cat "$PIDFILE" 2>/dev/null || echo "")
  MTIME=$(stat -c %Y "$LOG" 2>/dev/null || echo 0)
  if [ "$MTIME" != "$LAST_MTIME" ]; then
    LAST_MTIME=$MTIME; PROBE_OK=0
    continue                      # healthy progress
  fi
  if [ -z "$PID" ] || ! kill -0 "$PID" 2>/dev/null; then
    say "trainer process gone; relaunching"
    relaunch
    continue
  fi
  # a probe is itself a second TPU client, and two clients can wedge each
  # other mid-compile (verify skill gotcha; plausibly what killed relaunch
  # #1): never probe until the log has been stale >= 15 min, far beyond
  # any legitimate fresh-key compile (30-45 s) or eval compile (minutes)
  STALE=$(( $(date +%s) - MTIME ))
  if [ "$STALE" -lt 900 ]; then
    PROBE_OK=0
    continue
  fi
  # stale log + live process: probe the tunnel with a fresh client
  if probe; then
    PROBE_OK=$((PROBE_OK + 1))
    say "probe ok (${PROBE_OK}/6) while trainer stale"
    if [ "$PROBE_OK" -ge 6 ]; then
      say "tunnel healthy but trainer wedged; killing $PID"
      # the pid file holds the `timeout` wrapper; its python child has the
      # graceful-SIGTERM handler but is BLOCKED in a device call, so only
      # SIGKILL moves it — kill the exact child pid (never by pattern)
      CHILD=$(pgrep -P "$PID" 2>/dev/null | head -1)
      kill "$PID" 2>/dev/null; sleep 10
      kill -9 "$PID" 2>/dev/null
      [ -n "${CHILD}" ] && kill -9 "$CHILD" 2>/dev/null
      relaunch
    else
      sleep 240                   # space the probes >=5 min apart
    fi
  else
    [ $((PROBE_OK)) -gt 0 ] && say "probe hung again; resetting streak"
    PROBE_OK=0
  fi
done
