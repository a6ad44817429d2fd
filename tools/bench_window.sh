#!/bin/bash
# Loadavg-gated bench protocol (the ROUND_NOTES exclusive-window
# discipline): for each of 3 runs, wait until the 1-minute loadavg is
# below 1.5 (the box takes multi-hour external spikes; never bench
# through one), then run bench.py at $SPARK_GRAFT_SF_DIR (default
# sf0.1). Each wait aborts to a WARN after 40 minutes so the protocol
# can't hang a round. Outputs /tmp/bench_run{1,2,3}.json and a
# start/end loadavg log — report the 3-run MEDIAN ratio, and treat a
# run whose warm total sits far off the cluster while DuckDB holds
# steady as spike-contaminated (re-run it).
set -u
LOG=${BENCH_WINDOW_LOG:-/tmp/bench_window.log}
for i in 1 2 3; do
  waited=0
  while :; do
    load=$(cut -d' ' -f1 /proc/loadavg)
    load5=$(cut -d' ' -f2 /proc/loadavg)
    # gate BOTH averages: a 1-min dip right after a heavy job passes
    # the 1-min gate while the box is still thermally/cache loaded
    # (r12 observed ~25-40% absolute inflation on both engines in
    # exactly that state) — require the 5-min average down too
    ok=$(python3 -c "print(1 if float('$load') < 1.5 and float('$load5') < 3.0 else 0)")
    [ "$ok" = "1" ] && break
    sleep 60; waited=$((waited+1))
    [ $waited -ge 40 ] && echo "WARN: run $i proceeding at load $load/$load5 after 40min" >> "$LOG" && break
  done
  echo "=== run $i start load: $(cat /proc/loadavg)" >> "$LOG"
  python bench.py > /tmp/bench_run$i.json 2>/tmp/bench_run$i.err
  rc=$?  # capture BEFORE the $(cat ...) substitution overwrites $?
  echo "=== run $i end load: $(cat /proc/loadavg) exit=$rc" >> "$LOG"
done
echo ALLDONE >> "$LOG"
