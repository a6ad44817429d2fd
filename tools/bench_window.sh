#!/bin/bash
# Loadavg-gated bench protocol (the ROUND_NOTES exclusive-window
# discipline): for each of 3 runs, wait until the box is QUIET, then
# run bench.py at $SPARK_GRAFT_SF_DIR (default sf0.1). Quiet means all
# THREE loadavg windows are down — r12 showed a 0.39/2.61/3.66 state
# passing the old two-average gate and producing a ratio-2.30 outlier
# (the 15-min average still carried a 19-minute pytest run's residue).
# Each wait aborts to a WARN after 40 minutes so the protocol can't
# hang a round.
#
# DuckDB-total sanity band: on a truly quiet box the sf0.1 oracle total
# sits ~16.5-21s for the 68-entry catalog. Since round 14 the band is
# LOG-ONLY (an out-of-band run is logged as SPIKE but kept): retrying
# on the oracle total alone was asymmetric — contention that hit
# mainly the Spark half was kept while slow-duck runs were retried,
# biasing the ratio (round-13 ADVICE). The in-run cpu_steal_pct retry
# is the symmetric contamination gate; bench_median.py flags cross-run
# outliers on BOTH totals in the committed artifact. Override with
# DUCK_BAND=lo:hi / DUCK_BAND=off — it auto-disables when
# SPARK_GRAFT_SF_DIR points anywhere but the default sf0.1.
#
# Outputs /tmp/bench_run{1,2,3}.json (compact lines),
# /tmp/bench_full_run{1,2,3}.json (full per-query artifacts) and a
# start/end loadavg log; then folds the window into per-query MEDIANS
# via tools/bench_median.py → /tmp/bench_window_median.json — commit
# THAT as BENCH_local_sf01_r<N>.json, so per-query deltas are
# triage-able from the repo (round-12 verdict #1).
set -u
LOG=${BENCH_WINDOW_LOG:-/tmp/bench_window.log}
HERE="$(cd "$(dirname "$0")" && pwd)"
DUCK_BAND=${DUCK_BAND:-auto}
if [ "$DUCK_BAND" = "auto" ]; then
  case "${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}" in
    # floor recalibrated r14: a TRULY clean box (steal < 2.5%) runs the
    # 69-entry oracle at 16.0-17.4s — the old 16.5 floor was itself set
    # under residual contamination and flagged faster-than-band runs
    */sf0.1|*/sf0.1/) DUCK_BAND="15.5:21.0" ;;
    *) DUCK_BAND="off" ;;
  esac
fi
for i in 1 2 3; do
  # a slot whose every attempt fails must be MISSING, not a leftover
  # from an earlier window — bench_median.py hard-errors on missing
  # or duplicate run artifacts rather than silently folding stale data
  rm -f /tmp/bench_full_run$i.json
  for attempt in 1 2; do
    waited=0
    while :; do
      read -r load load5 load15 _ < /proc/loadavg
      # gate ALL THREE averages: a 1/5-min dip right after a heavy job
      # passes the short gates while the box is still loaded (r12's
      # 2.30-ratio outlier started at 15-min loadavg 3.66)
      ok=$(python3 -c "print(1 if float('$load') < 1.5 and float('$load5') < 3.0 and float('$load15') < 2.0 else 0)")
      if [ "$ok" = "1" ]; then
        # loadavg can read 0.02 while the HOST is oversubscribed (this
        # is a VM: round 13 measured 8.7% steal under a burst at idle
        # loadavg, inflating both engines 20-40%). Probe steal with a
        # 2s full-width burst; require < 3% of demanded CPU stolen.
        steal=$(python3 -c "
import multiprocessing as mp, time
def burn(e):
    t0=time.time()
    x=0
    while time.time()-t0 < 2.0: x ^= 1
def snap():
    return [int(v) for v in open('/proc/stat').readline().split()[1:]]
a=snap()
ps=[mp.Process(target=burn,args=(None,)) for _ in range(16)]
[p.start() for p in ps]; [p.join() for p in ps]
b=snap()
d=[y-x for x,y in zip(a,b)]
dem=sum(d)-d[3]-d[4]
print(round(100.0*d[7]/dem,2) if dem>0 else 0.0)")
        inquiet=$(python3 -c "print(1 if float('$steal') < 3.0 else 0)")
        [ "$inquiet" = "1" ] && break
        echo "STEAL: run $i gate held at steal ${steal}% (load $load/$load5/$load15)" >> "$LOG"
      fi
      sleep 60; waited=$((waited+1))
      [ $waited -ge 40 ] && echo "WARN: run $i proceeding at load $load/$load5/$load15 after 40min" >> "$LOG" && break
    done
    echo "=== run $i attempt $attempt start load: $(cat /proc/loadavg)" >> "$LOG"
    # delete the previous artifact FIRST: a crashed run must not let a
    # stale bench_out.json masquerade as this run (round-13 ADVICE
    # medium — the stale copy passed every gate and was folded into
    # the window medians as a silent duplicate)
    rm -f "$HERE/../bench_out.json"
    # chain of custody (round-14 VERDICT nit): hand the gate's OWN
    # pre-exec loadavg to bench.py so the committed artifact records
    # both the gate's reading and the bench's own re-check
    read -r gl1 gl5 gl15 _ < /proc/loadavg
    SPARK_GRAFT_GATE_LOADAVG="$gl1,$gl5,$gl15" \
      python "$HERE/../bench.py" > /tmp/bench_run$i.json 2>/tmp/bench_run$i.err
    rc=$?  # capture BEFORE the $(cat ...) substitution overwrites $?
    echo "=== run $i attempt $attempt end load: $(cat /proc/loadavg) exit=$rc" >> "$LOG"
    if [ $rc -ne 0 ] || [ ! -f "$HERE/../bench_out.json" ]; then
      echo "FAIL: run $i exit=$rc artifact=$([ -f "$HERE/../bench_out.json" ] && echo present || echo missing) — retrying slot" >> "$LOG"
      continue
    fi
    cp "$HERE/../bench_out.json" /tmp/bench_full_run$i.json
    # in-run steal check first: the pre-run probe can pass and the
    # host contend seconds later (observed 20% stolen across a run
    # whose probe read 0%); the in-artifact fraction is ground truth
    rsteal=$(python3 -c "
import json
try: print(json.load(open('/tmp/bench_full_run$i.json')).get('cpu_steal_pct', 0) or 0)
except Exception: print(0)")
    stole=$(python3 -c "print(1 if float('$rsteal') > 5.0 else 0)")
    if [ "$stole" = "1" ]; then
      echo "STEAL: run $i measured ${rsteal}% in-run steal — retrying" >> "$LOG"
      continue
    fi
    # duck band is LOG-ONLY since round 14 (ADVICE: retrying on the
    # oracle total alone was an asymmetric filter — a run whose
    # contention hit mainly the Spark half was kept while only
    # slow-duck runs were retried, biasing the committed ratio). The
    # in-run steal retry above is the symmetric physical gate;
    # bench_median.py additionally flags BOTH totals' cross-run
    # outliers in the committed artifact so a suspect slot is visible
    # and re-runnable.
    if [ "$DUCK_BAND" != "off" ]; then
      duck=$(python3 -c "
import json,sys
try:
    print(json.load(open('/tmp/bench_full_run$i.json'))['duckdb_oracle_total_sec'])
except Exception:
    print('nan')")
      inband=$(python3 -c "
lo, hi = '$DUCK_BAND'.split(':')  # python vars — NOT shell-interpolated
try: print(1 if float(lo) <= float('$duck') <= float(hi) else 0)
except ValueError: print(0)")
      [ "$inband" != "1" ] && echo "SPIKE: run $i duck total ${duck}s outside band $DUCK_BAND (log-only)" >> "$LOG"
    fi
    break
  done
done
python "$HERE/bench_median.py" /tmp/bench_full_run1.json /tmp/bench_full_run2.json /tmp/bench_full_run3.json > /tmp/bench_window_median.json 2>> "$LOG"
echo ALLDONE >> "$LOG"
