#!/bin/bash
# Run the full adversarial-axis battery sequentially on the current
# HEAD, one tool at a time (concurrent sweeps contaminate each other's
# timings and can flake the streaming kill-timing probes). Appends a
# one-line verdict per axis to the log; exit code is the count of
# failed axes.
#
# Usage: bash tools/run_axis_battery.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/axis_battery.log}"
: > "$LOG"
fails=0
run() {
  local name="$1"; shift
  local t0=$SECONDS
  if "$@" > /tmp/axis_last.out 2>&1; then
    echo "PASS $name ($((SECONDS-t0))s): $(tail -1 /tmp/axis_last.out)" >> "$LOG"
  else
    echo "FAIL $name ($((SECONDS-t0))s): $(tail -3 /tmp/axis_last.out | tr '\n' ' ')" >> "$LOG"
    fails=$((fails+1))
  fi
}
run hostile            python tools/hostile_check.py
run weird-confs        python tools/hostile_check.py --weird-confs
run ansi-off           python tools/hostile_check.py --ansi-off
run ts-domain          python tools/ts_domain_check.py
run nan-mirror         python tools/nan_mirror_check.py
run locale             python tools/locale_check.py
run empty-input        python tools/empty_check.py
run input-split        python tools/input_split_check.py
run partition-sweep    python tools/partition_sweep_check.py
run multijvm           python tools/multijvm_check.py
run executor-loss      python tools/executor_loss_check.py
run executor-count     python tools/executor_count_check.py
run value-skew         python tools/value_skew_check.py
run schema-drift       python tools/schema_drift_check.py
run reuse-flavor       python tools/checkpoint_reliable_check.py
run corrupted-input    python tools/corrupt_input_check.py
run memory-ceiling     python tools/memory_ceiling_check.py
run disk-pressure      python tools/disk_pressure_check.py
run stream-chaos       python tools/stream_chaos_check.py
run drift-pins         python tools/drift_pin_check.py
run file-source-chaos  python tools/file_source_chaos_check.py
run txnlog-race        python tools/txnlog_race_check.py
run state-format-drift python tools/state_format_drift_check.py
run vacuum-race        python tools/txnlog_vacuum_race_check.py
run writer-permission  python tools/writer_permission_check.py
run pydep-drift        python tools/pydep_drift_check.py
run vacuum-writer-race python tools/txnlog_vacuum_writer_race_check.py
run clock-skew         python tools/clock_skew_check.py
echo "battery done: $fails axis failure(s)" >> "$LOG"
exit "$fails"
