#!/bin/bash
# Round-2 sweep D: stabilize the readme calibrated PASS across seeds (Lion lr).
cd /root/repo
mkdir -p experiments/logs
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  timeout 2000 python tools/literal_gates.py "$@" > "experiments/logs/$name.jsonl" 2> "experiments/logs/$name.err"
  tail -1 "experiments/logs/$name.jsonl"
}
run readme_cal_lr3e4_s1 --config readme --seed 1 --lr 3e-4 --aug-noise calibrated
run readme_cal_lr3e4_s2 --config readme --seed 2 --lr 3e-4 --aug-noise calibrated
run readme_cal_lr3e4_s3 --config readme --seed 3 --lr 3e-4 --aug-noise calibrated
run readme_cal_k4_s2    --config readme --seed 2 --lr 1e-3 --probes 4 --aug-noise calibrated
echo "SWEEP D DONE"
