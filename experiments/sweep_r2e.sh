#!/bin/bash
# Round-2 sweep E: longer-budget robustness of calibrated readme across seeds.
cd /root/repo
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  timeout 3000 python tools/literal_gates.py "$@" > "experiments/logs/$name.jsonl" 2> "experiments/logs/$name.err"
  tail -1 "experiments/logs/$name.jsonl"
}
run readme_cal_3e4_800_s2  --config readme --seed 2 --lr 3e-4 --epochs 800 --eval-every 25 --aug-noise calibrated
run readme_cal_3e4_800_s3  --config readme --seed 3 --lr 3e-4 --epochs 800 --eval-every 25 --aug-noise calibrated
run readme_cal_1e4_1200_s2 --config readme --seed 2 --lr 1e-4 --epochs 1200 --eval-every 50 --aug-noise calibrated
run readme_cal_1e4_1200_s3 --config readme --seed 3 --lr 1e-4 --epochs 1200 --eval-every 50 --aug-noise calibrated
echo "SWEEP E DONE"
