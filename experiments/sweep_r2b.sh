#!/bin/bash
# Round-2 sweep B: calibrated transported augmentation (proper joint MLE).
cd /root/repo
mkdir -p experiments/logs
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  timeout 2000 python tools/literal_gates.py "$@" > "experiments/logs/$name.jsonl" 2> "experiments/logs/$name.err"
  tail -1 "experiments/logs/$name.jsonl"
}
run readme_cal_lr1e3   --config readme   --seed 1 --lr 1e-3 --aug-noise calibrated
run readme_cal_lr1e4   --config readme   --seed 1 --lr 1e-4 --aug-noise calibrated
run flagship_cal_lr1e3 --config flagship --seed 1 --lr 1e-3 --aug-noise calibrated --eval-every 25
run flagship_cal_lr1e4 --config flagship --seed 1 --lr 1e-4 --aug-noise calibrated --eval-every 25
echo "SWEEP B DONE"
