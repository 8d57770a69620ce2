#!/bin/bash
# Round-2 sweep C: seed-robustness of the readme calibrated PASS + 8-D diagnostics.
cd /root/repo
mkdir -p experiments/logs
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  timeout 4000 python tools/literal_gates.py "$@" > "experiments/logs/$name.jsonl" 2> "experiments/logs/$name.err"
  tail -1 "experiments/logs/$name.jsonl"
}
run readme_cal_s2       --config readme   --seed 2 --lr 1e-3 --aug-noise calibrated
run readme_cal_s3       --config readme   --seed 3 --lr 1e-3 --aug-noise calibrated
run flagship_noaug      --config flagship --seed 1 --lr 1e-3 --naug 0 --eval-every 25
run flagship_cal_long   --config flagship --seed 1 --lr 3e-4 --aug-noise calibrated --epochs 3000 --eval-every 100
echo "SWEEP C DONE"
