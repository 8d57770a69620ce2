#!/bin/bash
# Round-2 sweep A: literal-gate hyperparameter match (wd=0 vs r1's silent wd=1e-3).
cd /root/repo
mkdir -p experiments/logs
run() {
  name="$1"; shift
  echo "=== $name: $* ==="
  timeout 1500 python tools/literal_gates.py "$@" > "experiments/logs/$name.jsonl" 2> "experiments/logs/$name.err"
  tail -1 "experiments/logs/$name.jsonl"
}
run readme_lr1e3_b299   --config readme   --seed 1 --lr 1e-3 --b2 0.99
run readme_lr1e3_b2999  --config readme   --seed 1 --lr 1e-3 --b2 0.999
run readme_lr1e4_b299   --config readme   --seed 1 --lr 1e-4 --b2 0.99
run flagship_lr1e3      --config flagship --seed 1 --lr 1e-3 --b2 0.99 --eval-every 25
echo "SWEEP A DONE"
