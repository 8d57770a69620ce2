#!/bin/bash
# Post-gates batch: artifacts that need the chip after the gate runs.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/cnf_tpu_cache
# Re-train every gate row at the round-5 kernels: the first run_gates pass
# reused round-4 cached recipe results (experiments/gate_results.json);
# REGRESSION.md must rest on this round's code.
mv experiments/gate_results.json experiments/gate_results_r4cache.json.bak 2>/dev/null
timeout 6000 python tools/run_gates.py > experiments/run_gates_r5.log 2>&1
echo "rc=$?" >> experiments/run_gates_r5.log
timeout 2400 python benchmarks/tabular.py --out TABULAR_r05.json \
  > experiments/tabular_r5.log 2>&1
timeout 3000 python experiments/recipe_walltime_r5.py --epochs 60 \
  --out experiments/recipe_walltime_r5.json > experiments/recipe_walltime_r5.log 2>&1
timeout 900 python bench.py > experiments/bench_r5_local.json 2> experiments/bench_r5_local.err
echo FINAL_QUEUE_R5_DONE
