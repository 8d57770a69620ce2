#!/bin/bash
# Post-gates batch: artifacts that need the chip after the gate runs.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/cnf_tpu_cache
timeout 2400 python benchmarks/tabular.py --out TABULAR_r05.json \
  > experiments/tabular_r5.log 2>&1
timeout 3000 python experiments/recipe_walltime_r5.py --epochs 60 \
  --out experiments/recipe_walltime_r5.json > experiments/recipe_walltime_r5.log 2>&1
timeout 900 python bench.py > experiments/bench_r5_local.json 2> experiments/bench_r5_local.err
echo FINAL_QUEUE_R5_DONE
