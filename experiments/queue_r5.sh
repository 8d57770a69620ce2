#!/bin/bash
# Round-5 artifact queue: measurement + parity battery on the real chip,
# run after the bf16x3 precision work landed.  Sequential — one chip.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/cnf_tpu_cache
L=experiments

timeout 3000 python tools/roofline_audit.py --write \
  > $L/roofline_audit_r5.json 2> $L/roofline_audit_r5.err
timeout 3000 python experiments/tpu_parity_r5.py \
  > $L/tpu_parity_r5.log 2>&1; echo "rc=$?" >> $L/tpu_parity_r5.log
CNF_TPU_TESTS=1 timeout 1800 python -m pytest tests/test_tpu_parity.py -m tpu -q -n 0 \
  > $L/tpu_pytest_r5.log 2>&1; echo "rc=$?" >> $L/tpu_pytest_r5.log
timeout 1800 python experiments/tight_tol_r5.py --out experiments/tight_tol_r5.json \
  > $L/tight_tol_r5.log 2>&1
timeout 3000 python experiments/recipe_walltime_r5.py --epochs 60 \
  --out experiments/recipe_walltime_r5.json > $L/recipe_walltime_r5.log 2>&1
timeout 1800 python benchmarks/tabular.py --out TABULAR_r05.json \
  > $L/tabular_r5.log 2>&1
echo QUEUE_R5_DONE
