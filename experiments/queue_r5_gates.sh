#!/bin/bash
# Round-5 gate queue: density-quality gates on the real chip with the
# round-5 kernels (bf16x3 auto precision + generalized megakernels) —
# validates that the speedups did not cost gate quality, and refreshes
# REGRESSION.md wall-time rows.  Run AFTER experiments/queue_r5.sh.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/cnf_tpu_cache
L=experiments/logs
GATED="--config flagship --exact-trace --aug-noise calibrated --eval-every 25 --eval-rtol 1e-5 --lr 3e-4 --tail-avg 0.5 --logit --epochs 450 --schedule cosine"
timeout 3000 python tools/literal_gates.py $GATED --seed 1 \
  --save-ckpt experiments/ckpt/flagship_r5_gated.msgpack \
  > $L/flagship_r5_gated.jsonl 2> $L/flagship_r5_gated.err
timeout 3000 python tools/literal_gates.py $GATED --seed 2 \
  > $L/flagship_r5_gated_s2.jsonl 2> $L/flagship_r5_gated_s2.err
timeout 3000 python tools/literal_gates.py $GATED --seed 3 \
  > $L/flagship_r5_gated_s3.jsonl 2> $L/flagship_r5_gated_s3.err
timeout 6000 python tools/run_gates.py > experiments/run_gates_r5.log 2>&1
echo "rc=$?" >> experiments/run_gates_r5.log
# Re-validate the final revision (backward dt warm-start) on-chip.
CNF_TPU_TESTS=1 timeout 1800 python -m pytest tests/test_tpu_parity.py -m tpu -q -n 0   > experiments/tpu_pytest_r5b.log 2>&1; echo "rc=$?" >> experiments/tpu_pytest_r5b.log
timeout 3000 python experiments/tpu_parity_r5.py   > experiments/tpu_parity_r5.log 2>&1; echo "rc=$?" >> experiments/tpu_parity_r5.log
echo GATES_QUEUE_R5_DONE
