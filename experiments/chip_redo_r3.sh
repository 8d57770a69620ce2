#!/bin/bash
# Re-run the two chip artifacts that timed out under contention, plus a
# verbose parity log.  One serialized TPU session; chained behind run_gates.
set -x
cd /root/repo
timeout 900 python experiments/verify_drive_r3.py \
  > experiments/verify_drive_r3b.out 2> experiments/verify_drive_r3b.err
CNF_TPU_TESTS=1 timeout 1200 python -m pytest tests/test_tpu_parity.py -m tpu -v -ra \
  2>&1 | tee experiments/tpu_parity_r3.log
# trbdf2 stiff fallback on real-chip numerics (file has no tpu marker; run as-is)
CNF_TPU_TESTS=1 timeout 1200 python -m pytest tests/test_implicit.py -v -ra \
  2>&1 | tee experiments/tpu_implicit_r3.log
timeout 1500 python tools/roofline_audit.py --write \
  2>&1 | tee experiments/roofline_audit_r3.out
timeout 1500 python bench.py > experiments/bench_r3_local.json 2> experiments/bench_r3_local.err
echo REDO_ALL_DONE
