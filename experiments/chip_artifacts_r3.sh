#!/bin/bash
# One serialized TPU session producing the round-3 evidence artifacts:
#   1. on-chip kernel parity suite log  (round-2 judge ask #5)
#   2. roofline audit: counter-independent per-NFE + adjoint numbers (#6)
#   3. tabular benchmark JSON (#9)
#   4. round-1 anchor re-measure under current methodology (#7)
#   5. bench.py sanity run
set -x
cd /root/repo
CNF_TPU_TESTS=1 timeout 1800 python -m pytest tests/test_tpu_parity.py -m tpu -q \
  2>&1 | tee experiments/tpu_parity_r3.log
timeout 1500 python tools/roofline_audit.py --write \
  2>&1 | tee experiments/roofline_audit_r3.out
timeout 1500 python benchmarks/tabular.py > TABULAR_r03.json 2> experiments/tabular_r3.err
timeout 1800 python tools/bench_anchor.py 2> experiments/bench_anchor_r3.err
timeout 1500 python bench.py > experiments/bench_r3_local.json 2> experiments/bench_r3_local.err
echo ALL_DONE
