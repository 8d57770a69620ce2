#!/bin/bash
# Round-4 flagship gated runs: SAME recipe as round 3 (cosine 450, logit,
# exact divergence, calibrated aug) but now executing on the fused
# megakernels (the exact-divergence TRAIN stage + adjoint landed this round;
# tools/literal_gates.py turns fused on automatically on the real chip).
# Seeds 1-3 for the robustness table; round-3 logs kept for the wall-time
# comparison row in REGRESSION.md.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/cnf_tpu_cache
L=experiments/logs
GATED="--config flagship --exact-trace --aug-noise calibrated --eval-every 25 --eval-rtol 1e-5 --lr 3e-4 --tail-avg 0.5 --logit --epochs 450 --schedule cosine"
python tools/literal_gates.py $GATED --seed 1 \
  --save-ckpt experiments/ckpt/flagship_r4_gated.msgpack \
  > $L/flagship_r4_gated.jsonl 2> $L/flagship_r4_gated.err
python tools/literal_gates.py $GATED --seed 2 \
  > $L/flagship_r4_gated_s2.jsonl 2> $L/flagship_r4_gated_s2.err
python tools/literal_gates.py $GATED --seed 3 \
  > $L/flagship_r4_gated_s3.jsonl 2> $L/flagship_r4_gated_s3.err
echo GATED_QUEUE_R4_DONE
