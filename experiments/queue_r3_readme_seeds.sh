#!/bin/bash
# README gate, one fixed recipe across all three seeds: 2000-ep cosine,
# exact divergence, calibrated aug, logit bijector, tail-avg 0.5 (seed 3
# measured passing at this recipe: readme_r3l_s3_logit.jsonl).
set -x
cd /root/repo
L=experiments/logs
COMMON="--config readme --epochs 2000 --schedule cosine --lr 3e-4 --exact-trace --aug-noise calibrated --eval-every 50 --eval-rtol 1e-5 --tail-avg 0.5 --logit"
python tools/literal_gates.py $COMMON --seed 1 \
  > $L/readme_r3_final_s1.jsonl 2> $L/readme_r3_final_s1.err
python tools/literal_gates.py $COMMON --seed 2 \
  > $L/readme_r3_final_s2.jsonl 2> $L/readme_r3_final_s2.err
echo README_SEEDS_DONE
