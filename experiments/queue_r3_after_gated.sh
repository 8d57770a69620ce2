#!/bin/bash
# After the official gated s1 run: flagship seeds 2,3 at the gated recipe,
# then the README 3-seed fixed-recipe runs (s1, s2; s3 already measured).
set -x
cd /root/repo
L=experiments/logs
GATED="--config flagship --exact-trace --aug-noise calibrated --eval-every 25 --eval-rtol 1e-5 --lr 3e-4 --tail-avg 0.5 --logit --epochs 450 --schedule cosine"
python tools/literal_gates.py $GATED --seed 2 \
  > $L/flagship_r3_gated_s2.jsonl 2> $L/flagship_r3_gated_s2.err
python tools/literal_gates.py $GATED --seed 3 \
  > $L/flagship_r3_gated_s3.jsonl 2> $L/flagship_r3_gated_s3.err
bash experiments/queue_r3_readme_seeds.sh > experiments/logs_queue_readme_seeds.out 2>&1
echo AFTER_GATED_DONE
