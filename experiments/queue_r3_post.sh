#!/bin/bash
# Reordered round-3 queue (gate-critical first; logit graphs already cached):
#   verify drive -> r3n budget wave -> readme s3 logit probe -> r3k rescue
#   wave -> jitter 0.10 scan point.
set -x
cd /root/repo
L=experiments/logs
python experiments/verify_drive_r3.py > experiments/verify_drive_r3.json 2> $L/verify_drive_r3.err
bash experiments/sweep_r3n.sh > experiments/logs_sweep_r3n.out 2>&1
python tools/literal_gates.py --config readme --seed 3 --epochs 2000 \
  --schedule cosine --lr 3e-4 --exact-trace --aug-noise calibrated \
  --eval-every 50 --eval-rtol 1e-5 --tail-avg 0.5 --logit \
  > $L/readme_r3l_s3_logit.jsonl 2> $L/readme_r3l_s3_logit.err
bash experiments/sweep_r3k.sh > experiments/logs_sweep_r3k.out 2>&1
python tools/literal_gates.py --config flagship --seed 1 --schedule cosine \
  --exact-trace --aug-noise calibrated --eval-every 50 --eval-rtol 1e-5 \
  --epochs 2000 --lr 3e-4 --tail-avg 0.5 --x-jitter 0.10 \
  > $L/flagship_r3m_jit010.jsonl 2> $L/flagship_r3m_jit010.err
echo QUEUE_DONE
