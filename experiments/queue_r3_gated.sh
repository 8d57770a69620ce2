#!/bin/bash
# Official flagship gated run (cosine 450, logit, exact divergence, calibrated
# aug) + seed-robustness at the same recipe, then the readme s3 rescue wave,
# then full REGRESSION regeneration is done separately.
set -x
cd /root/repo
L=experiments/logs
GATED="--config flagship --exact-trace --aug-noise calibrated --eval-every 25 --eval-rtol 1e-5 --lr 3e-4 --tail-avg 0.5 --logit --epochs 450 --schedule cosine"
python tools/literal_gates.py $GATED --seed 1 \
  --save-ckpt experiments/ckpt/flagship_r3_gated.msgpack \
  --live-ckpt experiments/ckpt/flagship_r3_gated_live.msgpack \
  > $L/flagship_r3_gated.jsonl 2> $L/flagship_r3_gated.err
python tools/literal_gates.py $GATED --seed 2 \
  > $L/flagship_r3_gated_s2.jsonl 2> $L/flagship_r3_gated_s2.err
python tools/literal_gates.py $GATED --seed 3 \
  > $L/flagship_r3_gated_s3.jsonl 2> $L/flagship_r3_gated_s3.err
bash experiments/sweep_r3k.sh > experiments/logs_sweep_r3k.out 2>&1
echo GATED_QUEUE_DONE
