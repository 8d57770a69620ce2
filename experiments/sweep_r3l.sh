#!/bin/bash
# Wave 3.5: logit input bijector (support-matched flow).  Hypothesis: the
# residual ~0.3-correlated-across-datasets systematic error component and the
# measured 1.6% boundary mass leakage come from fitting a compactly-supported
# Beta^8 with a smooth Gaussian-base flow in RAW coordinates; in logit space
# the target is light-tailed on R^d and the boundary vanishes.
set -x
cd /root/repo
L=experiments/logs
COMMON="--config flagship --seed 1 --schedule cosine --exact-trace --aug-noise calibrated --eval-every 50 --eval-rtol 1e-5 --epochs 2000 --lr 3e-4 --tail-avg 0.5"
python tools/literal_gates.py $COMMON --logit \
  --save-ckpt experiments/ckpt/f_r3l_logit.msgpack \
  --live-ckpt experiments/ckpt/f_r3l_logit_live.msgpack \
  > $L/flagship_r3l_logit.jsonl 2> $L/flagship_r3l_logit.err
python tools/literal_gates.py $COMMON --logit --x-jitter 0.05 \
  > $L/flagship_r3l_logit_jit.jsonl 2> $L/flagship_r3l_logit_jit.err
python tools/literal_gates.py $COMMON --logit --aug-noise 1.0 \
  > $L/flagship_r3l_logit_sig1.jsonl 2> $L/flagship_r3l_logit_sig1.err
# readme seed-3 rescue probe with logit
python tools/literal_gates.py --config readme --seed 3 --epochs 2000 \
  --schedule cosine --lr 3e-4 --exact-trace --aug-noise calibrated \
  --eval-every 50 --eval-rtol 1e-5 --tail-avg 0.5 --logit \
  > $L/readme_r3l_s3_logit.jsonl 2> $L/readme_r3l_s3_logit.err
