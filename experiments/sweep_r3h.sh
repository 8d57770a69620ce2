#!/bin/bash
# README 1-D gate, seed robustness (round-2 judge ask #4): 3/3 seeds must
# pass mad/msd/tv <= 0.1 on FINAL params at ONE fixed recipe.  800-epoch
# cosine landed 1/3 (s2 0.111, s3 0.185) — double the budget and add Polyak
# tail averaging (the decay-free Lion sign-noise floor is the measured
# blocker; averaging is the textbook fix).
set -x
cd /root/repo
L=experiments/logs
COMMON="--config readme --epochs 2000 --schedule cosine --lr 3e-4 --aug-noise calibrated --exact-trace --eval-every 50 --eval-rtol 1e-5 --tail-avg 0.5"
for S in 1 2 3; do
  python tools/literal_gates.py $COMMON --seed $S \
    --live-ckpt experiments/ckpt/readme_r3h_s${S}_live.msgpack \
    --save-ckpt experiments/ckpt/readme_r3h_s${S}.msgpack \
    > $L/readme_r3h_s${S}.jsonl 2> $L/readme_r3h_s${S}.err
done
