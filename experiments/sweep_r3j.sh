#!/bin/bash
# Wave 4 (contingent): deep-ensemble estimator on the pinned flagship config.
# M=8 members, SAME data (--seed 1), independent init/batch order
# (--init-seed).  The ensemble density est = mean_m p_hat_m(x) is evaluated
# by experiments/ensemble_eval.py on the members' FINAL params (no selection).
set -x
cd /root/repo
L=experiments/logs
COMMON="--config flagship --seed 1 --schedule cosine --exact-trace --aug-noise calibrated --eval-every 100 --eval-rtol 1e-5 --epochs 2000 --lr 3e-4"
for M in 1 2 3 4 5 6 7 8; do
  python tools/literal_gates.py $COMMON --init-seed $M \
    --save-ckpt experiments/ckpt/f_ens_m${M}.msgpack \
    --live-ckpt experiments/ckpt/f_ens_m${M}_live.msgpack \
    > $L/flagship_r3j_m${M}.jsonl 2> $L/flagship_r3j_m${M}.err
done
