#!/bin/bash
# Wave 5b: flagship gate candidates — logit bijector at the reference-literal
# budget.  r3l measured the logit run INSIDE the gate (tv_norm 0.089-0.098,
# log_mad/d 0.036) over epochs ~194-354, overfitting slowly afterwards: the
# raw-space floor (0.137+) was a support-mismatch artifact, and the 2000-epoch
# budget was past the generalization minimum.  The reference's own regression
# budget is 300 epochs (test/regression_tests.jl:30) — probe final-params
# quality at budgets bracketing the measured minimum.
set -x
cd /root/repo
L=experiments/logs
COMMON="--config flagship --seed 1 --exact-trace --aug-noise calibrated --eval-every 25 --eval-rtol 1e-5 --lr 3e-4 --tail-avg 0.5 --logit"
python tools/literal_gates.py $COMMON --epochs 300 \
  > $L/flagship_r3n_const300.jsonl 2> $L/flagship_r3n_const300.err
python tools/literal_gates.py $COMMON --epochs 300 --schedule cosine \
  > $L/flagship_r3n_cos300.jsonl 2> $L/flagship_r3n_cos300.err
python tools/literal_gates.py $COMMON --epochs 450 --schedule cosine \
  > $L/flagship_r3n_cos450.jsonl 2> $L/flagship_r3n_cos450.err
python tools/literal_gates.py $COMMON --epochs 600 --schedule cosine \
  > $L/flagship_r3n_cos600.jsonl 2> $L/flagship_r3n_cos600.err
echo R3N_DONE
