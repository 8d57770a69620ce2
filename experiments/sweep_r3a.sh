#!/bin/bash
# Round-3 flagship diagnostic sweep: isolate the round-2 instability.
# Factors: adjoint gradient accuracy (backsolve vs direct) x trace estimator
# noise (1-probe Hutchinson vs exact divergence).  Round-2 baseline =
# backsolve+hutch (flagship_cal_* logs): mad_shape ~40-50, log_mad/d ~1.3.
set -x
cd /root/repo
L=experiments/logs
COMMON="--config flagship --seed 1 --epochs 300 --lr 3e-4 --aug-noise calibrated --eval-every 20 --eval-rtol 1e-5"
python tools/literal_gates.py $COMMON --exact-trace --adjoint direct  > $L/flagship_r3_dx.jsonl 2> $L/flagship_r3_dx.err
python tools/literal_gates.py $COMMON --exact-trace                   > $L/flagship_r3_bx.jsonl 2> $L/flagship_r3_bx.err
python tools/literal_gates.py $COMMON --adjoint direct                > $L/flagship_r3_dh.jsonl 2> $L/flagship_r3_dh.err
