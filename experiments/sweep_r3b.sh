#!/bin/bash
# Round-3 gate candidates: backsolve + exact trace (the sweep-A winner) with
# cosine-decayed Lion to collapse the sign-update noise floor that holds
# tv_norm at ~0.25 (see flagship_r3_bx).
set -x
cd /root/repo
L=experiments/logs
COMMON="--config flagship --seed 1 --epochs 1200 --schedule cosine --aug-noise calibrated --eval-every 40 --eval-rtol 1e-5 --exact-trace"
python tools/literal_gates.py $COMMON --lr 3e-4 > $L/flagship_r3_bx_cos3e4.jsonl 2> $L/flagship_r3_bx_cos3e4.err
python tools/literal_gates.py $COMMON --lr 1e-3 > $L/flagship_r3_bx_cos1e3.jsonl 2> $L/flagship_r3_bx_cos1e3.err
