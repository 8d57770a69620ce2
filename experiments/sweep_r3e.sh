#!/bin/bash
# Retrain grid with the complete precision fix (the closure_convert wrap-gap
# meant ALL prior runs trained with bf16-noise adjoint gradients — the
# delta-analysis fingerprint of the tv_norm=0.18 plateau).
set -x
cd /root/repo
L=experiments/logs
COMMON="--config flagship --seed 1 --schedule cosine --aug-noise calibrated --exact-trace --eval-every 100 --eval-rtol 1e-5"
python tools/literal_gates.py $COMMON --epochs 2000 --lr 3e-4 \
  --live-ckpt experiments/ckpt/f_r3e_a_live.msgpack --save-ckpt experiments/ckpt/f_r3e_a.msgpack \
  > $L/flagship_r3e_lion3e4.jsonl 2> $L/flagship_r3e_lion3e4.err
python tools/literal_gates.py $COMMON --epochs 2000 --lr 1e-3 --opt adam \
  --live-ckpt experiments/ckpt/f_r3e_b_live.msgpack --save-ckpt experiments/ckpt/f_r3e_b.msgpack \
  > $L/flagship_r3e_adam1e3.jsonl 2> $L/flagship_r3e_adam1e3.err
python tools/literal_gates.py $COMMON --epochs 4000 --lr 3e-4 \
  --live-ckpt experiments/ckpt/f_r3e_c_live.msgpack --save-ckpt experiments/ckpt/f_r3e_c.msgpack \
  > $L/flagship_r3e_lion3e4_4k.jsonl 2> $L/flagship_r3e_lion3e4_4k.err
