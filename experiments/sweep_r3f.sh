#!/bin/bash
# Lambda-bias experiments: RNODE's kinetic/Jacobian regularizers (lam1=lam2=
# 1e-2) bias the learned density; the delta-analysis residual (~0.55 nats,
# idiosyncratic) is the suspected fingerprint.  E1/E3 measure the bias from
# scratch; E2/E4 anneal it away in a fine-tune phase warm-started from the
# RNODE-trained checkpoint (training-schedule choice; same model/arch/eval).
set -x
cd /root/repo
L=experiments/logs
COMMON="--config flagship --seed 1 --schedule cosine --aug-noise calibrated --exact-trace --eval-every 100 --eval-rtol 1e-5"
python tools/literal_gates.py $COMMON --epochs 2000 --lr 3e-4 --lam12 0 \
  --live-ckpt experiments/ckpt/f_r3f_e1_live.msgpack \
  > $L/flagship_r3f_lam0.jsonl 2> $L/flagship_r3f_lam0.err
python tools/literal_gates.py $COMMON --epochs 1000 --lr 1e-4 --lam12 0 \
  --init-ckpt experiments/ckpt/f_r3e_a.msgpack \
  --live-ckpt experiments/ckpt/f_r3f_e2_live.msgpack --save-ckpt experiments/ckpt/f_r3f_e2.msgpack \
  > $L/flagship_r3f_anneal.jsonl 2> $L/flagship_r3f_anneal.err
python tools/literal_gates.py $COMMON --epochs 2000 --lr 3e-4 --lam12 1e-3 \
  --live-ckpt experiments/ckpt/f_r3f_e3_live.msgpack \
  > $L/flagship_r3f_lam1e3.jsonl 2> $L/flagship_r3f_lam1e3.err
# E5: the full fine-tune — zero lambdas AND steering off: train exactly the
# t1=13 slice-MLE the gate evaluates, warm-started from the RNODE model.
python tools/literal_gates.py --config flagship --seed 1 --schedule cosine \
  --aug-noise calibrated --exact-trace --eval-every 50 --eval-rtol 1e-5 \
  --epochs 1000 --lr 1e-4 --lam12 0 --steer-rate 0 \
  --init-ckpt experiments/ckpt/f_r3e_a.msgpack \
  --live-ckpt experiments/ckpt/f_r3f_e5_live.msgpack --save-ckpt experiments/ckpt/f_r3f_e5.msgpack \
  > experiments/logs/flagship_r3f_ft_nosteer.jsonl 2> experiments/logs/flagship_r3f_ft_nosteer.err
