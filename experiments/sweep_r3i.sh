#!/bin/bash
# Wave 3: bias-variance walk on the flagship gate.  Wave-2 measured the
# tv_norm floor (~0.15-0.17 final, 0.137-0.147 best) INVARIANT to lambda,
# optimizer, budget, width x2, aug sigma, and param tail-averaging; the
# fresh-point KL ~0.25 nats matches parametric estimation error at n=1024 —
# the binding constraint is VARIANCE.  Knobs that reduce effective dof
# without touching the reference architecture: weight decay (the reference's
# Optimisers.jl composes decay via OptimiserChain when needed), budget, and
# smoothed MLE (x_jitter: KDE-bandwidth analog).  Width-DOWN runs are
# diagnostics for the variance branch, not gate candidates.
set -x
cd /root/repo
L=experiments/logs
COMMON="--config flagship --seed 1 --schedule cosine --exact-trace --aug-noise calibrated --eval-every 50 --eval-rtol 1e-5 --epochs 2000 --lr 3e-4 --tail-avg 0.5"
python tools/literal_gates.py $COMMON --wd 0.03 \
  > $L/flagship_r3i_wd003.jsonl 2> $L/flagship_r3i_wd003.err
python tools/literal_gates.py $COMMON --wd 0.1 \
  > $L/flagship_r3i_wd01.jsonl 2> $L/flagship_r3i_wd01.err
python tools/literal_gates.py $COMMON --wd 0.3 \
  > $L/flagship_r3i_wd03.jsonl 2> $L/flagship_r3i_wd03.err
python tools/literal_gates.py $COMMON --x-jitter 0.02 \
  > $L/flagship_r3i_jit002.jsonl 2> $L/flagship_r3i_jit002.err
python tools/literal_gates.py $COMMON --x-jitter 0.05 \
  > $L/flagship_r3i_jit005.jsonl 2> $L/flagship_r3i_jit005.err
# diagnostics: width DOWN (variance-branch probe)
python tools/literal_gates.py $COMMON --width-mult 1 \
  > $L/flagship_r3i_w1.jsonl 2> $L/flagship_r3i_w1.err
python tools/literal_gates.py $COMMON --width-mult 2 \
  > $L/flagship_r3i_w2.jsonl 2> $L/flagship_r3i_w2.err
# budget matched to the observed best region (cosine ends at 800)
python tools/literal_gates.py --config flagship --seed 1 --schedule cosine \
  --exact-trace --aug-noise calibrated --eval-every 50 --eval-rtol 1e-5 \
  --epochs 800 --lr 3e-4 --tail-avg 0.5 \
  > $L/flagship_r3i_ep800.jsonl 2> $L/flagship_r3i_ep800.err
# full-batch adam fine-tune from the converged Lion model (deterministic
# gradient, 1 step/epoch): does a sharper local optimum change the floor?
python tools/literal_gates.py --config flagship --seed 1 --epochs 3000 \
  --batch-size 1024 --lr 1e-4 --opt adam --schedule cosine --exact-trace \
  --aug-noise calibrated --eval-every 100 --eval-rtol 1e-5 --tail-avg 0.3 \
  --init-ckpt experiments/ckpt/f_r3e_a.msgpack \
  > experiments/logs/flagship_r3i_fullbatch.jsonl 2> experiments/logs/flagship_r3i_fullbatch.err
