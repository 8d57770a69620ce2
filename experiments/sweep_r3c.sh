#!/bin/bash
# Round-3 GATE RUN: backsolve + exact divergence + cosine Lion 3e-4 (sweep-B
# winner) with HONEST f32 stage precision (SolverOptions.stage_precision
# fix): training steps drop to the mathematically-needed count and the
# TestMode eval no longer accumulates ~0.2 nats of bf16 random-walk noise.
set -x
cd /root/repo
L=experiments/logs
python tools/literal_gates.py --config flagship --seed 1 --epochs 2000 \
  --schedule cosine --lr 3e-4 --aug-noise calibrated --exact-trace \
  --eval-every 50 --eval-rtol 1e-5 \
  --live-ckpt experiments/ckpt/flagship_r3_gated_live.msgpack --resume \
  --save-ckpt experiments/ckpt/flagship_r3_gated.msgpack \
  > $L/flagship_r3_gated.jsonl 2> $L/flagship_r3_gated.err
