#!/bin/bash
# Wave 2 on the flagship tv_norm floor (~0.15-0.165, measured invariant to
# lambda/optimizer/budget in sweep_r3e/r3f): isolate CAPACITY vs AUG-TRANSPORT
# vs ITERATE-NOISE vs SEED.
#  G1  sigma=1 aug noise (aug marginal == base marginal: the flow spends zero
#      capacity transporting the aug dims; slice calibrated by the analytic
#      (sigma*sqrt(2pi))^naug constant) + Polyak tail average.
#  G2  width_mult 6 (MLP 16->96->16): capacity probe (documented deviation).
#  G3  seeds 2,3 at the r3e_a recipe: floor variance across inits.
#  G4  sigma=1 AND width 6: interaction.
set -x
cd /root/repo
L=experiments/logs
COMMON="--config flagship --schedule cosine --exact-trace --eval-every 50 --eval-rtol 1e-5 --epochs 2000 --lr 3e-4 --tail-avg 0.5"
python tools/literal_gates.py $COMMON --seed 1 --aug-noise 1.0 \
  --live-ckpt experiments/ckpt/f_r3g_1_live.msgpack --save-ckpt experiments/ckpt/f_r3g_1.msgpack \
  > $L/flagship_r3g_sig1.jsonl 2> $L/flagship_r3g_sig1.err
python tools/literal_gates.py $COMMON --seed 1 --aug-noise calibrated --width-mult 6 \
  --live-ckpt experiments/ckpt/f_r3g_2_live.msgpack --save-ckpt experiments/ckpt/f_r3g_2.msgpack \
  > $L/flagship_r3g_w6.jsonl 2> $L/flagship_r3g_w6.err
python tools/literal_gates.py $COMMON --seed 2 --aug-noise calibrated \
  --live-ckpt experiments/ckpt/f_r3g_s2_live.msgpack \
  > $L/flagship_r3g_s2.jsonl 2> $L/flagship_r3g_s2.err
python tools/literal_gates.py $COMMON --seed 3 --aug-noise calibrated \
  --live-ckpt experiments/ckpt/f_r3g_s3_live.msgpack \
  > $L/flagship_r3g_s3.jsonl 2> $L/flagship_r3g_s3.err
python tools/literal_gates.py $COMMON --seed 1 --aug-noise 1.0 --width-mult 6 \
  --live-ckpt experiments/ckpt/f_r3g_4_live.msgpack --save-ckpt experiments/ckpt/f_r3g_4.msgpack \
  > $L/flagship_r3g_sig1w6.jsonl 2> $L/flagship_r3g_sig1w6.err
