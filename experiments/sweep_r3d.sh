#!/bin/bash
# Seed robustness of the README 1-D gate (round-2 judge ask #4): one fixed
# recipe, three seeds, final-params gate mad/msd/tv <= 0.1.
# Recipe: calibrated transported augmentation, exact divergence, cosine
# Lion 3e-4, 800 epochs, batch 32 (the 800-epoch budget is what round-2's
# own evidence said the decay-free noise floor needed; the schedule + exact
# trace remove that floor).
set -x
cd /root/repo
L=experiments/logs
COMMON="--config readme --epochs 800 --schedule cosine --lr 3e-4 --aug-noise calibrated --exact-trace --eval-every 50 --eval-rtol 1e-5"
for S in 1 2 3; do
  python tools/literal_gates.py $COMMON --seed $S \
    --live-ckpt experiments/ckpt/readme_r3_s${S}_live.msgpack --resume \
    > $L/readme_r3_cal_s${S}.jsonl 2> $L/readme_r3_cal_s${S}.err
done
