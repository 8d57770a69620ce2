#!/bin/bash
# Wave 5a: (1) on-chip verify drive for the input-bijector feature (gates the
# commit), then (2) x_jitter bandwidth scan.  r3i measured jitter 0.05 as the
# single best variance lever (best tv_norm 0.125 / final_avg 0.137 vs the
# 0.15-0.17 no-jitter floor); the 8-D Silverman bandwidth for Beta(2,4)
# marginals at n=1024 is ~0.11 per dim, so 0.05 may under-smooth.  Scan the
# bracket; the convolution bias at 0.15 bounds the useful range from above.
set -x
cd /root/repo
L=experiments/logs
python experiments/verify_drive_r3.py > experiments/verify_drive_r3.json 2> $L/verify_drive_r3.err
COMMON="--config flagship --seed 1 --schedule cosine --exact-trace --aug-noise calibrated --eval-every 50 --eval-rtol 1e-5 --epochs 2000 --lr 3e-4 --tail-avg 0.5"
python tools/literal_gates.py $COMMON --x-jitter 0.08 \
  > $L/flagship_r3m_jit008.jsonl 2> $L/flagship_r3m_jit008.err
python tools/literal_gates.py $COMMON --x-jitter 0.10 \
  > $L/flagship_r3m_jit010.jsonl 2> $L/flagship_r3m_jit010.err
python tools/literal_gates.py $COMMON --x-jitter 0.15 \
  > $L/flagship_r3m_jit015.jsonl 2> $L/flagship_r3m_jit015.err
echo R3M_DONE
