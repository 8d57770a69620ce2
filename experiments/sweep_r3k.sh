#!/bin/bash
# README gate, seed-3 rescue probes.  s3 at the r3h recipe converges with
# calibrated mass (z~1) but degrading slice SHAPE; marginal eval recovers
# 0.219 -> 0.140 => factorization error (p(a|x) not independent of x) is a
# large component.  Probe knobs that target exactly that:
#   K1  lam3=0      (the z_aug->0 pull fights the noise-MLE optimum)
#   K2  x-jitter    (smoothed MLE)
#   K3  wd 0.1      (variance)
#   K4  aug sigma=1 (aug marginal == base: no scale transport in aug dim)
#   K5  slow fine anneal (lr 1e-4, 4000 ep)
# Phase 2 (manual): rerun seeds 1,2 at the winning recipe — the gate recipe
# must be one fixed config for all three seeds.
set -x
cd /root/repo
L=experiments/logs
COMMON="--config readme --seed 3 --epochs 2000 --schedule cosine --lr 3e-4 --exact-trace --eval-every 50 --eval-rtol 1e-5 --tail-avg 0.5"
python tools/literal_gates.py $COMMON --aug-noise calibrated --lam3 0 \
  > $L/readme_r3k_lam3z.jsonl 2> $L/readme_r3k_lam3z.err
python tools/literal_gates.py $COMMON --aug-noise calibrated --x-jitter 0.02 \
  > $L/readme_r3k_jit.jsonl 2> $L/readme_r3k_jit.err
python tools/literal_gates.py $COMMON --aug-noise calibrated --wd 0.1 \
  > $L/readme_r3k_wd.jsonl 2> $L/readme_r3k_wd.err
python tools/literal_gates.py $COMMON --aug-noise 1.0 \
  > $L/readme_r3k_sig1.jsonl 2> $L/readme_r3k_sig1.err
python tools/literal_gates.py --config readme --seed 3 --epochs 4000 \
  --schedule cosine --lr 1e-4 --exact-trace --eval-every 100 --eval-rtol 1e-5 \
  --tail-avg 0.5 --aug-noise calibrated \
  > $L/readme_r3k_slow.jsonl 2> $L/readme_r3k_slow.err
