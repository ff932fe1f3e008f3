#!/bin/bash
# TPU-side launch script — the counterpart of the reference's Slurm script
# (sbatch_script.s: 1 node / 1 GPU / 4 CPUs / 6h).  The flag surface is
# identical, so swapping the reference for this framework is this one file.
#SBATCH --job-name=gan_caption_tpu
#SBATCH --nodes=1
#SBATCH --time=6:00:00
#SBATCH --output=logs/%j.out

# Multi-host pods: the launcher exports JAX_COORDINATOR_ADDRESS /
# JAX_NUM_PROCESSES / JAX_PROCESS_ID and parallel/distributed.py picks
# them up; single host needs nothing.

# Chained multi-layer BPTT reverse kernel: +0.8% interleaved A/B
# (docs/benchmarks.md round 5); equivalence pinned in tests.
export GIC_BPTT_CHAIN=1

python3 src/main.py \
    --data-dir ../coco_data \
    --gen-embed-dim 512 \
    --pretrain-epochs 50 \
    --gen-num-layers 2 \
    --adv-epochs 50 \
    --pretrain-lr 1e-2 \
    --gen-lr 1e-4 \
    --disc-lr 1e-4 \
    --dataset_percent 0.1 \
    --captions-per-image 5 \
    --dtype bfloat16 \
    --steps-per-call 4 \
    --eval-bleu-every 5 \
    --checkpoint-every 10 \
    --resume auto
# --resume auto: the first submission trains fresh; a preempted/requeued
# job reruns this identical line and continues from the newest interrupt
# or snapshot checkpoint at the exact phase/epoch/batch (schedule sidecar).
