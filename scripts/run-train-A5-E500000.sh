#!/bin/bash
# TPU-slice training launcher (the reference's SLURM train-scripts analogue,
# e.g. train-scripts/run-train-A5-E500000-*.sh).  On Cloud TPU there is no
# SLURM layer: one process per host, the TPU runtime handles rendezvous.
# For multi-host slices run the same command on every worker
# (gcloud compute tpus tpu-vm ssh ... --worker=all).
set -e
mkdir -p logs
python -m dvae_tpu.cli train \
  --n_arm 5 --n_epoch 500000 \
  --batch_size 5000 --epochs_per_jit 50 --bf16 \
  --sharding full --wandb "$@" 2>&1 | tee logs/train-A5-E500000-$(date +%s).log
