#!/bin/bash
# Round-5 quality pipeline, part B — run after round5_quality.sh's first
# invocation (which lost stages 1-2 to the curve-path bug, fixed since).
# Priority order: the trained-augmenter production configuration first
# (VERDICT item 1 — highest leverage), then the epoch-count control row,
# then anything part A didn't reach.  Rows are skip-guarded, so this is
# idempotent with part A.

set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
R=artifacts/hard_synthetic
mkdir -p "$R"

row() {
  local name=$1; shift
  if [ -s "$R/r5_${name}.json" ]; then
    echo "== $name: already done, skipping"; return 0
  fi
  echo "== $name: $(date -u +%H:%M:%S) $*"
  python -u -c "
import json
from dvae_tpu.examples.hard_synthetic import run
row = run($*, verbose=False)
json.dump(row, open('$R/r5_${name}.json', 'w'), indent=1)
print('ROW_OK ${name}', row.get('ami_leaf'), 'cons', row.get('test_consensus'))
"
}

echo "=== B1: augmenter MSE to convergence ($(date -u))"
if [ ! -s "$R/augmenter_MSE.ckpt" ]; then
  python -u -m dvae_tpu.examples.hard_augmenter --mode MSE --epochs 10000 \
    --epochs_per_jit 100 || { echo AUG_MSE_FAILED; exit 1; }
fi

echo "=== B2: production configuration (trained aug in loop)"
row mse_a2_aug "n_epoch=25000, seed=3, mode='MSE', aug_file='$R/augmenter_MSE.ckpt', folder='/tmp/hard_mse_aug'"

echo "=== B3: epoch-count control (no aug, 1000 epochs — disambiguates the
smoke row's high AMI: augmenter effect vs short-budget effect)"
row mse_a2_e1000 "n_epoch=1000, seed=3, mode='MSE', folder='/tmp/hard_mse_e1000'"

echo "=== B4: K=100 align+prune seed variance"
for s in 4 5; do
  row k100_prune_s$s "n_epoch=25000, seed=$s, data_seed=3, mode='MSE', n_categories=100, align_every=500, n_epoch_p=2000, max_prun_it=8, folder='/tmp/hard_k100_s$s'"
done

echo "=== B5: ZINB augmenter + aug-in-loop row"
if [ ! -s "$R/augmenter_ZINB.ckpt" ]; then
  python -u -m dvae_tpu.examples.hard_augmenter --mode ZINB --epochs 10000 \
    --epochs_per_jit 100 || echo AUG_ZINB_FAILED
fi
[ -s "$R/augmenter_ZINB.ckpt" ] && \
  row zinb_a2_aug "n_epoch=30000, seed=3, mode='ZINB', aug_file='$R/augmenter_ZINB.ckpt', folder='/tmp/hard_zinb_aug'"

echo "=== part B done ($(date -u))"
