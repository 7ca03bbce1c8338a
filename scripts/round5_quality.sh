#!/bin/bash
# Round-5 quality pipeline (serial: ONE TPU process at a time).
#
# Stages:
#   0  smoke      — 200-epoch augmenter + 1000-epoch aug-in-loop study;
#                   gates the rest (fail fast before burning hours)
#   1  aug_mse    — augmenter to convergence at the reference cadence
#                   (n_epoch=10000, dist/train_agumenter.py:14)
#   2  mse_a2_aug — the reference's production configuration: trained
#                   frozen augmenter in the loop (train.py:97-113)
#   3  seeds      — seed-variance re-runs of the flagship hard rows on the
#                   FIXED data_seed=3 dataset (VERDICT r4 item 3)
#   4  aug_zinb   — ZINB augmenter + ZINB aug-in-loop row (stretch)
#
# Each stage is its own subprocess; rows land as
# artifacts/hard_synthetic/r5_<name>.json for later merge into results.json.

set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
R=artifacts/hard_synthetic
mkdir -p "$R"

# gate on backend health: adopt/await the shared probe (never killed — a
# mid-claim kill wedges the chip; utils/backend_probe.py); retry for hours
# if the tunnel is down
python -u -c "
import time
from dvae_tpu.utils.backend_probe import probe_backend
import subprocess
deadline = time.monotonic() + 6 * 3600
while time.monotonic() < deadline:
    try:
        if probe_backend(900):
            print('backend healthy'); break
        print('probe failed fast; retrying in 60s', flush=True)
        time.sleep(60)
    except subprocess.TimeoutExpired:
        print('probe still pending; waiting (not killing)', flush=True)
else:
    raise SystemExit('backend never came up')
" || exit 1

row() {  # row <name> <python-kwargs for hard_synthetic.run(...)>
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

echo "=== stage 0: smoke ($(date -u))"
if [ ! -s "$R/r5_smoke.json" ]; then
  python -u -c "
from dvae_tpu.examples.hard_augmenter import run
run(mode='MSE', n_epochs=200, epochs_per_jit=50, out='/tmp/aug_smoke.ckpt')
" || { echo SMOKE_AUG_FAILED; exit 1; }
  row smoke "n_epoch=1000, seed=3, mode='MSE', aug_file='/tmp/aug_smoke.ckpt', folder='/tmp/hard_smoke_aug'" \
    || { echo SMOKE_ROW_FAILED; exit 1; }
  python -c "
import json; r = json.load(open('$R/r5_smoke.json'))
assert r['train_consensus'] is not None, 'no train consensus logged'
assert all(v == v for v in r['ami_leaf']), 'NaN AMI'
print('SMOKE_OK train_consensus', r['train_consensus'])
" || { echo SMOKE_CHECK_FAILED; exit 1; }
fi

echo "=== stage 1: augmenter MSE to convergence ($(date -u))"
if [ ! -s "$R/augmenter_MSE.ckpt" ]; then
  python -u -m dvae_tpu.examples.hard_augmenter --mode MSE --epochs 10000 \
    --epochs_per_jit 100 || { echo AUG_MSE_FAILED; exit 1; }
fi

echo "=== stage 2: production configuration (trained aug in loop)"
row mse_a2_aug "n_epoch=25000, seed=3, mode='MSE', aug_file='$R/augmenter_MSE.ckpt', folder='/tmp/hard_mse_aug'"

echo "=== stage 3: seed variance (data_seed fixed at 3)"
for s in 4 5; do
  row mse_a2_s$s  "n_epoch=25000, seed=$s, data_seed=3, mode='MSE', folder='/tmp/hard_mse_s$s'"
done
for s in 4 5; do
  row zinb_a2_s$s "n_epoch=30000, seed=$s, data_seed=3, mode='ZINB', folder='/tmp/hard_zinb_s$s'"
done
for s in 4 5; do
  row a5_align_s$s "n_epoch=25000, seed=$s, data_seed=3, mode='MSE', n_arm=5, align_every=500, folder='/tmp/hard_a5al_s$s'"
done
# align+prune K-selection recipe (candidate headline, verdict item 3):
# K=100 -> prune toward the 92 planted types
for s in 4 5; do
  row k100_prune_s$s "n_epoch=25000, seed=$s, data_seed=3, mode='MSE', n_categories=100, align_every=500, n_epoch_p=2000, max_prun_it=8, folder='/tmp/hard_k100_s$s'"
done

echo "=== stage 4: ZINB augmenter + aug-in-loop row (stretch)"
if [ ! -s "$R/augmenter_ZINB.ckpt" ]; then
  python -u -m dvae_tpu.examples.hard_augmenter --mode ZINB --epochs 10000 \
    --epochs_per_jit 100 || echo AUG_ZINB_FAILED
fi
[ -s "$R/augmenter_ZINB.ckpt" ] && \
  row zinb_a2_aug "n_epoch=30000, seed=3, mode='ZINB', aug_file='$R/augmenter_ZINB.ckpt', folder='/tmp/hard_zinb_aug'"

echo "=== pipeline done ($(date -u))"
