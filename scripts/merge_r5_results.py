"""Merge round-5 quality rows (artifacts/hard_synthetic/r5_*.json) into
results.json and print the seed-variance + aug-configuration summary
tables for the README.

Seed-variance groups re-train the FLAGSHIP hard rows at 3 seeds on the
FIXED data_seed=3 dataset (round-4 verdict item 3); the aug rows are the
reference's trained-augmenter production configuration (verdict item 1).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "artifacts", "hard_synthetic")

# seed-variance groups: results.json key of the seed-3 run + r5 rows
GROUPS = {
    "mse_a2": ["mse_a2", "r5_mse_a2_s4", "r5_mse_a2_s5"],
    "zinb_a2": ["zinb_a2", "r5_zinb_a2_s4", "r5_zinb_a2_s5"],
    "a5_align500": ["mse_a5_align500", "r5_a5_align_s4", "r5_a5_align_s5"],
    "k100_prune_align500": ["mse_a2_k100_prune_align500",
                            "r5_k100_prune_s4", "r5_k100_prune_s5"],
    "k100_prune_align500_aug": ["r5_k100_aug", "r5_k100_aug_s4",
                                "r5_k100_aug_s5"],
    "zinb_k100_prune_align500_aug": ["r5_zinb_k100_aug",
                                     "r5_zinb_k100_aug_s4",
                                     "r5_zinb_k100_aug_s5"],
    "a5_aug_align500": ["r5_a5_aug_align", "r5_a5_aug_align_s4",
                        "r5_a5_aug_align_s5"],
    "a5_k100_prune_align500_aug": ["r5_a5_k100_aug", "r5_a5_k100_aug_s4",
                                   "r5_a5_k100_aug_s5"],
    "zinb_a5_aug_align500": ["r5_zinb_a5_aug_align",
                             "r5_zinb_a5_aug_align_s4",
                             "r5_zinb_a5_aug_align_s5"],
}
KMEANS = {"leaf": 0.376, "root_k92": 0.551, "root_k12": 0.613}


def load_all() -> dict:
    res = json.load(open(os.path.join(ART, "results.json")))
    for p in sorted(glob.glob(os.path.join(ART, "r5_*.json"))):
        name = os.path.splitext(os.path.basename(p))[0]
        res[name] = json.load(open(p))
    return res


def _fmt(vals, nd=3):
    m = float(np.mean(vals))
    return f"{m:.{nd}f} [{min(vals):.{nd}f}, {max(vals):.{nd}f}]"


def seed_table(res: dict) -> list[str]:
    lines = [
        "| recipe | seeds | leaf AMI (mean [min, max] over seeds, "
        "arm-avg) | root AMI | consensus | wall/run |",
        "|---|---|---|---|---|---|",
    ]
    for label, keys in GROUPS.items():
        rows = [res[k] for k in keys if k in res]
        if not rows:
            continue
        leaf = [float(np.mean(r["ami_leaf"])) for r in rows]
        root = [float(np.mean(r["ami_root"])) for r in rows]
        cons = [r["test_consensus"] for r in rows]
        wall = [r["wall_min"] for r in rows]
        lines.append(
            f"| {label} | {len(rows)} | {_fmt(leaf)} | {_fmt(root)} | "
            f"{_fmt(cons, 2)} | {np.mean(wall):.0f} min |")
    lines.append(
        f"| k-means92+PCA50 baseline | — | {KMEANS['leaf']:.3f} | "
        f"{KMEANS['root_k92']:.3f} (k=92) / {KMEANS['root_k12']:.3f} "
        f"(k=12) | — | — |")
    return lines


def margin_check(res: dict) -> list[str]:
    out = []
    for label, keys in GROUPS.items():
        rows = [res[k] for k in keys if k in res]
        if not rows:
            continue
        lo = min(float(np.mean(r["ami_leaf"])) for r in rows)
        out.append(f"{label}: worst-seed leaf {lo:.3f} vs k-means "
                   f"{KMEANS['leaf']:.3f} -> "
                   f"{'OUTSIDE' if lo > KMEANS['leaf'] else 'inside'} "
                   f"the error bars")
    return out


def aug_table(res: dict) -> list[str]:
    lines = [
        "| config | leaf AMI | root AMI | eval consensus | train "
        "(augmentation) consensus | wall |",
        "|---|---|---|---|---|---|",
    ]
    pairs = [("mse_a2 (no aug, seed 3)", "mse_a2"),
             ("mse_a2 + trained augmenter", "r5_mse_a2_aug"),
             ("zinb_a2 (no aug, seed 3)", "zinb_a2"),
             ("zinb_a2 + trained augmenter", "r5_zinb_a2_aug"),
             ("A=5 + aug + align500 (flagship)", "r5_a5_aug_align"),
             ("K=100 align+prune + aug", "r5_k100_aug"),
             ("ZINB K=100 align+prune + aug", "r5_zinb_k100_aug"),
             ("A=5 + aug + align + K=100 prune", "r5_a5_k100_aug"),
             ("ZINB A=5 + aug + align500", "r5_zinb_a5_aug_align")]
    for label, k in pairs:
        if k not in res:
            continue
        r = res[k]
        tc = r.get("train_consensus")
        lines.append(
            f"| {label} | {np.mean(r['ami_leaf']):.3f} | "
            f"{np.mean(r['ami_root']):.3f} | {r['test_consensus']:.3f} | "
            f"{tc if tc is None else format(tc, '.3f')} | "
            f"{r['wall_min']:.0f} min |")
    return lines


def main() -> None:
    res = load_all()
    with open(os.path.join(ART, "results.json"), "w") as fh:
        json.dump(res, fh, indent=1)
    print("\n".join(seed_table(res)))
    print()
    print("\n".join(margin_check(res)))
    print()
    print("\n".join(aug_table(res)))


if __name__ == "__main__":
    main()
