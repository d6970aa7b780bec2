"""Seed-ensemble of independently trained ImagesFeatures runs, scored on ONE
shared in-order render (the reconciled-suite record attempt, VERDICT r3 #3).

The grid-harness ensembles (`examples/ensemble_training.py`) average members
trained inside one vmapped program; this script instead averages the
predictions of K FULL `images_features` experiment runs (different seeds,
the exact harness and schedule behind the single-model 0.458/0.455 record)
— bagging at the record's own operating point. One experiment instance
provides the shared evaluation render (its `in_order_data`), every
checkpoint is restored into it in turn, and per-arm predictions are averaged
across seeds, plain and rotation-TTA. Scoring stays the poster protocol
(`error_table`: mse of pred−true, std/4).

Run: python examples/seed_ensemble_rescore.py results/images_features_reconciled_scaled \
         results/images_features_seed1 [...] --seqs-per-d 256 --out results/seed_ensemble
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax.numpy as jnp
import numpy as np


ARMS = ("im_ft_early_tr", "im_tr", "im_resnet", "im_ft_resnet", "im_ft_late_tr", "ft_mlp")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dirs", nargs="+", help="run directories containing final/")
    ap.add_argument("--seed", type=int, default=0, help="eval-render seed (shared across members)")
    ap.add_argument("--seqs-per-d", type=int, default=256)
    ap.add_argument("--out", default="results/seed_ensemble")
    args = ap.parse_args(argv)

    from moleculardiffusion_mivit_tpu.evaluation import error_table
    from moleculardiffusion_mivit_tpu.experiments import get_experiment
    from moleculardiffusion_mivit_tpu.experiments.base import rotate_videos
    from moleculardiffusion_mivit_tpu.utils import restore_experiment

    exp = get_experiment(
        "images_features",
        seed=args.seed,
        sequences_per_d=args.seqs_per_d,
        with_in_order=True,
    )
    exp.build()
    data = exp.in_order_data
    d_values = data["d_values"]
    n_d = len(d_values)

    # per arm: list over members of (N,) predictions, plain and TTA
    preds: dict = {a: {"plain": [], "tta": []} for a in ARMS}
    for run_dir in args.run_dirs:
        restore_experiment(exp, os.path.join(run_dir, "final"))
        for name in ARMS:
            arm = exp.arms[name]
            _, evaluate = exp._fns[name]
            videos, feats, _ = arm.slice_fn(data)
            rots = []
            for k in range(4):
                v = rotate_videos(videos, k) if videos.ndim == 4 else videos
                rots.append(
                    np.asarray(
                        evaluate(exp.states[name], v, feats)
                        if arm.with_features
                        else evaluate(exp.states[name], v)
                    )[..., 0]
                )
            preds[name]["plain"].append(rots[0])
            preds[name]["tta"].append(np.mean(rots, axis=0))
        print(f"restored + evaluated {run_dir}", file=sys.stderr, flush=True)

    report = {"members": len(args.run_dirs), "run_dirs": args.run_dirs,
              "seqs_per_d": args.seqs_per_d, "suite": "imft (reconciled 100-value)"}
    for name in ARMS:
        row = {}
        for kind in ("plain", "tta"):
            member_mses = [
                float(error_table(jnp.reshape(jnp.asarray(p), (n_d, -1)), d_values)["mse"])
                for p in preds[name][kind]
            ]
            ens = error_table(
                jnp.reshape(jnp.asarray(np.mean(preds[name][kind], axis=0)), (n_d, -1)),
                d_values,
            )
            row[kind] = {
                "member_mses": [round(m, 4) for m in member_mses],
                "ensemble_mse": round(float(ens["mse"]), 4),
                "ensemble_std": round(float(ens["std"]), 4),
            }
        report[name] = row
        print(
            f"{name:16s} members {row['plain']['member_mses']} -> "
            f"ensemble {row['plain']['ensemble_mse']} (TTA {row['tta']['ensemble_mse']})",
            flush=True,
        )

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "seed_ensemble_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {args.out}/seed_ensemble_report.json", file=sys.stderr)


if __name__ == "__main__":
    main()
