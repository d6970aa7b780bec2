"""How much of an in-order score is the render draw? (round 4)

The reconciled-suite trajectories are deterministic, but BOTH codebases
re-render them with fresh optics noise per run (unseeded RNG in the
reference; per-run keys here). Round 4's seed study exposed the
consequence: four independently trained seeds score 0.477-0.488 on their
own runs' renders yet 0.458-0.462 on one shared render — the spread between
RUNS is render noise, not training noise. This script pins both variance
components: it restores K checkpoints and scores ONE arm on R distinct
renders of the identical trajectory suite, reporting the K×R MSE matrix and
the variance decomposition (per-seed σ at fixed render vs per-render σ of
the seed mean).

Run: python examples/render_noise_study.py results/images_features_seed0 ... \
        [--arm im_ft_early_tr] [--renders 5] [--out results/render_noise]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--arm", default="im_ft_early_tr")
    ap.add_argument("--renders", type=int, default=5)
    ap.add_argument("--seqs-per-d", type=int, default=256)
    ap.add_argument("--out", default="results/render_noise")
    args = ap.parse_args(argv)

    from moleculardiffusion_mivit_tpu.evaluation import (
        IN_ORDER_IMFT_D_VALUES,
        error_table,
        generate_in_order_imft,
    )
    from moleculardiffusion_mivit_tpu.experiments import get_experiment
    from moleculardiffusion_mivit_tpu.experiments.images_features import make_dataset
    from moleculardiffusion_mivit_tpu.utils import restore_experiment

    exp = get_experiment(
        "images_features", seed=0, sequences_per_d=args.seqs_per_d, with_in_order=True
    )
    exp.build()
    cfg = exp.train_cfg
    arr = generate_in_order_imft(t_steps=cfg.n_frames * cfg.n_pos_per_frame)
    n_d, n_p = arr.shape[:2]
    flat = jnp.asarray(arr, jnp.float32).reshape(n_d * n_p, -1, 2) / cfg.traj_div_factor
    d_values = IN_ORDER_IMFT_D_VALUES

    # distinct render keys: disjoint from every key namespace used in
    # training/eval elsewhere (2**21 + r)
    renders = []
    for r in range(args.renders):
        data = make_dataset(
            jax.random.fold_in(jax.random.key(0), 2**21 + r), flat, cfg, exp.optics
        )
        data["labels"] = None
        renders.append(data)

    arm = exp.arms[args.arm]
    _, evaluate = exp._fns[args.arm]
    mse = np.zeros((len(args.run_dirs), args.renders))
    preds = np.zeros((len(args.run_dirs), args.renders, n_d * n_p))
    for i, run_dir in enumerate(args.run_dirs):
        restore_experiment(exp, os.path.join(run_dir, "final"))
        for r, data in enumerate(renders):
            videos, feats, _ = arm.slice_fn(data)
            pred = (
                evaluate(exp.states[args.arm], videos, feats)
                if arm.with_features
                else evaluate(exp.states[args.arm], videos)
            )
            preds[i, r] = np.asarray(pred[..., 0])
            mse[i, r] = float(
                error_table(jnp.reshape(pred[..., 0], (n_d, -1)), d_values)["mse"]
            )
        print(f"{run_dir}: {np.round(mse[i], 4).tolist()}", flush=True)

    seed_sigma = float(mse.std(axis=0, ddof=1).mean())  # across seeds, fixed render
    render_sigma = float(mse.mean(axis=0).std(ddof=1))  # seed-mean across renders
    # the render-averaged record: the K-seed PREDICTION ensemble scored per
    # render, then averaged over renders — the number that survives both
    # noise sources
    ens_per_render = [
        float(
            error_table(
                jnp.reshape(jnp.asarray(preds[:, r].mean(axis=0)), (n_d, -1)), d_values
            )["mse"]
        )
        for r in range(args.renders)
    ]
    report = {
        "arm": args.arm,
        "run_dirs": args.run_dirs,
        "mse_matrix_seed_x_render": [[round(v, 4) for v in row] for row in mse],
        "per_render_seed_mean": [round(v, 4) for v in mse.mean(axis=0)],
        "seed_sigma_at_fixed_render": round(seed_sigma, 4),
        "render_sigma_of_seed_mean": round(render_sigma, 4),
        "grand_mean": round(float(mse.mean()), 4),
        "ensemble_mse_per_render": [round(v, 4) for v in ens_per_render],
        "ensemble_render_mean": round(float(np.mean(ens_per_render)), 4),
        "ensemble_render_std": round(float(np.std(ens_per_render, ddof=1)), 4),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "render_noise_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
