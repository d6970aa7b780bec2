"""CLI experiment runner — the ``python trainModels*.py`` equivalent.

Usage:
    python -m moleculardiffusion_mivit_tpu.run_experiment baseline \
        --cycles 100 --out results/baseline [--seed 0] [--seqs-per-d 64]

Runs the named experiment regime, streams per-cycle metrics to JSONL + stderr
(the reference's parameter banner and progress prints, trainModels.py:58-110),
checkpoints the last 5 cycles like the experiment scripts
(trainModelsPSFNoise.py:241-242), and writes poster-style error-table CSVs
when the experiment carries an in-order sweep.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("experiment", help="baseline | psfnoise | framerate | embeddings | images_features | denoising | modular")
    ap.add_argument("--cycles", type=int, default=None, help="override num_cycles")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seqs-per-d", type=int, default=64)
    ap.add_argument("--out", type=str, default=None, help="output directory")
    ap.add_argument("--checkpoint-last", type=int, default=5)
    ap.add_argument("--eval-every", type=int, default=1)
    ap.add_argument(
        "--in-order",
        action="store_true",
        help="build the in-order D sweep for poster-style error tables "
        "(where the experiment supports it)",
    )
    ap.add_argument(
        "--in-order-suite",
        type=str,
        default=None,
        choices=("imft", "committed"),
        help="which D sweep the in-order scoring uses (where the experiment "
        "supports it): 'imft' = the reconciled 100-value D=0.1..10.0 "
        "published protocol (default), 'committed' = the snapshot's "
        "70-value valTrajsInOrder asset (rounds 1-2 scoring)",
    )
    ap.add_argument(
        "--no-aot-cache",
        action="store_true",
        help="disable the on-disk AOT executable cache for the fused cycle "
        "(utils.aot_cache; default on for unmeshed runs — a repeat run or "
        "an already-seen batch regime starts in ~3 s instead of recompiling "
        "through the tunnel)",
    )
    ap.add_argument(
        "--plots",
        action="store_true",
        help="render the L8 figures (val-MSE curves, error bars/violins, "
        "prediction-vs-D, PSF×noise heatmaps) into <out>/figures after the run",
    )
    ap.add_argument(
        "--unroll",
        type=int,
        default=None,
        help="epoch-scan unroll factor (TrainConfig.scan_unroll): replicates "
        "the optimizer-step body so XLA amortizes loop overhead across "
        "consecutive steps — a batch-1-regime throughput lever that trades "
        "compile time for cycle time (see RESULTS.md)",
    )
    ap.add_argument(
        "--in-order-renders",
        type=int,
        default=1,
        help="score the in-order sweep on K fresh render-noise draws of the "
        "identical trajectories and report mse mean ± std across renders "
        "alongside the protocol (first-render) score. The render draw is "
        "the dominant noise on these scores (σ ≈ 0.011 vs 0.002 training "
        "seed σ on the reconciled suite — results/render_noise), so "
        "single-render records are ±0.01 quantities",
    )
    ap.add_argument(
        "--compute-dtype",
        choices=("float32", "bfloat16"),
        default=None,
        help="forward/backward compute precision (TrainConfig.compute_dtype): "
        "bfloat16 keeps f32 master params + optimizer state and casts "
        "params/activations inside the loss — measured +26%% training "
        "throughput at batch 64 (results/mfu_attribution). Default float32 "
        "(the reference's own precision)",
    )
    ap.add_argument(
        "--resume",
        type=str,
        default=None,
        help="checkpoint directory (e.g. <out>/final) to restore and "
        "continue from; runs the remaining cycles based on saved history",
    )
    ap.add_argument(
        "--no-stack-pairs",
        action="store_true",
        help="disable vmap-stacking of activation-slope-only model pairs "
        "inside the fused cycle (Experiment.stack_pairs; on by default — "
        "cuts the baseline's 7 sequential scan chains to 4, states stay "
        "per-arm so checkpoints/eval are unaffected)",
    )
    ap.add_argument(
        "--with-hybrid",
        action="store_true",
        help="(modular) add the round-4 composition arms: "
        "HybridFusionTransformer (per-frame feature tokens + global "
        "reg-token early fusion in ONE model) plus its GeneralTransformer "
        "early-fusion parent, trained on the same generated data as the "
        "five modular arms",
    )
    ap.add_argument(
        "--mesh",
        type=str,
        default=None,
        help="shard over a device mesh, e.g. 'data=2,model=4': GridArm "
        "stacks shard params over 'model' and the batch over 'data'; "
        "single-model arms replicate params and shard the batch over all "
        "devices. The fused single-dispatch cycle stays on (any batch size "
        "is correct; batches divisible by the data axis avoid cross-shard "
        "gathers)",
    )
    args = ap.parse_args(argv)

    import jax

    from moleculardiffusion_mivit_tpu.experiments import get_experiment
    from moleculardiffusion_mivit_tpu.utils import MetricsLogger, save_experiment

    out_dir = args.out or f"results/{args.experiment}"
    os.makedirs(out_dir, exist_ok=True)
    logger = MetricsLogger(os.path.join(out_dir, "metrics.jsonl"), stdout=True)

    import inspect

    from moleculardiffusion_mivit_tpu.experiments import REGISTRY

    kwargs = dict(seed=args.seed, sequences_per_d=args.seqs_per_d)
    builder_params = inspect.signature(REGISTRY[args.experiment]).parameters
    if (args.in_order or args.in_order_suite) and "with_in_order" in builder_params:
        # an explicit suite choice implies the in-order sweep itself
        kwargs["with_in_order"] = True
    if args.in_order_suite is not None:
        if "in_order_suite" not in builder_params:
            ap.error(
                f"experiment {args.experiment!r} does not support --in-order-suite"
            )
        kwargs["in_order_suite"] = args.in_order_suite
    if args.with_hybrid:
        if "with_hybrid" not in builder_params:
            ap.error(f"experiment {args.experiment!r} does not support --with-hybrid")
        kwargs["with_hybrid"] = True
    exp = get_experiment(args.experiment, **kwargs)
    if args.unroll:
        exp.train_cfg = exp.train_cfg.replace(scan_unroll=args.unroll)
        for arm in exp.arms.values():
            if getattr(arm, "train_cfg", None) is not None:
                arm.train_cfg = arm.train_cfg.replace(scan_unroll=args.unroll)
    if args.compute_dtype:
        exp.train_cfg = exp.train_cfg.replace(compute_dtype=args.compute_dtype)
        for arm in exp.arms.values():
            if getattr(arm, "train_cfg", None) is not None:
                arm.train_cfg = arm.train_cfg.replace(compute_dtype=args.compute_dtype)
    if args.no_stack_pairs:
        exp.stack_pairs = False
    if args.no_aot_cache:
        exp.aot_cache = False
    if args.mesh:
        from moleculardiffusion_mivit_tpu.parallel import make_mesh

        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        exp.use_mesh(make_mesh(**{k: int(v) for k, v in spec.items()}))
    n_cycles = args.cycles or exp.train_cfg.num_cycles

    logger.log(
        "start",
        experiment=args.experiment,
        devices=[str(d) for d in jax.devices()],
        num_cycles=n_cycles,
        sequences_per_d=args.seqs_per_d,
        training_ds=list(map(list, exp.train_cfg.training_ds)),
        lr=exp.train_cfg.lr,
        loss=exp.train_cfg.loss,
        models=exp.model_names,
    )

    t0 = time.time()
    exp.build()
    logger.log("built", seconds=round(time.time() - t0, 1))

    start_cycle = 0
    if args.resume:
        from moleculardiffusion_mivit_tpu.utils import restore_experiment

        restore_experiment(exp, args.resume)
        start_cycle = len(next(iter(exp.history.values()))["val_avg"])
        n_cycles = max(n_cycles - start_cycle, 0)
        logger.log(
            "resumed", checkpoint=args.resume, cycles_done=start_cycle, cycles_left=n_cycles
        )

    t0 = time.time()
    exp.run(
        num_cycles=n_cycles,
        callback=logger.cycle_callback(),
        eval_every=args.eval_every,
        checkpoint_last=args.checkpoint_last,
        checkpoint_dir=out_dir,
        start_cycle=start_cycle,
    )
    logger.log("trained", seconds=round(time.time() - t0, 1))

    save_experiment(exp, os.path.join(out_dir, "final"))
    final = {name: h["val_avg"][-1] for name, h in exp.history.items() if h["val_avg"]}
    logger.log("final_val_avg", values=final)

    if exp.in_order_data is not None:
        import numpy as np

        from moleculardiffusion_mivit_tpu.evaluation import (
            error_table,
            save_error_table_csv,
        )

        d_values = exp.in_order_data["d_values"]
        preds = exp.in_order_predictions()
        tables = {name: error_table(p, d_values) for name, p in preds.items()}
        if args.in_order_renders > 1:
            tables = exp.in_order_error_tables(n_renders=args.in_order_renders)
        csv_path = os.path.join(out_dir, f"{args.experiment}_errors.csv")
        save_error_table_csv(tables, csv_path)
        logger.log("error_tables", path=csv_path, tables=tables)
        # raw per-sequence predictions: the committed artifact the L8 figure
        # layer (evaluation.plots) regenerates violins / pred-vs-D from
        np.savez_compressed(
            os.path.join(out_dir, "in_order_predictions.npz"),
            d_values=np.asarray(d_values),
            **preds,
        )

    with open(os.path.join(out_dir, "history.json"), "w") as f:
        json.dump(exp.history, f)

    if args.plots:
        from moleculardiffusion_mivit_tpu.evaluation.plots import render_all

        made = render_all(out_dir)
        logger.log("figures", paths=list(made.values()))
    print(f"results in {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
