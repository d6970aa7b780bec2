"""End-to-end sim+train throughput benchmark.

Measures the reference baseline experiment's per-cycle unit of work
(tests/train_tests/trainModels.py), re-built TPU-native, and prints ONE JSON
line: {"metric", "value", "unit", "vs_baseline"}.

One cycle = generate 4 D-classes × 64 = 256 fresh sequences (30 frames of
9×9 px, 10 sub-positions/frame, full PSF render + background + Poisson noise,
normalized) **on device**, then train all 7 baseline models (3 embeddings ×
{relu, leaky_relu} GeneralTransformers + MultiImageResNet,
trainSettings.py:83-134) for one epoch each, then evaluate every model on the
frozen validation videos (4 D values × 50 sequences) — exactly the work the
reference does per cycle on host CPU + GPU.

Baseline: the reference README states "a training run usually run in 1 hour"
(README.md:78) for 100 such cycles ⇒ 256·100/3600 ≈ 7.1 generated
sequences/sec through the full sim+train(+eval) pipeline. We benchmark in the
reference's *slowest* regime (initial batch size 1 ⇒ 256 optimizer steps per
model per cycle) to keep the comparison conservative.

Usage: python bench.py [--cycles N] [--warmup N] [--json-only]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

REFERENCE_SEQS_PER_SEC = 256.0 * 100.0 / 3600.0  # ≈ 7.11


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument(
        "--unroll",
        type=int,
        default=None,
        help="epoch-scan unroll factor; default picks the measured optimum "
        "per regime on TPU v5e (RESULTS.md): 1 with pair-stacking (unroll "
        "4/16 regress the 4-chain cycle), 16 at batch 1 unstacked "
        "(757.8 -> 889.3 seq/s), 1 at batch >= 16",
    )
    ap.add_argument(
        "--stack-pairs",
        choices=("auto", "on", "off"),
        default="auto",
        help="vmap-stack the 3 relu/leaky model pairs into one scan chain "
        "each (train.multi.detect_activation_stacks): cuts the fused "
        "cycle's 7 sequential chains to 4 (953 -> 1563 seq/s at batch 1 "
        "on v5e, same update sequences). auto = on below batch 32, where "
        "the cycle is chain-latency-bound; at batch >= 64 the stacked "
        "batched GEMMs measured ~8%% slower (4375 vs 4727 seq/s)",
    )
    ap.add_argument(
        "--cycles-per-dispatch",
        type=int,
        default=1,
        help="fuse K cycles into ONE device dispatch (lax.scan over per-cycle "
        "key/LR — train.multi.make_scanned_multi_cycle). Measured ~neutral "
        "at batch 1 on v5e (1668 vs 1662 seq/s: the async dispatch queue "
        "already pipelines per-cycle launches, RESULTS.md), so default 1; "
        "--cycles must be a multiple.",
    )
    ap.add_argument(
        "--compute-dtype",
        choices=("float32", "bfloat16"),
        default="float32",
        help="forward/backward compute precision (TrainConfig.compute_dtype): "
        "bfloat16 keeps f32 master params + optimizer state and casts "
        "params/activations for the loss — measured +26%% throughput at "
        "batch 64 (22.4 -> 28.2%% MFU, results/mfu_attribution). float32 "
        "stays the default so the benchmark series remains the reference's "
        "own f32 training workload.",
    )
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    from moleculardiffusion_mivit_tpu.config import (
        BASELINE_OPTICS,
        ModelConfig,
        TrainConfig,
    )
    from moleculardiffusion_mivit_tpu.evaluation import (
        generate_frozen_validation,
        render_validation_videos,
    )
    from moleculardiffusion_mivit_tpu.models import (
        GeneralTransformer,
        MultiImageResNet,
        get_transformer_models,
    )
    from moleculardiffusion_mivit_tpu.train import (
        make_multi_cycle,
        make_scanned_multi_cycle,
    )
    from moleculardiffusion_mivit_tpu.train.loop import generate_cycle_data
    from moleculardiffusion_mivit_tpu.train.multi import STACK_BELOW_BATCH

    stack_pairs = args.stack_pairs == "on" or (
        args.stack_pairs == "auto" and args.batch_size < STACK_BELOW_BATCH
    )
    # measured optima (RESULTS.md): the stacked 4-chain cycle is fastest at
    # unroll 1 in every regime; unstacked keeps the round-3 u16 batch-1 pick
    unroll = args.unroll if args.unroll else (
        1 if stack_pairs or args.batch_size != 1 else 16
    )
    train_cfg = TrainConfig(
        seed=0, scan_unroll=unroll, compute_dtype=args.compute_dtype
    )
    model_cfg = ModelConfig(use_pos_encoding=True)  # trainSettings.py:34
    n_seq = train_cfg.sequences_per_d * len(train_cfg.training_ds)

    models = dict(get_transformer_models(model_cfg))
    models.update(
        {
            k + "_leaky": GeneralTransformer(
                model_cfg.replace(activation="leaky_relu"), embedding=e
            )
            for k, e in [
                ("linear_2layer", "linear"),
                ("cnn_2layer", "cnn"),
                ("deepcnn_2layer", "deep_resnet"),
            ]
        }
    )
    models["resnet"] = MultiImageResNet()

    if not args.json_only:
        print(f"devices: {jax.devices()}", file=sys.stderr)
        print(f"models: {list(models)}", file=sys.stderr)

    # Frozen validation (reference: 4 D values × 50 trajectories × 300 steps).
    fixtures = generate_frozen_validation(d_values=(1, 3, 5, 7), in_order_particles=1)
    fixtures.pop("valTrajsInOrder")
    val_videos = render_validation_videos(fixtures, train_cfg, BASELINE_OPTICS)
    val = {float(k[3:]): v for k, v in val_videos.items()}
    # one concatenated eval batch per model per cycle (dispatch latency
    # through the TPU tunnel dominates 4 separate tiny eval calls)
    val_ds = sorted(val)
    val_concat = jnp.concatenate([val[d] for d in val_ds], axis=0)
    val_targets = jnp.repeat(
        jnp.asarray(val_ds, jnp.float32), val[val_ds[0]].shape[0]
    )[:, None]

    # ONE compiled program per cycle: on-device generation + all 7 model
    # epochs + all validations fused (train.multi) — a cycle costs a single
    # ~40 ms tunnel dispatch instead of 15.
    key = jax.random.key(0)
    ex_videos, _, _ = generate_cycle_data(key, train_cfg, BASELINE_OPTICS)
    cpd = args.cycles_per_dispatch
    if args.cycles % cpd or args.warmup < 1:
        raise SystemExit(
            f"--cycles ({args.cycles}) must be a positive multiple of "
            f"--cycles-per-dispatch ({cpd}) and --warmup >= 1"
        )
    if cpd == 1:
        init_states, cycle = make_multi_cycle(
            models, train_cfg, BASELINE_OPTICS, stack_pairs=stack_pairs
        )
    else:
        init_states, scanned = make_scanned_multi_cycle(
            models, train_cfg, BASELINE_OPTICS, stack_pairs=stack_pairs
        )
    states = init_states(key, ex_videos[:1])
    lr = jnp.float32(train_cfg.lr)

    def run_block(block_idx, warmup=False):
        """One device dispatch = ``cpd`` full cycles; returns the last
        cycle's val-MSE dict (fresh computed outputs — safe to sync on).
        Warmup blocks fold in from a disjoint namespace (2**20 + …) so no
        warmup×cycles product can collide with timed-loop keys (timed keys
        stay below 10_000 + cycles)."""
        nonlocal states
        base = (2**20 if warmup else 10_000) + block_idx * cpd
        if cpd == 1:
            k = jax.random.fold_in(key, base)
            states, _, val_mse = cycle(
                states, k, lr, args.batch_size, val_concat, val_targets
            )
            return val_mse
        ks = jnp.stack([jax.random.fold_in(key, base + i) for i in range(cpd)])
        states, _, val_mse = scanned(
            states, ks, jnp.full((cpd,), lr), args.batch_size, val_concat, val_targets
        )
        return {name: v[-1] for name, v in val_mse.items()}

    for w in range(args.warmup):
        r = run_block(w, warmup=True)
        jax.block_until_ready(r)

    t0 = time.perf_counter()
    for c in range(args.cycles // cpd):
        r = run_block(c)
    jax.block_until_ready(r)
    elapsed = time.perf_counter() - t0

    # the benchmark must not go green on a diverged/NaN run
    val_final = {k: float(v) for k, v in r.items()}
    assert all(
        v == v and abs(v) < 1e6 for v in val_final.values()
    ), f"non-finite/diverged validation MSE: {val_final}"

    # Hardware-utilization accounting: exact FLOPs of the cycle's logical
    # work (per-model loop-free train_step lowered on the CPU backend ×
    # step count + eval + generation — XLA's cost analysis counts scan
    # bodies once, not × trip count, so lowering the scanned program itself
    # undercounts by ~the step count), achieved FLOP/s and fraction of the
    # chip's bf16 peak.
    from moleculardiffusion_mivit_tpu.utils import multi_cycle_flops, utilization

    cycle_seconds = elapsed / args.cycles
    flops = multi_cycle_flops(
        models, train_cfg, BASELINE_OPTICS, args.batch_size, val_concat.shape
    )
    util = utilization(flops, cycle_seconds)

    seqs_per_sec = n_seq * args.cycles / elapsed
    result = {
        "metric": "sim+train sequences/sec/chip (baseline experiment cycle: "
        "on-device generation + 7 models trained + validated, batch size "
        f"{args.batch_size})",
        "value": round(seqs_per_sec, 2),
        "unit": "sequences/sec",
        "vs_baseline": round(seqs_per_sec / REFERENCE_SEQS_PER_SEC, 2),
        "flops_per_cycle": util["flops"],
        "achieved_tflops": util["achieved_tflops"],
        "mfu_pct": util["mfu_pct"],
    }
    if not args.json_only:
        print(
            f"{args.cycles} cycles in {elapsed:.2f}s; val_avg "
            f"{ {k: round(float(v), 2) for k, v in r.items()} }",
            file=sys.stderr,
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
