"""End-to-end sim+train throughput benchmark.

Measures the reference baseline experiment's per-cycle unit of work
(tests/train_tests/trainModels.py), re-built TPU-native, and prints JSON
lines {"metric", "value", "unit", "vs_baseline"} — the LAST line is the
official result.

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

Robustness (round 5): first compiles through the axon TPU tunnel measured
72-930 s for the SAME program (RESULTS.md), which timed out the round-4
driver run (BENCH_r04 rc=124). Three defenses, all on by default:
- **staged emission** — the cheapest-compiling configuration (unstacked,
  unroll 1) is measured and its JSON line printed FIRST, so a timeout during
  the stacked default's compile still leaves a valid (lower) number on
  stdout; the stacked line then supersedes it as the tail line;
- **AOT executable cache** (utils/aot_cache.py) — compiled executables are
  serialized to ~/.cache/mivit_aot keyed by (jax version, device kind,
  lowered-HLO hash); a warm cache skips XLA entirely and starts in seconds;
- **background compile overlap** — the stacked program compiles in a thread
  while the staged configuration compiles and runs (the axon backend
  overlaps concurrent compiles and on-chip execution, CLAUDE.md), so
  staging adds ~no wall-clock;
plus timestamped stderr progress lines so any future rc=124 is diagnosable.
Host-side setup (frozen-validation rendering, model init) runs on the CPU
backend to keep every pre-stage tunnel compile off the critical path.

Usage: python bench.py [--cycles N] [--warmup N] [--json-only]
"""

import argparse
import json
import sys
import threading
import time

import jax
import jax.numpy as jnp

REFERENCE_SEQS_PER_SEC = 256.0 * 100.0 / 3600.0  # ≈ 7.11

_T0 = time.time()


def log(msg):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


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
    ap.add_argument(
        "--cycles-per-dispatch",
        type=int,
        default=1,
        help="fuse K cycles into ONE device dispatch (lax.scan over per-cycle "
        "key/LR — train.multi.make_scanned_multi_cycle). Measured ~neutral "
        "at batch 1 on v5e (1668 vs 1662 seq/s: the async dispatch queue "
        "already pipelines per-cycle launches, RESULTS.md), so default 1; "
        "--cycles must be a multiple. K > 1 disables staged emission.",
    )
    ap.add_argument(
        "--staged",
        choices=("auto", "off"),
        default="auto",
        help="measure + print the cheap-compile configuration first so a "
        "timeout mid-way still records a number (auto: only when the final "
        "configuration differs from the cheap one)",
    )
    ap.add_argument(
        "--aot-cache",
        choices=("on", "off"),
        default="on",
        help="serialize/deserialize compiled executables under "
        "~/.cache/mivit_aot (utils/aot_cache.py) — the axon backend has no "
        "cross-process compile cache of its own",
    )
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()
    if args.aot_cache == "off":
        import os

        os.environ["MIVIT_AOT_CACHE"] = "0"

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
    from moleculardiffusion_mivit_tpu.utils.aot_cache import (
        cached_compile,
        load_or_compile,
        lower_and_check,
    )

    stack_final = args.stack_pairs == "on" or (
        args.stack_pairs == "auto" and args.batch_size < STACK_BELOW_BATCH
    )
    # measured optima (RESULTS.md): the stacked 4-chain cycle is fastest at
    # unroll 1 in every regime; unstacked keeps the round-3 u16 batch-1 pick
    unroll_final = args.unroll if args.unroll else (
        1 if stack_final or args.batch_size != 1 else 16
    )
    base_cfg = TrainConfig(seed=0, compute_dtype=args.compute_dtype)
    model_cfg = ModelConfig(use_pos_encoding=True)  # trainSettings.py:34
    n_seq = base_cfg.sequences_per_d * len(base_cfg.training_ds)

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

    device = jax.devices()[0]
    log(f"devices: {jax.devices()}")
    if not args.json_only:
        print(f"models: {list(models)}", file=sys.stderr)

    # Host-side setup on the CPU backend: the frozen-validation render and
    # model inits are tiny programs, but EVERY tunnel compile is a timeout
    # risk — keep them off the device until the data is ready to ship.
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = device
    with jax.default_device(cpu):
        log("rendering frozen validation on host CPU...")
        # reference: 4 D values × 50 trajectories × 300 steps
        fixtures = generate_frozen_validation(
            d_values=(1, 3, 5, 7), in_order_particles=1
        )
        fixtures.pop("valTrajsInOrder")
        val_videos = render_validation_videos(fixtures, base_cfg, BASELINE_OPTICS)
        val = {float(k[3:]): v for k, v in val_videos.items()}
        # one concatenated eval batch per model per cycle (dispatch latency
        # through the TPU tunnel dominates 4 separate tiny eval calls)
        val_ds = sorted(val)
        val_concat = jnp.concatenate([val[d] for d in val_ds], axis=0)
        val_targets = jnp.repeat(
            jnp.asarray(val_ds, jnp.float32), val[val_ds[0]].shape[0]
        )[:, None]
        ex_videos, _, _ = generate_cycle_data(jax.random.key(0), base_cfg, BASELINE_OPTICS)
        ex_videos = ex_videos[:1]
    val_concat = jax.device_put(val_concat, device)
    val_targets = jax.device_put(val_targets, device)
    log(f"validation ready: {val_concat.shape}")

    key = jax.random.key(0)
    lr = jax.device_put(jnp.float32(base_cfg.lr), device)
    cpd = args.cycles_per_dispatch
    if args.cycles % cpd or args.warmup < 1:
        raise SystemExit(
            f"--cycles ({args.cycles}) must be a positive multiple of "
            f"--cycles-per-dispatch ({cpd}) and --warmup >= 1"
        )

    # CPU-resident key for inits: a TPU-resident key operand drags the init
    # programs onto the device despite default_device(cpu) (measured ~2x
    # slower through the tunnel)
    key_cpu = jax.device_put(key, cpu)

    def build_states(stack_pairs, unroll, label):
        """(states on device, unjitted-then-jitted cycle) for one
        configuration. ONE compiled program per dispatch: on-device
        generation + all 7 model epochs + all validations fused
        (train.multi; K cycles scanned in when --cycles-per-dispatch > 1) —
        a cycle costs a single ~40 ms tunnel dispatch instead of 15.
        Init runs on host CPU (every tunnel compile is a timeout risk) and
        the states ship to the device; they are donated, so callers must
        thread the returned states through every call."""
        t0 = time.perf_counter()
        cfg = base_cfg.replace(scan_unroll=unroll)
        maker = make_multi_cycle if cpd == 1 else make_scanned_multi_cycle
        init_states, cycle = maker(
            models, cfg, BASELINE_OPTICS, stack_pairs=stack_pairs
        )
        with jax.default_device(cpu):
            states = init_states(key_cpu, ex_videos)
        states = jax.device_put(states, device)
        log(f"{label}: states built in {time.perf_counter() - t0:.1f}s")
        return states, cycle

    def ex_args():
        """Example dynamic args of the cycle call (after the states)."""
        if cpd == 1:
            return (key, lr)
        return (
            jnp.stack([jax.random.fold_in(key, i) for i in range(cpd)]),
            jnp.full((cpd,), lr),
        )

    def run_block(states, compiled, base):
        """One dispatch = ``cpd`` cycles; returns (states, last-cycle val)."""
        if cpd == 1:
            k = jax.random.fold_in(key, base)
            states, _, r = compiled(states, k, lr, val_concat, val_targets)
            return states, r
        ks = jnp.stack([jax.random.fold_in(key, base + i) for i in range(cpd)])
        states, _, r = compiled(
            states, ks, jnp.full((cpd,), lr), val_concat, val_targets
        )
        return states, {name: v[-1] for name, v in r.items()}

    def measure(states, compiled, label):
        """Warmup + timed cycles; returns (seqs_per_sec, elapsed).

        Warmup blocks fold in from a disjoint namespace (2**20 + …) so no
        warmup×cycles product can collide with timed-loop keys (timed keys
        stay below 10_000 + cycles). Syncs on the freshly computed val-MSE
        outputs — NOT on donated state buffers, whose block_until_ready can
        return early through the tunnel (CLAUDE.md)."""
        for w in range(args.warmup):
            states, r = run_block(states, compiled, 2**20 + w * cpd)
            jax.block_until_ready(r)
        log(f"{label}: warmup done ({args.warmup} block(s))")

        t0 = time.perf_counter()
        for c in range(args.cycles // cpd):
            states, r = run_block(states, compiled, 10_000 + c * cpd)
        jax.block_until_ready(r)
        elapsed = time.perf_counter() - t0

        # the benchmark must not go green on a diverged/NaN run
        val_final = {k_: float(v) for k_, v in r.items()}
        assert all(
            v == v and abs(v) < 1e6 for v in val_final.values()
        ), f"non-finite/diverged validation MSE: {val_final}"
        log(
            f"{label}: {args.cycles} cycles in {elapsed:.2f}s; val_avg "
            f"{ {k_: round(v, 2) for k_, v in val_final.items()} }"
        )
        return n_seq * args.cycles / elapsed, elapsed

    def emit(seqs_per_sec, config_label, stage, extra=None):
        result = {
            "metric": "sim+train sequences/sec/chip (baseline experiment cycle: "
            "on-device generation + 7 models trained + validated, batch size "
            f"{args.batch_size})",
            "value": round(seqs_per_sec, 2),
            "unit": "sequences/sec",
            "vs_baseline": round(seqs_per_sec / REFERENCE_SEQS_PER_SEC, 2),
            "config": config_label,
            "stage": stage,
        }
        result.update(extra or {})
        print(json.dumps(result), flush=True)
        return result

    # -- phase A: lower the FINAL configuration and check its cache --------
    # A warm cache makes the whole staged apparatus unnecessary: deserialize
    # and measure, nothing else is built. (Building + tracing a 7-model
    # cycle costs minutes of host CPU — measured as the dominant warm-path
    # cost before this ordering.)
    final_label = (
        f"{'stacked' if stack_final else 'unstacked'}-u{unroll_final}"
        + ("-bf16" if args.compute_dtype == "bfloat16" else "")
    )
    states, cycle_final = build_states(stack_final, unroll_final, "final")
    lowered_f, entry_f = lower_and_check(
        cycle_final,
        states,
        *ex_args(),
        args.batch_size,
        val_concat,
        val_targets,
        tag=f"bench-final-b{args.batch_size}",
        log=log,
    )

    staged = (
        args.staged == "auto"
        and cpd == 1
        and (stack_final, unroll_final) != (False, 1)
        and not entry_f["hit"]
    )

    if staged:
        # cold cache: the final program compiles in a background thread
        # while the cheap-compiling configuration builds, compiles and
        # emits a first valid JSON line in the foreground (concurrent
        # compiles overlap on the axon backend, CLAUDE.md —
        # Experiment._start_precompile uses the same trick), so a driver
        # timeout mid-final-compile still records a number
        final_box = {}

        def compile_final():
            try:
                final_box["compiled"] = load_or_compile(lowered_f, entry_f, log=log)
            except Exception as e:  # surface in main thread
                final_box["error"] = e

        th = threading.Thread(target=compile_final, daemon=True)
        th.start()

        states_c, cycle_c = build_states(False, 1, "staged")
        compiled_c, _ = cached_compile(
            cycle_c,
            states_c,
            *ex_args(),
            args.batch_size,
            val_concat,
            val_targets,
            tag=f"bench-cheap-b{args.batch_size}",
            log=log,
        )
        sps_c, _ = measure(states_c, compiled_c, "staged(unstacked-u1)")
        emit(sps_c, "unstacked-u1", "staged")
        del states_c, compiled_c

        th.join()
        if "error" in final_box:
            raise final_box["error"]
        compiled = final_box["compiled"]
    else:
        compiled = load_or_compile(lowered_f, entry_f, log=log)

    try:
        sps, elapsed = measure(states, compiled, f"final({final_label})")
    except Exception as e:
        if entry_f.get("source") != "cache":
            raise
        # a deserialized executable that fails at call time (backend quirk)
        # must not kill the benchmark: recompile from the kept lowering and
        # rebuild the (possibly donated-away) states
        log(f"cached executable failed at call time ({type(e).__name__}: {e}); "
            "recompiling")
        states, _ = build_states(stack_final, unroll_final, "final-retry")
        compiled = lowered_f.compile()
        sps, elapsed = measure(states, compiled, f"final({final_label}, recompiled)")

    # emit the headline number FIRST — the FLOP accounting below lowers
    # per-model programs on the host and must never cost the record
    emit(sps, final_label, "final")

    # Hardware-utilization accounting: exact FLOPs of the cycle's logical
    # work (per-model loop-free train_step lowered on the CPU backend ×
    # step count + eval + generation — XLA's cost analysis counts scan
    # bodies once, not × trip count, so lowering the scanned program itself
    # undercounts by ~the step count), achieved FLOP/s and fraction of the
    # chip's bf16 peak.
    from moleculardiffusion_mivit_tpu.utils import multi_cycle_flops, utilization

    log("computing FLOP accounting (CPU lowering)...")
    try:
        flops = multi_cycle_flops(
            models,
            base_cfg.replace(scan_unroll=unroll_final),
            BASELINE_OPTICS,
            args.batch_size,
            val_concat.shape,
        )
        util = utilization(flops, elapsed / args.cycles)
        emit(
            sps,
            final_label,
            "final",
            {
                "flops_per_cycle": util["flops"],
                "achieved_tflops": util["achieved_tflops"],
                "mfu_pct": util["mfu_pct"],
            },
        )
    except Exception as e:  # accounting must never cost the headline number
        log(f"FLOP accounting failed ({type(e).__name__}: {e}); headline already emitted")


if __name__ == "__main__":
    main()
