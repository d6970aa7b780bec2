"""Step-time breakdown of one baseline training cycle on the real TPU.

Times each stage of the per-cycle unit of work separately (steady-state,
after compile): on-device generation, each model's training epoch, the
fused validation, and the end-to-end fused mega-cycle (``train.multi``) that
bench.py uses — so RESULTS.md can pin where cycle time goes and how much the
single-dispatch fusion saves vs. per-stage dispatch.

Optionally captures a ``jax.profiler`` trace (--trace-dir).

Run: python examples/profile_cycle.py [--batch-size 1] [--iters 5] [--trace-dir DIR]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def timed(fn, iters, *args, **kwargs):
    """Steady-state seconds per call (first call excluded as compile)."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument(
        "--stack-pairs",
        choices=("auto", "on", "off"),
        default="auto",
        help="vmap-stack the 3 relu/leaky pairs in the fused cycle (the "
        "bench.py default layout); auto follows train.multi.STACK_BELOW_BATCH",
    )
    args = ap.parse_args(argv)

    from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS, ModelConfig, TrainConfig
    from moleculardiffusion_mivit_tpu.evaluation import (
        generate_frozen_validation,
        render_validation_videos,
    )
    from moleculardiffusion_mivit_tpu.models import (
        GeneralTransformer,
        MultiImageResNet,
        get_transformer_models,
    )
    from moleculardiffusion_mivit_tpu.train import make_multi_cycle, make_train_fns
    from moleculardiffusion_mivit_tpu.train.loop import generate_cycle_data

    train_cfg = TrainConfig(seed=0)
    model_cfg = ModelConfig(use_pos_encoding=True)
    n_seq = train_cfg.sequences_per_d * len(train_cfg.training_ds)
    print(f"devices: {jax.devices()}; {n_seq} seqs/cycle; batch {args.batch_size}",
          file=sys.stderr, flush=True)

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

    fixtures = generate_frozen_validation(d_values=(1, 3, 5, 7), in_order_particles=1)
    fixtures.pop("valTrajsInOrder")
    val_videos = render_validation_videos(fixtures, train_cfg, BASELINE_OPTICS)
    val = {float(k[3:]): v for k, v in val_videos.items()}
    val_ds = sorted(val)
    val_concat = jnp.concatenate([val[d] for d in val_ds], axis=0)
    val_targets = jnp.repeat(
        jnp.asarray(val_ds, jnp.float32), val[val_ds[0]].shape[0]
    )[:, None]

    key = jax.random.key(0)
    videos, labels, _ = generate_cycle_data(key, train_cfg, BASELINE_OPTICS)
    breakdown = {}

    # 1. generation alone (one dispatch)
    gen = lambda k: generate_cycle_data(k, train_cfg, BASELINE_OPTICS)
    breakdown["generate"] = timed(gen, args.iters, jax.random.fold_in(key, 1))

    # 2. per-model epochs + evals (separate dispatches, the pre-fusion layout)
    per_model_train = {}
    per_model_eval = {}
    states = {}
    fns = {}
    for i, (name, model) in enumerate(models.items()):
        init_state, train_cycle, evaluate = make_train_fns(model, train_cfg)
        fns[name] = (train_cycle, evaluate)
        states[name] = init_state(jax.random.fold_in(key, i), videos[:1])

    for name in models:
        train_cycle, evaluate = fns[name]

        def step(name=name, train_cycle=train_cycle):
            st, loss = train_cycle(
                jax.tree.map(jnp.copy, states[name]), videos, labels, None,
                key, jnp.float32(1e-4), args.batch_size,
            )
            return loss

        per_model_train[name] = timed(step, args.iters)
        per_model_eval[name] = timed(
            lambda evaluate=evaluate, name=name: evaluate(states[name], val_concat),
            args.iters,
        )
    breakdown["train_per_model"] = per_model_train
    breakdown["train_total"] = sum(per_model_train.values())
    breakdown["eval_total"] = sum(per_model_eval.values())

    # 3. dispatch overhead probe: a trivial jitted op round-trip
    trivial = jax.jit(lambda x: x + 1.0)
    breakdown["dispatch_roundtrip"] = timed(
        lambda: trivial(jnp.float32(0.0)), max(args.iters * 4, 20)
    )

    # 4. fused mega-cycle (bench.py path): one dispatch for everything
    from moleculardiffusion_mivit_tpu.train.multi import STACK_BELOW_BATCH

    stack_pairs = args.stack_pairs == "on" or (
        args.stack_pairs == "auto" and args.batch_size < STACK_BELOW_BATCH
    )
    breakdown["stack_pairs"] = stack_pairs
    init_states, cycle = make_multi_cycle(
        models, train_cfg, BASELINE_OPTICS, stack_pairs=stack_pairs
    )
    mstates = init_states(key, videos[:1])

    def fused():
        nonlocal mstates
        mstates, _, val_mse = cycle(
            mstates, jax.random.fold_in(key, 2), jnp.float32(1e-4),
            args.batch_size, val_concat, val_targets,
        )
        return val_mse

    if args.trace_dir:
        from moleculardiffusion_mivit_tpu.utils.profiling import profile_trace

        fused()  # compile outside the trace
        with profile_trace(args.trace_dir):
            jax.block_until_ready(fused())
        print(f"trace written to {args.trace_dir}", file=sys.stderr)

    breakdown["fused_cycle"] = timed(fused, args.iters)
    breakdown["unfused_cycle_sum"] = (
        breakdown["generate"] + breakdown["train_total"] + breakdown["eval_total"]
    )
    breakdown["fused_seqs_per_sec"] = n_seq / breakdown["fused_cycle"]

    # Utilization accounting: exact FLOPs of the cycle's logical work
    # (loop-free per-step lowerings × step counts — XLA's cost analysis
    # counts scan bodies once, so lowering the scanned program undercounts),
    # achieved FLOP/s at the measured steady-state time, and the fraction of
    # the chip's bf16 peak (MFU).
    from moleculardiffusion_mivit_tpu.utils import multi_cycle_flops, utilization

    flops = multi_cycle_flops(
        models, train_cfg, BASELINE_OPTICS, args.batch_size, val_concat.shape
    )
    breakdown["utilization"] = utilization(flops, breakdown["fused_cycle"])
    print(json.dumps(breakdown, indent=2))


if __name__ == "__main__":
    main(sys.argv[1:])
