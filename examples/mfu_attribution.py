"""Where does the compute-bound regime's non-MXU time go? (VERDICT r3 item 2)

Round 3 measured the fused baseline cycle at 21.5-23% MFU in the batch-16/64
steady state and *asserted* the rest was shape-bound. This script makes that
attribution measured, on the real chip, three ways:

1. **Stage decomposition** — generation / per-model epochs / validation each
   timed standalone, plus an intra-step split of the flagship deep-ResNet
   transformer's optimizer step at the target batch: forward loss, forward+
   backward (`value_and_grad`), and the full AdamW step, each as its own
   jitted program. fwd:bwd:update ratios localize the time.
2. **Profiler trace** — `jax.profiler` trace of the fused cycle, parsed from
   the raw `*.xplane.pb` (tensorflow.tsl protobuf): per-op device time
   grouped by HLO category (convolution/dot vs elementwise/copy/reduce) —
   the direct measurement of MXU vs non-MXU device time. Degrades gracefully
   if the axon tunnel backend emits no device plane.
3. **The two obvious levers, A/B'd** —
   (i) `TrainConfig.compute_dtype="bfloat16"` (f32 master params + optimizer,
   bf16 forward/backward: the HBM-traffic lever), and (ii) `embed_dim` 64→128
   (lane-native token width: v5e lanes are 128 wide, so a 64-wide embedding
   pads every token-dim matmul/elementwise tile to half occupancy). Each
   reports seq/s and MFU with its own exact FLOP denominator
   (`utils.multi_cycle_flops`).

Timing protocol (CLAUDE.md): donated-state programs sync on a freshly
computed param checksum before AND after each timed loop; standalone stage
timings use non-donated programs and block on their fresh outputs.

Run: python examples/mfu_attribution.py [--batch-size 64] [--cycles 20]
     [--trace-dir /tmp/mfu_trace] [--out results/mfu_attribution]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import jax
import jax.numpy as jnp


def build_models(model_cfg):
    """The bench.py / baseline-experiment model dict (7 arms)."""
    from moleculardiffusion_mivit_tpu.models import (
        GeneralTransformer,
        MultiImageResNet,
        get_transformer_models,
    )

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
    return models


def parse_xplane(trace_dir: str):
    """Device-time-by-HLO-category table from the newest xplane.pb under
    trace_dir.

    Uses the TPU device plane's "XLA Ops" line, whose events NEST (a `while`
    epoch scan's event spans all its body ops): each event's SELF time is
    its duration minus its children's, reconstructed from interval
    containment, so nothing is double-counted — summed self time matches the
    measured cycle time within a few %. Events aggregate by the profiler's
    own `hlo_category` stat ("convolution fusion", "loop fusion", "copy",
    ...). Returns None when no device plane exists (a tunnel backend may
    only emit host planes)."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        return None
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        return None
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    planes = [p for p in space.planes if p.name.startswith("/device:TPU")]
    if not planes:
        return None
    by_cat: dict = {}
    by_op: dict = {}
    for plane in planes:
        stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
        meta = {k: v for k, v in plane.event_metadata.items()}

        def category(mid):
            for s in meta[mid].stats:
                if stat_names.get(s.metadata_id) == "hlo_category":
                    return s.str_value
            return "(uncategorized)"

        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            evs = sorted(line.events, key=lambda e: (e.offset_ps, -e.duration_ps))
            stack = []  # (start, end, metadata_id)
            for ev in evs:
                start, end = ev.offset_ps, ev.offset_ps + ev.duration_ps
                while stack and stack[-1][1] <= start:
                    stack.pop()
                if stack:  # child time belongs to the child, not the parent
                    pmid = stack[-1][2]
                    by_cat[category(pmid)] = by_cat.get(category(pmid), 0) - ev.duration_ps
                    pname = meta[pmid].display_name or meta[pmid].name
                    by_op[pname] = by_op.get(pname, 0) - ev.duration_ps
                c = category(ev.metadata_id)
                name = meta[ev.metadata_id].display_name or meta[ev.metadata_id].name
                by_cat[c] = by_cat.get(c, 0) + ev.duration_ps
                by_op[name] = by_op.get(name, 0) + ev.duration_ps
                stack.append((start, end, ev.metadata_id))
    total_ps = sum(by_cat.values())
    if total_ps <= 0:
        return None
    top = sorted(by_op.items(), key=lambda kv: -kv[1])[:12]
    return {
        "device_self_time_ms": round(total_ps / 1e9, 3),
        "by_category_pct": {
            c: round(100.0 * ps / total_ps, 1)
            for c, ps in sorted(by_cat.items(), key=lambda kv: -kv[1])
            if ps / total_ps >= 0.0005
        },
        "top_ops_pct": {op: round(100.0 * ps / total_ps, 1) for op, ps in top},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--cycles", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/mfu_trace")
    ap.add_argument("--skip-levers", action="store_true")
    ap.add_argument("--out", default="results/mfu_attribution")
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
    from moleculardiffusion_mivit_tpu.train import make_multi_cycle, make_train_fns
    from moleculardiffusion_mivit_tpu.train.loop import generate_cycle_data
    from moleculardiffusion_mivit_tpu.utils import multi_cycle_flops, utilization

    base_model_cfg = ModelConfig(use_pos_encoding=True)  # bench.py regime
    bs = args.batch_size

    def val_set(train_cfg):
        fixtures = generate_frozen_validation(d_values=(1, 3, 5, 7), in_order_particles=1)
        fixtures.pop("valTrajsInOrder")
        vids = render_validation_videos(fixtures, train_cfg, BASELINE_OPTICS)
        val = {float(k[3:]): v for k, v in vids.items()}
        ds = sorted(val)
        concat = jnp.concatenate([val[d] for d in ds], axis=0)
        targets = jnp.repeat(jnp.asarray(ds, jnp.float32), val[ds[0]].shape[0])[:, None]
        return concat, targets

    checksum = jax.jit(
        lambda states: sum(
            jnp.sum(x) for x in jax.tree.leaves(states) if jnp.issubdtype(x.dtype, jnp.floating)
        )
    )

    def run_variant(tag, train_cfg, model_cfg, trace=False):
        models = build_models(model_cfg)
        val_concat, val_targets = val_set(train_cfg)
        n_seq = train_cfg.sequences_per_d * len(train_cfg.training_ds)
        init_states, cycle = make_multi_cycle(
            models, train_cfg, BASELINE_OPTICS, stack_pairs=False
        )
        key = jax.random.key(0)
        videos, _, _ = generate_cycle_data(key, train_cfg, BASELINE_OPTICS)
        states = init_states(key, videos[:1])
        lr = jnp.float32(train_cfg.lr)

        def one(i):
            nonlocal states
            states, _, val_mse = cycle(
                states, jax.random.fold_in(key, i), lr, bs, val_concat, val_targets
            )
            return val_mse

        for w in range(args.warmup):
            one(2**20 + w)
        float(checksum(states))
        t0 = time.perf_counter()
        for c in range(args.cycles):
            r = one(c)
        float(checksum(states))
        cycle_s = (time.perf_counter() - t0) / args.cycles
        vals = {k: float(v) for k, v in r.items()}
        assert all(v == v and abs(v) < 1e6 for v in vals.values()), vals

        flops = multi_cycle_flops(models, train_cfg, BASELINE_OPTICS, bs, val_concat.shape)
        util = utilization(flops, cycle_s)
        row = {
            "cycle_ms": round(cycle_s * 1e3, 2),
            "seqs_per_sec": round(n_seq / cycle_s, 1),
            "mfu_pct": util["mfu_pct"],
            "achieved_tflops": util["achieved_tflops"],
            "val_mse_sample": {k: round(v, 3) for k, v in sorted(vals.items())[:2]},
        }
        print(f"[{tag}] {json.dumps(row)}", flush=True)

        if trace and args.trace_dir:
            os.makedirs(args.trace_dir, exist_ok=True)
            jax.profiler.start_trace(args.trace_dir)
            jax.block_until_ready(one(2**20 + 100))
            jax.profiler.stop_trace()
            row["trace"] = parse_xplane(args.trace_dir)
        return row, models, states, val_concat

    report = {"batch_size": bs, "device": str(jax.devices()[0])}
    train_cfg = TrainConfig(seed=0)
    report["f32_baseline"], models, states, val_concat = run_variant(
        "f32 baseline", train_cfg, base_model_cfg, trace=True
    )

    # -- stage decomposition ---------------------------------------------
    key = jax.random.key(7)
    videos, labels, _ = generate_cycle_data(key, train_cfg, BASELINE_OPTICS)

    def timed(fn, iters=None):
        iters = iters or args.cycles
        jax.block_until_ready(fn())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    stages = {}
    gen = jax.jit(lambda k: generate_cycle_data(k, train_cfg, BASELINE_OPTICS)[0])
    stages["generate_ms"] = timed(lambda: gen(jax.random.fold_in(key, 1))) * 1e3

    # flagship arm's step split at the target batch: fwd / fwd+bwd / full step
    from moleculardiffusion_mivit_tpu.models import GeneralTransformer

    flag = GeneralTransformer(base_model_cfg, embedding="deep_resnet")
    init_state, train_cycle, evaluate = make_train_fns(flag, train_cfg)
    fstate = init_state(jax.random.fold_in(key, 3), videos[:1])
    bv, by = videos[:bs], labels[:bs]

    def loss_fn(params, batch_stats):
        # mirror train.loop.loss_fn exactly (train=True, mutable batch_stats,
        # dropout rng) so fwd/bwd timings measure the real step's programs
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        out, _ = flag.apply(
            variables, bv, train=True, mutable=mutable,
            rngs={"dropout": jax.random.fold_in(key, 9)},
        )
        return jnp.mean((out - by) ** 2)

    try:
        fwd = jax.jit(loss_fn)
        bwd = jax.jit(jax.value_and_grad(loss_fn))
        stages["flagship_fwd_ms"] = timed(
            lambda: fwd(fstate.params, fstate.batch_stats)) * 1e3
        stages["flagship_fwd_bwd_ms"] = timed(
            lambda: bwd(fstate.params, fstate.batch_stats)[0]) * 1e3
    except Exception as e:  # a model-family layout surprise must not kill the report
        stages["flagship_split_error"] = repr(e)

    # (a standalone full-epoch timing was tried and dropped: donation forces a
    # fresh param-tree copy per call, whose ~100 small dispatches through the
    # tunnel dominate the reading — the fwd/bwd split above plus the measured
    # full-cycle time carry the same information uncontaminated)
    stages["flagship_steps_per_epoch"] = videos.shape[0] // bs
    stages["eval_700seq_ms"] = timed(lambda: evaluate(fstate, val_concat)) * 1e3
    report["stages"] = {
        k: (round(v, 3) if isinstance(v, float) else v) for k, v in stages.items()
    }
    print(json.dumps(report["stages"], indent=2), flush=True)

    if not args.skip_levers:
        report["bf16_compute"], *_ = run_variant(
            "bf16 compute", TrainConfig(seed=0, compute_dtype="bfloat16"), base_model_cfg
        )
        report["embed128_f32"], *_ = run_variant(
            "embed 128 f32", train_cfg, base_model_cfg.replace(embed_dim=128)
        )
        report["embed128_bf16"], *_ = run_variant(
            "embed 128 bf16",
            TrainConfig(seed=0, compute_dtype="bfloat16"),
            base_model_cfg.replace(embed_dim=128),
        )

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "mfu_attribution.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
