"""Grid-scale MFU accounting — the 60-model PSFNoise regime (round-5,
verdict Missing #3).

The MFU story so far covers only the 7-model baseline cycle (22.4% MFU at
batch 64, conv-fusion-dominated — results/mfu_attribution). The vmapped
model grid is where the TPU-native thesis should saturate best: 60 models'
batched matmuls in one program. This script closes the accounting:

1. **MFU rows** — the real PSFNoise experiment's fused training cycle
   (generation + both 30-model GridArms, ``Experiment._fused_cycle_fn``)
   timed steady-state at batch {16, 64} × {f32, bf16}, each with its exact
   FLOP denominator (``utils.grid_cycle_flops`` per arm — loop-free stacked
   step × step count, immune to XLA's scan-body undercount — plus the
   generation program via ``utils.compiled_flops``; generation's trajectory
   scan is undercounted by its ~300-step walk, a few MFLOPs of adds against
   the renderer's exact matmuls).
2. **hlo_category attribution** — profiler trace of one fused cycle parsed
   by examples/mfu_attribution.py's xplane reader: conv/dot vs elementwise/
   copy device time at grid scale.
3. **The grid-unique layout lever, A/B'd standalone** — the embedding convs
   carry per-model kernels, so the vmapped grid lowers them as grouped
   convolutions; the alternative presents the SAME math as batched GEMMs
   (im2col patches × per-model kernel matrices, batching over the model
   axis — MXU-native shape). Measured per conv shape of the
   DeepResNetEmbedding at grid batch (M=30), two-loop-length slope
   protocol (CLAUDE.md).

Timing protocol: the fused cycle donates its states, so every timed loop
syncs on a freshly computed parameter checksum before AND after
(block_until_ready on donated outputs returns early through the tunnel).

Run: python examples/grid_mfu.py [--seqs-per-d 256] [--cycles 10]
         [--out results/grid_mfu]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import time

import jax
import jax.numpy as jnp

_here = os.path.dirname(os.path.abspath(__file__))
_spec = importlib.util.spec_from_file_location(
    "mfu_attribution", os.path.join(_here, "mfu_attribution.py")
)
_mfa = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mfa)
parse_xplane = _mfa.parse_xplane


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seqs-per-d", type=int, default=256,
                    help="the reconciled-scaled protocol regime (256/class)")
    ap.add_argument("--cycles", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--batch-sizes", default="16,64")
    ap.add_argument("--trace-dir", default="/tmp/grid_mfu_trace")
    ap.add_argument("--skip-lever", action="store_true")
    ap.add_argument("--lever-only", action="store_true",
                    help="run only the conv layout A/B and merge it into an "
                    "existing report (the MFU rows cost ~25 min of chip time)")
    ap.add_argument("--out", default="results/grid_mfu")
    args = ap.parse_args()

    from moleculardiffusion_mivit_tpu.experiments import psfnoise
    from moleculardiffusion_mivit_tpu.utils import (
        compiled_flops,
        grid_cycle_flops,
        utilization,
    )

    batch_sizes = [int(b) for b in args.batch_sizes.split(",")]
    os.makedirs(args.out, exist_ok=True)
    report_path = os.path.join(args.out, "grid_mfu.json")
    report = {"seqs_per_d": args.seqs_per_d, "device": str(jax.devices()[0]),
              "cycles": args.cycles, "rows": {}}

    def save():
        # incremental: a crash in a later phase must not lose measured rows
        with open(report_path, "w") as fh:
            json.dump(report, fh, indent=2)

    if args.lever_only:
        if os.path.exists(report_path):
            with open(report_path) as fh:
                report = json.load(fh)
        report["conv_lever"] = conv_layout_ab(cycles=400)
        print("conv lever:", json.dumps(report["conv_lever"], indent=1), flush=True)
        save()
        print(f"report -> {report_path}")
        return

    checksum = jax.jit(
        lambda states: sum(
            jnp.sum(x)
            for x in jax.tree.leaves(states)
            if jnp.issubdtype(x.dtype, jnp.floating)
        )
    )

    def flops_for(exp, batch_size):
        """Exact per-cycle FLOPs: both grid arms' epochs + generation."""
        n_per_model = sum(
            psfnoise.class_sequence_counts(
                exp.train_cfg.training_ds, args.seqs_per_d
            )
        )
        total = 0.0
        for arm in exp.arms.values():
            f = grid_cycle_flops(
                arm.model,
                exp.train_cfg,
                len(arm.names),
                n_per_model,
                batch_size,
                (9, 9),
            )
            if f is None:
                return None
            total += f
        gen = jax.jit(exp.generate_fn)
        g = compiled_flops(gen, jax.eval_shape(lambda: jax.random.key(0)))
        return total + (g or 0.0)

    traced = False
    for dtype in ("float32", "bfloat16"):
        exp = psfnoise.build(seed=0, sequences_per_d=args.seqs_per_d)
        exp.train_cfg = exp.train_cfg.replace(compute_dtype=dtype)
        exp.precompile_schedule = False
        exp.build()
        fused = exp._fused_cycle_fn()
        states = exp.states
        key = jax.random.key(5)
        lr = jnp.float32(exp.train_cfg.lr)
        n_total_seqs = sum(
            psfnoise.class_sequence_counts(exp.train_cfg.training_ds, args.seqs_per_d)
        )

        for bs in batch_sizes:
            def one(i):
                nonlocal states
                kg, kt = jax.random.split(jax.random.fold_in(key, i))
                states = fused(states, kg, kt, lr, bs)
                return states

            for w in range(args.warmup):
                one(2**20 + 1000 * bs + w)
            float(checksum(states))
            t0 = time.perf_counter()
            for c in range(args.cycles):
                one(1000 * bs + c)
            float(checksum(states))
            cycle_s = (time.perf_counter() - t0) / args.cycles

            flops = flops_for(exp, bs)
            util = utilization(flops, cycle_s)
            row = {
                "cycle_s": round(cycle_s, 4),
                "seqs_per_sec": round(n_total_seqs / cycle_s, 1),
                "flops_per_cycle": flops,
                "achieved_tflops": util["achieved_tflops"],
                "mfu_pct": util["mfu_pct"],
            }
            report["rows"][f"{dtype}/b{bs}"] = row
            print(f"[{dtype}/b{bs}] {json.dumps(row)}", flush=True)
            save()

            if not traced and dtype == "float32" and bs == batch_sizes[-1]:
                traced = True
                os.makedirs(args.trace_dir, exist_ok=True)
                jax.profiler.start_trace(args.trace_dir)
                one(2**21)
                float(checksum(states))
                jax.profiler.stop_trace()
                report["trace_f32_last_batch"] = parse_xplane(args.trace_dir)
                print("trace:", json.dumps(report["trace_f32_last_batch"], indent=1),
                      flush=True)
                save()

    if not args.skip_lever:
        report["conv_lever"] = conv_layout_ab(cycles=400)
        print("conv lever:", json.dumps(report["conv_lever"], indent=1), flush=True)
        save()
    print(f"report -> {report_path}")


def conv_layout_ab(m=30, cycles=400):
    """Per-shape A/B: vmapped (grouped-conv-lowered) per-model 3x3 conv vs
    the SAME math as an im2col batched GEMM over the model axis.

    Shapes are the DeepResNetEmbedding's conv stack at grid batch
    (M=30 models, N=batch*frames activations of 9x9; N shrinks with channel
    count to keep the im2col patch tensor inside HBM -- the first attempt
    materialized a 38 GB patch copy at cin=128 and OOM'd, itself a bound on
    the lever: the GEMM layout pays a 9x activation blow-up the conv
    lowering never stores). Two loop lengths -> per-call slope (subtracts
    the ~27 ms dispatch floor, CLAUDE.md)."""
    key = jax.random.key(0)
    out = {}
    for cin, cout, n in ((1, 32, 480), (32, 64, 480), (64, 128, 240), (128, 128, 120)):
        try:
            out[f"{cin}->{cout} (n={n})"] = _ab_one_shape(m, n, cin, cout, cycles, key)
        except Exception as e:  # e.g. patch-tensor OOM: record, keep going
            out[f"{cin}->{cout} (n={n})"] = {"error": f"{type(e).__name__}: {e}"[:200]}
    return out


def _ab_one_shape(m, n, cin, cout, cycles, key):
    import numpy as np

    x = jax.random.normal(key, (m, n, 9, 9, cin), jnp.float32)
    k = jax.random.normal(key, (m, 3, 3, cin, cout), jnp.float32) * 0.1

    @jax.jit
    def conv_vmapped(x, k):
        def one(xm, km):
            return jax.lax.conv_general_dilated(
                xm, km, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        return jax.vmap(one)(x, k)

    @jax.jit
    def conv_im2col(x, k):
        # patches: (M*N, 9, 9, 3*3*cin) -> batched GEMM over M
        xm = x.reshape(m * n, 9, 9, cin)
        p = jax.lax.conv_general_dilated_patches(
            xm, (3, 3), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        p = p.reshape(m, n * 81, 3 * 3 * cin)
        # patches order is (cin, kh, kw); align the kernel to match
        km = jnp.transpose(k, (0, 3, 1, 2, 4)).reshape(m, 3 * 3 * cin, cout)
        y = jnp.einsum("mpk,mko->mpo", p, km)
        return y.reshape(m, n, 9, 9, cout)

    ref = np.asarray(conv_vmapped(x, k))
    got = np.asarray(conv_im2col(x, k))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)

    def slope_us(fn):
        def loop(iters):
            y = fn(x, k)
            jax.block_until_ready(y)
            t0 = time.perf_counter()
            for _ in range(iters):
                y = fn(x, k)
            float(jnp.sum(y))  # host fetch = reliable sync (CLAUDE.md)
            return time.perf_counter() - t0

        t1, t2 = loop(cycles), loop(4 * cycles)
        return (t2 - t1) / (3 * cycles) * 1e6

    v_us, g_us = slope_us(conv_vmapped), slope_us(conv_im2col)
    return {
        "vmapped_conv_us": round(v_us, 1),
        "im2col_batched_gemm_us": round(g_us, 1),
        "speedup": round(v_us / g_us, 2) if g_us > 0 else None,
    }


if __name__ == "__main__":
    main()
