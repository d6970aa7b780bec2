"""Fused-embedding kernel vs XLA conv lowering — on-chip A/B.

Times the DeepResNetEmbedding training forward and forward+backward through
(a) the flax/XLA path (models/embeddings.py standard branch) and (b) the
whole-embedding Pallas kernel (ops/fused_embedding.py), at a sweep of folded
frame counts N = batch·frames. This measurement decides the
``set_embedding_backend("auto")`` routing (currently: XLA everywhere — the
kernel measured at parity, see the ops/fused_embedding.py docstring) —
re-run it if the kernel or the hardware changes.

Timing per CLAUDE.md: one compiled ``fori_loop`` per (impl, n_iters) with a
data dependence that defeats hoisting; per-call cost is the slope between
two loop lengths, synced by host-fetching the scalar result.

Run: python examples/fused_embedding_benchmark.py [--batch-sizes 1,2,4]
     [--frames 30] [--iters 200] [--out results/fused_embedding]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.models.embeddings import DeepResNetEmbedding
from moleculardiffusion_mivit_tpu.ops.fused_embedding import fused_deep_resnet_embed


def gather(p):
    bn = {
        "bn1": p["bn1"],
        "rb1_bn1": p["res_block1"]["bn1"],
        "rb1_bn2": p["res_block1"]["bn2"],
        "rb1_skip": p["res_block1"]["skip_bn"],
        "rb2_bn1": p["res_block2"]["bn1"],
        "rb2_bn2": p["res_block2"]["bn2"],
        "rb2_skip": p["res_block2"]["skip_bn"],
    }
    ks = {
        "initial": p["initial_conv"]["kernel"],
        "rb1_conv1": p["res_block1"]["conv1"]["kernel"],
        "rb1_conv2": p["res_block1"]["conv2"]["kernel"],
        "rb1_skip": p["res_block1"]["skip_conv"]["kernel"],
        "rb2_conv1": p["res_block2"]["conv1"]["kernel"],
        "rb2_conv2": p["res_block2"]["conv2"]["kernel"],
        "rb2_skip": p["res_block2"]["skip_conv"]["kernel"],
    }
    return (
        ks,
        {k: v["scale"] for k, v in bn.items()},
        {k: v["bias"] for k, v in bn.items()},
        p["fc"]["kernel"],
        p["fc"]["bias"],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", default="1,2,4")
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--out", default="results/fused_embedding")
    ap.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    key = jax.random.key(0)
    S, E = 9, 64
    mod = DeepResNetEmbedding(patch_size=S, embed_dim=E)

    def make_looped(f, params, x, n):
        @jax.jit
        def looped():
            def body(i, acc):
                p = jax.tree.map(lambda v: v * (1 + 1e-6 * acc).astype(v.dtype), params)
                out = f(p, x * (1 + 1e-6 * acc))
                return jnp.mean(jax.tree.leaves(out)[0]).astype(jnp.float32) + 0.0 * acc

            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return looped

    def grad_of(f):
        def g(p, xx):
            loss, grads = jax.value_and_grad(lambda pp: jnp.mean(f(pp, xx)) * 1e3)(p)
            return loss + sum(jnp.sum(v) for v in jax.tree.leaves(grads))

        return g

    def slope(f, params, x, lo, hi, repeats=3):
        progs = {n: make_looped(f, params, x, n) for n in (lo, hi)}
        mins = {}
        for n in (lo, hi):
            float(progs[n]())  # warm: compile + full roundtrip
            mins[n] = min(
                (lambda t0: (float(progs[n]()), time.perf_counter() - t0)[1])(
                    time.perf_counter()
                )
                for _ in range(repeats)
            )
        return (mins[hi] - mins[lo]) / (hi - lo)

    report = {"frames": args.frames, "device": str(jax.devices()[0].device_kind), "rows": {}}
    for b in [int(v) for v in args.batch_sizes.split(",")]:
        x = jax.random.normal(key, (b, args.frames, S, S), jnp.float32) * 0.3 + 0.1
        variables = mod.init(jax.random.key(1), x[:, :2], train=True)
        params, bstats = variables["params"], variables["batch_stats"]

        def fwd_xla(p, xx):
            out, _ = mod.apply(
                {"params": p, "batch_stats": bstats}, xx, train=True, mutable=["batch_stats"]
            )
            return out

        def fwd_fused(p, xx):
            out, _ = fused_deep_resnet_embed(xx, *gather(p))
            return out

        lo = args.iters
        for name, f in [
            ("xla/fwd", fwd_xla),
            ("fused/fwd", fwd_fused),
            ("xla/fwdbwd", grad_of(fwd_xla)),
            ("fused/fwdbwd", grad_of(fwd_fused)),
        ]:
            us = slope(f, params, x, lo, 4 * lo) * 1e6
            report["rows"][f"b{b}/{name}"] = round(us, 2)
            print(f"b{b:<3d} {name:16s} {us:9.2f} us", flush=True)

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "fused_embedding_benchmark.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}/fused_embedding_benchmark.json")


if __name__ == "__main__":
    main()
