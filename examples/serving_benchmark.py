"""Inference (serving) throughput of the flagship MiViT on the current chip.

Regenerates the RESULTS.md "Inference (serving) throughput" table: the
jitted forward pass of the poster architecture (GeneralTransformer with the
deep-ResNet embedding, 6 encoder layers, 30 frames of 9x9 pixels —
helpers/models.py:278-361 / trainSettingsImagesFeatures.py:119-168) swept
over serving batch sizes. The reference reports only *relative* inference
costs (image transformer ~ +20% vs CNN, rotation-TTA x8 — ProjectReport
section 5); here the absolute per-chip numbers are first-class.

Timing notes: steady state (first call per shape excluded as compile);
outputs are NOT donated, so ``block_until_ready`` on them is a correct sync
(the donated-buffer hazard in CLAUDE.md applies to training state, not
here).

Run: python examples/serving_benchmark.py [--batches 256 1024 4096] [--iters 20]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[256, 1024, 4096])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument(
        "--tta",
        action="store_true",
        help="also time the 4-rotation test-time-augmentation forward "
        "(trainSettingsImagesFeatures.py:255-300) to pin its cost factor",
    )
    args = ap.parse_args(argv)

    from moleculardiffusion_mivit_tpu.config import ModelConfig
    from moleculardiffusion_mivit_tpu.experiments.base import rotate_videos
    from moleculardiffusion_mivit_tpu.models import GeneralTransformer, init_model

    cfg = ModelConfig()  # patch 9, embed 64, 4 heads, 6 layers (poster model)
    model = GeneralTransformer(cfg, embedding="deep_resnet")
    key = jax.random.key(0)
    params, batch_stats = init_model(
        model, key, jnp.zeros((1, 30, cfg.patch_size, cfg.patch_size), jnp.float32)
    )

    @jax.jit
    def forward(videos):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, videos, train=False)

    @jax.jit
    def forward_tta(videos):
        return jnp.mean(
            jnp.stack([forward(rotate_videos(videos, k)) for k in range(4)]), axis=0
        )

    def timed(fn, videos):
        fn(videos).block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(videos)
        out.block_until_ready()
        return (time.perf_counter() - t0) / args.iters

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rows = []
    for b in args.batches:
        videos = jax.random.normal(
            jax.random.fold_in(key, b), (b, 30, cfg.patch_size, cfg.patch_size)
        )
        sec = timed(forward, videos)
        row = {
            "batch": b,
            "latency_ms": round(sec * 1e3, 2),
            "seqs_per_sec": round(b / sec),
        }
        if args.tta:
            tta_sec = timed(forward_tta, videos)
            row["tta_latency_ms"] = round(tta_sec * 1e3, 2)
            row["tta_cost_factor"] = round(tta_sec / sec, 2)
        rows.append(row)
        print(json.dumps(row), flush=True)
    best = max(rows, key=lambda r: r["seqs_per_sec"])
    print(
        json.dumps({"peak_seqs_per_sec": best["seqs_per_sec"], "at_batch": best["batch"]})
    )


if __name__ == "__main__":
    main(sys.argv[1:])
