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

``--per-arm OUT.json`` instead times the forward pass of each poster arm
(MSD_Frame, ft_mlp, im_resnet, im_tr, im_ft_early_tr — the poster's
MSD/MLP/CNN/ViT/MiViT) given its own input kind, and writes
``{arm: [mean_ms, std_ms]}`` per 10k sequences. Dropped next to a result
directory's ``*_errors.csv`` as ``inference_times.json``, it feeds the
poster's cost-vs-accuracy scatter (outPoster/poster_plots_final.ipynb
cell 3; ``evaluation.plots.plot_accuracy_vs_cost`` via ``render_all``).
Costs are the arm's forward only — feature extraction/tracking upstream of
the MLP/fusion arms is excluded, matching the poster's per-model framing.
Per-arm timing uses the two-loop-slope method (the forward runs inside ONE
compiled ``fori_loop``; the per-call cost is the slope between two loop
lengths, synced by host-fetching the scalar result) because the fixed
~27 ms-per-dispatch tunnel cost would otherwise swamp the cheap arms —
``ops.pallas_render.benchmark_renderers`` is the reference implementation
of this method and documents the failure mode.

Run: python examples/serving_benchmark.py [--batches 256 1024 4096] [--iters 20]
     python examples/serving_benchmark.py --per-arm results/<dir>/inference_times.json
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp


def _per_arm(out_path: str, batch: int, iters: int, repeats: int = 3):
    """Time each poster arm's forward at ``batch`` and write
    ``{arm: [mean_ms, std_ms]}`` per 10k sequences to ``out_path``.

    Steady-state per-call cost is the slope between compiled loops of
    ``iters`` and ``4*iters`` forwards (host-fetch synced, best of
    ``repeats``); see the module docstring for why a plain timing loop is
    invalid through the TPU tunnel."""
    import numpy as np

    from moleculardiffusion_mivit_tpu.config import ModelConfig
    from moleculardiffusion_mivit_tpu.experiments.images_features import FeatureMLP
    from moleculardiffusion_mivit_tpu.features import N_FEATURES, d_from_msd_tau1
    from moleculardiffusion_mivit_tpu.models import (
        GeneralTransformer,
        MultiImageResNet,
        init_model,
    )

    cfg = ModelConfig()
    key = jax.random.key(0)
    videos = jax.random.normal(key, (batch, 30, cfg.patch_size, cfg.patch_size))
    feats = jax.random.normal(jax.random.fold_in(key, 1), (batch, N_FEATURES))
    trajs = jnp.cumsum(
        jax.random.normal(jax.random.fold_in(key, 2), (batch, 30, 2)), axis=1
    )

    def fwd(model, *inputs):
        params, batch_stats = init_model(model, key, *inputs)

        @jax.jit
        def f(*xs):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            return model.apply(variables, *xs, train=False)

        return f

    arms = {
        "MSD_Frame": (jax.jit(lambda t: d_from_msd_tau1(t) * 37.5), (trajs,)),
        "ft_mlp": (fwd(FeatureMLP(), feats), (feats,)),
        "im_resnet": (fwd(MultiImageResNet(), videos), (videos,)),
        "im_tr": (fwd(GeneralTransformer(cfg, embedding="deep_resnet"), videos), (videos,)),
        "im_ft_early_tr": (
            fwd(
                GeneralTransformer(
                    cfg,
                    embedding="deep_resnet",
                    use_global_features=True,
                    fusion_type="early",
                ),
                videos,
                feats,
            ),
            (videos, feats),
        ),
    }
    def time_slope(f, inputs, lo, hi):
        """Best-of-``repeats`` per-call seconds via the two-loop slope, plus
        the spread of per-repeat slopes for error bars."""
        mins, runs = {}, {}
        for n in (lo, hi):

            @jax.jit
            def looped(*xs, n=n):
                def body(i, acc):
                    # acc feeds back into the inputs so XLA can't hoist the
                    # (otherwise loop-invariant) forward out of the loop
                    shifted = tuple(x * (1.0 + 1e-6 * acc) for x in xs)
                    return jnp.mean(f(*shifted)).astype(jnp.float32)

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            float(looped(*inputs))  # compile + full device->host roundtrip
            runs[n] = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                float(looped(*inputs))
                runs[n].append(time.perf_counter() - t0)
            mins[n] = min(runs[n])
        per_call = (mins[hi] - mins[lo]) / (hi - lo)
        spreads = [(b - a) / (hi - lo) for a, b in zip(runs[lo], runs[hi])]
        return per_call, float(np.std(spreads))

    times = {}
    for name, (f, inputs) in arms.items():
        # escalate loop lengths until the timed delta clears the ~ms tunnel
        # timing noise — the MSD/MLP arms are microseconds per call and are
        # invisible at loop lengths that suit the transformer arms
        lo = iters
        while True:
            sec, sec_std = time_slope(f, inputs, lo, 4 * lo)
            if sec * 3 * lo > 0.05 or lo >= 10_000 * iters:
                break
            lo *= 16
        # a still-sub-noise-floor arm can slope slightly negative; floor at 0
        # and let the plot layer skip it rather than emit a bogus negative cost
        sec = max(sec, 0.0)
        scale = 10_000 / batch * 1e3  # per-call sec -> ms per 10k sequences
        times[name] = [round(sec * scale, 4), round(sec_std * scale, 4)]
        print(json.dumps({name: times[name]}), flush=True)
    with open(out_path, "w") as fh:
        json.dump(times, fh, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


def _cold_start(batch: int):
    """Serving cold start through the AOT cache: build the flagship model,
    serve ONE batch, report every phase. On a warm cache the XLA compile —
    the 77-930 s tunnel wildcard — is replaced by a ~seconds deserialize,
    so a serving process reaches its first prediction in ~model-init time."""
    from moleculardiffusion_mivit_tpu.config import ModelConfig
    from moleculardiffusion_mivit_tpu.models import GeneralTransformer, init_model
    from moleculardiffusion_mivit_tpu.utils import cached_compile

    t_start = time.perf_counter()
    cfg = ModelConfig()
    model = GeneralTransformer(cfg, embedding="deep_resnet")
    key = jax.random.key(0)
    # params materialize on host CPU then ship — the shape of a real serving
    # start (checkpoint restore is host-side too); initializing on the
    # device costs a tunnel compile per init program (measured 60-100 s)
    device = jax.devices()[0]
    with jax.default_device(jax.devices("cpu")[0]):
        params, batch_stats = init_model(
            model,
            jax.device_put(key, jax.devices("cpu")[0]),
            jnp.zeros((1, 30, cfg.patch_size, cfg.patch_size), jnp.float32),
        )
    params = jax.device_put(params, device)
    batch_stats = jax.device_put(batch_stats, device)
    t_init = time.perf_counter()

    def forward(params, batch_stats, videos):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, videos, train=False)

    videos = jax.random.normal(
        jax.random.fold_in(key, batch), (batch, 30, cfg.patch_size, cfg.patch_size)
    )
    compiled, info = cached_compile(
        jax.jit(forward),
        params,
        batch_stats,
        videos,
        tag=f"serving-b{batch}",
        log=lambda m: print(m, file=sys.stderr, flush=True),
    )
    t_ready = time.perf_counter()
    out = compiled(params, batch_stats, videos)
    jax.block_until_ready(out)
    t_first = time.perf_counter()
    print(
        json.dumps(
            {
                "batch": batch,
                "source": info["source"],
                "model_init_s": round(t_init - t_start, 2),
                "lower_s": info.get("lower_s"),
                "compile_s": info.get("compile_s"),
                "deserialize_s": info.get("load_s"),
                "first_prediction_s": round(t_first - t_start, 2),
            }
        ),
        flush=True,
    )


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
    ap.add_argument(
        "--bf16",
        action="store_true",
        help="serve the forward in bfloat16 (params, stats and activations "
        "cast once; predictions returned f32) and report the max prediction "
        "delta vs the f32 forward on the same batch — the serving-side "
        "variant of TrainConfig.compute_dtype",
    )
    ap.add_argument(
        "--per-arm",
        metavar="OUT_JSON",
        default=None,
        help="time the five poster arms instead and write "
        "{arm: [mean_ms, std_ms]} per 10k sequences (feeds "
        "evaluation.plots.plot_accuracy_vs_cost)",
    )
    ap.add_argument(
        "--cold-start",
        action="store_true",
        help="measure serving cold start instead: wall time from process-"
        "fresh model to the first prediction, through the AOT executable "
        "cache (utils.aot_cache) — reports whether this run compiled (cache "
        "MISS) or deserialized (HIT) and the phase timings. Run twice for "
        "the MISS/HIT pair.",
    )
    args = ap.parse_args(argv)
    if args.per_arm:
        _per_arm(args.per_arm, batch=args.batches[0], iters=args.iters)
        return
    if args.cold_start:
        _cold_start(batch=args.batches[0])
        return

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
    def forward_f32(videos):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        return model.apply(variables, videos, train=False)

    if args.bf16:
        cast = lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x
        bparams = jax.tree.map(cast, params)
        bstats = jax.tree.map(cast, batch_stats)

        @jax.jit
        def forward(videos):
            variables = {"params": bparams}
            if bstats:
                variables["batch_stats"] = bstats
            out = model.apply(variables, cast(videos), train=False)
            return out.astype(jnp.float32)

    else:
        forward = forward_f32

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
        if args.bf16:
            # max |bf16 - f32| prediction delta in physical D units (×10):
            # the numeric cost of the serving cast, on the same batch
            delta = float(
                jnp.max(jnp.abs(forward(videos) - forward_f32(videos)))
            )
            row["max_pred_delta_d_units"] = round(delta * 10.0, 5)
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
