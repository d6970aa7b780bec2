"""Can anything beat XLA's conv lowering on the deep-ResNet embedding?

Round 4's MFU attribution (results/mfu_attribution) measured 68% of the
batch-64 fused cycle's device time inside the convolution fusions of the
DeepResNetEmbedding (models/embeddings.py, parity: reference
helpers/models.py:202-257), running at ~33% MXU efficiency — a *shape*
bound (9×9 frames, 32-128 channels) claimed to be intrinsic. This study
stress-tests that claim on the real chip before (and instead of blindly)
writing a Pallas kernel:

1. **Per-conv-shape timing** — every conv in the embedding as its own
   jitted program at training shapes (N = batch·frames frames of 9×9),
   f32 and bf16, two-loop-slope clocked, with its analytic FLOPs → each
   layer's individual MXU efficiency. Localizes which shapes lose.
2. **Whole-embedding formulation A/B** — the embedding re-expressed as a
   pure function of the SAME flax param tree (numerics-pinned vs the
   module) with swappable conv implementations:
     - ``xla``:    jax.lax.conv_general_dilated (the production path)
     - ``im2col``: 9 shifted views materialized → ONE big GEMM per conv
                   (what a Pallas kernel would do in VMEM, but through HBM)
     - ``shift``:  9 accumulated (N·81, Cin)×(Cin, Cout) GEMMs, no 9×
                   materialization
     - ``packed``: sibling convs that share an input fused along output
                   channels (rb conv1 ‖ zero-embedded 1×1 skip → one
                   lane-full 32→128 / 64→256 conv), mathematically equal
   each timed fwd and fwd+bwd (training BN), vs analytic FLOPs.

Timing per CLAUDE.md: the forward runs inside one compiled ``fori_loop``
with a data dependence that defeats hoisting; per-call cost is the slope
between two loop lengths, synced by host-fetching the loop's scalar. All
programs are AOT-compiled in a thread pool first (tunnel compiles overlap).

Run: python examples/conv_embedding_study.py [--batch-size 64] [--frames 30]
     [--dtypes f32,bf16] [--out results/conv_embedding_study]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16 = 197e12  # TPU v5e peak bf16 FLOP/s (MFU denominator, RESULTS.md)


# ---------------------------------------------------------------- conv impls
def conv_xla(x, kernel):
    """Production path: lax conv, NHWC/HWIO, SAME-style explicit padding."""
    kh, kw = kernel.shape[:2]
    pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def conv_im2col(x, kernel):
    """Materialize the 9 shifted views, contract as ONE GEMM.

    This is the memory-hungry strawman for what a fused VMEM kernel would
    compute: (N·H·W, kh·kw·Cin) @ (kh·kw·Cin, Cout)."""
    kh, kw, cin, cout = kernel.shape
    if (kh, kw) == (1, 1):
        return jnp.einsum("nhwc,co->nhwo", x, kernel[0, 0])
    n, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    views = jnp.stack(
        [xp[:, dy : dy + h, dx : dx + w, :] for dy in range(kh) for dx in range(kw)],
        axis=3,
    )  # (N, H, W, kh·kw, Cin)
    return jnp.einsum("nhwkc,kco->nhwo", views, kernel.reshape(kh * kw, cin, cout))


def conv_shift(x, kernel):
    """kh·kw accumulated GEMMs over shifted slices — no 9× materialization."""
    kh, kw, cin, cout = kernel.shape
    if (kh, kw) == (1, 1):
        return jnp.einsum("nhwc,co->nhwo", x, kernel[0, 0])
    n, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)))
    acc = jnp.zeros((n, h, w, cout), x.dtype)
    for dy in range(kh):
        for dx in range(kw):
            acc = acc + jnp.einsum(
                "nhwc,co->nhwo", xp[:, dy : dy + h, dx : dx + w, :], kernel[dy, dx]
            )
    return acc


CONV_IMPLS = {"xla": conv_xla, "im2col": conv_im2col, "shift": conv_shift}


# ------------------------------------------------- pure-function embedding
def _bn_train(x, scale, bias, eps=1e-5):
    """Training-mode BatchNorm over (N, H, W) — stats computed in-graph like
    the flax module's; the (cheap, elementwise) running-stat EMA update is
    excluded identically for every variant."""
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def embed_apply(params, x, conv, packed=False):
    """DeepResNetEmbedding forward as a pure function of the flax param tree
    (models/embeddings.py::DeepResNetEmbedding — numerics-pinned by
    test/check_parity below). ``conv`` is one of CONV_IMPLS; ``packed=True``
    additionally fuses each residual block's conv1 with its (zero-embedded
    to 3×3) 1×1 skip conv into one lane-full conv over the shared input."""
    b, t, h, w = x.shape
    y = x.reshape(b * t, h, w, 1)

    p = params
    y = conv(y, p["initial_conv"]["kernel"])
    y = _bn_train(y, p["bn1"]["scale"], p["bn1"]["bias"])
    y = jax.nn.relu(y)

    for blk in ("res_block1", "res_block2"):
        q = p[blk]
        cin = y.shape[-1]
        if packed:
            skip3 = jnp.zeros_like(q["conv1"]["kernel"])
            skip3 = skip3.at[1, 1].set(q["skip_conv"]["kernel"][0, 0])
            wide = conv(y, jnp.concatenate([q["conv1"]["kernel"], skip3], axis=-1))
            cout = q["conv1"]["kernel"].shape[-1]
            z, idn = wide[..., :cout], wide[..., cout:]
        else:
            z = conv(y, q["conv1"]["kernel"])
            idn = conv(y, q["skip_conv"]["kernel"])
        idn = _bn_train(idn, q["skip_bn"]["scale"], q["skip_bn"]["bias"])
        z = jax.nn.relu(_bn_train(z, q["bn1"]["scale"], q["bn1"]["bias"]))
        z = conv(z, q["conv2"]["kernel"])
        z = _bn_train(z, q["bn2"]["scale"], q["bn2"]["bias"])
        y = jax.nn.relu(z + idn)

    y = jnp.mean(y, axis=(1, 2)).reshape(b, t, -1)
    return y @ p["fc"]["kernel"] + p["fc"]["bias"]


def embed_flops(n_frames: int, s: int = 9) -> float:
    """Analytic MAC·2 count of the embedding's convs + fc per call."""
    px = s * s
    f = 0.0
    f += px * 9 * 1 * 32  # initial 3x3
    f += px * 9 * 32 * 64 + px * 9 * 64 * 64 + px * 1 * 32 * 64  # rb1
    f += px * 9 * 64 * 128 + px * 9 * 128 * 128 + px * 1 * 64 * 128  # rb2
    f += 128 * 64  # fc (embed_dim 64)
    return 2.0 * f * n_frames


# ----------------------------------------------------------------- timing
def make_looped(f, inputs, n):
    """One compiled fori_loop of n calls with an acc feedback that defeats
    hoisting; returns the jitted program (serving_benchmark.py protocol)."""

    @jax.jit
    def looped():
        def body(i, acc):
            # scale in the leaf's own dtype — an f32 multiplier would silently
            # promote bf16 operands and time the wrong program
            shifted = tuple(
                jax.tree.map(lambda v: v * (1 + 1e-6 * acc).astype(v.dtype), x)
                for x in inputs
            )
            out = f(*shifted)
            return jnp.mean(jax.tree.leaves(out)[0]).astype(jnp.float32) + 0.0 * acc

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    return looped


def time_slope(programs, lo, hi, repeats=3):
    """programs: {n: compiled_callable}. Best-of-repeats two-loop slope."""
    mins = {}
    for n in (lo, hi):
        prog = programs[n]
        float(prog())  # warm execution + full roundtrip
        best = min(
            (lambda t0: (float(prog()), time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(repeats)
        )
        mins[n] = best
    return (mins[hi] - mins[lo]) / (hi - lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--batch-sizes", default="64,1",
        help="sequence batch sizes to time the whole embedding at; per-conv "
        "shapes are timed at the first (largest) one",
    )
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtypes", default="f32,bf16")
    ap.add_argument("--out", default="results/conv_embedding_study")
    ap.add_argument("--skip-parity", action="store_true")
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (smoke/debug; the axon TPU plugin "
        "ignores JAX_PLATFORMS so this must be set in-process)",
    )
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from moleculardiffusion_mivit_tpu.config import ModelConfig
    from moleculardiffusion_mivit_tpu.models.embeddings import DeepResNetEmbedding

    cfg = ModelConfig()
    s = cfg.patch_size
    key = jax.random.key(0)
    batch_sizes = [int(b) for b in args.batch_sizes.split(",")]
    main_b = batch_sizes[0]
    x = jax.random.normal(key, (main_b, args.frames, s, s), jnp.float32)
    n_frames = main_b * args.frames

    module = DeepResNetEmbedding(patch_size=s, embed_dim=64)
    variables = module.init(key, x[:2], train=True)
    params = jax.device_put(variables["params"])

    # ---- numerics: pure function == flax module; all impls == xla ---------
    if not args.skip_parity:
        xs = x[:2]
        # The reference MUST run inside the same precision context as the
        # variants: TPU (and CPU) matmuls/convs default to bf16-rounded
        # passes, so a reference computed at default precision diverges from
        # highest-precision variants by ~6e-3 (observed on the real chip).
        with jax.default_matmul_precision("highest"):
            ref, _ = module.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                xs,
                train=True,
                mutable=["batch_stats"],
            )
            for name, impl in CONV_IMPLS.items():
                got = embed_apply(params, xs, impl)
                np.testing.assert_allclose(
                    np.asarray(ref), np.asarray(got), rtol=2e-4, atol=2e-4,
                    err_msg=f"impl {name} diverges from flax module",
                )
            gotp = embed_apply(params, xs, conv_xla, packed=True)
            np.testing.assert_allclose(
                np.asarray(ref), np.asarray(gotp), rtol=2e-4, atol=2e-4,
                err_msg="packed-sibling variant diverges",
            )
        print("parity: all conv impls match the flax module", flush=True)

    report = {
        "batch_sizes": batch_sizes,
        "frames": args.frames,
        "device": str(jax.devices()[0].device_kind),
        "per_conv": {},
        "embedding": {},
    }

    conv_shapes = {
        "initial_1to32": (1, 32, 3),
        "rb1_conv1_32to64": (32, 64, 3),
        "rb1_conv2_64to64": (64, 64, 3),
        "rb1_skip_32to64": (32, 64, 1),
        "rb2_conv1_64to128": (64, 128, 3),
        "rb2_conv2_128to128": (128, 128, 3),
        "rb2_skip_64to128": (64, 128, 1),
        "packed_rb1_32to128": (32, 128, 3),
        "packed_rb2_64to256": (64, 256, 3),
    }

    dtypes = {"f32": jnp.float32, "bf16": jnp.bfloat16}
    want = [d for d in args.dtypes.split(",") if d in dtypes]

    # ---- build every timed program, then AOT-compile them all in parallel -
    jobs = {}  # name -> {"programs": {n: jitted}, "lo": int, "flops": float}
    lo0, hi0 = args.iters, 4 * args.iters

    for dt_name in want:
        dt = dtypes[dt_name]
        pd = jax.tree.map(lambda v: v.astype(dt), params)
        for cname, (cin, cout, k) in conv_shapes.items():
            xi = jax.random.normal(
                jax.random.fold_in(key, hash(cname) % 1000), (n_frames, s, s, cin)
            ).astype(dt)
            kern = jax.random.normal(
                jax.random.fold_in(key, 1 + hash(cname) % 1000), (k, k, cin, cout)
            ).astype(dt) * 0.05
            jobs[f"conv/{dt_name}/{cname}"] = {
                "programs": {
                    n: make_looped(conv_xla, (xi, kern), n) for n in (lo0, hi0)
                },
                "lo": lo0,
                "flops": 2.0 * n_frames * s * s * k * k * cin * cout,
            }

        for b in batch_sizes:
            xd = x[:b].astype(dt)
            # tiny batches need proportionally longer loops to clear the
            # ~ms tunnel timing noise
            lo = lo0 * max(1, main_b // b)
            for iname, impl in CONV_IMPLS.items():
                for mode in ("fwd", "fwdbwd"):
                    for packed in ((False, True) if iname == "xla" else (False,)):
                        tag = iname + ("_packed" if packed else "")

                        def fwd_fn(p_, x_, impl=impl, packed=packed):
                            return embed_apply(p_, x_, impl, packed=packed)

                        if mode == "fwd":
                            f = fwd_fn
                        else:
                            def f(p_, x_, fwd_fn=fwd_fn):
                                loss, grads = jax.value_and_grad(
                                    lambda pp: jnp.mean(fwd_fn(pp, x_)) * 1e3
                                )(p_)
                                return loss + sum(
                                    jnp.sum(g) for g in jax.tree.leaves(grads)
                                )

                        fl = embed_flops(b * args.frames, s)
                        jobs[f"embed/b{b}/{dt_name}/{tag}/{mode}"] = {
                            "programs": {
                                n: make_looped(f, (pd, xd), n) for n in (lo, 4 * lo)
                            },
                            "lo": lo,
                            "flops": fl * (3.0 if mode == "fwdbwd" else 1.0),
                        }

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=8) as pool:
        futs = [
            pool.submit(lambda prog=prog: float(prog()))
            for job in jobs.values()
            for prog in job["programs"].values()
        ]
        for fut in futs:
            fut.result()
    print(f"compiled {len(futs)} programs in {time.time() - t0:.0f}s", flush=True)

    for name, job in sorted(jobs.items()):
        lo = job["lo"]
        sec = max(time_slope(job["programs"], lo, 4 * lo), 1e-9)
        fl = job["flops"]
        eff = fl / sec / PEAK_BF16 * 100
        kind, rest = name.split("/", 1)
        report[("per_conv" if kind == "conv" else "embedding")][rest] = {
            "us": round(sec * 1e6, 2),
            "gflop": round(fl / 1e9, 3),
            "mxu_pct": round(eff, 1),
        }
        print(
            f"{name:44s} {sec * 1e6:9.1f} us  {fl / 1e9:8.3f} GF  {eff:5.1f}% MXU",
            flush=True,
        )

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "conv_embedding_study.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    print(f"wrote {args.out}/conv_embedding_study.json", file=sys.stderr)


if __name__ == "__main__":
    main()
