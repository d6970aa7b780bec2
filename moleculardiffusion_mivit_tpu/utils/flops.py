"""Hardware-utilization accounting (FLOPs, achieved FLOP/s, MFU).

The reference publishes no throughput or utilization numbers at all
(SURVEY.md §5-6: wall-clock bookend prints only). A TPU-first framework
should state how much of the chip it actually uses, so the remaining
headroom is a decision rather than an unknown: these helpers extract the
compiled programs' FLOP counts from XLA's own cost model and relate the
achieved FLOP/s to the chip's peak.

The numbers are *model* FLOPs as XLA counts them (fused program, including
generation/rendering and the optimizer), not a hand-derived estimate — so
MFU here answers "how full is the MXU across the whole cycle program".
"""

from __future__ import annotations

import os
from typing import Optional

import jax

# Peak dense-matmul throughput per chip, bf16 (the MXU's native multiply
# precision and JAX's default matmul operand rounding). Values are the
# published per-chip specs; override with MIVIT_PEAK_TFLOPS for unlisted
# hardware.
_PEAK_TFLOPS_BF16 = {
    "v5 lite": 197.0,  # TPU v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6 lite": 918.0,  # TPU v6e (Trillium)
    "v6e": 918.0,
    "cpu": 0.0,  # no meaningful MXU peak; MFU reported as None
}


def device_peak_flops(device: Optional[jax.Device] = None) -> Optional[float]:
    """Peak bf16 FLOP/s of one chip, or None when unknown/CPU."""
    env = os.environ.get("MIVIT_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, tflops in _PEAK_TFLOPS_BF16.items():
        if key in kind:
            return tflops * 1e12 or None
    return None


def _flops_of(ca) -> Optional[float]:
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0] if ca else None
    if not ca:
        return None
    flops = ca.get("flops")
    return float(flops) if flops and flops > 0 else None


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """Total FLOPs of one call of a jitted function, from XLA's cost model.

    CAVEAT (measured 2026-08-17, both lowered and compiled analyses, CPU
    backend): XLA's HLO cost analysis counts a ``while``/``scan`` BODY ONCE,
    not × trip count — a 256-step batch-1 epoch is charged as one step, so
    programs whose hot loop is a scan are undercounted by ~the trip count
    (and ``scan_unroll`` inflates the count by the unroll factor since the
    replicated body is visible). Use ``multi_cycle_flops`` for training-cycle
    programs: it lowers the loop-free per-step function and multiplies by the
    step count.

    Reads the *lowered* module's cost analysis first — no compilation, so
    it is safe to call on programs whose compile is expensive (minutes
    through the TPU tunnel) and on arguments whose buffers were already
    donated (only avals are inspected). The axon TPU backend's lowered
    analysis carries no flops, so the program is then re-lowered under the
    host CPU backend (flop counts are backend-independent pre-optimization
    and the CPU lowering is local and fast). Compiling is the last resort.
    Returns None when no path provides a cost model.
    """
    lowered = None
    try:
        lowered = jitted_fn.lower(*args, **kwargs)
        flops = _flops_of(lowered.cost_analysis())
        if flops is not None:
            return flops
    except Exception:
        pass  # keep `lowered` if lower() itself succeeded: the compile()
        # last resort below can still use it when only cost_analysis threw
    try:
        cpus = jax.devices("cpu")
        with jax.default_device(cpus[0]):
            flops = _flops_of(jitted_fn.lower(*args, **kwargs).cost_analysis())
        if flops is not None:
            return flops
    except Exception:
        pass
    try:
        if lowered is None:
            return None
        return _flops_of(lowered.compile().cost_analysis())
    except Exception:
        return None


def utilization(
    flops_per_call: Optional[float],
    seconds_per_call: float,
    device: Optional[jax.Device] = None,
) -> dict:
    """``{"flops", "achieved_tflops", "mfu_pct"}`` (None-safe)."""
    out = {"flops": flops_per_call, "achieved_tflops": None, "mfu_pct": None}
    if not flops_per_call or seconds_per_call <= 0:
        return out
    achieved = flops_per_call / seconds_per_call
    out["achieved_tflops"] = round(achieved / 1e12, 4)
    peak = device_peak_flops(device)
    if peak:
        out["mfu_pct"] = round(100.0 * achieved / peak, 3)
    return out


def multi_cycle_flops(
    models: dict,
    train_cfg,
    optics,
    batch_size: int,
    val_videos_shape: tuple,
) -> Optional[float]:
    """Exact FLOPs of one fused training cycle (generation + every model's
    epoch + every model's validation), immune to the cost-model scan caveat.

    Each model's loop-free ``train_step`` is lowered once at ``batch_size``
    (CPU backend — FLOP counts are backend-independent pre-optimization) and
    multiplied by the epoch's step count; evaluation and generation are
    lowered as-is (evaluation is loop-free; generation's only scan is the
    300-step trajectory walk whose body is a handful of adds per particle —
    its undercount is ≤1e7 FLOPs against the renderer's exact matmuls).
    Only avals are used: safe on donated buffers and never compiles.

    Covers video-only models (the bench/baseline cycle); feature-fusion
    arms would need their feature avals threaded through ``train_step``.
    """
    import jax.numpy as jnp

    from moleculardiffusion_mivit_tpu.train.loop import (
        generate_cycle_data,
        make_train_impls,
    )

    n_seq = train_cfg.sequences_per_d * len(train_cfg.training_ds)
    steps = n_seq // batch_size
    n_frames = train_cfg.n_frames
    videos_aval = jax.ShapeDtypeStruct(
        (n_seq, n_frames) + tuple(val_videos_shape[-2:]), jnp.float32
    )
    labels_shape = (n_seq, n_frames) if train_cfg.sequence_mode else (n_seq, 1)
    labels_aval = jax.ShapeDtypeStruct(labels_shape, jnp.float32)
    idx_aval = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    key_aval = jax.eval_shape(lambda: jax.random.key(0))
    val_aval = jax.ShapeDtypeStruct(tuple(val_videos_shape), jnp.float32)

    try:
        cpus = jax.devices("cpu")
    except Exception:
        return None
    total = 0.0
    with jax.default_device(cpus[0]):
        gen = jax.jit(lambda k: generate_cycle_data(k, train_cfg, optics))
        f = _flops_of(gen.lower(key_aval).cost_analysis())
        if f:
            total += f
        for model in models.values():
            # a model outside this function's video-only contract (e.g. a
            # feature-fusion arm whose trace demands features) must degrade
            # to "no FLOP count", not crash the caller after its timed run
            try:
                impls = make_train_impls(model, train_cfg)
                state_aval = jax.eval_shape(
                    impls.init_state,
                    key_aval,
                    jax.ShapeDtypeStruct((1,) + videos_aval.shape[1:], jnp.float32),
                )
                step = jax.jit(impls.train_step)
                f = _flops_of(
                    step.lower(
                        state_aval, videos_aval, labels_aval, None, idx_aval, key_aval
                    ).cost_analysis()
                )
                if f is None:
                    return None
                total += f * steps
                ev = jax.jit(impls.evaluate)
                f = _flops_of(ev.lower(state_aval, val_aval).cost_analysis())
                if f:
                    total += f
            except Exception:
                return None
    return total


def grid_cycle_flops(
    model,
    train_cfg,
    n_models: int,
    n_seq_per_model: int,
    batch_size: int,
    frame_shape: tuple,
    with_features: bool = False,
    n_features: int = 25,
    val_shape: Optional[tuple] = None,
) -> Optional[float]:
    """Exact FLOPs of one vmapped-grid training cycle (train.grid) — the
    60-model PSFNoise regime the round-4 verdict asked to account for
    (Missing #3): the loop-free stacked ``train_step`` (one minibatch
    update for the WHOLE model stack) lowered on the CPU backend ×
    the epoch's step count, plus the stacked evaluation when ``val_shape``
    ``(M, N_val, F, S, S)`` is given. Immune to the scan-body undercount
    caveat (see ``compiled_flops``). Generation is NOT included — grid
    experiments generate per-cell data through their own ``generate_fn``;
    account it separately with ``compiled_flops`` on that function.
    """
    import jax.numpy as jnp

    from moleculardiffusion_mivit_tpu.train.grid import make_grid_impls

    steps = n_seq_per_model // batch_size
    f, s0, s1 = train_cfg.n_frames, frame_shape[0], frame_shape[1]
    videos_aval = jax.ShapeDtypeStruct(
        (n_models, n_seq_per_model, f, s0, s1), jnp.float32
    )
    labels_shape = (
        (n_models, n_seq_per_model, f)
        if train_cfg.sequence_mode
        else (n_models, n_seq_per_model, 1)
    )
    labels_aval = jax.ShapeDtypeStruct(labels_shape, jnp.float32)
    feats_aval = (
        jax.ShapeDtypeStruct((n_models, n_seq_per_model, n_features), jnp.float32)
        if with_features
        else None
    )
    idx_aval = jax.ShapeDtypeStruct((n_models, batch_size), jnp.int32)
    key_aval = jax.eval_shape(lambda: jax.random.key(0))
    keys_aval = jax.eval_shape(lambda: jax.random.split(jax.random.key(0), n_models))
    lr_aval = jax.ShapeDtypeStruct((), jnp.float32)

    try:
        cpus = jax.devices("cpu")
    except Exception:
        return None
    total = 0.0
    with jax.default_device(cpus[0]):
        try:
            impls = make_grid_impls(model, train_cfg, with_features)
            grid_aval = jax.eval_shape(
                lambda k, v, ff: impls.init_grid(k, n_models, v, ff),
                key_aval,
                jax.ShapeDtypeStruct((1, f, s0, s1), jnp.float32),
                jax.ShapeDtypeStruct((1, n_features), jnp.float32)
                if with_features
                else None,
            )
            step = jax.jit(impls.train_step)
            fl = _flops_of(
                step.lower(
                    grid_aval,
                    videos_aval,
                    labels_aval,
                    feats_aval,
                    idx_aval,
                    keys_aval,
                    lr_aval,
                ).cost_analysis()
            )
            if fl is None:
                return None
            total += fl * steps
            if val_shape is not None:
                ev = jax.jit(impls.evaluate)
                val_aval = jax.ShapeDtypeStruct(tuple(val_shape), jnp.float32)
                vfeats_aval = (
                    jax.ShapeDtypeStruct(
                        (val_shape[0], val_shape[1], n_features), jnp.float32
                    )
                    if with_features
                    else None
                )
                fl = _flops_of(
                    ev.lower(grid_aval, val_aval, vfeats_aval).cost_analysis()
                )
                if fl:
                    total += fl
        except Exception:
            return None
    return total
