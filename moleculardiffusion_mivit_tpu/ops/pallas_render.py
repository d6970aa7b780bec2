"""Pallas TPU kernel for the fused PSF-splat renderer.

Computes the same math as ``sim.render.render_frames_core`` — pooled 1-D
Gaussian outer products with factored peak renormalization — as a single
Mosaic kernel; select it pipeline-wide with
``sim.render.set_render_backend("pallas")`` (scalar-sigma shapes at
guard-accepted sizes; everything else falls back to XLA). Layout is
batch-in-lanes: the batch rides the 128-wide lane
dimension, the (sub-position × grid/output) structure rides sublanes, all
index plumbing (grid repeat, pooling, outer-product expansion, Σ over
sub-positions) is constant one-hot/block-diagonal bf16 matmuls, the peak
normalization uses its closed form on the integer grid, and every
value-side matmul runs as 2-3 single-pass bf16 MXU dots via hi/lo operand
splitting (~2^-18 relative error) instead of 6-pass ``Precision.HIGHEST``
f32 emulation. See ``_make_kernel`` for the design rationale and the
measured cost of each rejected variant.

Measured steady-state (TPU v5e, dispatch-amortized slope between 200- and
800-iteration compiled fori_loops, host-fetch synced — see
``benchmark_renderers``; RESULTS.md has the full table): per 1920-frame
9×9/u=5/P=10 render call (the reference's training unit) XLA 19.7 µs vs
this kernel 24.4 µs (1.24×), hardware parity max rel diff 1.2e-5. Round 2's
kernel was 563 µs on the same honest clock (the old table's "166 µs XLA /
698 µs Pallas" folded ~135 µs of tunnel dispatch into every per-call
number). At 13×13 the S²-row expansion matmuls still lose to XLA's batched
GEMM (~81 vs ~14 µs), and wide-field sizes are rejected (constants scale as
P²·S³) — so the XLA path stays the package default on data; this kernel is
the hand-tuned option for the flagship 9×9 regime and the existence proof
that a Mosaic kernel can sit within ~1.25× of XLA's fusion here. Renderer
cost is ≪1% of a training cycle either way (the hot path is the
optimizer-step scan).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 128  # batch elements per program — the LANE dimension (×128)

# the assembly constants grow as P²·S³ — refuse sizes whose constant
# operands would not fit VMEM comfortably (reference sizes are ≤ 1 MB;
# 63×63 wide-field would need ~100 MB and belongs on the XLA path)
_MAX_CONST_BYTES = 8 * 2**20

# Profitability regime (measured on TPU v5e, two-loop-slope clock,
# benchmark_renderers): at S=9/u=5/P=10 the kernel is within 1.24× of XLA
# (24.4 vs 19.7 µs per 1920-frame call); at S=13 (the Framerate
# experiment's patch, trainSettingsFramerate.py:42) the S²-row expansion
# matmuls lose to XLA's batched GEMM 4.4× (~66 vs ~14 µs). The dispatch in
# ``sim.render.render_frames_core`` therefore only routes sizes ≤ this to
# the kernel and warns once per larger size — ``set_render_backend
# ("pallas")`` must never silently run a >1.5× regression on any reference
# regime. Calling ``pallas_render_frames`` directly bypasses the check
# (explicit opt-in, e.g. for re-benchmarking a new chip generation).
PROFITABLE_MAX_OUTPUT_SIZE = 9

_warned_unprofitable: set = set()


def pallas_profitable(output_size: int) -> bool:
    """True if the kernel measured competitive with XLA at this output size
    (see PROFITABLE_MAX_OUTPUT_SIZE); warns ONCE per unprofitable size so
    backend selection is never silently ignored."""
    if output_size <= PROFITABLE_MAX_OUTPUT_SIZE:
        return True
    if output_size not in _warned_unprofitable:
        _warned_unprofitable.add(output_size)
        import warnings

        warnings.warn(
            f"render backend 'pallas': output size {output_size} is outside "
            f"the kernel's measured-profitable regime (≤ "
            f"{PROFITABLE_MAX_OUTPUT_SIZE}; at 13×13 it measured ~4.4× "
            "slower than XLA's fused path) — falling back to the XLA "
            "renderer for this size"
        )
    return False


def _grid_constants(output_size: int, upsampling: int):
    grid_size = output_size * upsampling
    limit = (grid_size - 1) // 2
    coords_np = np.linspace(-float(limit), float(limit), grid_size, dtype=np.float32)
    # mean pooling as a (grid_size, S) matrix -> MXU matmul
    pool_np = np.zeros((grid_size, output_size), np.float32)
    for s in range(output_size):
        pool_np[s * upsampling : (s + 1) * upsampling, s] = 1.0 / upsampling
    return coords_np, pool_np


def _split(v, terms):
    """Split f32 values into ``terms`` bf16-representable f32 addends
    (Dekker-style): Σ parts ≈ v with relative error ~2^(-9·terms)."""
    parts = []
    rem = v
    for _ in range(terms - 1):
        hi = jax.lax.convert_element_type(
            jax.lax.convert_element_type(rem, jnp.bfloat16), jnp.float32
        )
        parts.append(hi)
        rem = rem - hi
    parts.append(rem)
    return parts


def _mm(c, v, terms=2):
    """``c @ v`` where ``c`` is a constant whose entries are EXACT in bf16
    (0/1 one-hot / block-diagonal here). The value operand is split into
    ``terms`` bf16 addends so each product runs as a single-pass bf16 MXU
    matmul with f32 accumulation: ``terms`` passes total instead of the 6
    passes of ``Precision.HIGHEST`` f32 emulation (which measured 3.5× the
    whole kernel: 67-75 µs vs 19.7 µs with single-pass matmuls). Error is
    ~|v|·2^-18 for terms=2 — far below the renderer's Poisson noise and the
    1e-4 hardware-parity budget."""
    return sum(
        jnp.dot(c, part, preferred_element_type=jnp.float32)
        for part in _split(v, terms)
    )


def _make_kernel(n_sub: int, output_size: int, upsampling: int, limit: float):
    """Batch-in-lanes kernel: every tensor is (rows, TILE_B) with the batch
    along the 128-wide lane dimension and (sub-position × grid/output)
    structure along sublanes, so nothing is ever lane-padded (the earlier
    batch-in-sublanes variants padded the G=S·u grid axis 45→128 lanes and
    spent 2.8× the exp/elementwise work; measured stage split at B=1920:
    exps alone 24 µs ≥ XLA's whole 19.5 µs render).

    Three structural tricks keep it relayout-free and MXU-friendly:

      1. All index plumbing (repeating x over the grid, pooling, the
         outer-product expansion, the Σ over sub-positions) is constant
         one-hot / block-diagonal matmuls with the batch as the N dimension
         — tiny K, full lane utilization, no shape casts:
           x_e = REP@x; px = BD@gx; PXe = TT@px; out = SEL@(PYe·PXe)
      2. The peak normalization max_g exp(-(c_g-x)²/2σ²) has a CLOSED FORM
         on a uniform grid: the Gaussian is monotone in |c-x|, so the max
         sits at the nearest grid point, index clip(round((x+limit)/step),
         0, G-1) — scale = w·exp((d_x²+d_y²)/2σ²) is pure (P, TB)
         elementwise work, no lane reduce, no 3D keepdims broadcast (the
         reduce+divide stage alone measured ~20 µs).
      3. The per-(p,b) scale is applied to the POOLED rows (P·S, TB) —
         pooling is linear so the row scale commutes — via one more
         one-hot expansion REPS@scale.

    The kernel writes frames transposed, (S², TILE_B); the (S², B) result
    is transposed/reshaped to (B, S, S) outside the kernel (one small XLA
    transpose of the final output)."""
    p, s = n_sub, output_size
    inv_u2 = 1.0 / float(upsampling * upsampling)
    grid_size = s * upsampling
    g_minus_1 = float(grid_size - 1)
    # linspace(-limit, limit, grid_size) spacing — 1 for odd grids, (g-2)/(g-1)
    # for even ones
    step = 2.0 * limit / g_minus_1 if grid_size > 1 else 1.0
    inv_step = 1.0 / step

    s2p = ((s * s + 7) // 8) * 8  # sublane-aligned expansion pitch

    def kernel(sigma_ref, coords_ref, rep_ref, reps_ref, bd_ref, rr_ref,
               tt_ref, x_ref, y_ref, w_ref, out_ref):
        inv2s2 = 1.0 / (2.0 * sigma_ref[0, 0] * sigma_ref[0, 0])
        x = x_ref[:, :]  # (P, TB)
        y = y_ref[:, :]
        coords = coords_ref[:, :]  # (P·G, 1) — lane-broadcasts below

        # 3-term split for the positions: the exps amplify dx error by
        # ~2|dx|/2σ² ≈ 0.9/unit, so positions need ~f32 accuracy
        x_e = _mm(rep_ref[:, :], x, terms=3)  # (P·G, TB): x over the grid
        y_e = _mm(rep_ref[:, :], y, terms=3)
        dx = coords - x_e
        dy = coords - y_e
        gx = jnp.exp(-dx * dx * inv2s2)  # (P·G, TB)
        gy = jnp.exp(-dy * dy * inv2s2)

        # closed-form peak max: the Gaussian is monotone in the distance to
        # the nearest grid point, c* = -limit + clip(round((x+limit)/step),
        # 0, g-1)·step (handles the non-unit linspace spacing of even
        # grid_size too); 1/u² folds the mean-pooling normalization out of
        # BD (keeping BD binary = exact in bf16)
        def nearest_d(v):
            idx = jnp.clip(jnp.floor((v + limit) * inv_step + 0.5), 0.0, g_minus_1)
            return v - (idx * step - limit)

        dpx = nearest_d(x)  # (P, TB)
        dpy = nearest_d(y)
        scale = (w_ref[:, :] * inv_u2) * jnp.exp((dpx * dpx + dpy * dpy) * inv2s2)

        px = _mm(bd_ref[:, :], gx)  # (P·S, TB): block-diag sum pooling
        pyw = _mm(bd_ref[:, :], gy) * _mm(reps_ref[:, :], scale, terms=3)
        # expansions emit at a sublane-aligned pitch S²↑8 so the Σ over
        # sub-positions is P aligned static slice-adds on the VPU — the
        # one-hot contraction it replaces (K = P·S²) dominated at S=13
        pxe = _mm(tt_ref[:, :], px)  # (P·S²p, TB): tile columns
        pye = _mm(rr_ref[:, :], pyw)  # (P·S²p, TB): repeat rows
        z = pye * pxe
        acc = z[0:s2p, :]
        for k in range(1, p):
            acc = acc + z[k * s2p : (k + 1) * s2p, :]
        out_ref[:, :] = acc[0 : s * s, :]  # (S², TB)

    return kernel


def _assembly_constants(p: int, s: int, pool_np: np.ndarray):
    """Constant one-hot / block-diagonal operands for the batch-in-lanes
    kernel (see _make_kernel). All f32; total VMEM for the reference sizes
    (P=10, S=9..13) is < 2 MB."""
    g = pool_np.shape[0]
    rep = np.zeros((p * g, p), np.float32)  # x -> grid-repeated x
    reps = np.zeros((p * s, p), np.float32)  # scale -> pooled-row scale
    bd = np.zeros((p * s, p * g), np.float32)  # block-diag SUM pooling —
    # binary (exact in bf16); the 1/u² mean normalization is folded into
    # the kernel's elementwise scale
    s2p = ((s * s + 7) // 8) * 8  # sublane-aligned expansion pitch
    rr = np.zeros((p * s2p, p * s), np.float32)  # repeat: row i -> (i, j)
    tt = np.zeros((p * s2p, p * s), np.float32)  # tile: row j -> (i, j)
    pool_binary = (pool_np.T > 0).astype(np.float32)
    for k in range(p):
        rep[k * g : (k + 1) * g, k] = 1.0
        reps[k * s : (k + 1) * s, k] = 1.0
        bd[k * s : (k + 1) * s, k * g : (k + 1) * g] = pool_binary
        for i in range(s):
            rr[k * s2p + i * s : k * s2p + (i + 1) * s, k * s + i] = 1.0
            tt[k * s2p + i * s : k * s2p + (i + 1) * s, k * s : (k + 1) * s] = np.eye(
                s, dtype=np.float32
            )
    return rep, reps, bd, rr, tt


@functools.partial(
    jax.jit, static_argnames=("output_size", "upsampling_factor", "interpret")
)
def pallas_render_frames(
    x_hr: jax.Array,
    y_hr: jax.Array,
    intensities: jax.Array,
    sigma_hr,
    output_size: int,
    upsampling_factor: int,
    interpret: bool = False,
) -> jax.Array:
    """Pallas equivalent of ``render_frames_core`` for a flat batch.

    x_hr, y_hr, intensities: ``(B, P)``; scalar ``sigma_hr``.
    Returns frames ``(B, S, S)``.
    """
    b, p = x_hr.shape
    s = output_size
    padded = ((b + TILE_B - 1) // TILE_B) * TILE_B
    pad = padded - b
    if pad:
        # pad with in-grid dummy spots (weight 0 keeps them out of the output)
        x_hr = jnp.pad(x_hr, ((0, pad), (0, 0)))
        y_hr = jnp.pad(y_hr, ((0, pad), (0, 0)))
        intensities = jnp.pad(intensities, ((0, pad), (0, 0)))

    sigma = jnp.asarray(sigma_hr, jnp.float32).reshape(1, 1)
    coords_np, pool_np = _grid_constants(s, upsampling_factor)
    g = coords_np.shape[0]
    # exact constant-operand footprint: coords + rep + reps + bd + rr + tt
    # (see _assembly_constants)
    s2p = ((s * s + 7) // 8) * 8
    const_bytes = 4 * (
        p * g * (1 + p)  # coords_col, rep
        + p * s * p  # reps
        + p * s * p * g  # bd
        + 2 * (p * s2p) * (p * s)  # rr, tt
    )
    if const_bytes > _MAX_CONST_BYTES:
        raise ValueError(
            f"pallas_render_frames: assembly constants for P={p}, S={s} need "
            f"{const_bytes / 2**20:.1f} MB of VMEM (limit "
            f"{_MAX_CONST_BYTES / 2**20:.0f} MB); use sim.render."
            "render_frames_core (the XLA path) for wide-field sizes"
        )
    limit = float((g - 1) // 2)
    # batch-in-lanes layout: each block is (rows, TILE_B) — see _make_kernel
    x_t = x_hr.T  # (P, B)
    y_t = y_hr.T
    w_t = intensities.T
    coords_col = jnp.asarray(np.tile(coords_np, p)[:, None])  # (P·G, 1)
    rep, reps, bd, rr, tt = (
        jnp.asarray(c) for c in _assembly_constants(p, s, pool_np)
    )
    kernel = _make_kernel(p, s, upsampling_factor, limit)

    def _const(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def _batch(rows):
        return pl.BlockSpec((rows, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(padded // TILE_B,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            _const((p * g, 1)),
            _const((p * g, p)),
            _const((p * s, p)),
            _const((p * s, p * g)),
            _const((p * s2p, p * s)),
            _const((p * s2p, p * s)),
            _batch(p),
            _batch(p),
            _batch(p),
        ],
        out_specs=pl.BlockSpec((s * s, TILE_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s * s, padded), jnp.float32),
        interpret=interpret,
    )(sigma, coords_col, rep, reps, bd, rr, tt, x_t, y_t, w_t)
    return out.T.reshape(padded, s, s)[:b]


def benchmark_renderers(
    batch=1920, n_sub=10, output_size=9, upsampling=5, iters=(200, 800)
):
    """Time the XLA fused path vs the Pallas kernel on the current device.

    The render calls run inside ONE compiled ``fori_loop`` (each iteration
    shifts the positions and consumes the previous frame sum, so the loop
    can't be collapsed). Two loop lengths are timed and the STEADY-STATE
    per-call cost is the slope between them — the fixed per-dispatch cost
    (~27 ms through the axon tunnel) would otherwise dominate and did
    corrupt the round-2 table (166 µs "XLA" was ~135 µs dispatch + ~21 µs
    render). Sync is a host fetch of the loop's scalar result:
    ``block_until_ready`` through the tunnel returns early/non-monotonically
    (measured 2-157 µs/call for the same program). Returns
    {"xla_ms": ..., "pallas_ms": ...} per render call."""
    import time

    from moleculardiffusion_mivit_tpu.sim.render import render_frames_core

    key = jax.random.key(0)
    x = 4.0 * jax.random.normal(key, (batch, n_sub))
    y = 4.0 * jax.random.normal(jax.random.fold_in(key, 1), (batch, n_sub))
    w = 500.0 + jax.random.normal(jax.random.fold_in(key, 2), (batch, n_sub))
    sigma = 5.96
    lo, hi = min(iters), max(iters)

    def time_fn(render):
        totals = {}
        for n in (lo, hi):

            @jax.jit
            def looped(x, y, w, n=n):
                def body(i, acc):
                    out = render(
                        x + 1e-3 * (i + acc), y, w, sigma, output_size, upsampling
                    )
                    return jnp.mean(out)

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            float(looped(x, y, w))  # compile + full device→host roundtrip
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(looped(x, y, w))
                best = min(best, time.perf_counter() - t0)
            totals[n] = best
        return (totals[hi] - totals[lo]) / (hi - lo) * 1e3

    xla_ms = time_fn(render_frames_core)
    try:
        pallas_ms = time_fn(pallas_render_frames)
    except ValueError:  # size guard: constants would not fit VMEM
        pallas_ms = None
    return {"xla_ms": xla_ms, "pallas_ms": pallas_ms}
