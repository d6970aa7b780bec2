"""Pallas TPU kernel for the fused PSF-splat renderer.

Computes the same math as ``sim.render.render_frames_core`` — pooled 1-D
Gaussian outer products with factored peak renormalization — as a single
Mosaic kernel: per batch tile, the 1-D exponentials run on the VPU, mean
pooling is a matmul against a constant pooling matrix (MXU), and the frame
assembly is a ``(S × P) @ (P × S)`` dot per element.

At the reference's frame sizes (S=9..13, u=5, P≤50) XLA's own fusion of the
lax ops is already excellent, so the XLA path stays the default; this kernel
exists as the hand-tuned fallback should the XLA schedule regress. Select
with ``renderer="pallas"`` in ``pallas_render_frames`` callers or benchmark
both with ``benchmark_renderers``.

Measured (TPU v5e, dispatch-amortized inside one compiled fori_loop via
``benchmark_renderers``, 2026-08-17; see RESULTS.md): per 1920-frame render
call XLA 166 µs vs Pallas 698 µs at 9×9 and 13×13; 154 vs 253 µs per
256-frame call at 63×63. This tile-vectorized variant is 1.6× faster than
the round-2 per-element-loop kernel (1135 µs) and numerically parity-checked
on hardware (max rel diff 7.2e-7 vs the XLA path); the remaining gap is the
frame-assembly stage — TILE_B per-element (P, S)ᵀ @ (P, S) dots that Mosaic
runs serially for lack of a batched-dot primitive, where XLA emits one
batched GEMM. XLA therefore remains the default on data, not just judgment;
at 166 µs per cycle's generation the renderer is ≪1% of a training cycle
either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 8  # batch elements per program (float32 sublane)


def _grid_constants(output_size: int, upsampling: int):
    grid_size = output_size * upsampling
    limit = (grid_size - 1) // 2
    coords_np = np.linspace(-float(limit), float(limit), grid_size, dtype=np.float32)
    # mean pooling as a (grid_size, S) matrix -> MXU matmul
    pool_np = np.zeros((grid_size, output_size), np.float32)
    for s in range(output_size):
        pool_np[s * upsampling : (s + 1) * upsampling, s] = 1.0 / upsampling
    return coords_np, pool_np


def _make_kernel(n_sub: int, output_size: int, upsampling: int):
    """Tile-vectorized kernel: sub-positions arrive pre-flattened as
    ``(TILE_B·P, 1)`` blocks, so the Mosaic-unsupported in-kernel
    ``(TB, P) → (TB·P, 1)`` relayout never happens — the round-2 kernel
    worked around it with a per-element ``fori_loop`` that serialized the
    tile (8× slower than XLA). Here the exponentials ((TB·P, G), VPU), the
    peak maxima and the pooling matmuls ((TB·P, G) @ (G, S), MXU) cover the
    WHOLE tile at once; only the S×P×S frame-assembly dots remain per
    element, sliced statically out of the pooled rows."""
    p, s = n_sub, output_size

    def kernel(sigma_ref, coords_ref, pool_ref, x_ref, y_ref, w_ref, out_ref,
               px_ref, pyw_ref):
        coords = coords_ref[0, :]  # (G,)
        pool = pool_ref[:, :]  # (G, S)
        inv2s2 = 1.0 / (2.0 * sigma_ref[0, 0] * sigma_ref[0, 0])

        x = x_ref[:, :]  # (TB·P, 1)
        y = y_ref[:, :]
        dx = coords[None, :] - x  # (TB·P, G)
        dy = coords[None, :] - y
        gx = jnp.exp(-dx * dx * inv2s2)
        gy = jnp.exp(-dy * dy * inv2s2)
        mx = jnp.max(gx, axis=1, keepdims=True)  # (TB·P, 1)
        my = jnp.max(gy, axis=1, keepdims=True)
        px_ref[:, :] = jnp.dot(gx, pool, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)  # (TB·P, S)
        py = jnp.dot(gy, pool, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        pyw_ref[:, :] = py * (w_ref[:, :] / (mx * my))  # (TB·P, S)

        def one(b, _):
            # dynamic sublane slices come off the VMEM scratch refs (Mosaic
            # supports dynamic starts on ref indexing, not on values)
            frame = jax.lax.dot_general(
                pyw_ref[pl.dslice(b * p, p), :],  # (P, S)
                px_ref[pl.dslice(b * p, p), :],  # (P, S)
                (((0,), (0,)), ((), ())),  # contract the sub-position axis
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (S, S)
            out_ref[b, :, :] = frame
            return _

        jax.lax.fori_loop(0, TILE_B, one, None)

    return kernel


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
    coords = jnp.asarray(coords_np)[None, :]  # (1, G)
    pool = jnp.asarray(pool_np)  # (G, S)
    g = coords.shape[1]
    # flatten sub-positions OUTSIDE the kernel (free in XLA) so each block
    # arrives as (TILE_B·P, 1) — see _make_kernel
    x_flat = x_hr.reshape(padded * p, 1)
    y_flat = y_hr.reshape(padded * p, 1)
    w_flat = intensities.reshape(padded * p, 1)
    kernel = _make_kernel(p, s, upsampling_factor)
    out = pl.pallas_call(
        kernel,
        grid=(padded // TILE_B,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, g), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B * p, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B * p, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_B * p, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_B, s, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, s, s), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((TILE_B * p, s), jnp.float32),  # pooled x rows
            pltpu.VMEM((TILE_B * p, s), jnp.float32),  # weighted pooled y rows
        ],
        interpret=interpret,
    )(sigma, coords, pool, x_flat, y_flat, w_flat)
    return out[:b]


def benchmark_renderers(batch=1920, n_sub=10, output_size=9, upsampling=5, iters=200):
    """Time the XLA fused path vs the Pallas kernel on the current device.

    ``iters`` render calls run inside ONE compiled ``fori_loop`` (each
    iteration shifts the positions and consumes the previous frame sum, so
    the loop can't be collapsed), amortizing tunnel-dispatch latency — the
    same methodology as the RESULTS.md renderer table. Returns
    {"xla_ms": ..., "pallas_ms": ...} steady-state per render call."""
    import time

    from moleculardiffusion_mivit_tpu.sim.render import render_frames_core

    key = jax.random.key(0)
    x = 4.0 * jax.random.normal(key, (batch, n_sub))
    y = 4.0 * jax.random.normal(jax.random.fold_in(key, 1), (batch, n_sub))
    w = 500.0 + jax.random.normal(jax.random.fold_in(key, 2), (batch, n_sub))
    sigma = 5.96

    def time_fn(render):
        @jax.jit
        def looped(x, y, w):
            def body(i, acc):
                out = render(
                    x + 1e-3 * (i + acc), y, w, sigma, output_size, upsampling
                )
                return jnp.mean(out)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        looped(x, y, w).block_until_ready()  # compile
        t0 = time.perf_counter()
        looped(x, y, w).block_until_ready()
        return (time.perf_counter() - t0) / iters * 1e3

    xla_ms = time_fn(render_frames_core)
    pallas_ms = time_fn(pallas_render_frames)
    return {"xla_ms": xla_ms, "pallas_ms": pallas_ms}
