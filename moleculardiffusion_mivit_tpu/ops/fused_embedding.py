"""Whole-DeepResNetEmbedding fused Pallas kernel for the latency-bound regime.

Why this exists (measured, results/conv_embedding_study): at batch 1 the
DeepResNetEmbedding (models/embeddings.py, parity reference
helpers/models.py:202-257) costs 72 µs fwd+bwd on TPU v5e as ~30 dependent
sub-10 µs XLA ops, which the conv study attributed to per-op scheduling
floors (29% MXU). This kernel tested that attribution: ONE VMEM-resident
program for the whole forward and one for the whole backward.

**Measured verdict (TPU v5e, results/fused_embedding): the kernel LOSES
~2×** — at the batch-1 bench shape (30 frames of 9×9), fwd 36.4 µs vs
XLA's 17.6, fwd+bwd 134 vs 66 (two-loop slope, reproduced in two
independent sessions) — and the recompute-in-VMEM backward stops
*compiling* above ~2432 padded rows (60 frames OOM the 110 MB scoped-VMEM
limit at 118 MB). The batch-1 time is therefore NOT per-op dispatch
overhead (XLA pipelines its ~30 ops essentially for free and schedules the
serial chain better than this hand-fused program); it is the work itself:
the same ~36 shift copies, mask multiplies, BN column-reductions and
narrow-K GEMMs exist inside the kernel, on the same serial dependency
chain, minus XLA's scheduling freedom. ``set_embedding_backend("auto")``
therefore keeps the XLA path; ``"fused"`` opts in (equivalence-pinned,
never routes for eval, and falls back with a warning above the measured
VMEM row limit — ``models.embeddings.FUSED_MAX_ROWS``). Kept as the
measured answer to the conv study's open question and as the scaffold for
any future in-kernel layout win.

Design:

- Layout: frames fold to rows — every activation is a ``(R, C)`` f32 matrix
  with channels on lanes, ``R = pad8(N·S²)`` (N = batch·frames, S = patch).
- 3×3 SAME convs are 9 shift-masked GEMMs: ``acc += (roll(x, off)·mask) @
  W[ky,kx]``, where the per-shift mask (computed in-kernel from iota) zeroes
  rows whose source pixel falls outside the image or into the row padding.
  Rolls never contaminate valid rows across image boundaries because any
  cross-image source lands on a masked destination row. 1×1 skip convs are
  single GEMMs with the validity mask.
- Training BatchNorm computes biased batch stats over the N·S² valid rows
  in-kernel (conv outputs are exactly zero on pad rows, so plain sums are
  exact) and returns all 7 (mean, var) pairs packed in one ``(16, 128)``
  array so flax can apply its EMA running-stat update outside.
- Backward is a second kernel (``jax.custom_vjp``) that RECOMPUTES the
  forward in VMEM (storing only the 7 BN x̂ tensors + rstd, ~6 MB — cheaper
  than staging 10+ residuals through HBM) and emits every parameter
  gradient. BN-backward re-masks its incoming gradient so pad-row garbage
  from the broadcast mean terms never reaches a ∂W GEMM.
- MXU dots run with bf16 operands / f32 accumulation on TPU (exactly the
  multiply precision XLA's default conv lowering uses — CLAUDE.md gotcha),
  and full f32 in interpret mode so CPU parity tests are exact.

The public entry is :func:`fused_deep_resnet_embed`, a pure function of the
same flax arrays ``DeepResNetEmbedding`` declares; packing to kernel layout
is plain differentiable jnp, so ``custom_vjp`` sits only on the packed core.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Channel widths of the embedding trunk (helpers/models.py:202-257).
C0, C1, C2 = 32, 64, 128
# BN row order inside the packed (8, 128) scale/bias and (16, 128) stats
# arrays: index, channel width.
BN_LAYOUT = (
    ("bn1", C0),
    ("rb1_bn1", C1),
    ("rb1_bn2", C1),
    ("rb1_skip", C1),
    ("rb2_bn1", C2),
    ("rb2_bn2", C2),
    ("rb2_skip", C2),
)
BN_EPS = 1e-5

# The recompute-everything backward keeps ~60 MB live on the Mosaic stack at
# the bench shape (R=2432); v5e has 128 MiB of physical VMEM and the default
# 16 MiB scoped limit is just a conservative compiler cap — raise it.
_VMEM_LIMIT = 110 * 1024 * 1024


def _pad8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _offsets(s: int):
    """Row offset of source pixel (h+ky-1, w+kx-1) for each 3×3 tap."""
    return [(ky - 1) * s + (kx - 1) for ky in range(3) for kx in range(3)]


def _dot(a, b, exact: bool):
    if not exact:
        a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b, exact: bool, contract: Tuple[int, int]):
    """dot_general contracting ``a``'s axis contract[0] with ``b``'s [1]."""
    if not exact:
        a, b = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((contract[0],), (contract[1],)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _make_masks(r: int, rv: int, s: int):
    """Per-tap (R, 1) f32 masks + the (R, 1) validity mask."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    valid = rows < rv
    h = (rows % (s * s)) // s
    w = rows % s
    masks = []
    for ky in range(3):
        for kx in range(3):
            sh, sw = h + ky - 1, w + kx - 1
            m = valid & (sh >= 0) & (sh < s) & (sw >= 0) & (sw < s)
            masks.append(m.astype(jnp.float32))
    return masks, valid.astype(jnp.float32)


def _roll(v, off: int, r: int):
    """rolled[q] = v[(q + off) % r]; off may be negative."""
    if off % r == 0:
        return v
    return pltpu.roll(v, (-off) % r, 0)


def _conv3(x, w_ref, cin: int, cout: int, masks, offs, r: int, exact: bool):
    """3×3 SAME conv: 9 shift-masked GEMMs against (9·cin, cout) weights."""
    acc = jnp.zeros((r, cout), jnp.float32)
    for i, off in enumerate(offs):
        xs = _roll(x, off, r) * masks[i]
        acc = acc + _dot(xs, w_ref[i * cin : (i + 1) * cin, :].astype(jnp.float32), exact)
    return acc


def _conv3_bwd(g, x, w_ref, cin: int, cout: int, masks, offs, r: int, exact: bool):
    """∂(conv3)/∂x and ∂/∂W. ``g`` must be zero on pad rows for exact ∂W
    (guaranteed: the shift masks zero the ``x`` operand there anyway)."""
    dx = jnp.zeros((r, cin), jnp.float32)
    dw = []
    for i, off in enumerate(offs):
        gm = g * masks[i]
        wi = w_ref[i * cin : (i + 1) * cin, :].astype(jnp.float32)
        dx = dx + _roll(_dot_t(gm, wi, exact, (1, 1)), -off, r)
        xs = _roll(x, off, r) * masks[i]
        dw.append(_dot_t(xs, gm, exact, (0, 0)))
    return dx, jnp.concatenate(dw, axis=0)


def _bn_fwd(x, sc_ref, bi_ref, row: int, c: int, rv: int):
    """Training BN: biased batch stats over the rv valid rows (x is exactly
    zero on pad rows — conv output). Returns (out, x̂, mean, var, rstd)."""
    mean = jnp.sum(x, axis=0, keepdims=True) / rv
    mean2 = jnp.sum(x * x, axis=0, keepdims=True) / rv
    var = mean2 - mean * mean
    rstd = jax.lax.rsqrt(var + BN_EPS)
    xh = (x - mean) * rstd
    scale = sc_ref[row : row + 1, :c].astype(jnp.float32)
    bias = bi_ref[row : row + 1, :c].astype(jnp.float32)
    return xh * scale + bias, xh, mean, var, rstd


def _bn_bwd(g, xh, rstd, sc_ref, row: int, c: int, rv: int, valid):
    """BN backward (batch-stat mode). Masks ``g`` first: the broadcast mean
    terms would otherwise write garbage into pad rows of dx AND pad-row
    garbage of g would corrupt dscale/dbias."""
    g = g * valid
    scale = sc_ref[row : row + 1, :c].astype(jnp.float32)
    dbias = jnp.sum(g, axis=0, keepdims=True)
    dscale = jnp.sum(g * xh, axis=0, keepdims=True)
    dxh = g * scale
    m1 = jnp.sum(dxh, axis=0, keepdims=True) / rv
    m2 = jnp.sum(dxh * xh, axis=0, keepdims=True) / rv
    dx = (dxh - m1 - xh * m2) * rstd * valid
    return dx, dscale, dbias


def _pool_mats(n: int, r: int, rv: int, s: int):
    """(N, R) mean-pool matrix and its (R, N) transpose, built from iota."""
    px = s * s
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, r), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, r), 0)
    p = ((cols // px == rows) & (cols < rv)).astype(jnp.float32) / px
    colsT = jax.lax.broadcasted_iota(jnp.int32, (r, n), 0)
    rowsT = jax.lax.broadcasted_iota(jnp.int32, (r, n), 1)
    pt = ((colsT // px == rowsT) & (colsT < rv)).astype(jnp.float32) / px
    return p, pt


def _fwd_stages(refs, n: int, r: int, rv: int, s: int, exact: bool):
    """Shared forward trace. Returns everything the backward needs."""
    (x_ref, wi_ref, w1c1, w1sk, w1c2, w2c1, w2sk, w2c2, sc, bi, wfc, bfc) = refs
    offs = _offsets(s)
    masks, valid = _make_masks(r, rv, s)

    x0 = x_ref[:].astype(jnp.float32)
    # initial conv, cin=1: broadcast-multiply instead of a K=1 GEMM
    a = jnp.zeros((r, C0), jnp.float32)
    for i, off in enumerate(offs):
        a = a + (_roll(x0, off, r) * masks[i]) * wi_ref[i : i + 1, :].astype(jnp.float32)
    a, xh0, m0, v0, r0 = _bn_fwd(a, sc, bi, 0, C0, rv)
    a = jax.nn.relu(a)

    # residual block 1 (32 → 64)
    z1 = _conv3(a, w1c1, C0, C1, masks, offs, r, exact)
    z1, xh1, m1, v1, r1 = _bn_fwd(z1, sc, bi, 1, C1, rv)
    z1 = jax.nn.relu(z1)
    z2 = _conv3(z1, w1c2, C1, C1, masks, offs, r, exact)
    z2, xh2, m2, v2, r2 = _bn_fwd(z2, sc, bi, 2, C1, rv)
    idn = _dot(a * valid, w1sk[:].astype(jnp.float32), exact)
    idn, xh3, m3, v3, r3 = _bn_fwd(idn, sc, bi, 3, C1, rv)
    y1 = jax.nn.relu(z2 + idn)

    # residual block 2 (64 → 128)
    z1b = _conv3(y1, w2c1, C1, C2, masks, offs, r, exact)
    z1b, xh4, m4, v4, r4 = _bn_fwd(z1b, sc, bi, 4, C2, rv)
    z1b = jax.nn.relu(z1b)
    z2b = _conv3(z1b, w2c2, C2, C2, masks, offs, r, exact)
    z2b, xh5, m5, v5, r5 = _bn_fwd(z2b, sc, bi, 5, C2, rv)
    idn2 = _dot(y1 * valid, w2sk[:].astype(jnp.float32), exact)
    idn2, xh6, m6, v6, r6 = _bn_fwd(idn2, sc, bi, 6, C2, rv)
    y2 = jax.nn.relu(z2b + idn2)

    p, pt = _pool_mats(n, r, rv, s)
    pooled = _dot(p, y2, exact)  # (N, 128)
    emb = _dot(pooled, wfc[:].astype(jnp.float32), exact) + bfc[:].astype(jnp.float32)

    stats = [(m0, v0), (m1, v1), (m2, v2), (m3, v3), (m4, v4), (m5, v5), (m6, v6)]

    saved = dict(
        x0=x0, a=a, z1=z1, y1=y1, z1b=z1b, pooled=pooled,
        xh=(xh0, xh1, xh2, xh3, xh4, xh5, xh6),
        rstd=(r0, r1, r2, r3, r4, r5, r6),
        masks=masks, valid=valid, offs=offs, pt=pt, y2=y2,
    )
    return emb, stats, saved


def _fwd_kernel(n, r, rv, s, exact, *refs):
    *in_refs, emb_ref, stats_ref = refs
    emb, stats, _ = _fwd_stages(tuple(in_refs), n, r, rv, s, exact)
    emb_ref[:] = emb
    stats_ref[:] = jnp.zeros((16, 128), jnp.float32)
    for i, (mm, vv) in enumerate(stats):
        c = BN_LAYOUT[i][1]
        stats_ref[i : i + 1, :c] = mm
        stats_ref[8 + i : 9 + i, :c] = vv


def _bwd_kernel(n, r, rv, s, exact, *refs):
    (*in_refs, g_ref,
     gx_ref, gwi_ref, gw1c1_ref, gw1sk_ref, gw1c2_ref, gw2c1_ref, gw2sk_ref,
     gw2c2_ref, gsc_ref, gbi_ref, gwfc_ref, gbfc_ref) = refs
    (x_ref, wi_ref, w1c1, w1sk, w1c2, w2c1, w2sk, w2c2, sc, bi, wfc, bfc) = in_refs
    _, _, sv = _fwd_stages(tuple(in_refs), n, r, rv, s, exact)
    offs, masks, valid = sv["offs"], sv["masks"], sv["valid"]
    xh = sv["xh"]
    rstd = sv["rstd"]

    g = g_ref[:].astype(jnp.float32)  # (N, E)
    # fc
    gbfc_ref[:] = jnp.sum(g, axis=0, keepdims=True)
    gwfc_ref[:] = _dot_t(sv["pooled"], g, exact, (0, 0))
    g_pooled = _dot_t(g, wfc[:].astype(jnp.float32), exact, (1, 1))  # (N, 128)
    # mean pool
    g_y2 = _dot(sv["pt"], g_pooled, exact)  # (R, 128), zero on pad rows

    gsc_ref[:] = jnp.zeros((8, 128), jnp.float32)
    gbi_ref[:] = jnp.zeros((8, 128), jnp.float32)

    def put_sc(row, ds, db):
        c = BN_LAYOUT[row][1]
        gsc_ref[row : row + 1, :c] = ds
        gbi_ref[row : row + 1, :c] = db

    # rb2 output relu: mask from recomputed pre-activation sign via y2>0
    g_pre = g_y2 * (sv["y2"] > 0)
    # bn(z2b) and bn(idn2) both receive g_pre
    g_z2b, ds5, db5 = _bn_bwd(g_pre, xh[5], rstd[5], sc, 5, C2, rv, valid)
    put_sc(5, ds5, db5)
    g_idn2, ds6, db6 = _bn_bwd(g_pre, xh[6], rstd[6], sc, 6, C2, rv, valid)
    put_sc(6, ds6, db6)
    # conv2 of rb2
    g_z1b, dw2c2 = _conv3_bwd(g_z2b, sv["z1b"], w2c2, C2, C2, masks, offs, r, exact)
    gw2c2_ref[:] = dw2c2
    g_z1b = g_z1b * (sv["z1b"] > 0)
    g_z1b, ds4, db4 = _bn_bwd(g_z1b, xh[4], rstd[4], sc, 4, C2, rv, valid)
    put_sc(4, ds4, db4)
    # conv1 + skip of rb2, both from y1
    g_y1, dw2c1 = _conv3_bwd(g_z1b, sv["y1"], w2c1, C1, C2, masks, offs, r, exact)
    gw2c1_ref[:] = dw2c1
    y1v = sv["y1"] * valid
    gw2sk_ref[:] = _dot_t(y1v, g_idn2, exact, (0, 0))
    g_y1 = g_y1 + _dot_t(g_idn2, w2sk[:].astype(jnp.float32), exact, (1, 1)) * valid

    # rb1 output relu
    g_pre1 = g_y1 * (sv["y1"] > 0)
    g_z2, ds2, db2 = _bn_bwd(g_pre1, xh[2], rstd[2], sc, 2, C1, rv, valid)
    put_sc(2, ds2, db2)
    g_idn, ds3, db3 = _bn_bwd(g_pre1, xh[3], rstd[3], sc, 3, C1, rv, valid)
    put_sc(3, ds3, db3)
    g_z1, dw1c2 = _conv3_bwd(g_z2, sv["z1"], w1c2, C1, C1, masks, offs, r, exact)
    gw1c2_ref[:] = dw1c2
    g_z1 = g_z1 * (sv["z1"] > 0)
    g_z1, ds1, db1 = _bn_bwd(g_z1, xh[1], rstd[1], sc, 1, C1, rv, valid)
    put_sc(1, ds1, db1)
    g_a, dw1c1 = _conv3_bwd(g_z1, sv["a"], w1c1, C0, C1, masks, offs, r, exact)
    gw1c1_ref[:] = dw1c1
    av = sv["a"] * valid
    gw1sk_ref[:] = _dot_t(av, g_idn, exact, (0, 0))
    g_a = g_a + _dot_t(g_idn, w1sk[:].astype(jnp.float32), exact, (1, 1)) * valid

    # initial bn + relu + conv
    g_a = g_a * (sv["a"] > 0)
    g_a, ds0, db0 = _bn_bwd(g_a, xh[0], rstd[0], sc, 0, C0, rv, valid)
    put_sc(0, ds0, db0)

    # initial conv (cin=1): dW[i] = Σ_r (x0 rolled·mask)·g ; dx broadcast sum
    gwi = []
    gx = jnp.zeros((r, 1), jnp.float32)
    for i, off in enumerate(offs):
        gm = g_a * masks[i]
        xs = _roll(sv["x0"], off, r) * masks[i]
        gwi.append(jnp.sum(xs * gm, axis=0, keepdims=True))
        gx = gx + _roll(
            jnp.sum(gm * wi_ref[i : i + 1, :].astype(jnp.float32), axis=1, keepdims=True),
            -off,
            r,
        )
    gwi_ref[:] = jnp.concatenate(gwi, axis=0)
    gx_ref[:] = gx * valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _core(static, x_rows, w_init, w1c1, w1sk, w1c2, w2c1, w2sk, w2c2, sc, bi, wfc, bfc):
    emb, stats = _core_fwd_impl(
        static, x_rows, w_init, w1c1, w1sk, w1c2, w2c1, w2sk, w2c2, sc, bi, wfc, bfc
    )
    return emb, stats


def _core_fwd_impl(static, *args):
    n, r, rv, s, e, interpret, exact = static
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n, r, rv, s, exact),
        out_shape=(
            jax.ShapeDtypeStruct((n, e), jnp.float32),
            jax.ShapeDtypeStruct((16, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


def _core_fwd(static, *args):
    out = _core_fwd_impl(static, *args)
    return out, args


def _core_bwd(static, res, cts):
    n, r, rv, s, e, interpret, exact = static
    g_emb, _ = cts  # stats feed only the (undifferentiated) EMA update
    g_emb = jnp.asarray(g_emb, jnp.float32)
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, n, r, rv, s, exact),
        out_shape=(
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((9, C0), jnp.float32),
            jax.ShapeDtypeStruct((9 * C0, C1), jnp.float32),
            jax.ShapeDtypeStruct((C0, C1), jnp.float32),
            jax.ShapeDtypeStruct((9 * C1, C1), jnp.float32),
            jax.ShapeDtypeStruct((9 * C1, C2), jnp.float32),
            jax.ShapeDtypeStruct((C1, C2), jnp.float32),
            jax.ShapeDtypeStruct((9 * C2, C2), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((C2, e), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(12)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*res, g_emb)
    return tuple(g.astype(a.dtype) for g, a in zip(grads, res))


_core.defvjp(_core_fwd, _core_bwd)


def _pack_w3(k):
    """(3, 3, cin, cout) → (9·cin, cout), tap-major rows."""
    return k.reshape(9 * k.shape[2], k.shape[3])


def _pack_rows(vecs):
    """Pack per-BN channel vectors into an (8, 128) array by BN_LAYOUT row."""
    out = jnp.zeros((8, 128), vecs[0].dtype)
    for i, v in enumerate(vecs):
        out = out.at[i, : v.shape[0]].set(v)
    return out


def fused_deep_resnet_embed(
    x: jax.Array,
    kernels: dict,
    bn_scales: dict,
    bn_biases: dict,
    fc_kernel: jax.Array,
    fc_bias: jax.Array,
    *,
    interpret: bool | None = None,
    exact: bool | None = None,
):
    """Training-mode DeepResNetEmbedding forward as ONE Pallas kernel.

    ``x``: (B, T, S, S). ``kernels``: conv kernels keyed ``initial`` (3,3,1,32),
    ``rb1_conv1`` (3,3,32,64), ``rb1_conv2``, ``rb1_skip`` (1,1,32,64),
    ``rb2_conv1``, ``rb2_conv2``, ``rb2_skip``. ``bn_scales``/``bn_biases``:
    (C,) vectors keyed by BN_LAYOUT names. Returns ``(emb (B,T,E),
    {name: (batch_mean, batch_var)})`` — the caller applies the EMA update.

    Differentiable via ``jax.custom_vjp`` (a second all-VMEM kernel that
    recomputes the forward); the batch-stat outputs are treated as
    non-differentiable byproducts, matching their flax role.
    """
    b, t, h, w = x.shape
    assert h == w, "square patches only"
    s = h
    n = b * t
    rv = n * s * s
    r = _pad8(rv)
    e = fc_kernel.shape[1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if exact is None:
        exact = interpret

    x_rows = jnp.pad(x.reshape(rv, 1), ((0, r - rv), (0, 0)))
    args = (
        x_rows,
        kernels["initial"].reshape(9, C0),
        _pack_w3(kernels["rb1_conv1"]),
        kernels["rb1_skip"].reshape(C0, C1),
        _pack_w3(kernels["rb1_conv2"]),
        _pack_w3(kernels["rb2_conv1"]),
        kernels["rb2_skip"].reshape(C1, C2),
        _pack_w3(kernels["rb2_conv2"]),
        _pack_rows([bn_scales[k] for k, _ in BN_LAYOUT]),
        _pack_rows([bn_biases[k] for k, _ in BN_LAYOUT]),
        fc_kernel,
        fc_bias.reshape(1, e),
    )
    static = (n, r, rv, s, e, bool(interpret), bool(exact))
    emb, stats = _core(static, *args)
    bn_stats = {
        name: (stats[i, :c], stats[8 + i, :c])
        for i, (name, c) in enumerate(BN_LAYOUT)
    }
    return emb.reshape(b, t, e).astype(x.dtype), bn_stats
