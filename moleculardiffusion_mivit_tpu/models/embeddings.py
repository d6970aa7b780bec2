"""Frame-embedding modules for the MiViT transformer family.

Parity targets (helpers/models.py):

- ``LinearProjectionEmbedding`` (:146-167): flatten each S×S frame → Dense.
- ``CNNEmbedding`` (:170-199): one Conv(1→D, kernel=S, VALID) per frame.
- ``DeepResNetEmbedding`` (:202-257): Conv3x3(1→32)+BN+ReLU →
  ResidualBlock(32→64) → ResidualBlock(64→128) → global average pool →
  Dense(128→D). Frames are folded into the batch axis, which also keeps
  BatchNorm statistics per-(batch·frames) exactly like the reference.

Convolution padding is explicit (torch-style) so shapes match for any input
size, not just the odd patch sizes the reference uses. BatchNorm uses
eps=1e-5 / momentum 0.1 (torch defaults); running stats live in the
``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

BN = lambda name=None: nn.BatchNorm(
    use_running_average=None, momentum=0.9, epsilon=1e-5, name=name
)
_BN_MOMENTUM = 0.9

# ---------------------------------------------------------------------------
# Fused-embedding backend switch (mirrors sim.render.set_render_backend):
# "fused" routes DeepResNetEmbedding's TRAINING forward through the
# whole-embedding Pallas kernel (ops/fused_embedding.py; interpret-mode
# off-TPU — used by the parity tests); "xla" keeps the flax/conv path;
# "auto" picks the measured-faster path per regime. Measured on TPU v5e
# (results/fused_embedding, RESULTS.md): the kernel LOSES ~2× to XLA's
# per-op lowering at the batch-1 bench shape (fwd 36.4 vs 17.6 µs,
# fwd+bwd 134 vs 66; two-loop slope, reproduced twice), and its
# recompute-in-VMEM backward exceeds the 110 MB scoped-VMEM limit above
# ~2432 padded rows (30 frames of 9×9 compile; 60 OOM at 118 MB) — so
# "auto" resolves to the XLA path everywhere, and explicit "fused" falls
# back (with a one-time warning) at row counts where the backward
# measured uncompilable.
_EMBEDDING_BACKEND = "auto"

# Largest pad8(n_images·S²) row count at which the backward kernel is
# measured to fit scoped VMEM on v5e (results/fused_embedding).
FUSED_MAX_ROWS = 2432
# Row counts already warned about (one warning per distinct oversize, so a
# user switching shapes — or backends and back — still hears about each new
# silent fallback; reset by set_embedding_backend).
_FUSED_FALLBACK_WARNED_ROWS = set()


def set_embedding_backend(backend: str) -> None:
    global _EMBEDDING_BACKEND
    if backend not in ("auto", "fused", "xla"):
        raise ValueError(f"unknown embedding backend {backend!r}")
    _EMBEDDING_BACKEND = backend
    _FUSED_FALLBACK_WARNED_ROWS.clear()


def _route_fused(n_rows: int, train: bool) -> bool:
    if _EMBEDDING_BACKEND == "xla" or not train:
        return False
    if _EMBEDDING_BACKEND != "fused":
        return False
    if n_rows > FUSED_MAX_ROWS:
        if n_rows not in _FUSED_FALLBACK_WARNED_ROWS:
            _FUSED_FALLBACK_WARNED_ROWS.add(n_rows)
            import warnings

            warnings.warn(
                f"fused embedding backend: {n_rows} activation rows exceed "
                f"the measured scoped-VMEM limit of the backward kernel "
                f"({FUSED_MAX_ROWS} rows on TPU v5e, results/fused_embedding)"
                " — falling back to the XLA path for this call",
                stacklevel=3,
            )
        return False
    return True


class _ConvParams(nn.Module):
    """Declares exactly the param an ``nn.Conv(use_bias=False)`` would."""

    kshape: Tuple[int, ...]  # (kh, kw, cin, cout)

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.kshape)


class _BNParams(nn.Module):
    """Declares exactly the variables ``BN()`` would (scale/bias params,
    float32 batch_stats) and applies flax's EMA update when given the batch
    stats computed inside the fused kernel."""

    features: int

    @nn.compact
    def __call__(self, batch_mean=None, batch_var=None):
        c = (self.features,)
        scale = self.param("scale", nn.initializers.ones_init(), c)
        bias = self.param("bias", nn.initializers.zeros_init(), c)
        ra_mean = self.variable("batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), c)
        ra_var = self.variable("batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), c)
        if batch_mean is not None and not self.is_initializing():
            ra_mean.value = _BN_MOMENTUM * ra_mean.value + (1 - _BN_MOMENTUM) * batch_mean
            ra_var.value = _BN_MOMENTUM * ra_var.value + (1 - _BN_MOMENTUM) * batch_var
        return scale, bias


class _DenseParams(nn.Module):
    """Declares exactly the params an ``nn.Dense`` would."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (self.cin, self.cout))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.cout,))
        return kernel, bias


class _ResBlockParams(nn.Module):
    """Parameter/stat declarations matching ``ResidualBlock``'s tree."""

    cin: int
    cout: int

    @nn.compact
    def __call__(self, stats=None):
        k_skip = _ConvParams((1, 1, self.cin, self.cout), name="skip_conv")()
        skip_bn = _BNParams(self.cout, name="skip_bn")
        k1 = _ConvParams((3, 3, self.cin, self.cout), name="conv1")()
        bn1 = _BNParams(self.cout, name="bn1")
        k2 = _ConvParams((3, 3, self.cout, self.cout), name="conv2")()
        bn2 = _BNParams(self.cout, name="bn2")
        if stats is None:
            s1, b1 = bn1()
            s2, b2 = bn2()
            ss, bs = skip_bn()
        else:
            s1, b1 = bn1(*stats["bn1"])
            s2, b2 = bn2(*stats["bn2"])
            ss, bs = skip_bn(*stats["skip"])
        kernels = {"conv1": k1, "conv2": k2, "skip": k_skip}
        scales = {"bn1": s1, "bn2": s2, "skip": ss}
        biases = {"bn1": b1, "bn2": b2, "skip": bs}
        return kernels, scales, biases


def _fold_frames(x):
    """(B, T, S, S) → (B·T, S, S, 1) NHWC."""
    b, t, h, w = x.shape
    return x.reshape(b * t, h, w, 1), b, t


class LinearProjectionEmbedding(nn.Module):
    patch_size: int
    embed_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim == 3:  # unbatched (T, S, S)
            x = x[None]
        b, t, h, w = x.shape
        x = x.reshape(b, t, h * w)
        return nn.Dense(self.embed_dim, name="proj")(x)


class CNNEmbedding(nn.Module):
    patch_size: int
    embed_dim: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        xf, b, t = _fold_frames(x)
        y = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            padding="VALID",
            name="conv",
        )(xf)
        return y.reshape(b, t, self.embed_dim)


class ResidualBlock(nn.Module):
    out_channels: int
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride = 2 if self.downsample else 1
        in_channels = x.shape[-1]
        identity = x
        if in_channels != self.out_channels or self.downsample:
            identity = nn.Conv(
                self.out_channels, (1, 1), strides=stride, use_bias=False, name="skip_conv"
            )(x)
            identity = BN("skip_bn")(identity, use_running_average=not train)
        y = nn.Conv(
            self.out_channels,
            (3, 3),
            strides=stride,
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            name="conv1",
        )(x)
        y = BN("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2"
        )(y)
        y = BN("bn2")(y, use_running_average=not train)
        return nn.relu(y + identity)


class DeepResNetEmbedding(nn.Module):
    patch_size: int = 7  # unused; kept for config-signature parity
    embed_dim: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t = x.shape[0], x.shape[1]
        if not self.is_initializing() and _route_fused(
            b * t * x.shape[2] * x.shape[3], train
        ):
            return self._fused(x)
        xf, b, t = _fold_frames(x)
        y = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="initial_conv")(xf)
        y = BN("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = ResidualBlock(64, name="res_block1")(y, train)
        y = ResidualBlock(128, name="res_block2")(y, train)
        y = jnp.mean(y, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        y = y.reshape(b, t, 128)
        return nn.Dense(self.embed_dim, name="fc")(y)

    def _fused(self, x):
        """Training forward through the whole-embedding Pallas kernel
        (ops/fused_embedding.py) against the SAME variable tree the flax
        path declares — an execution-layout change only, equivalence-pinned
        by tests/test_fused_embedding.py."""
        from moleculardiffusion_mivit_tpu.ops.fused_embedding import (
            fused_deep_resnet_embed,
        )

        k_init = _ConvParams((3, 3, 1, 32), name="initial_conv")()
        bn1 = _BNParams(32, name="bn1")
        s0, b0 = bn1()
        rb1 = _ResBlockParams(32, 64, name="res_block1")
        rb2 = _ResBlockParams(64, 128, name="res_block2")
        k1, s1, bi1 = rb1()
        k2, s2, bi2 = rb2()
        fc_kernel, fc_bias = _DenseParams(128, self.embed_dim, name="fc")()

        kernels = {
            "initial": k_init,
            "rb1_conv1": k1["conv1"], "rb1_conv2": k1["conv2"], "rb1_skip": k1["skip"],
            "rb2_conv1": k2["conv1"], "rb2_conv2": k2["conv2"], "rb2_skip": k2["skip"],
        }
        scales = {
            "bn1": s0,
            "rb1_bn1": s1["bn1"], "rb1_bn2": s1["bn2"], "rb1_skip": s1["skip"],
            "rb2_bn1": s2["bn1"], "rb2_bn2": s2["bn2"], "rb2_skip": s2["skip"],
        }
        biases = {
            "bn1": b0,
            "rb1_bn1": bi1["bn1"], "rb1_bn2": bi1["bn2"], "rb1_skip": bi1["skip"],
            "rb2_bn1": bi2["bn1"], "rb2_bn2": bi2["bn2"], "rb2_skip": bi2["skip"],
        }
        emb, bn_stats = fused_deep_resnet_embed(
            x, kernels, scales, biases, fc_kernel, fc_bias
        )
        # EMA running-stat updates, exactly as flax BatchNorm applies them
        bn1(*bn_stats["bn1"])
        rb1(stats={
            "bn1": bn_stats["rb1_bn1"], "bn2": bn_stats["rb1_bn2"], "skip": bn_stats["rb1_skip"],
        })
        rb2(stats={
            "bn1": bn_stats["rb2_bn1"], "bn2": bn_stats["rb2_bn2"], "skip": bn_stats["rb2_skip"],
        })
        return emb


EMBEDDING_REGISTRY = {
    "linear": LinearProjectionEmbedding,
    "cnn": CNNEmbedding,
    "deep_resnet": DeepResNetEmbedding,
}
