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

import flax.linen as nn
import jax.numpy as jnp

BN = lambda name=None: nn.BatchNorm(
    use_running_average=None, momentum=0.9, epsilon=1e-5, name=name
)


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
        xf, b, t = _fold_frames(x)
        y = nn.Conv(32, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="initial_conv")(xf)
        y = BN("bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = ResidualBlock(64, name="res_block1")(y, train)
        y = ResidualBlock(128, name="res_block2")(y, train)
        y = jnp.mean(y, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        y = y.reshape(b, t, 128)
        return nn.Dense(self.embed_dim, name="fc")(y)


EMBEDDING_REGISTRY = {
    "linear": LinearProjectionEmbedding,
    "cnn": CNNEmbedding,
    "deep_resnet": DeepResNetEmbedding,
}
