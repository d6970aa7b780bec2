"""Light ResNet comparison arms.

Parity targets (helpers/models.py):

- ``BasicBlock`` (:600-635): two 3x3 convs + BN, 1x1 BN shortcut on
  stride/channel change, activation after the residual add.
- ``LightResNet`` (:638-683): conv5x5 s2 p2 (1→32) + BN + act + maxpool3 s2
  p1, stages [32, 64(s2), 128(s2)] with one block each, global average pool,
  fc 128→64 → act → fc 64→1.
- ``MultiImageResNet`` (:686-701): per-frame LightResNet prediction, mean
  over frames when ``single_prediction``.
- ``MultiImageFeatureResNet`` (:749-772): ResNet trunk emitting a 64-d
  feature (LightImagesFeaturesResNet, :704-747), mean-pooled over frames,
  concatenated with external trajectory features, 2-layer MLP head.

Frames fold into the batch axis (so BatchNorm statistics match the
reference's B·T batching). Explicit torch-style padding throughout.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.models.embeddings import BN
from moleculardiffusion_mivit_tpu.models.layers import activation_by_name


class BasicBlock(nn.Module):
    out_channels: int
    stride: int = 1
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_by_name(self.activation)
        in_channels = x.shape[-1]
        identity = x
        if self.stride != 1 or in_channels != self.out_channels:
            identity = nn.Conv(
                self.out_channels, (1, 1), strides=self.stride, use_bias=False, name="shortcut_conv"
            )(x)
            identity = BN("shortcut_bn")(identity, use_running_average=not train)
        y = nn.Conv(
            self.out_channels,
            (3, 3),
            strides=self.stride,
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            name="conv1",
        )(x)
        y = BN("bn1")(y, use_running_average=not train)
        y = act(y)
        y = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False, name="conv2"
        )(y)
        y = BN("bn2")(y, use_running_average=not train)
        return act(y + identity)


class _ResNetTrunk(nn.Module):
    """Shared stem + stages + GAP + fc1: emits a ``feature_size``-d vector."""

    feature_size: int = 64
    activation: str = "relu"
    num_blocks: tuple = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = activation_by_name(self.activation)
        y = nn.Conv(
            32, (5, 5), strides=2, padding=[(2, 2), (2, 2)], use_bias=False, name="conv1"
        )(x)
        y = BN("bn1")(y, use_running_average=not train)
        y = act(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (channels, stride) in enumerate([(32, 1), (64, 2), (128, 2)]):
            for block in range(self.num_blocks[stage]):
                y = BasicBlock(
                    channels,
                    stride if block == 0 else 1,
                    self.activation,
                    name=f"layer{stage + 1}_block{block}",
                )(y, train)
        y = jnp.mean(y, axis=(1, 2))  # AdaptiveAvgPool2d((1,1))
        y = nn.Dense(self.feature_size, name="fc1")(y)
        return act(y)


class LightResNet(nn.Module):
    num_classes: int = 1
    feature_size: int = 64
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _ResNetTrunk(self.feature_size, self.activation, name="trunk")(x, train)
        return nn.Dense(self.num_classes, name="fc2")(y)


class MultiImageResNet(nn.Module):
    single_prediction: bool = True
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w = x.shape
        xf = x.reshape(b * t, h, w, 1)
        y = LightResNet(1, 64, self.activation, name="resnet")(xf, train)
        y = y.reshape(b, t, 1)
        if self.single_prediction:
            y = jnp.mean(y, axis=1)
        return y


class MultiImageFeatureResNet(nn.Module):
    external_dim: int
    feature_size: int = 64
    hidden_size: int = 128
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, external_features, train: bool = False):
        act = activation_by_name(self.activation)
        b, t, h, w = x.shape
        xf = x.reshape(b * t, h, w, 1)
        feats = _ResNetTrunk(self.feature_size, self.activation, name="resnet")(xf, train)
        feats = feats.reshape(b, t, -1).mean(axis=1)  # mean over time
        combined = jnp.concatenate([feats, external_features], axis=1)
        y = nn.Dense(self.hidden_size, name="mlp_fc1")(combined)
        y = act(y)
        return nn.Dense(1, name="mlp_fc2")(y)
