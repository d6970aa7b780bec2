"""Transformer building blocks (Flax Linen).

Architecture-parity notes vs the reference (helpers/models.py):

- ``MultiHeadAttention`` (models.py:11-59): separate Q/K/V/out dense layers
  with Xavier-uniform kernels, scaled dot-product, softmax→dropout→context.
- ``FeedForward`` (models.py:61-77): 2-layer MLP with a caller-chosen
  activation.
- ``TransformerEncoderLayerWithSkip`` (models.py:81-108): **post-norm**
  residual blocks — ``x + drop(MHA) → LN → x + drop(FF) → LN``.
- ``Transformer`` (models.py:111-141): optional learned positional embedding
  of shape (1, MAX_TOKENS, D) sliced to the sequence length, N encoder
  layers, final LayerNorm.

LayerNorm epsilon is pinned to 1e-5 (the torch default) rather than Flax's
1e-6. Attention sequence lengths in this workload are ≤ 61 tokens
(MAX_TOKENS=128 cap, models.py:8) so plain O(T²) attention on the MXU is the
right kernel; no flash/blockwise attention is needed.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

MAX_TOKENS = 128  # hard cap on learned positional embedding (models.py:8)

LN_EPS = 1e-5


def activation_by_name(name: str) -> Callable[[jax.Array], jax.Array]:
    table = {
        "relu": nn.relu,
        "leaky_relu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "gelu": nn.gelu,
        "tanh": nn.tanh,
    }
    if callable(name):
        return name
    if name not in table:
        raise ValueError(f"Unknown activation {name!r}; expected one of {list(table)}")
    return table[name]


class MultiHeadAttention(nn.Module):
    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        if self.embed_dim % self.num_heads != 0:
            raise ValueError("embed_dim must be divisible by num_heads")
        head_dim = self.embed_dim // self.num_heads
        b, t, _ = x.shape
        dense = lambda name: nn.Dense(
            self.embed_dim, kernel_init=nn.initializers.xavier_uniform(), name=name
        )
        q = dense("q_proj")(x).reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        k = dense("k_proj")(x).reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)
        v = dense("v_proj")(x).reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(head_dim).astype(x.dtype)
        if mask is not None:
            scores = jnp.where(mask == 0, jnp.asarray(-1e9, scores.dtype), scores)
        attn = jax.nn.softmax(scores, axis=-1)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, t, self.embed_dim)
        return dense("out_proj")(ctx)


class FeedForward(nn.Module):
    embed_dim: int
    hidden_dim: int
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, act_slope=None):
        if act_slope is None:
            act = activation_by_name(self.activation)
        else:
            # Traced leaky-relu slope: lets a vmapped stack of models that
            # differ ONLY in activation slope (relu == slope 0, the
            # reference's leaky_relu == slope 0.01) share one compiled
            # program (train.multi stack_pairs). Forward matches
            # relu/leaky_relu exactly; the gradient differs from nn.relu
            # only at inputs of exactly 0.0 (where() picks 1, relu picks 0).
            act = lambda v: jnp.where(v >= 0, v, act_slope * v)
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.embed_dim, name="fc2")(x)


class TransformerEncoderLayerWithSkip(nn.Module):
    embed_dim: int
    num_heads: int
    hidden_dim: int
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True, act_slope=None):
        attn = MultiHeadAttention(self.embed_dim, self.num_heads, self.dropout, name="self_attn")(
            x, mask, deterministic
        )
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(x)  # post-norm
        ff = FeedForward(self.embed_dim, self.hidden_dim, self.activation, self.dropout, name="feed_forward")(
            x, deterministic, act_slope
        )
        x = x + nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm2")(x)


class Transformer(nn.Module):
    """Post-norm encoder stack with optional learned positional embedding."""

    embed_dim: int
    num_heads: int
    hidden_dim: int
    num_layers: int
    dropout: float = 0.0
    use_pos_encoding: bool = False
    activation: str = "relu"
    max_tokens: int = MAX_TOKENS

    @nn.compact
    def __call__(self, x, deterministic: bool = True, act_slope=None):
        if self.use_pos_encoding:
            pos = self.param(
                "pos_embedding",
                nn.initializers.normal(stddev=1.0),
                (1, self.max_tokens, self.embed_dim),
            )
            x = x + pos[:, : x.shape[1], :]
        for i in range(self.num_layers):
            x = TransformerEncoderLayerWithSkip(
                self.embed_dim,
                self.num_heads,
                self.hidden_dim,
                self.activation,
                self.dropout,
                name=f"layer_{i}",
            )(x, deterministic=deterministic, act_slope=act_slope)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)


class MLPHead(nn.Module):
    """Two-layer regression head (models.py:260-276)."""

    hidden_dim: int = 128
    output_dim: int = 1
    dropout: float = 0.0
    activation: str = "relu"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = activation_by_name(self.activation)
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = act(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="fc2")(x)
