"""The MiViT: GeneralTransformer and ModularTransformer regressors.

Parity targets: ``GeneralTransformer`` (helpers/models.py:278-361) and
``ModularTransformer`` (:366-593). Flow for GeneralTransformer:

    frame embedding → LayerNorm → [regression token (+early feature
    fusion via a 2-layer projector)] → post-norm Transformer →
    token-0 / mean pooling → [late fusion concat] → MLPHead

Known reference quirk (documented, not replicated): the torch
GeneralTransformer ignores ``single_prediction`` at forward time and always
mean-pools when no regression token is used, so its sequence mode cannot
actually emit per-frame predictions (models.py:351-354). Here
``single_prediction=False`` (with no regression token) returns per-token
predictions ``(B, T, 1)`` — the behavior the training harness expects and
what ModularTransformer implements (:585-590).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from moleculardiffusion_mivit_tpu.config import ModelConfig
from moleculardiffusion_mivit_tpu.models.embeddings import EMBEDDING_REGISTRY
from moleculardiffusion_mivit_tpu.models.layers import LN_EPS, MLPHead, Transformer


class FeatureProjector(nn.Module):
    """2-layer global-feature projector (models.py:316-320)."""

    embed_dim: int

    @nn.compact
    def __call__(self, f):
        f = nn.Dense(self.embed_dim, name="fc1")(f)
        f = nn.relu(f)
        return nn.Dense(self.embed_dim, name="fc2")(f)


class GeneralTransformer(nn.Module):
    config: ModelConfig
    embedding: str = "deep_resnet"  # linear | cnn | deep_resnet
    use_global_features: bool = False
    fusion_type: str = "early"  # early | late
    global_feature_dim: Optional[int] = None
    head_hidden_dim: int = 128

    @nn.compact
    def __call__(self, x, features=None, train: bool = False, act_slope=None):
        cfg = self.config
        emb_cls = EMBEDDING_REGISTRY[self.embedding]
        x = emb_cls(cfg.patch_size, cfg.embed_dim, name="embedding")(x, train)
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        b = x.shape[0]

        if self.use_global_features and features is None:
            raise ValueError("Global features required when use_global_features=True")

        if cfg.use_regression_token:
            reg_token = self.param(
                "reg_token", nn.initializers.normal(stddev=1.0), (1, 1, cfg.embed_dim)
            )
            reg = jnp.broadcast_to(reg_token, (b, 1, cfg.embed_dim))
            if self.use_global_features and self.fusion_type == "early":
                proj = FeatureProjector(cfg.embed_dim, name="feature_projector")(features)
                reg = reg + proj[:, None, :]
            x = jnp.concatenate([reg, x], axis=1)

        x = Transformer(
            cfg.embed_dim,
            cfg.num_heads,
            cfg.hidden_dim,
            cfg.num_layers,
            cfg.dropout,
            cfg.use_pos_encoding,
            cfg.activation,
            cfg.max_tokens,
            name="transformer",
        )(x, deterministic=not train, act_slope=act_slope)

        if cfg.use_regression_token:
            out = x[:, 0, :]
        elif cfg.single_prediction:
            out = jnp.mean(x, axis=1)
        else:
            out = x  # per-token predictions (B, T, D)

        if self.use_global_features and self.fusion_type == "late":
            proj = FeatureProjector(cfg.embed_dim, name="feature_projector")(features)
            out = jnp.concatenate([out, proj], axis=-1)

        head = MLPHead(self.head_hidden_dim, dropout=0.0, name="mlp_head")
        return head(out, deterministic=not train)


class HybridFusionTransformer(nn.Module):
    """Both fusion pathways in ONE model — the composition neither the
    reference nor rounds 1-3 ever tried (reference built the halves:
    GeneralTransformer's global-feature regression-token early fusion,
    models.py:278-361, and ModularTransformer's per-frame feature tokens,
    models.py:366-593).

    Motivation (RESULTS.md, round-3 modular study): per-frame feature
    tokens win at low-to-mid D (0.339 vs 0.373 on the committed D ≤ 7
    suite) while global early fusion wins the full published sweep (0.486
    vs 0.529 on D = 0.1..10.0) — the pathways fail in different regimes,
    so combining them may dominate both parents.

    Flow::

        frame tokens = image_embedding(images) ⊕ per-frame feature tokens
                       (fusion_method: add | concat_proj, the modular arms)
        reg token    = learned token + FeatureProjector(global features)
                       (the GeneralTransformer early-fusion mechanism)
        post-norm Transformer → token 0 → MLPHead

    The training harness passes ONE features tensor per arm, so the two
    feature kinds arrive PACKED: ``features (B, F·per_frame_dim +
    global_dim)`` — per-frame features flattened first, global features
    appended (see ``experiments.modular.make_dataset`` hybrid packing).
    ``F`` is recovered from the image tensor's frame axis (static under
    jit).
    """

    config: ModelConfig
    image_embedding: str = "deep_resnet"
    per_frame_dim: int = 6
    global_dim: int = 25
    fusion_method: str = "concat_proj"  # add | concat_proj
    head_hidden_dim: int = 128

    def _pf_embed(self, f):
        cfg = self.config
        y = nn.Dense(cfg.embed_dim * 2, name="pf_fc1")(f)
        y = nn.LayerNorm(epsilon=LN_EPS, name="pf_ln")(y)
        y = nn.gelu(y)
        return nn.Dense(cfg.embed_dim, name="pf_fc2")(y)

    @nn.compact
    def __call__(self, images, features=None, train: bool = False):
        cfg = self.config
        if features is None:
            raise ValueError("HybridFusionTransformer requires packed features")
        b, f = images.shape[0], images.shape[1]
        n_pf = f * self.per_frame_dim
        if features.shape[-1] != n_pf + self.global_dim:
            raise ValueError(
                f"packed features must be (B, {n_pf} + {self.global_dim}); "
                f"got {features.shape}"
            )
        pf = jnp.nan_to_num(
            features[:, :n_pf].reshape(b, f, self.per_frame_dim), nan=0.0
        )
        gf = jnp.nan_to_num(features[:, n_pf:], nan=0.0)

        img = EMBEDDING_REGISTRY[self.image_embedding](
            cfg.patch_size, cfg.embed_dim, name="image_embedding"
        )(images, train)
        if self.fusion_method == "add":
            x = img + self._pf_embed(pf)
        elif self.fusion_method == "concat_proj":
            cat = jnp.concatenate([img, self._pf_embed(pf)], axis=-1)
            x = nn.Dense(cfg.embed_dim, name="fusion_layer")(cat)
        else:
            raise ValueError(f"unknown fusion_method {self.fusion_method!r}")
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)

        reg_token = self.param(
            "reg_token", nn.initializers.normal(stddev=1.0), (1, 1, cfg.embed_dim)
        )
        reg = jnp.broadcast_to(reg_token, (b, 1, cfg.embed_dim))
        reg = reg + FeatureProjector(cfg.embed_dim, name="feature_projector")(gf)[:, None, :]
        x = jnp.concatenate([reg, x], axis=1)

        x = Transformer(
            cfg.embed_dim,
            cfg.num_heads,
            cfg.hidden_dim,
            cfg.num_layers,
            cfg.dropout,
            cfg.use_pos_encoding,
            cfg.activation,
            cfg.max_tokens,
            name="transformer",
        )(x, deterministic=not train)

        if cfg.single_prediction:
            out = x[:, 0, :]
        else:
            # sequence mode (round 5, changepoint study): per-frame
            # predictions from the frame tokens; the global-feature reg
            # token participates in attention as context but emits no
            # prediction — so the detection study can ask whether the
            # global pathway helps or costs per-frame change sensitivity
            out = x[:, 1:, :]
        return MLPHead(self.head_hidden_dim, name="mlp_head")(out, deterministic=not train)


class ModularTransformer(nn.Module):
    """Generalized variant: images / per-frame features / both, with
    configurable feature embedding and fusion (models.py:366-593)."""

    config: ModelConfig
    mode: str = "images_only"  # images_only | features_only | both
    image_embedding: str = "deep_resnet"
    features_dim: Optional[int] = None
    feature_embedding_type: str = "linear"  # linear | mlp
    fusion_method: str = "add"  # add | concat_proj | concat_features
    head_hidden_dim: int = 128

    def _feature_embed(self, f):
        cfg = self.config
        if self.feature_embedding_type == "linear":
            return nn.Dense(cfg.embed_dim, name="feature_embedding")(f)
        if self.feature_embedding_type == "mlp":
            y = nn.Dense(cfg.embed_dim * 2, name="feature_fc1")(f)
            y = nn.LayerNorm(epsilon=LN_EPS, name="feature_ln")(y)
            y = nn.gelu(y)
            return nn.Dense(cfg.embed_dim, name="feature_fc2")(y)
        raise ValueError(f"Unknown feature_embedding_type {self.feature_embedding_type!r}")

    @nn.compact
    def __call__(self, images=None, features=None, train: bool = False):
        cfg = self.config
        if self.mode not in ("images_only", "features_only", "both"):
            raise ValueError("mode must be images_only, features_only or both")
        if self.mode in ("images_only", "both") and images is None:
            raise ValueError("images required")
        if self.mode in ("features_only", "both") and features is None:
            raise ValueError("features required")

        if self.mode == "both" and self.fusion_method == "concat_features":
            image_embed_dim = cfg.embed_dim - int(self.features_dim)
            if image_embed_dim <= 0:
                raise ValueError("embed_dim must exceed features_dim for concat_features")
        else:
            image_embed_dim = cfg.embed_dim

        if features is not None:
            features = jnp.nan_to_num(features, nan=0.0)

        if self.mode == "images_only":
            x = EMBEDDING_REGISTRY[self.image_embedding](
                cfg.patch_size, image_embed_dim, name="image_embedding"
            )(images, train)
        elif self.mode == "features_only":
            x = self._feature_embed(features)
        else:
            img = EMBEDDING_REGISTRY[self.image_embedding](
                cfg.patch_size, image_embed_dim, name="image_embedding"
            )(images, train)
            if self.fusion_method == "add":
                x = img + self._feature_embed(features)
            elif self.fusion_method == "concat_proj":
                cat = jnp.concatenate([img, self._feature_embed(features)], axis=-1)
                x = nn.Dense(cfg.embed_dim, name="fusion_layer")(cat)
            else:  # concat_features
                x = jnp.concatenate([img, features], axis=-1)

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        b = x.shape[0]

        if cfg.use_regression_token:
            reg_token = self.param(
                "reg_token", nn.initializers.normal(stddev=1.0), (1, 1, cfg.embed_dim)
            )
            x = jnp.concatenate([jnp.broadcast_to(reg_token, (b, 1, cfg.embed_dim)), x], axis=1)

        x = Transformer(
            cfg.embed_dim,
            cfg.num_heads,
            cfg.hidden_dim,
            cfg.num_layers,
            cfg.dropout,
            cfg.use_pos_encoding,
            cfg.activation,
            cfg.max_tokens,
            name="transformer",
        )(x, deterministic=not train)

        if cfg.use_regression_token:
            out = x[:, 0, :]
        elif cfg.single_prediction:
            out = jnp.mean(x, axis=1)
        else:
            out = x
        return MLPHead(self.head_hidden_dim, name="mlp_head")(out, deterministic=not train)
