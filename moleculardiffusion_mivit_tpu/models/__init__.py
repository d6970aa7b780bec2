"""Flax model zoo: the MiViT transformer family and ResNet comparison arms."""

from typing import Optional

import jax

from moleculardiffusion_mivit_tpu.config import ModelConfig
from moleculardiffusion_mivit_tpu.models.layers import (  # noqa: F401
    MAX_TOKENS,
    FeedForward,
    MLPHead,
    MultiHeadAttention,
    Transformer,
    TransformerEncoderLayerWithSkip,
    activation_by_name,
)
from moleculardiffusion_mivit_tpu.models.embeddings import (  # noqa: F401
    EMBEDDING_REGISTRY,
    CNNEmbedding,
    DeepResNetEmbedding,
    LinearProjectionEmbedding,
    ResidualBlock,
)
from moleculardiffusion_mivit_tpu.models.vit import (  # noqa: F401
    FeatureProjector,
    GeneralTransformer,
    HybridFusionTransformer,
    ModularTransformer,
)
from moleculardiffusion_mivit_tpu.models.resnet import (  # noqa: F401
    BasicBlock,
    LightResNet,
    MultiImageFeatureResNet,
    MultiImageResNet,
)


def param_count(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def get_transformer_models(config: ModelConfig, name_suffix: str = ""):
    """The three-embedding transformer set of the baseline experiment
    (tests/train_tests/trainSettings.py:180-239)."""
    return {
        f"linear_2layer{name_suffix}": GeneralTransformer(config, embedding="linear"),
        f"cnn_2layer{name_suffix}": GeneralTransformer(config, embedding="cnn"),
        f"deepcnn_2layer{name_suffix}": GeneralTransformer(config, embedding="deep_resnet"),
    }


def init_model(model, key, *example_inputs, train: bool = False):
    """Initialize a model returning ``(params, batch_stats)`` — batch_stats
    is an empty dict for models without BatchNorm."""
    variables = model.init(key, *example_inputs, train=train)
    return variables.get("params", {}), variables.get("batch_stats", {})


def apply_model(model, params, batch_stats, *inputs, train: bool = False, rngs=None):
    """Apply a model; returns ``(outputs, new_batch_stats)``."""
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if train:
        out, mutated = model.apply(
            variables, *inputs, train=True, mutable=["batch_stats"] if batch_stats else [],
            rngs=rngs,
        )
        return out, mutated.get("batch_stats", batch_stats)
    return model.apply(variables, *inputs, train=False), batch_stats
