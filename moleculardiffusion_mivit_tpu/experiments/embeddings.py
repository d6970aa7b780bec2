"""Embeddings size-sweep experiment (Experiments/Embeddings/).

Three embeddings × three sizes — normal (64/4/128/6), small (÷2 on embed dim,
heads, hidden, layers) and big (×2) — plus MultiImageResNet = 10 models
(trainSettingsEmbeddings.py:83-102), positional encoding ON (:35), baseline
optics, D classes [1,3,5,7]. The reference prints per-model parameter counts
(trainModelsEmbeddings.py:33-36); ``param_counts()`` provides the same.
"""

from __future__ import annotations

from moleculardiffusion_mivit_tpu.config import BASELINE_OPTICS, ModelConfig, TrainConfig
from moleculardiffusion_mivit_tpu.evaluation import (
    load_validation_trajectories,
    render_validation_videos,
)
from moleculardiffusion_mivit_tpu.experiments.base import Experiment, ModelEntry
from moleculardiffusion_mivit_tpu.models import GeneralTransformer, MultiImageResNet
from moleculardiffusion_mivit_tpu.train.loop import generate_cycle_data

SIZE_VARIANTS = {"_n": 1, "_s": 0.5, "_b": 2}
EMBEDDINGS = {"linear_2layer": "linear", "cnn_2layer": "cnn", "deepcnn_2layer": "deep_resnet"}


def build(
    seed: int = 0,
    sequences_per_d: int = 64,
    val_length: int = 30,
    val_d_values=(1.0, 3.0, 5.0, 7.0),
) -> Experiment:
    train_cfg = TrainConfig(
        seed=seed,
        sequences_per_d=sequences_per_d,
        training_ds=((1, 1), (3, 1), (5, 1), (7, 1)),
        n_frames=val_length,
    )
    base = ModelConfig(use_pos_encoding=True)
    optics = BASELINE_OPTICS

    def identity_slice(data):
        return data["videos"], None, data["labels"]

    arms = {}
    for suffix, scale in SIZE_VARIANTS.items():
        cfg = base.replace(
            embed_dim=int(base.embed_dim * scale),
            num_heads=max(int(base.num_heads * scale), 1),
            hidden_dim=int(base.hidden_dim * scale),
            num_layers=max(int(base.num_layers * scale), 1),
        )
        for key_name, emb in EMBEDDINGS.items():
            arms[key_name + suffix] = ModelEntry(
                model=GeneralTransformer(cfg, embedding=emb), slice_fn=identity_slice
            )
    arms["resnet"] = ModelEntry(model=MultiImageResNet(), slice_fn=identity_slice)

    def generate_fn(key):
        videos, labels, _ = generate_cycle_data(key, train_cfg, optics)
        return {"videos": videos, "labels": labels}

    trajs = load_validation_trajectories(length=val_length)
    rendered = render_validation_videos(trajs, train_cfg, optics)
    val_data = {
        d: {"videos": rendered[f"val{d:g}"], "labels": None}
        for d in val_d_values
        if f"val{d:g}" in rendered
    }
    return Experiment("embeddings", train_cfg, optics, arms, generate_fn, val_data)


def param_counts(exp: Experiment):
    """Per-model learnable parameter counts (the reference prints these,
    trainModelsEmbeddings.py:33-36)."""
    from moleculardiffusion_mivit_tpu.models import param_count

    if not exp._built:
        exp.build()
    return {name: param_count(exp.states[name].params) for name in exp.states}
