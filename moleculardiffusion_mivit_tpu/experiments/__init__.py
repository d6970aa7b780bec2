"""Declarative experiment registry reproducing the reference regimes.

| name            | reference                               | arms |
|-----------------|------------------------------------------|------|
| baseline        | tests/train_tests/                       | 6 transformers + resnet |
| psfnoise        | Experiments/PSFNoise/ (published grid)   | 5×6×2 vmapped grids |
| framerate       | Experiments/Framerate/                   | 6 exposure pairs |
| embeddings      | Experiments/Embeddings/                  | 3 emb × 3 sizes + resnet |
| images_features | Experiments/ImagesFeatures/ (poster)     | 6 learned + 3 MSD arms |
| denoising       | Experiments/Denoising/                   | 7 settings × 2, L1 loss |
| modular         | models.py:366-593 (built, never trained)  | 3 ModularTransformer fusion arms |
"""

from moleculardiffusion_mivit_tpu.experiments import (  # noqa: F401
    baseline,
    denoising,
    embeddings,
    framerate,
    images_features,
    modular,
    psfnoise,
)
from moleculardiffusion_mivit_tpu.experiments.base import (  # noqa: F401
    Experiment,
    GridArm,
    ModelEntry,
    rotate_videos,
)

REGISTRY = {
    "baseline": baseline.build,
    "psfnoise": psfnoise.build,
    "framerate": framerate.build,
    "embeddings": embeddings.build,
    "images_features": images_features.build,
    "denoising": denoising.build,
    "modular": modular.build,
}


def get_experiment(name: str, **kwargs) -> Experiment:
    if name not in REGISTRY:
        raise KeyError(f"unknown experiment {name!r}; available: {sorted(REGISTRY)}")
    return REGISTRY[name](**kwargs)
