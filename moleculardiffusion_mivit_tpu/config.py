"""Typed configuration for simulation, models and training.

The reference uses "Python module as config": each experiment directory holds
a ``trainSettings*.py`` with ~50 duplicated constant lines plus an
``image_props`` dict whose keyword contract is documented at
``helpers/helpersGeneration.py:148-182``. Here that contract becomes frozen
(hashable) dataclasses usable directly as static arguments to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class OpticsConfig:
    """Optical / camera model for fluorescence video rendering.

    Field semantics mirror the ``image_props`` contract of the reference
    (helpers/helpersGeneration.py:205-222 defaults), including two quirks that
    we reproduce *as implemented* for output parity:

    - ``fwhm_psf = wavelength / 2 * NA / psf_division_factor`` — i.e. the
      Python-precedence reading ``(wavelength/2)*NA/psf_div`` of the intended
      Abbe limit λ/(2·NA) (helpersGeneration.py:239).
    - The high-resolution render grid is ``linspace(-limit, limit, S*u)`` with
      ``limit=(S*u-1)//2`` (helpersGeneration.py:90-93), which has exactly
      unit spacing only when ``S*u`` is odd (all reference experiments use odd
      patch sizes 9/13 with u=5).
    """

    particle_intensity: Tuple[float, float] = (500.0, 20.0)  # mean, std
    na: float = 1.46
    wavelength: float = 500e-9
    psf_division_factor: float = 1.0
    resolution: float = 100e-9  # effective pixel size in meters
    output_size: int = 32
    upsampling_factor: int = 5
    background_intensity: Tuple[float, float] = (100.0, 10.0)  # mean, std
    poisson_noise: float = 100.0  # -1 disables; multiplicative Pois(k)/k
    trajectory_unit: float = 100.0  # nm per trajectory unit; -1 = pixels

    @property
    def fwhm_psf(self) -> float:
        # Reproduces helpersGeneration.py:239 precedence exactly.
        return self.wavelength / 2 * self.na / self.psf_division_factor

    @property
    def gaussian_sigma_hr(self) -> float:
        """PSF sigma in high-resolution grid pixels (helpersGeneration.py:242)."""
        return self.upsampling_factor / self.resolution * self.fwhm_psf / 2.355

    @property
    def pixels_per_unit(self) -> float:
        """Trajectory-unit → pixel conversion factor (helpersGeneration.py:229-231)."""
        if self.trajectory_unit == -1:
            return 1.0
        return self.trajectory_unit / (self.resolution * 1e9)

    def replace(self, **kw) -> "OpticsConfig":
        return dataclasses.replace(self, **kw)


# The optics used by the baseline train_tests experiment
# (tests/train_tests/trainSettings.py:56-77): real-data-derived intensities.
BASELINE_OPTICS = OpticsConfig(
    particle_intensity=(6000.0 - 1420.0, 500.0),
    psf_division_factor=1.3,
    output_size=9,
    background_intensity=(1420.0, 290.0),
    poisson_noise=100.0,
    trajectory_unit=1200.0,
)

# PSFNoise experiment optics (Experiments/PSFNoise/trainSettingsPSFNoise.py:64-85).
PSFNOISE_OPTICS = OpticsConfig(
    particle_intensity=(5000.0, 500.0),
    psf_division_factor=1.3,
    output_size=9,
    background_intensity=(5000.0, 0.0),
    poisson_noise=100.0,
    trajectory_unit=1200.0,
)

# Framerate experiment optics (Experiments/Framerate/trainSettingsFramerate.py:61-81).
FRAMERATE_OPTICS = OpticsConfig(
    particle_intensity=(6000.0 - 1420.0, 500.0),
    psf_division_factor=1.3,
    output_size=13,
    background_intensity=(1420.0, 290.0),
    poisson_noise=100.0,
    trajectory_unit=1200.0,
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters shared by the MiViT transformer family.

    Defaults mirror tests/train_tests/trainSettings.py:41-46.
    """

    patch_size: int = 9
    embed_dim: int = 64
    num_heads: int = 4
    hidden_dim: int = 128
    num_layers: int = 6
    dropout: float = 0.0
    activation: str = "relu"  # relu | leaky_relu | gelu
    use_pos_encoding: bool = False
    use_regression_token: bool = True
    single_prediction: bool = True
    max_tokens: int = 128  # helpers/models.py:8

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Cycle-based training schedule (tests/train_tests/trainModels.py:25-44).

    ``adaptive_batch_size``: the batch size starts at ``initial_batch_size``
    and doubles every ``adaptive_batch_size`` cycles (arXiv:1712.02029, cited
    at trainModels.py:105); -1 disables doubling and uses
    ``fixed_batch_size``.
    """

    num_cycles: int = 100
    sequences_per_d: int = 64
    training_ds: Tuple[Tuple[float, float], ...] = ((1, 1), (3, 1), (5, 1), (7, 1))
    lr: float = 1e-4
    weight_decay: float = 0.01  # torch AdamW default, used by reference optimizers
    lr_step_cycles: int = 5  # StepLR(step_size=5, gamma=0.9)
    lr_gamma: float = 0.9
    adaptive_batch_size: int = 20
    initial_batch_size: int = 1
    fixed_batch_size: int = 16
    # Ceiling for the doubling schedule. The reference's 100-cycle protocol
    # tops out at 16 (trainModels.py:102-108); runs longer than 100 cycles
    # would otherwise double unboundedly (batch 128 at cycle 140 OOMs the
    # 30-model PSFNoise grid on one chip). 0 = uncapped.
    max_batch_size: int = 64
    d_max_normalization: float = 10.0
    n_frames: int = 30
    n_pos_per_frame: int = 10
    traj_div_factor: float = 100.0
    center: bool = True
    loss: str = "mse"  # mse | l1 (Denoising experiment uses l1)
    sequence_mode: bool = False  # per-frame predictions/labels (sequences=True)
    mix_trajectories: bool = False  # sequence-mode tail-swap augmentation
    # lax.scan unroll factor for the per-epoch minibatch loop. >1 replicates
    # the step body so XLA amortizes loop overhead across consecutive
    # optimizer steps — a lever on the batch-1 regime, whose critical path is
    # hundreds of sequential tiny steps. Must divide into the step count
    # cleanly for best effect; 1 = plain scan.
    scan_unroll: int = 1
    # Training compute dtype: "float32" (default — full-precision activations
    # and parameters in the forward/backward) or "bfloat16" (mixed precision:
    # f32 master params + optimizer state; params and minibatch inputs are
    # cast to bf16 inside the loss so activations/gradient intermediates run
    # and travel HBM at half width; the loss and the gradients ACCUMULATED
    # into the f32 master copy stay f32 via the cast transpose). Note JAX
    # already rounds matmul operands to bf16 at default precision — this
    # lever halves the HBM traffic of everything AROUND the MXU ops.
    compute_dtype: str = "float32"
    seed: int = 0

    @property
    def total_steps_hint(self) -> int:
        n_seq = self.sequences_per_d * len(self.training_ds)
        return self.num_cycles * n_seq

    def batch_size_for_cycle(self, cycle: int) -> int:
        if self.adaptive_batch_size == -1:
            return self.fixed_batch_size
        bs = self.initial_batch_size * (2 ** (cycle // self.adaptive_batch_size))
        return min(bs, self.max_batch_size) if self.max_batch_size else bs

    def lr_for_cycle(self, cycle: int) -> float:
        return self.lr * (self.lr_gamma ** (cycle // self.lr_step_cycles))

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout for multi-chip training.

    The scaling dimensions of this workload are ``data`` (batch of generated
    sequences) and ``model`` (the grid of small independent models, e.g. the
    5×6×2 PSFNoise grid). Sequence length is ≤61 tokens so no sequence
    parallelism is needed (reference MAX_TOKENS=128, helpers/models.py:8).
    """

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = 1
    model_parallel: int = 1

    @property
    def shape(self):
        return {self.data_axis: self.data_parallel, self.model_axis: self.model_parallel}
