"""MolecularDiffusion-MiViT-TPU.

A TPU-native (JAX / XLA / Pallas / pjit) framework for estimating diffusion
coefficients of single fluorescent molecules from short microscopy image
sequences with Motion-Informed Vision Transformers (MiViT).

Re-designed from scratch with the capabilities of the reference project
``Biomedical-Imaging-Group/MolecularDiffusion_MiViT`` (PyTorch/NumPy, host
CPU data generation). The defining architectural change: synthetic data
generation (Brownian/fBm trajectory simulation + fluorescence PSF rendering +
noise) is a fused, batched, on-device XLA function that streams image
sequences straight into the jitted training step — eliminating the reference's
host-simulate-then-device-train gap — and the reference's "dict of dozens of
small models" becomes a vmapped model-grid axis sharded over a TPU mesh.

Subpackages
-----------
- ``config``      typed experiment / optics / training configuration
- ``sim``         trajectory simulators + fluorescence video renderers
- ``ops``         reusable numeric ops (pooling, filters, bounded LM fits, hulls)
- ``features``    25-dim trajectory feature extraction, MSD estimators
- ``models``      Flax model zoo (MiViT GeneralTransformer, ResNets, heads)
- ``train``       cycle-based training loops and vmapped model grids
- ``parallel``    mesh construction and sharded (pjit / shard_map) train steps
- ``evaluation``  frozen-validation loaders, in-order D sweeps, CSV export
- ``realdata``    TIFF IO, detection, linking, tracking, localization, inference
- ``denoise``     Richardson-Lucy + total-variation deconvolution
- ``experiments`` declarative specs reproducing the reference experiment regimes
- ``utils``       rng, checkpointing, metrics, profiling
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache: first compiles of the fused renderers are
# expensive through the TPU tunnel (minutes); every later process reuses them.
# Opt out with MIVIT_NO_COMPILE_CACHE=1.
if not _os.environ.get("MIVIT_NO_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "MIVIT_COMPILE_CACHE_DIR", _os.path.expanduser("~/.cache/jax")
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - older jax without these options
        pass

from moleculardiffusion_mivit_tpu import config  # noqa: F401
