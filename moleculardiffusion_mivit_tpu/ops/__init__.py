from moleculardiffusion_mivit_tpu.ops.filters import (  # noqa: F401
    gaussian_kernel_1d,
    gaussian_filter_2d,
    difference_of_gaussians,
)
