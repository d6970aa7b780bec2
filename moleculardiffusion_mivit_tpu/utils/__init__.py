from moleculardiffusion_mivit_tpu.utils.aot_cache import cached_compile  # noqa: F401
from moleculardiffusion_mivit_tpu.utils.checkpoint import (  # noqa: F401
    restore_experiment,
    restore_pytree,
    save_experiment,
    save_pytree,
)
from moleculardiffusion_mivit_tpu.utils.flops import (  # noqa: F401
    compiled_flops,
    device_peak_flops,
    grid_cycle_flops,
    multi_cycle_flops,
    utilization,
)
from moleculardiffusion_mivit_tpu.utils.metrics import MetricsLogger  # noqa: F401
from moleculardiffusion_mivit_tpu.utils.profiling import profile_trace, time_block  # noqa: F401
