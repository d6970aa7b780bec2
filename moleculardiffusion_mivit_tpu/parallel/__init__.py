from moleculardiffusion_mivit_tpu.parallel.mesh import (  # noqa: F401
    grid_sharding,
    initialize_distributed,
    make_mesh,
    shard_grid,
)
from moleculardiffusion_mivit_tpu.parallel.steps import (  # noqa: F401
    make_sharded_cycle_program,
    make_sharded_grid_fns,
    make_sharded_grid_step,
)
