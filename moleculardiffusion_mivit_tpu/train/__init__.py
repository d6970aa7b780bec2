from moleculardiffusion_mivit_tpu.train.loop import (  # noqa: F401
    TrainState,
    generate_cycle_data,
    make_optimizer,
    make_train_fns,
    make_train_impls,
    run_training,
)
from moleculardiffusion_mivit_tpu.train.grid import (  # noqa: F401
    ModelGrid,
    make_grid_impls,
    make_grid_train_fns,
)
from moleculardiffusion_mivit_tpu.train.multi import (  # noqa: F401
    detect_activation_stacks,
    make_multi_cycle,
    make_scanned_multi_cycle,
)
