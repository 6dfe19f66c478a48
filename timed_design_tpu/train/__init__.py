"""Training subsystem (capability the reference lacks; ships h5 releases only)."""
from .train import (  # noqa: F401
    TrainState,
    fit,
    init_train_state,
    load_checkpoint_params,
    make_train_step,
    param_shardings,
    load_checkpoint_orbax,
    save_checkpoint,
    save_checkpoint_orbax,
)
