"""Training subsystem (capability the reference lacks; ships h5 releases only)."""
from .train import (  # noqa: F401
    TrainState,
    balanced_class_weights,
    evaluate,
    fit,
    init_train_state,
    load_checkpoint_build_kwargs,
    load_checkpoint_params,
    make_eval_step,
    make_lr_schedule,
    make_train_step,
    param_shardings,
    load_checkpoint_orbax,
    save_checkpoint,
    save_checkpoint_orbax,
)
