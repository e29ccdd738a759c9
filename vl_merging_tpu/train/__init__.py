from . import objectives, optimizer, schedule, train_step  # noqa: F401
from .train_step import (  # noqa: F401
    TrainState, make_train_step, make_eval_step, init_train_state,
    compute_losses, total_loss, active_tasks,
)
from .optimizer import make_optimizer, param_masks  # noqa: F401
from .schedule import make_schedule, resolve_warmup_steps  # noqa: F401
