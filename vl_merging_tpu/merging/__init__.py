from .core import (  # noqa: F401
    LAYER_ORDERS, merge_weights, sum_task_vectors, regmean, scale_gram,
    modalities_for_layer,
)
from .device import (  # noqa: F401
    merge_weights_device, ratio_sweep, regmean_device, stack_checkpoints,
    sum_task_vectors_device,
)
