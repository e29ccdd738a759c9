from .core import (  # noqa: F401
    LAYER_ORDERS, merge_weights, sum_task_vectors, regmean, scale_gram,
    modalities_for_layer,
)
