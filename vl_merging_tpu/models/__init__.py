from .spec import (  # noqa: F401
    BlockSpec, ModelSpec, Params, make_model_spec, param_shapes, init_params,
    V, L, VL,
)
from . import model, mome, relpos, layers  # noqa: F401
