from .io import (  # noqa: F401
    load_torch_checkpoint, save_torch_checkpoint, state_dict_to_params,
    params_to_state_dict,
)
from .surgery import (  # noqa: F401
    modify_checkpoint_vlmo, modify_checkpoint_beit, modify_checkpoint_self,
    insert_expert_names, clone_vision_weights,
)
from .pipeline import load_params, adapt_state_dict, apply_merging  # noqa: F401
from .bicubic import bicubic_resize  # noqa: F401
