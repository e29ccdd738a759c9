from .attention import fused_attention, reference_attention  # noqa: F401
from .mlp import fused_mlp, reference_mlp  # noqa: F401
