from .attention import fused_attention, reference_attention  # noqa: F401
