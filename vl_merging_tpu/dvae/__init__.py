from .encoder import (  # noqa: F401
    encoder_logits, get_codebook_indices, load_encoder_params,
    make_mim_label_fn, VOCAB_SIZE,
)
from .decoder import (  # noqa: F401
    decoder_output, decode_indices, load_decoder_params, unmap_pixels,
)
from .discrete import (  # noqa: F401
    DiscreteVAEConfig, init_discrete_vae_params,
)
