from .encoder import (  # noqa: F401
    encoder_logits, get_codebook_indices, load_encoder_params,
    make_mim_label_fn, VOCAB_SIZE,
)
