"""dVAE encoder tests: structure + parity against a torch oracle built from
the published architecture (bottleneck blocks, post_gain residual)."""

import math
import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vl_merging_tpu.dvae import decoder
from vl_merging_tpu.dvae.encoder import (
    encoder_logits, get_codebook_indices, GROUP_COUNT)


def make_params(n_hid=8, n_blk=1, vocab=32, seed=0):
    """Random weights in the released checkpoint's naming scheme."""
    rng = np.random.RandomState(seed)
    params = {}

    def conv(name, cin, cout, k):
        params[f"{name}.w"] = (rng.randn(cout, cin, k, k) /
                               math.sqrt(cin * k * k)).astype(np.float32)
        params[f"{name}.b"] = rng.randn(cout).astype(np.float32) * 0.01

    conv("blocks.input", 3, n_hid, 7)
    widths = [n_hid, 2 * n_hid, 4 * n_hid, 8 * n_hid]
    cin = n_hid
    for g, w in enumerate(widths, start=1):
        for i in range(1, n_blk + 1):
            p = f"blocks.group_{g}.block_{i}"
            if cin != w:
                conv(f"{p}.id_path", cin, w, 1)
            hid = w // 4
            conv(f"{p}.res_path.conv_1", cin, hid, 3)
            conv(f"{p}.res_path.conv_2", hid, hid, 3)
            conv(f"{p}.res_path.conv_3", hid, hid, 3)
            conv(f"{p}.res_path.conv_4", hid, w, 1)
            cin = w
    conv("blocks.output.conv", 8 * n_hid, vocab, 1)
    return params


def torch_oracle(params, x, n_blk=1):
    """Literal torch transcription of the published encoder math."""
    t = {k: torch.from_numpy(v) for k, v in params.items()}

    def conv(name, h):
        w = t[f"{name}.w"]
        return F.conv2d(h, w, t[f"{name}.b"], padding=(w.shape[-1] - 1) // 2)

    post_gain = 1.0 / ((GROUP_COUNT * n_blk) ** 2)
    h = conv("blocks.input", torch.from_numpy(x))
    for g in range(1, GROUP_COUNT + 1):
        for i in range(1, n_blk + 1):
            p = f"blocks.group_{g}.block_{i}"
            idp = conv(f"{p}.id_path", h) if f"{p}.id_path.w" in t else h
            r = h
            for j in (1, 2, 3, 4):
                r = conv(f"{p}.res_path.conv_{j}", F.relu(r))
            h = idp + post_gain * r
        if g < GROUP_COUNT:
            h = F.max_pool2d(h, 2)
    return conv("blocks.output.conv", F.relu(h)).numpy()


def test_encoder_matches_torch_oracle():
    params = make_params()
    x = np.random.RandomState(1).rand(2, 3, 32, 32).astype(np.float32)
    x = 0.8 * x + 0.1  # map_pixels range
    want = torch_oracle(params, x)
    got = np.asarray(encoder_logits(
        {k: jnp.asarray(v) for k, v in params.items()},
        jnp.asarray(x), n_blk_per_group=1))
    assert got.shape == (2, 32, 4, 4)  # vocab, S/8
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_codebook_indices_shape():
    params = {k: jnp.asarray(v) for k, v in make_params().items()}
    x = jnp.asarray(np.random.rand(2, 3, 112, 112).astype(np.float32))
    # n_blk_per_group default is 2; our params have 1 block per group
    from vl_merging_tpu.dvae import encoder
    logits = encoder.encoder_logits(params, x, n_blk_per_group=1)
    idx = jnp.argmax(logits, axis=1).reshape(2, -1)
    assert idx.shape == (2, 14 * 14)
    assert int(idx.max()) < 32


def test_decoder_matches_reference_torch_decoder():
    """JAX decoder vs the ACTUAL reference dall_e.Decoder on random weights
    (reference src/dall_e/decoder.py)."""
    import sys

    ref_src = "/root/reference/src"
    if not os.path.isdir(os.path.join(ref_src, "dall_e")):
        pytest.skip("reference checkout not present")
    sys.path.insert(0, ref_src)
    try:
        from dall_e.decoder import Decoder
    finally:
        sys.path.remove(ref_src)

    vocab, n_init, n_hid, n_blk = 64, 8, 8, 1
    ref = Decoder(n_init=n_init, n_hid=n_hid, n_blk_per_group=n_blk,
                  vocab_size=vocab, use_mixed_precision=False,
                  requires_grad=False)
    # randomize (the pickled release ships trained weights; here any values)
    gen = torch.Generator().manual_seed(0)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
    params = {k: jnp.asarray(p.detach().numpy())
              for k, p in ref.named_parameters()}

    rng = np.random.RandomState(0)
    idx = rng.randint(0, vocab, (2, 4, 4))
    z = torch.nn.functional.one_hot(
        torch.from_numpy(idx), vocab).permute(0, 3, 1, 2).float()
    want = ref(z).detach().numpy()

    got = decoder.decoder_output(
        params, jnp.asarray(z.numpy()), n_blk_per_group=n_blk)
    assert got.shape == want.shape == (2, 6, 32, 32)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)

    # index→pixel convenience path
    px = decoder.decode_indices(params, jnp.asarray(idx), vocab_size=vocab,
                                n_blk_per_group=n_blk)
    assert px.shape == (2, 3, 32, 32)
    assert float(px.min()) >= 0.0 and float(px.max()) <= 1.0
    want_px = np.clip((torch.sigmoid(torch.from_numpy(want[:, :3])).numpy()
                       - 0.1) / 0.8, 0, 1)
    np.testing.assert_allclose(np.asarray(px), want_px, atol=2e-5)


def test_encoder_matches_reference_torch_encoder():
    """JAX encoder vs the ACTUAL reference dall_e.Encoder on random weights
    (reference src/dall_e/encoder.py; attrs validators require n_hid>=64,
    vocab>=512, so this is the smallest legal instantiation)."""
    import sys

    ref_src = "/root/reference/src"
    if not os.path.isdir(os.path.join(ref_src, "dall_e")):
        pytest.skip("reference checkout not present")
    sys.path.insert(0, ref_src)
    try:
        from dall_e.encoder import Encoder
    finally:
        sys.path.remove(ref_src)

    vocab, n_hid, n_blk = 512, 64, 1
    ref = Encoder(n_hid=n_hid, n_blk_per_group=n_blk, vocab_size=vocab,
                  use_mixed_precision=False, requires_grad=False)
    gen = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in ref.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
    params = {k: jnp.asarray(p.detach().numpy())
              for k, p in ref.named_parameters()}

    rng = np.random.RandomState(1)
    x = rng.rand(2, 3, 32, 32).astype(np.float32) * 0.8 + 0.1
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()         # B, vocab, 4, 4

    got = np.asarray(encoder_logits(params, jnp.asarray(x),
                                    n_blk_per_group=n_blk))
    assert got.shape == want.shape == (2, vocab, 4, 4)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-4)

    # argmax codebook ids agree wherever the top-2 logits aren't ulp-close
    want_idx = want.argmax(1).reshape(2, -1)
    got_idx = np.asarray(get_codebook_indices(
        params, jnp.asarray(x), n_blk_per_group=n_blk))
    agree = (want_idx == got_idx).mean()
    assert agree > 0.99, agree
