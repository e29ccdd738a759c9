"""From-scratch gumbel DiscreteVAE vs the EXECUTED reference class.

Extracts ``BasicVAE``/``ResBlock``/``DiscreteVAE`` (and the module-level
helpers) from reference modeling_discrete_vae.py:19-203 via ast — the module
itself can't be imported (it does ``from dall_e import load_model`` at
import time and dall_e isn't installed) — instantiates the real torch
module at tiny dims, copies its state_dict into the JAX params, and checks
logits / indices / decode / loss parity.  Gumbel noise is injected into
both sides (a deterministic ``F.gumbel_softmax`` shim on the torch side)
so the stochastic path is compared exactly.
"""

import ast
import math
import os
from math import sqrt

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF
from einops import rearrange
from torch import einsum, nn

from vl_merging_tpu.dvae import discrete

REF = "/root/reference/src/vilt/modules/modeling_discrete_vae.py"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference checkout not present")


class _FShim:
    """torch.nn.functional with a deterministic gumbel_softmax.

    ``noise`` is fixed per-test; semantics otherwise mirror
    torch.nn.functional.gumbel_softmax exactly (softmax((logits+g)/tau),
    optional straight-through hard one-hot)."""

    def __init__(self):
        self.noise = None

    def gumbel_softmax(self, logits, tau=1.0, hard=False, dim=-1):
        y = ((logits + self.noise) / tau).softmax(dim)
        if hard:
            idx = y.max(dim, keepdim=True)[1]
            y_hard = torch.zeros_like(y).scatter_(dim, idx, 1.0)
            y = y_hard - y.detach() + y
        return y

    def __getattr__(self, name):
        return getattr(TF, name)


def _load_reference_classes():
    with open(REF) as f:
        tree = ast.parse(f.read())
    wanted = []
    for node in tree.body:
        if isinstance(node, ast.FunctionDef) and node.name in (
                "top_k", "exists", "default", "eval_decorator"):
            wanted.append(node)
        if isinstance(node, ast.ClassDef) and node.name in (
                "BasicVAE", "ResBlock", "DiscreteVAE"):
            wanted.append(node)
    fshim = _FShim()
    ns = {"torch": torch, "nn": nn, "F": fshim, "einsum": einsum,
          "rearrange": rearrange, "sqrt": sqrt, "os": os}
    exec(compile(ast.Module(body=wanted, type_ignores=[]), REF, "exec"), ns)
    return ns["DiscreteVAE"], fshim


CFG = dict(image_size=16, num_tokens=12, codebook_dim=6, num_layers=2,
           hidden_dim=5, channels=3)


def _pair(seed=0, **over):
    """(torch module, jax params, jax cfg) with identical weights."""
    kw = dict(CFG, **over)
    DiscreteVAE, fshim = _load_reference_classes()
    torch.manual_seed(seed)
    mod = DiscreteVAE(**kw)
    mod.eval()
    params = {k: jnp.asarray(v.detach().numpy())
              for k, v in mod.state_dict().items()}
    cfg = discrete.DiscreteVAEConfig(**kw)
    return mod, fshim, params, cfg


def _img(seed=1, b=2):
    rng = np.random.RandomState(seed)
    return rng.randn(b, 3, CFG["image_size"], CFG["image_size"]) \
        .astype(np.float32)


def test_param_naming_matches_reference_state_dict():
    mod, _, _, cfg = _pair()
    ours = discrete.init_discrete_vae_params(cfg, seed=0)
    assert set(ours) == set(mod.state_dict().keys())
    for k, v in mod.state_dict().items():
        assert tuple(ours[k].shape) == tuple(v.shape), k


def test_encoder_logits_and_indices_parity():
    mod, _, params, cfg = _pair()
    x = _img()
    with torch.no_grad():
        want = mod(torch.from_numpy(x), return_logits=True).numpy()
    got = np.asarray(discrete.forward(params, jnp.asarray(x), cfg,
                                      return_logits=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

    want_idx = mod.get_codebook_indices(torch.from_numpy(x)).numpy()
    got_idx = np.asarray(discrete.get_codebook_indices(
        params, jnp.asarray(x), cfg))
    np.testing.assert_array_equal(got_idx, want_idx)

    want_p = mod.get_codebook_probs(torch.from_numpy(x)).numpy()
    got_p = np.asarray(discrete.get_codebook_probs(
        params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got_p, want_p, rtol=2e-5, atol=2e-6)


def test_decode_parity():
    mod, _, params, cfg = _pair()
    rng = np.random.RandomState(3)
    # spatial tokens after num_layers=2 halvings: (16/4)² = 16
    seq = rng.randint(0, CFG["num_tokens"], (2, 16))
    with torch.no_grad():
        want = mod.decode(torch.from_numpy(seq)).numpy()
    got = np.asarray(discrete.decode(params, jnp.asarray(seq), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("smooth_l1,straight_through,klw", [
    (False, False, 0.0),
    (True, False, 0.5),
    (False, True, 0.0),
])
def test_forward_loss_parity(smooth_l1, straight_through, klw):
    mod, fshim, params, cfg = _pair(
        smooth_l1_loss=smooth_l1, straight_through=straight_through,
        kl_div_loss_weight=klw)
    x = _img(seed=4)
    noise = np.random.RandomState(5).gumbel(
        size=(2, CFG["num_tokens"], 4, 4)).astype(np.float32)
    fshim.noise = torch.from_numpy(noise)
    with torch.no_grad():
        want_loss, want_out = mod(torch.from_numpy(x), return_loss=True,
                                  return_recons=True)
    got_loss, got_out = discrete.forward(
        params, jnp.asarray(x), cfg, noise=jnp.asarray(noise),
        return_loss=True, return_recons=True)
    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_out), want_out.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_forward_temp_override_and_recons_only():
    mod, fshim, params, cfg = _pair()
    x = _img(seed=6)
    noise = np.random.RandomState(7).gumbel(
        size=(2, CFG["num_tokens"], 4, 4)).astype(np.float32)
    fshim.noise = torch.from_numpy(noise)
    with torch.no_grad():
        want = mod(torch.from_numpy(x), temp=0.4).numpy()
    got = np.asarray(discrete.forward(params, jnp.asarray(x), cfg,
                                      noise=jnp.asarray(noise), temp=0.4))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gradients_flow_including_straight_through():
    """Training usability: d(loss)/d(params) finite and nonzero for the
    codebook even with the hard straight-through estimator."""
    _, _, params, cfg = _pair(straight_through=True, kl_div_loss_weight=0.1)
    x = jnp.asarray(_img(seed=8))

    def loss_fn(p, key):
        return discrete.forward(p, x, cfg, rng=key, return_loss=True)

    g = jax.grad(loss_fn)(params, jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert float(jnp.abs(g["codebook.weight"]).max()) > 0
    assert float(jnp.abs(g["encoder.0.0.weight"]).max()) > 0


def test_image_tokens_size_quirk():
    """Reference hardcodes //8 even when num_layers≠3
    (modeling_discrete_vae.py:129-133) — quirk preserved."""
    _, _, _, cfg = _pair()
    assert cfg.get_image_size() == 16
    assert cfg.get_image_tokens_size() == 2  # 16//8, NOT 16//4
