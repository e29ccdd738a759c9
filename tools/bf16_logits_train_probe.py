#!/usr/bin/env python
"""Gradient drift of the bf16-attention-logits TRAINING fast mode.

attention_logits_dtype="bf16" measured 147.5 vs 160.4 ms/step at @224 B22
pretrain (-8%).  The reference computes f32 logits even under AMP
(vision_transformer.py:346-355), so bf16 is opt-in; this probe bounds how
far it moves the training signal: per-leaf gradient cosine vs the f32
default on the same params/batch/rng.
"""

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np

from train_trace import _setup, _batch, _loss_fn  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    grads = {}
    for name, over in [("f32", {}),
                       ("bf16", {"attention_logits_dtype": "bf16"})]:
        cfg, spec, opt, state = _setup(over)
        loss_fn = _loss_fn(cfg, spec)

        @jax.jit
        def g(params, batch):
            return jax.grad(loss_fn)(params, batch, jax.random.PRNGKey(7))

        grads[name] = {k: np.asarray(v, np.float64)
                       for k, v in g(state.params, _batch(spec)).items()}
        del state, opt

    cos, worst = [], ("", 1.0)
    for k in grads["f32"]:
        a, b = grads["f32"][k].ravel(), grads["bf16"][k].ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            continue
        c = float(a @ b / (na * nb))
        cos.append(c)
        if c < worst[1]:
            worst = (k, c)
    cos = np.asarray(cos)
    print(f"leaves={len(cos)} median_cos={np.median(cos):.6f} "
          f"min_cos={cos.min():.6f} worst_leaf={worst[0]}")
    flat_a = np.concatenate([g.ravel() for g in grads['f32'].values()])
    flat_b = np.concatenate([g.ravel() for g in grads['bf16'].values()])
    gc = flat_a @ flat_b / (np.linalg.norm(flat_a) * np.linalg.norm(flat_b))
    print(f"global_grad_cos={gc:.6f}")


if __name__ == "__main__":
    main()
