"""Optimizer with the reference's 4 param groups.

(decay, no-decay) × (base-lr, head-lr·lr_mult) — reference
src/vilt/modules/vilt_utils.py:225-321.  no-decay = biases + every
LayerNorm flavor (incl. per-expert norms); head groups = downstream
classifiers plus optional expert subsets (all_{mlp,vl,v,l}_mult), with
their own weight_decay_custom_modules.

Built as an optax chain equivalent to torch AdamW's update:
  p ← p − group_lr · (adam_dir + wd_group · p)
"""

from __future__ import annotations

from typing import Callable, Dict

import optax

from ..models.spec import Params

NO_DECAY_SUBSTRINGS = (
    "bias",
    "LayerNorm.bias", "LayerNorm.weight",
    "norm.bias", "norm.weight",
    "norm1.bias", "norm1.weight",
    "norm2.bias", "norm2.weight",
    "norm.v.bias", "norm.v.weight",
    "norm.l.bias", "norm.l.weight",
    "norm.vl.bias", "norm.vl.weight",
)


def head_names(cfg: Dict) -> tuple:
    names = ["vqa_classifier", "nlvr2_classifier", "img_cls_classifier"]
    if cfg["all_mlp_mult"]:
        names.append("mlp")
    if cfg["all_vl_mult"]:
        names += ["attn.vl", "mlp.vl", "mlp_vl"]
    if cfg["all_v_mult"]:
        names += ["attn.v", "mlp.v"]
    if cfg["all_l_mult"]:
        names += ["attn.l", "mlp.l"]
    return tuple(names)


def is_no_decay(name: str) -> bool:
    return any(nd in name for nd in NO_DECAY_SUBSTRINGS)


def param_masks(params: Params, cfg: Dict) -> Dict[str, Dict[str, bool]]:
    heads = head_names(cfg)

    def is_head(name):
        return any(h in name for h in heads)

    return {
        "decay_base": {k: (not is_no_decay(k)) and (not is_head(k))
                       for k in params},
        "decay_head": {k: (not is_no_decay(k)) and is_head(k) for k in params},
        "head": {k: is_head(k) for k in params},
    }


def _masked_weight_decay(weight_decay: float, mask: Dict[str, bool]):
    return optax.add_decayed_weights(weight_decay, mask=lambda p: mask)


def _scale_selected(mult: float, mask: Dict[str, bool]):
    def update_fn(updates, state, params=None):
        new = {k: (u * mult if mask[k] else u) for k, u in updates.items()}
        return new, state
    return optax.GradientTransformation(lambda p: optax.EmptyState(),
                                        update_fn)


def make_optimizer(params: Params, cfg: Dict, max_steps: int,
                   schedule_fn: Callable) -> optax.GradientTransformation:
    masks = param_masks(params, cfg)
    lr_mult = float(cfg["lr_mult"])

    if cfg["optim_type"] == "adamw":
        core = optax.scale_by_adam(b1=0.9, b2=cfg["beta_2"], eps=1e-8)
    elif cfg["optim_type"] == "adam":
        core = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    elif cfg["optim_type"] == "sgd":
        core = optax.trace(decay=0.9)
    else:
        raise ValueError(f"unknown optim_type {cfg['optim_type']!r}")

    chain = [core]
    if cfg["optim_type"] == "adamw":
        chain.append(_masked_weight_decay(cfg["weight_decay"],
                                          masks["decay_base"]))
        chain.append(_masked_weight_decay(cfg["weight_decay_custom_modules"],
                                          masks["decay_head"]))
    chain.append(optax.scale_by_schedule(lambda s: -schedule_fn(s)))
    if lr_mult != 1.0:
        chain.append(_scale_selected(lr_mult, masks["head"]))
    return optax.chain(*chain)
