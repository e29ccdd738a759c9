"""The pjit-compiled training step.

One function replaces the reference's Lightning training_step + DDP backward
+ AdamW/scheduler plumbing (reference: src/vilt/modules/vilt_module.py:
1467-1530, src/vilt/modules/vilt_utils.py:225-359): forward over the global
sharded batch, task dispatch in reference order, summed loss, grad, optax
update — all inside one compiled graph with XLA-inserted collectives.

Gradient accumulation (the reference's accumulate_grad_batches,
run.py:210-212) is a ``lax.scan`` over a leading micro-batch axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.spec import ModelSpec, Params
from . import objectives


@dataclasses.dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: jax.Array
    rng: jax.Array

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step, self.rng), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten)


def _resolve_pallas(cfg: Dict, spec: ModelSpec) -> bool:
    """pallas_attention=None ⇒ auto: the packed kernels (fwd + fused bwd)
    win TRAINING at image_len ≥ 577 (COCO irtr @384: 161.6 → 108.8 ms/step
    with remat, 91.7 without — tools/train_probe.py) and lose at @224
    shapes; eval CLIs always enable them explicitly."""
    flag = cfg.get("pallas_attention", None)
    if flag is None:
        return spec.image_len >= 577
    return bool(flag)


def _fast_rng(cfg: Dict, key: jax.Array) -> jax.Array:
    """Convert a raw threefry key to the configured training PRNG impl.

    With ``train_rng_impl="unsafe_rbg"`` every downstream
    ``jax.random.split`` / ``bernoulli`` lowers to the TPU hardware
    RngBitGenerator instead of threefry lane arithmetic — the per-block
    drop-path keys cost ~18 ms/step of VPU time at @224 B22 otherwise
    (tools/fwd224b_probe.py).  The checkpointed ``TrainState.rng`` stays a
    raw uint32 threefry key; conversion happens per step, so resume
    determinism and checkpoint layout are unchanged."""
    if cfg.get("train_rng_impl", "unsafe_rbg") != "unsafe_rbg":
        return key
    data = jnp.concatenate([key.astype(jnp.uint32)] * 2)       # (4,) uint32
    return jax.random.wrap_key_data(data, impl="unsafe_rbg")


def active_tasks(cfg: Dict) -> Tuple[str, ...]:
    """Tasks with loss weight ≥ 1 (reference vilt_utils.py:218-222)."""
    return tuple(k for k, v in cfg["loss_names"].items() if v >= 1)


def compute_losses(
    params: Params, spec: ModelSpec, cfg: Dict, batch: Dict,
    rng: jax.Array, *, train: bool = True,
    mim_label_fn: Optional[Callable] = None,
) -> Dict[str, jax.Array]:
    """Task dispatch in reference order (vilt_module.py:1467-1523)."""
    tasks = active_tasks(cfg)
    out: Dict[str, jax.Array] = {}
    keys = jax.random.split(rng, 12)

    def mim_labels(b):
        if mim_label_fn is not None:
            return mim_label_fn(b)
        return b["mim_labels"]

    # mixed single/multi-modal training: dict batch {"v":…, "l":…, "vl":…}
    if cfg["tasks"] is not None and any(k in batch for k in ("v", "l", "vl")):
        if "v" in batch and "image_only_mim" in tasks:
            out.update(objectives.compute_mim_image_only(
                params, spec, batch["v"], mim_labels=mim_labels(batch["v"]),
                train=train, rng=keys[0]))
        if "l" in batch and "text_only_mlm" in tasks:
            out.update(objectives.compute_mlm_text_only(
                params, spec, batch["l"], train=train, rng=keys[1]))
        if "vl" not in batch:
            return out
        batch = batch["vl"]

    if "mlm" in tasks:
        out.update(objectives.compute_mlm(
            params, spec, batch, vl_mlm_weight=cfg["vl_mlm_weight"],
            train=train, rng=keys[2]))
    if "mim" in tasks:
        out.update(objectives.compute_mim(
            params, spec, batch, mim_labels=mim_labels(batch),
            train=train, rng=keys[3]))
    if "ifm" in tasks:
        out.update(objectives.compute_ifm(
            params, spec, batch, ifm_weight=cfg["ifm_weight"],
            train=train, rng=keys[4]))
    if "irtr" in tasks:
        out.update(objectives.compute_irtr(
            params, spec, batch, train=train, rng=keys[5]))
    if "itm" in tasks:
        if "ifm_i2t_logits" not in out:
            raise ValueError(
                "itm requires ifm in loss_names: hard negatives are sampled "
                "from ifm's similarity logits (reference "
                "vilt_module.py:1509-1510)")
        out.update(objectives.compute_itm_hardneg(
            params, spec, batch, out["ifm_i2t_logits"], out["ifm_t2i_logits"],
            train=train, rng=keys[6]))
    if "vqa" in tasks:
        out.update(objectives.compute_vqa(
            params, spec, batch, train=train, rng=keys[7]))
    if "img_cls" in tasks:
        out.update(objectives.compute_img_cls(
            params, spec, batch, train=train, rng=keys[8]))
    if "nlvr2" in tasks:
        out.update(objectives.compute_nlvr2(
            params, spec, batch, train=train, rng=keys[9]))
    return out


# Contrastive losses carry the reference's DDP 1/world gradient factor
# (see objectives.py module docstring).
_DP_SCALED_LOSSES = ("ifm_loss", "irtr_loss")


def total_loss(out: Dict[str, jax.Array], dp_scale: float = 1.0) -> jax.Array:
    """Σ of every *_loss key (vilt_module.py:1525-1530)."""
    total = 0.0
    for k, v in out.items():
        if k.endswith("_loss"):
            total = total + (v * dp_scale if k in _DP_SCALED_LOSSES else v)
    return total


def scalar_metrics(out: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Keep scalars only (drop logits and other large aux arrays)."""
    return {k: v for k, v in out.items()
            if hasattr(v, "ndim") and v.ndim == 0}


def _device_mlm_batch(cfg: Dict, spec: ModelSpec, batch: Dict,
                      rng: jax.Array) -> Dict:
    """Derive text_ids_mlm / text_labels_mlm IN-GRAPH (device_mlm mode).

    The collator emitted an RNG-free word-boundary map (text_word_ids,
    -1 on special/pad); selection + 80/10/10 replacement run on-device
    (ops/text_masking.apply_mlm), so text masking compiles into the same
    XLA graph as the step (north star / SURVEY §7.6).  Mixed-task
    {"v","l","vl"} batches mask each sub-batch with its own prob
    (vl_mlm_prob for "vl" — MultiMTDataModule's host-side convention)."""
    from ..ops.text_masking import apply_mlm

    mask_id = cfg.get("mask_token_id")
    if mask_id is None:
        raise ValueError("device_mlm=True needs mask_token_id (the "
                         "Trainer resolves it from the tokenizer)")

    def one(b, key, prob):
        if not isinstance(b, dict) or "text_word_ids" not in b:
            return b
        wid = b["text_word_ids"]
        ids_mlm, labels = apply_mlm(
            b["text_ids"], wid < 0, key, prob, spec.vocab_size, mask_id,
            word_ids=wid if cfg["whole_word_masking"] else None)
        return dict(b, text_ids_mlm=ids_mlm, text_labels_mlm=labels)

    if any(t in batch for t in ("v", "l", "vl")):
        keys = jax.random.split(rng, len(batch))
        return {t: one(b, k,
                       cfg["vl_mlm_prob"] if t == "vl" else cfg["mlm_prob"])
                for (t, b), k in zip(batch.items(), keys)}
    return one(batch, rng, cfg["mlm_prob"])


def attach_augment_params(batch: Dict, cfg: Dict, rng) -> Dict:
    """HOST side of device_augment: sample every scalar random choice of
    the train image pipeline (crop boxes incl. torchvision's rejection
    loop, flip coins, RandAugment op ids/magnitudes) for each micro-batch
    and attach them as ``aug_*`` arrays; the pixel work happens in-graph
    (_device_augment_batch).  ``rng`` is a np.random.RandomState owned by
    the Trainer — one stream, deterministic under a fixed seed."""
    from ..ops.augment import sample_train_params

    def one(b):
        if not isinstance(b, dict) or "image_sizes" not in b:
            return b
        b = dict(b)
        params = sample_train_params(rng, b.pop("image_sizes"),
                                     cfg["image_size"])
        for k, v in params.items():
            b[f"aug_{k}"] = v
        return b

    if any(t in batch for t in ("v", "l", "vl")):
        return {t: one(b) for t, b in batch.items()}
    return one(batch)


def _device_augment_batch(cfg: Dict, batch: Dict) -> Dict:
    """Derive the normalized (B, 3, S, S) train image IN-GRAPH from the
    uint8 canvas + host-sampled aug params (device_augment mode — the
    image-side north star: resize, RandAugment, normalize compile into
    the same XLA graph as the step; SURVEY §7.5)."""
    from ..ops.augment import augment_train_batch

    def one(b):
        if not isinstance(b, dict) or "image_canvas" not in b:
            return b
        params = {k[4:]: v for k, v in b.items() if k.startswith("aug_")}
        img = augment_train_batch(b["image_canvas"], params,
                                  out_size=cfg["image_size"])
        rest = {k: v for k, v in b.items()
                if k != "image_canvas" and not k.startswith("aug_")}
        return dict(rest, image=img)

    if any(t in batch for t in ("v", "l", "vl")):
        return {t: one(b) for t, b in batch.items()}
    return one(batch)


def make_train_step(
    cfg: Dict, spec: ModelSpec, optimizer: optax.GradientTransformation,
    *, dp_scale: float = 1.0, accum_steps: int = 1,
    mim_label_fn: Optional[Callable] = None,
    donate: bool = True,
):
    """Build the jitted train step.

    With ``accum_steps > 1`` the batch must have a leading (accum, micro, …)
    layout; gradients are averaged over micro-steps before one optimizer
    update — semantics of Lightning's accumulate_grad_batches.
    """

    def loss_fn(params, batch, rng):
        from ..models.mome import pallas_attention

        if cfg.get("device_augment"):
            batch = _device_augment_batch(cfg, batch)
        if cfg.get("device_mlm"):
            rng, mrng = jax.random.split(rng)
            batch = _device_mlm_batch(cfg, spec, batch, mrng)
        with pallas_attention(_resolve_pallas(cfg, spec)):
            out = compute_losses(params, spec, cfg, batch,
                                 _fast_rng(cfg, rng), train=True,
                                 mim_label_fn=mim_label_fn)
        return total_loss(out, dp_scale), scalar_metrics(out)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def single_step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        rng, step_rng = jax.random.split(state.rng)
        if accum_steps == 1:
            (loss, metrics), grads = grad_fn(state.params, batch, step_rng)
        else:
            def micro(carry, xs):
                grads_acc, loss_acc = carry
                mb, key = xs
                (loss, metrics), grads = grad_fn(state.params, mb, key)
                grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss), metrics

            zero = jax.tree.map(jnp.zeros_like, state.params)
            keys = jax.random.split(step_rng, accum_steps)
            (grads, loss), metrics = jax.lax.scan(
                micro, (zero, 0.0), (batch, keys))
            grads = jax.tree.map(lambda g: g / accum_steps, grads)
            loss = loss / accum_steps
            metrics = jax.tree.map(lambda m: m[-1], metrics)

        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, total_loss=loss,
                       grad_norm=optax.global_norm(grads))
        return TrainState(params, opt_state, state.step + 1, rng), metrics

    return jax.jit(single_step, donate_argnums=(0,) if donate else ())


def make_eval_step(cfg: Dict, spec: ModelSpec,
                   mim_label_fn: Optional[Callable] = None):
    def eval_step(params, batch, rng):
        from ..models.mome import pallas_attention

        if cfg.get("device_mlm"):
            rng, mrng = jax.random.split(rng)
            batch = _device_mlm_batch(cfg, spec, batch, mrng)
        with pallas_attention(_resolve_pallas(cfg, spec)):
            out = compute_losses(params, spec, cfg, batch, rng,
                                 train=False, mim_label_fn=mim_label_fn)
        return scalar_metrics(out)
    return jax.jit(eval_step)


def init_train_state(params: Params,
                     optimizer: optax.GradientTransformation,
                     seed: int = 0) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(seed),
    )
