"""Training objectives as pure functions over the global (sharded) batch.

Reimplements reference src/vilt/modules/objectives.py for SPMD execution:
losses are written over the *global* batch inside ``jit``; with batches
sharded over the mesh's data axis, XLA inserts exactly the collectives the
reference issues by hand (`dist.all_gather` of contrastive features and
hard-negative candidates, objectives.py:161-314, 382-409).

Gradient-scale parity note: the reference computes the full-batch
contrastive loss on every rank but backprops only through local features,
then DDP *averages* gradients — so its effective ifm/irtr gradient equals
grad(L_full) / world_size, while per-sample losses (mlm, itm, ...) match
the global mean exactly.  ``dp_scale`` reproduces that 1/world factor for
the contrastive terms (pass dp_scale = 1/num_data_shards; see train_step).

Dynamic-shape ops in the reference (boolean indexing of masked patches,
per-sample python loops) become masked dense reductions — identical math,
static shapes.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models import model
from ..models.spec import ModelSpec, Params


def _ce_ignore_index(
    logits: jax.Array, labels: jax.Array, ignore: int = -100,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Cross-entropy with ignore_index semantics (mean over valid targets).

    Returns (loss, correct_count, valid_count)."""
    valid = labels != ignore
    safe = jnp.where(valid, labels, 0)
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    loss = nll.sum() / count
    correct = ((jnp.argmax(logits, -1) == safe) & valid).sum()
    return loss, correct, valid.sum()


def _ce_dense(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Plain mean cross-entropy with integer labels (f32 logits)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


# --------------------------------------------------------------------------
# MLM (objectives.py:88-143)
# --------------------------------------------------------------------------

def compute_mlm(params: Params, spec: ModelSpec, batch, *,
                vl_mlm_weight: float = 1.0, train=False, rng=None) -> Dict:
    infer = model.infer(params, spec, batch, mask_text=True, train=train,
                        rng=rng)
    logits = model.mlm_head(params, infer["text_feats"])
    loss, correct, count = _ce_ignore_index(logits, infer["text_labels"])
    return {"mlm_loss": loss * vl_mlm_weight,
            "mlm_correct": correct, "mlm_count": count}


def compute_mlm_text_only(params, spec, batch, *, train=False,
                          rng=None) -> Dict:
    infer = model.infer_text_ft(params, spec, batch, mask_text=True,
                                train=train, rng=rng)
    logits = model.mlm_head(params, infer["text_feats"])
    loss, correct, count = _ce_ignore_index(logits, infer["text_labels"])
    return {"text_only_mlm_loss": loss,
            "text_only_mlm_correct": correct, "text_only_mlm_count": count}


# --------------------------------------------------------------------------
# MIM (objectives.py:18-85) — masked dense CE instead of boolean gather
# --------------------------------------------------------------------------

def _mim_loss(params, spec, image_feats, mim_labels, masked_pos):
    """CE over dVAE codebook at masked patches: masked mean, static shapes."""
    logits = model.mim_head(params, image_feats[:, 1:])      # B, P, 8192
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, mim_labels[..., None], axis=-1)[..., 0]
    m = masked_pos.astype(jnp.float32)
    count = jnp.maximum(m.sum(), 1.0)
    loss = (nll * m).sum() / count
    correct = ((jnp.argmax(logits, -1) == mim_labels) * masked_pos).sum()
    return loss, correct, m.sum()


def compute_mim(params, spec, batch, *, mim_labels, train=False,
                rng=None) -> Dict:
    """mim_labels: (B, num_patches) dVAE codebook ids of the target view
    (computed by the dVAE encoder; reference objectives.py:27-29)."""
    masked = batch["image_masked_pos"].astype(bool)
    infer = model.infer(params, spec, batch, mask_image=True,
                        bool_masked_pos=masked, train=train, rng=rng)
    loss, correct, count = _mim_loss(params, spec, infer["image_feats"],
                                     mim_labels, masked)
    return {"mim_loss": loss, "mim_correct": correct, "mim_count": count}


def compute_mim_image_only(params, spec, batch, *, mim_labels, train=False,
                           rng=None) -> Dict:
    masked = batch["image_masked_pos"].astype(bool)
    infer = model.infer_image_ft(params, spec, batch,
                                 bool_masked_pos=masked, train=train, rng=rng)
    loss, correct, count = _mim_loss(params, spec, infer["image_feats"],
                                     mim_labels, masked)
    return {"image_only_mim_loss": loss, "image_only_mim_correct": correct,
            "image_only_mim_count": count}


# --------------------------------------------------------------------------
# Contrastive (ifm, objectives.py:248-369; irtr, :372-443)
# --------------------------------------------------------------------------

def _info_nce(image_feats, text_feats, logit_scale) -> Tuple[jax.Array, ...]:
    """Symmetric InfoNCE over the global batch; f32 logits."""
    logits_i2t = logit_scale * (image_feats @ text_feats.T).astype(jnp.float32)
    logits_t2i = logits_i2t.T
    labels = jnp.arange(image_feats.shape[0])
    loss = 0.5 * (_ce_dense(logits_i2t, labels) + _ce_dense(logits_t2i, labels))
    return loss, logits_i2t, logits_t2i, labels


def compute_ifm(params, spec, batch, *, ifm_weight: float = 1.0, train=False,
                rng=None) -> Dict:
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    infer_imag = model.infer_image(params, spec, batch, train=train, rng=r1)
    infer_text = model.infer_text(params, spec, batch, train=train, rng=r2)

    scale = jnp.exp(params["logit_scale"])
    vl_scale = jnp.exp(params["logit_vl_scale"])

    loss_b, i2t, t2i, labels = _info_nce(
        infer_imag["cls_feats"], infer_text["cls_feats"], scale)
    loss_vl, vl_i2t, vl_t2i, _ = _info_nce(
        infer_imag["cls_vlffn_feats"], infer_text["cls_vlffn_feats"], vl_scale)

    total = (ifm_weight * loss_b + loss_vl) * 0.5
    n = labels.shape[0]
    return {
        "ifm_loss": total,
        "ifm_i2t_logits": i2t, "ifm_t2i_logits": t2i,
        "ifm_i2t_correct": (jnp.argmax(i2t, -1) == labels).sum(),
        "ifm_i2t_count": n,
        "ifm_t2i_correct": (jnp.argmax(t2i, -1) == labels).sum(),
        "ifm_t2i_count": n,
        "ifm_vl_i2t_correct": (jnp.argmax(vl_i2t, -1) == labels).sum(),
        "ifm_vl_i2t_count": n,
        "ifm_vl_t2i_correct": (jnp.argmax(vl_t2i, -1) == labels).sum(),
        "ifm_vl_t2i_count": n,
        "ifm_logit_scale": scale,
        "ifm_logit_vl_scale": vl_scale,
    }


def compute_irtr(params, spec, batch, *, train=False, rng=None) -> Dict:
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    infer_imag = model.infer_image_ft(params, spec, batch, train=train, rng=r1)
    infer_text = model.infer_text_ft(params, spec, batch, train=train, rng=r2)
    scale = jnp.exp(params["logit_scale"])
    loss, i2t, t2i, labels = _info_nce(
        infer_imag["cls_feats"], infer_text["cls_feats"], scale)
    n = labels.shape[0]
    return {
        "irtr_loss": loss,
        "irtr_i2t_correct": (jnp.argmax(i2t, -1) == labels).sum(),
        "irtr_i2t_count": n,
        "irtr_t2i_correct": (jnp.argmax(t2i, -1) == labels).sum(),
        "irtr_t2i_count": n,
        "irtr_logit_scale": scale,
    }


# --------------------------------------------------------------------------
# ITM with global hard negatives (objectives.py:146-245)
# --------------------------------------------------------------------------

def compute_itm_hardneg(params, spec, batch, sim_i2t, sim_t2i, *,
                        train=False, rng=None) -> Dict:
    """Hard-negative mining over the global batch.

    The reference all_gathers raw images + text across ranks and samples
    negatives with multinomial(softmax(sim), diag=0) (objectives.py:161-218).
    Here the batch already *is* global under jit; the XLA gather of
    negative rows induces the same cross-device communication.
    """
    bsz = batch["text_ids"].shape[0]
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    r_inf, r_i, r_t, r_neg1, r_neg2 = jax.random.split(rng, 5)

    infer_pos = model.infer(params, spec, batch, train=train, rng=r_inf)

    # categorical over softmax(sim) with zeroed diagonal == multinomial of
    # the reference; -inf diagonal removes self-pairs
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)
    eye = jnp.eye(bsz, dtype=bool)
    w_i2t = jnp.where(eye, neg_inf, sim_i2t.astype(jnp.float32))
    w_t2i = jnp.where(eye, neg_inf, sim_t2i.astype(jnp.float32))
    neg_img_idx = jax.random.categorical(r_i, w_t2i, axis=1)   # per text row
    neg_txt_idx = jax.random.categorical(r_t, w_i2t, axis=1)   # per image row

    images_neg = jnp.take(batch["image"], neg_img_idx, axis=0)
    text_ids_neg = jnp.take(batch["text_ids"], neg_txt_idx, axis=0)
    text_masks_neg = jnp.take(batch["text_masks"], neg_txt_idx, axis=0)

    batch_img_neg = dict(batch, image=images_neg)
    infer_img_neg = model.infer(params, spec, batch_img_neg, train=train,
                                rng=r_neg1)
    batch_txt_neg = dict(batch, text_ids=text_ids_neg,
                         text_masks=text_masks_neg)
    infer_txt_neg = model.infer(params, spec, batch_txt_neg, train=train,
                                rng=r_neg2)

    cls = jnp.concatenate([infer_pos["cls_feats"], infer_img_neg["cls_feats"],
                           infer_txt_neg["cls_feats"]], axis=0)
    logits = model.itm_head(params, cls).astype(jnp.float32)
    labels = jnp.concatenate([jnp.ones(bsz, jnp.int32),
                              jnp.zeros(2 * bsz, jnp.int32)])
    loss = _ce_dense(logits, labels)
    return {
        "itm_loss": loss,
        "itm_correct": (jnp.argmax(logits, -1) == labels).sum(),
        "itm_count": labels.shape[0],
    }


# --------------------------------------------------------------------------
# Downstream heads (objectives.py:446-569)
# --------------------------------------------------------------------------

def compute_vqa(params, spec, batch, *, train=False, rng=None) -> Dict:
    """BCE-with-logits × label_size against dense soft targets.

    The collator pre-densifies (vqa_labels, vqa_scores) lists into a
    (B, 3129) target matrix — same math as the reference's python loop
    (objectives.py:456-466), TPU-static.
    """
    infer = model.infer(params, spec, batch, train=train, rng=rng)
    logits = model.vqa_head(params, infer["cls_feats"]).astype(jnp.float32)
    targets = batch["vqa_targets"].astype(jnp.float32)
    bce = jnp.maximum(logits, 0) - logits * targets + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    loss = bce.mean() * targets.shape[1]
    # VQAScore: soft score of the argmax answer (gadgets/my_metrics.py)
    score = jnp.take_along_axis(targets, jnp.argmax(logits, -1)[:, None],
                                axis=1).sum()
    return {"vqa_loss": loss, "vqa_score_sum": score,
            "vqa_count": logits.shape[0], "vqa_logits": logits}


def compute_nlvr2(params, spec, batch, *, train=False, rng=None) -> Dict:
    r1, r2 = (jax.random.split(rng) if rng is not None else (None, None))
    infer1 = model.infer(params, spec, batch, image_token_type_idx=1,
                         train=train, rng=r1)
    infer2 = model.infer(params, spec, batch, image_token_type_idx=2,
                         train=train, rng=r2)
    cls = jnp.concatenate([infer1["cls_feats"], infer2["cls_feats"]], axis=-1)
    logits = model.nlvr2_head(params, cls).astype(jnp.float32)
    labels = batch["answers"].astype(jnp.int32)
    loss = _ce_dense(logits, labels)
    return {
        "nlvr2_loss": loss,
        "nlvr2_correct": (jnp.argmax(logits, -1) == labels).sum(),
        "nlvr2_count": labels.shape[0],
        "nlvr2_logits": logits,
    }


def compute_img_cls(params, spec, batch, *, train=False, rng=None) -> Dict:
    infer = model.infer_image_ft(params, spec, batch, train=train, rng=rng)
    logits = model.img_cls_head(
        params, infer["image_feats"].mean(axis=1)).astype(jnp.float32)
    labels = batch["class_label"].astype(jnp.int32)
    loss = _ce_dense(logits, labels)
    return {
        "img_cls_loss": loss,
        "img_cls_correct": (jnp.argmax(logits, -1) == labels).sum(),
        "img_cls_count": labels.shape[0],
    }
