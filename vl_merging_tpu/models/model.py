"""VL-MoME task model: embeddings, visual patchify, infer paths, heads.

Pure-function re-implementation of ``ViLTransformerSS``
(reference: src/vilt/modules/vilt_module.py:46-1464) minus the Lightning
plumbing: every ``infer*`` variant is a function of (params, spec, batch)
suitable for ``jax.jit`` / ``pjit`` with static type_id routing.

Batches are dicts of arrays:
  text_ids (B, T) int32, text_masks (B, T) int32, text_labels (B, T) int32,
  image (B, 3, H, W) float32, optionally *_mlm variants and
  image_masked_pos (B, num_patches) for MIM.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import relpos
from .layers import dropout, gelu, layer_norm, linear
from .mome import LN_EPS, block_forward
from .spec import ModelSpec, Params, V, L, VL

BERT_LN_EPS = 1e-12  # HF BertConfig default layer_norm_eps


# --------------------------------------------------------------------------
# Embeddings
# --------------------------------------------------------------------------

def text_embed(
    params: Params, spec: ModelSpec, text_ids: jax.Array,
    *, train: bool = False, rng: Optional[jax.Array] = None,
) -> jax.Array:
    """BertEmbeddings with position_embedding_type="rel_pos": word + bert
    token-type(0) → LayerNorm → dropout; absolute positions are NOT added
    (vilt_module.py:51-64)."""
    emb = jnp.take(params["text_embeddings.word_embeddings.weight"],
                   text_ids, axis=0)
    emb = emb + params["text_embeddings.token_type_embeddings.weight"][0]
    emb = layer_norm(emb, params["text_embeddings.LayerNorm.weight"],
                     params["text_embeddings.LayerNorm.bias"], eps=BERT_LN_EPS)
    emb = dropout(emb, spec.drop_rate, rng, train)
    return emb.astype(spec.jnp_compute_dtype)


def visual_embed(
    params: Params, spec: ModelSpec, image: jax.Array,
    *, bool_masked_pos: Optional[jax.Array] = None,
):
    """Conv patchify + optional MIM mask-token substitution + cls prepend
    (reference vision_transformer.py:952-991).  Returns (embeds, masks)."""
    dtype = spec.jnp_compute_dtype
    w = params["transformer.patch_embed.proj.weight"].astype(dtype)
    x = jax.lax.conv_general_dilated(
        image.astype(dtype), w,
        window_strides=(spec.patch_size, spec.patch_size),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    x = x + params["transformer.patch_embed.proj.bias"].astype(dtype)[
        None, :, None, None]
    B = x.shape[0]
    x = x.reshape(B, spec.hidden_size, -1).transpose(0, 2, 1)  # B, L, C

    if bool_masked_pos is not None:
        mask_token = params["transformer.mask_token"].astype(dtype)
        wmask = bool_masked_pos[:, :, None].astype(dtype)
        x = x * (1 - wmask) + mask_token * wmask

    cls = jnp.broadcast_to(params["transformer.cls_token"].astype(dtype),
                           (B, 1, spec.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    masks = jnp.ones((B, x.shape[1]), jnp.int32)
    return x, masks


def _final_norm(params: Params, x: jax.Array) -> jax.Array:
    return layer_norm(x, params["transformer.norm.weight"],
                      params["transformer.norm.bias"], eps=LN_EPS)


def _l2norm(x: jax.Array) -> jax.Array:
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def _token_type(params: Params, idx, shape_like: jax.Array,
                dtype) -> jax.Array:
    table = params["token_type_embeddings.weight"].astype(dtype)
    return jnp.broadcast_to(table[idx], shape_like.shape[:2] + (table.shape[-1],))


def _layer_rngs(rng: Optional[jax.Array], n: int):
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))


def _drop_path_rates(spec: ModelSpec):
    # torch.linspace(0, drop_path_rate, depth) (vision_transformer.py:861-863)
    if spec.num_layers == 1:
        return [0.0]
    return [spec.drop_rate * i / (spec.num_layers - 1)
            for i in range(spec.num_layers)]


def _dp_scale_table(spec: ModelSpec, rng: Optional[jax.Array], train: bool,
                    batch: int) -> Optional[jax.Array]:
    """All of a pass's stochastic-depth scales in ONE rng op.

    Per-block `drop_path` cost ~15 ms/step at @224 B22 — not the hashing
    (unsafe_rbg saved ~1 ms) but the ~180 tiny per-block split/bernoulli
    ops' fixed overhead (tools/fwd224c_probe.py).  One uniform draw of
    shape (L, 2, B) with per-layer keep probs replaces them; blocks get a
    precomputed (2, B) scale slice.  Layer 0's rate is 0 → keep 1 →
    u < 1.0 always → scale exactly 1.  Semantics are timm DropPath
    (mask/keep per sample); the draws land outside the remat boundary,
    so the backward replays no RNG at all."""
    if not train or rng is None or spec.drop_rate <= 0.0:
        return None
    keep = 1.0 - np.asarray(_drop_path_rates(spec), np.float32)
    u = jax.random.uniform(rng, (spec.num_layers, 2, batch))
    return (u < keep[:, None, None]).astype(jnp.float32) \
        / keep[:, None, None]


def precompute_bias(params: Params, spec: ModelSpec, kind: str,
                    true_length: Optional[int] = None,
                    pad_to: Optional[int] = None,
                    segment_pad: Optional[Tuple[int, int, int]] = None
                    ) -> jax.Array:
    """Per-layer rel-pos bias (L, H, N, N), input-independent.

    Eval loops should compute this once and pass it via ``rel_bias`` to
    the infer functions: the table gather + transpose costs ~10 ms per
    call at N=640 on v5e and is pure overhead per batch otherwise.

    ``pad_to`` pads the (static, host-side) index matrix to a lane-aligned
    sequence length with bucket 0 — padded keys are masked in attention
    and padded query rows are discarded, so the values never matter — and
    keeps the gather itself fusable (padding the gathered bias instead
    would materialize the full (L,H,N,N) tensor)."""
    if kind == "fused" and segment_pad is not None:
        # segment_pad = (text_len, pad_t, pad_i): runtime text length plus
        # the two padded segment sizes
        index = relpos.fused_index_padded(
            spec.max_text_len, spec.max_text_len_of_initckpt, spec.window,
            *segment_pad)
        return relpos.per_layer_bias(
            params["relative_position_bias_table"], index,
            spec.num_layers, spec.num_heads)
    index = {"fused": lambda: relpos.fused_index(spec),
             "text": lambda: relpos.text_index(spec, true_length),
             "image": lambda: relpos.image_index(spec)}[kind]()
    if pad_to is not None and pad_to > index.shape[0]:
        extra = pad_to - index.shape[0]
        index = np.pad(index, ((0, extra), (0, extra)))
    return relpos.per_layer_bias(
        params["relative_position_bias_table"], index,
        spec.num_layers, spec.num_heads)


def _seq_pad(spec: ModelSpec, n: int) -> int:
    """Tile-aligned sequence length for the Pallas fast path: one pad at
    trunk entry replaces a pad+slice copy pair in every layer.

    Sublane (16) alignment suffices for the packed kernel's (bb, N, 128)
    blocks — Mosaic pads the trailing dim of the (bb, N, N) logits tile
    internally.  577 → 592 instead of 640 cuts ~7.5% of every projection/
    MLP row and logit row vs full lane (128) alignment."""
    from ..ops.attention import PACKED_MIN_N
    from .mome import _USE_PALLAS

    if not _USE_PALLAS.get() or n % 16 == 0 or (n + 15) // 16 * 16 < \
            PACKED_MIN_N:
        return n
    return (n + 15) // 16 * 16



def _block_apply(params, spec, b, x, mask, bias_i, type_id, dp_rate, rng,
                 train, text_len=None, dp_scale=None):
    """One block step; under use_remat the block rematerializes in the
    backward pass (jax.checkpoint) instead of saving activations."""
    def f(params, x, mask, bias_i, rng, dp_scale):
        return block_forward(params, spec, b, x, mask, bias_i, type_id,
                             drop_path_rate=dp_rate, rng=rng, train=train,
                             text_len=text_len, dp_scale=dp_scale)[0]
    if spec.remat and train:
        # surgical remat: save un-batched matmul outputs (qkv / proj / mlp
        # projections), recompute the batched attention einsums — i.e. the
        # O(B·H·N²) f32 logits/probs that OOM HBM at per-chip batches ≥66
        # never persist to the backward pass.  Full-block remat measured
        # ~50% slower; save-everything-except-names ballooned residuals.
        # prevent_cse=False: under jit the CSE-prevention barriers only
        # serialize XLA's schedule of the backward replay — dropping them
        # measured 187.0 -> 160.4 ms/step at @224 B22 pretrain
        # (tools/remat_matrix_probe.py); numerics are unaffected (CSE can
        # only share, not change, the recomputation).
        f = jax.checkpoint(
            f, prevent_cse=False,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    return f(params, x, mask, bias_i, rng, dp_scale)

# --------------------------------------------------------------------------
# Inference paths
# --------------------------------------------------------------------------

def infer(
    params: Params, spec: ModelSpec, batch: Dict[str, jax.Array],
    *, mask_text: bool = False, mask_image: bool = False,
    bool_masked_pos: Optional[jax.Array] = None,
    image_token_type_idx: int = 1,
    image: Optional[jax.Array] = None,
    rel_bias: Optional[jax.Array] = None,
    train: bool = False, rng: Optional[jax.Array] = None,
) -> Dict[str, Optional[jax.Array]]:
    """Fused VL pass, type_id=2 (vilt_module.py:1071-1156)."""
    dtype = spec.jnp_compute_dtype
    do_mlm = "_mlm" if mask_text else ""
    text_ids = batch[f"text_ids{do_mlm}"]
    text_labels = batch.get(f"text_labels{do_mlm}")
    text_masks = batch["text_masks"]

    if image is None:
        imgkey = f"image_{image_token_type_idx - 1}"
        image = batch[imgkey] if imgkey in batch else batch["image"]

    rngs = _layer_rngs(rng, spec.num_layers + 2)
    dp = _dp_scale_table(spec, rngs[-2], train, text_ids.shape[0])
    t_emb = text_embed(params, spec, text_ids, train=train, rng=rngs[-1])
    i_emb, image_masks = visual_embed(params, spec, image,
                                      bool_masked_pos=bool_masked_pos)

    t_emb = t_emb + _token_type(params, 0, t_emb, dtype)
    i_emb = i_emb + _token_type(params, image_token_type_idx, i_emb, dtype)

    x = jnp.concatenate([t_emb, i_emb], axis=1)
    co_masks = jnp.concatenate([text_masks.astype(jnp.int32), image_masks],
                               axis=1)

    text_len = t_emb.shape[1]
    image_len = i_emb.shape[1]
    n = x.shape[1]
    # Per-segment sublane alignment for the packed Pallas path: padding
    # text→np_t and image→np_i (instead of one trailing pad) keeps BOTH
    # modality halves 16-aligned, so split-per-modality blocks
    # (separate_plain / self_attn_for_single_mode — block_forward's
    # per-half recursion) stay on the fused kernels too.  Padded rows are
    # mask-zero keys and discarded query rows; bias pad slots use bucket 0.
    from .mome import _USE_PALLAS
    if _USE_PALLAS.get() and n >= 256:
        np_t = (text_len + 15) // 16 * 16
        np_i = (image_len + 15) // 16 * 16
    else:
        np_t, np_i = text_len, image_len
    if rel_bias is not None and rel_bias.shape[-1] != np_t + np_i:
        np_t, np_i = text_len, image_len
    if (np_t, np_i) != (text_len, image_len):
        zeros = jnp.zeros((x.shape[0], np_t - text_len, x.shape[2]), x.dtype)
        zeros_i = jnp.zeros((x.shape[0], np_i - image_len, x.shape[2]),
                            x.dtype)
        x = jnp.concatenate([t_emb, zeros, i_emb, zeros_i], axis=1)
        mz = jnp.zeros((x.shape[0], np_t - text_len), co_masks.dtype)
        mz_i = jnp.zeros((x.shape[0], np_i - image_len), co_masks.dtype)
        co_masks = jnp.concatenate(
            [text_masks.astype(jnp.int32), mz, image_masks, mz_i], axis=1)

    bias = rel_bias if rel_bias is not None else precompute_bias(
        params, spec, "fused", segment_pad=(text_len, np_t, np_i)
        if (np_t, np_i) != (text_len, image_len) else None)
    dprates = _drop_path_rates(spec)

    for i, b in enumerate(spec.blocks):
        x = _block_apply(params, spec, b, x, co_masks, bias[i], VL,
                         dprates[i], rngs[i], train, text_len=np_t,
                         dp_scale=None if dp is None else dp[i])
    if (np_t, np_i) != (text_len, image_len):
        x = jnp.concatenate(
            [x[:, :text_len], x[:, np_t:np_t + image_len]], axis=1)
    x = _final_norm(params, x)
    cls_feats = pooler(params, x)
    return {
        "text_feats": x[:, :text_len],
        "image_feats": x[:, text_len:],
        "cls_feats": cls_feats,
        "raw_cls_feats": x[:, 0],
        "image_masks": image_masks,
        "image": image,
        "text_labels": text_labels,
        "text_ids": text_ids,
        "text_masks": text_masks,
    }


def _text_trunk(
    params: Params, spec: ModelSpec, batch, mask_text, train, rng,
    *, vlffn_rerun: bool, rel_bias: Optional[jax.Array] = None,
):
    """Shared body of infer_text / infer_text_ft (vilt_module.py:1159-1285)."""
    do_mlm = "_mlm" if mask_text else ""
    text_ids = batch[f"text_ids{do_mlm}"]
    text_labels = batch.get(f"text_labels{do_mlm}")
    text_masks = batch["text_masks"].astype(jnp.int32)

    rngs = _layer_rngs(rng, 2 * spec.num_layers + 3)
    dp = _dp_scale_table(spec, rngs[-3], train, text_ids.shape[0])
    dp_vl = _dp_scale_table(spec, rngs[-2], train, text_ids.shape[0]) \
        if vlffn_rerun else None
    x = text_embed(params, spec, text_ids, train=train, rng=rngs[-1])
    x = x + _token_type(params, 0, x, x.dtype)

    true_length = text_ids.shape[1] if spec.max_vl_text_len is not None else None
    bias = rel_bias if rel_bias is not None else precompute_bias(
        params, spec, "text", true_length)
    dprates = _drop_path_rates(spec)

    hidden = []
    for i, b in enumerate(spec.blocks):
        x = _block_apply(params, spec, b, x, text_masks, bias[i], L,
                         dprates[i], rngs[i], train,
                         dp_scale=None if dp is None else dp[i])
        hidden.append(x)

    vlffn_hiddens = None
    if vlffn_rerun:
        # re-run deep layers with type_id=2 from the layer-(k-1) state for the
        # second (vlffn-branch) contrastive head (vilt_module.py:1190-1192)
        vlffn_hiddens = hidden[spec.vlffn_start_layer_index - 1]
        for i in range(spec.vlffn_start_layer_index, spec.num_layers):
            vlffn_hiddens = _block_apply(
                params, spec, spec.blocks[i], vlffn_hiddens, text_masks,
                bias[i], VL, dprates[i], rngs[spec.num_layers + i], train,
                dp_scale=None if dp_vl is None else dp_vl[i])
    return hidden, vlffn_hiddens, text_ids, text_labels, text_masks


def infer_text(params, spec, batch, *, mask_text=False, train=False, rng=None):
    """Text-only pretrain pass with vlffn re-run (vilt_module.py:1159-1223)."""
    hidden, vlffn_hiddens, text_ids, text_labels, text_masks = _text_trunk(
        params, spec, batch, mask_text, train, rng, vlffn_rerun=True)

    lffn = _final_norm(params, hidden[-1])
    cls_feats = _l2norm(linear(lffn[:, 0], params["ifm_text_proj.fc.weight"]))
    vlffn = _final_norm(params, vlffn_hiddens)
    cls_vlffn_feats = _l2norm(
        linear(vlffn[:, 0], params["ifm_vl_text_proj.fc.weight"]))
    return {
        "text_feats": lffn,
        "image_feats": None,
        "cls_feats": cls_feats,
        "cls_vlffn_feats": cls_vlffn_feats,
        "raw_cls_feats": hidden[-1][:, 0],
        "text_labels": text_labels,
        "text_ids": text_ids,
        "text_masks": text_masks,
    }


def infer_text_ft(params, spec, batch, *, mask_text=False, train=False,
                  rng=None, rel_bias=None):
    """Single-branch text pass (vilt_module.py:1226-1285)."""
    hidden, _, text_ids, text_labels, text_masks = _text_trunk(
        params, spec, batch, mask_text, train, rng, vlffn_rerun=False,
        rel_bias=rel_bias)
    lffn = _final_norm(params, hidden[-1])
    if "ifm_text_proj.fc.weight" in params:
        cls_feats = _l2norm(
            linear(lffn[:, 0], params["ifm_text_proj.fc.weight"]))
    else:
        cls_feats = None
    return {
        "text_feats": lffn,
        "image_feats": None,
        "cls_feats": cls_feats,
        "cls_vlffn_feats": None,
        "raw_cls_feats": hidden[-1][:, 0],
        "text_labels": text_labels,
        "text_ids": text_ids,
        "text_masks": text_masks,
    }


def _image_trunk(
    params: Params, spec: ModelSpec, batch, image_token_type_idx,
    bool_masked_pos, train, rng, *, vlffn_rerun: bool,
    image: Optional[jax.Array] = None,
    rel_bias: Optional[jax.Array] = None,
):
    if image is None:
        imgkey = f"image_{image_token_type_idx - 1}"
        image = batch[imgkey] if imgkey in batch else batch["image"]

    rngs = _layer_rngs(rng, 2 * spec.num_layers + 2)
    x, image_masks = visual_embed(params, spec, image,
                                  bool_masked_pos=bool_masked_pos)
    dp = _dp_scale_table(spec, rngs[-2], train, x.shape[0])
    dp_vl = _dp_scale_table(spec, rngs[-1], train, x.shape[0]) \
        if vlffn_rerun else None
    x = x + _token_type(params, image_token_type_idx, x, x.dtype)

    n = x.shape[1]
    np_ = _seq_pad(spec, n)
    if rel_bias is not None and rel_bias.shape[-1] != np_:
        np_ = n  # caller supplied an unpadded bias: honor its length
    if np_ != n:
        # one lane-align pad for the whole trunk (packed Pallas attention);
        # padded keys are masked, padded query rows sliced off at the end
        x = jnp.pad(x, ((0, 0), (0, np_ - n), (0, 0)))
        image_masks = jnp.concatenate(
            [image_masks,
             jnp.zeros((x.shape[0], np_ - n), image_masks.dtype)], axis=1)

    bias = rel_bias if rel_bias is not None else precompute_bias(
        params, spec, "image", pad_to=np_)
    dprates = _drop_path_rates(spec)

    hidden = []
    for i, b in enumerate(spec.blocks):
        x = _block_apply(params, spec, b, x, image_masks, bias[i], V,
                         dprates[i], rngs[i], train,
                         dp_scale=None if dp is None else dp[i])
        hidden.append(x)

    vlffn_hiddens = None
    if vlffn_rerun:
        vlffn_hiddens = hidden[spec.vlffn_start_layer_index - 1]
        for i in range(spec.vlffn_start_layer_index, spec.num_layers):
            # image-only sequence run with VL experts: text_len is 0, not
            # what the fused-shape inference would derive on padded input
            vlffn_hiddens = _block_apply(
                params, spec, spec.blocks[i], vlffn_hiddens, image_masks,
                bias[i], VL, dprates[i], rngs[spec.num_layers + i], train,
                text_len=0,
                dp_scale=None if dp_vl is None else dp_vl[i])
    if np_ != n:
        hidden = hidden[:-1] + [hidden[-1][:, :n]]
        if vlffn_hiddens is not None:
            vlffn_hiddens = vlffn_hiddens[:, :n]
        image_masks = image_masks[:, :n]
    return hidden, vlffn_hiddens, image_masks


def infer_image(params, spec, batch, *, mask_image=False,
                image_token_type_idx=1, bool_masked_pos=None,
                image=None, train=False, rng=None):
    """Image-only pretrain pass with vlffn re-run (vilt_module.py:1287-1375)."""
    del mask_image  # masking is controlled by bool_masked_pos
    hidden, vlffn_hiddens, image_masks = _image_trunk(
        params, spec, batch, image_token_type_idx, bool_masked_pos, train,
        rng, vlffn_rerun=True, image=image)
    vffn = _final_norm(params, hidden[-1])
    cls_feats = _l2norm(linear(vffn[:, 0], params["ifm_image_proj.fc.weight"]))
    vlffn = _final_norm(params, vlffn_hiddens)
    cls_vlffn_feats = _l2norm(
        linear(vlffn[:, 0], params["ifm_vl_image_proj.fc.weight"]))
    return {
        "text_feats": None,
        "image_feats": vffn,
        "cls_feats": cls_feats,
        "cls_vlffn_feats": cls_vlffn_feats,
        "raw_cls_feats": hidden[-1][:, 0],
        "image_masks": image_masks,
    }


def infer_image_ft(params, spec, batch, *, mask_image=False,
                   image_token_type_idx=1, bool_masked_pos=None,
                   image=None, train=False, rng=None, rel_bias=None):
    """Single-branch image pass (vilt_module.py:1378-1464)."""
    del mask_image
    hidden, _, image_masks = _image_trunk(
        params, spec, batch, image_token_type_idx, bool_masked_pos, train,
        rng, vlffn_rerun=False, image=image, rel_bias=rel_bias)
    vffn = _final_norm(params, hidden[-1])
    if "ifm_image_proj.fc.weight" in params:
        cls_feats = _l2norm(
            linear(vffn[:, 0], params["ifm_image_proj.fc.weight"]))
    else:
        cls_feats = pooler(params, hidden[-1])
    return {
        "text_feats": None,
        "image_feats": vffn,
        "cls_feats": cls_feats,
        "cls_vlffn_feats": None,
        "raw_cls_feats": hidden[-1][:, 0],
        "image_masks": image_masks,
    }


# --------------------------------------------------------------------------
# Heads (reference: src/vilt/modules/heads.py)
# --------------------------------------------------------------------------

def pooler(params: Params, hidden_states: jax.Array) -> jax.Array:
    """Tanh-linear over token 0 (heads.py:8-18)."""
    x = linear(hidden_states[:, 0], params["pooler.dense.weight"],
               params["pooler.dense.bias"])
    return jnp.tanh(x)


def itm_head(params: Params, x: jax.Array) -> jax.Array:
    return linear(x, params["itm_score.fc.weight"], params["itm_score.fc.bias"])


def mlm_head(params: Params, x: jax.Array) -> jax.Array:
    """BertPredictionHeadTransform (dense→gelu→LN) + tied-free decoder
    (heads.py:40-52)."""
    h = gelu(linear(x, params["mlm_score.transform.dense.weight"],
                    params["mlm_score.transform.dense.bias"]))
    h = layer_norm(h, params["mlm_score.transform.LayerNorm.weight"],
                   params["mlm_score.transform.LayerNorm.bias"],
                   eps=BERT_LN_EPS)
    return linear(h, params["mlm_score.decoder.weight"]) + params["mlm_score.bias"]


def mim_head(params: Params, x: jax.Array) -> jax.Array:
    return linear(x, params["mim_score.weight"], params["mim_score.bias"])


def vqa_head(params: Params, x: jax.Array) -> jax.Array:
    """hs → 2hs → LN → GELU → 3129 (vilt_module.py:301-309)."""
    h = linear(x, params["vqa_classifier.0.weight"],
               params["vqa_classifier.0.bias"])
    h = layer_norm(h, params["vqa_classifier.1.weight"],
                   params["vqa_classifier.1.bias"], eps=1e-5)
    h = gelu(h)
    return linear(h, params["vqa_classifier.3.weight"],
                  params["vqa_classifier.3.bias"])


def nlvr2_head(params: Params, x: jax.Array) -> jax.Array:
    h = linear(x, params["nlvr2_classifier.0.weight"],
               params["nlvr2_classifier.0.bias"])
    h = layer_norm(h, params["nlvr2_classifier.1.weight"],
                   params["nlvr2_classifier.1.bias"], eps=1e-5)
    h = gelu(h)
    return linear(h, params["nlvr2_classifier.3.weight"],
                  params["nlvr2_classifier.3.bias"])


def img_cls_head(params: Params, x: jax.Array) -> jax.Array:
    return linear(x, params["img_cls_classifier.weight"],
                  params["img_cls_classifier.bias"])
