"""In-graph MLM masking (standard + whole-word), the text-side north-star
item: masking compiles into the same XLA graph as the train step instead
of running in host NumPy per batch.

Semantics match data/collators.MLMCollator (itself distribution-equivalent
to HF's DataCollatorForLanguageModeling / DataCollatorForWholeWordMask,
which the reference applies inside dataset collate — reference:
src/vilt/datasets/base_dataset.py:204-253,
src/vilt/datamodules/datamodule_base.py:64-72):

  * candidate positions = non-special, non-padding tokens,
  * standard: each candidate masked i.i.d. with p = mlm_prob,
  * whole-word: '##'-continuation tokens group with their word (the host
    tokenizer emits a per-token ``word_ids`` map — cheap, RNG-free);
    whole words are taken in a random order while they fit within
    round(n_candidates · mlm_prob) tokens (HF's greedy-with-skip loop,
    here a ``lax.scan`` over the shuffled group list),
  * replacement: 80% [MASK], 10% random token, 10% unchanged,
  * labels = original ids at masked positions, −100 elsewhere.

The selection loop is sequential per row (a skipped group does not
consume budget), so it runs as a scan with a scalar carry over at most
max_text_len steps — trivial VPU work next to the model step it fuses
into.  All shapes static; vmapped over the batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

IGNORE = -100


def _select_row(word_id, special, order_key, mlm_prob, max_predictions):
    """Whole-word selection for one row.

    word_id: (L,) int32 — word-group index per token, -1 on special/pad
    special: (L,) bool
    order_key: PRNG key for the group shuffle
    Returns (L,) bool mask of selected tokens."""
    L = word_id.shape[0]
    valid_tok = ~special & (word_id >= 0)
    n_candidates = valid_tok.sum()
    # budget via a trace-time table in HOST f64 semantics — an in-graph
    # f32 `jnp.round(n * prob)` resolves near-.5 ties differently from the
    # collator's `int(round(...))` (e.g. 30*0.15 -> 4.50000018 in f32 ->
    # 5, vs 4.4999999... in f64 -> 4), skewing the budget by one token at
    # specific candidate counts (ADVICE r4 #2).  n_candidates <= L, so the
    # exact host expression is enumerable at trace time.
    budget_table = jnp.asarray(
        [min(max_predictions, max(1, int(round(n * mlm_prob))))
         for n in range(L + 1)], jnp.int32)
    num_to_predict = budget_table[n_candidates]

    # group g exists iff any token carries it; its length = token count
    gid = jnp.arange(L, dtype=jnp.int32)
    onehot = (word_id[None, :] == gid[:, None]) & valid_tok[None, :]
    glen = onehot.sum(axis=1).astype(jnp.int32)            # (L,) 0 if absent
    exists = glen > 0

    # random order over existing groups (HF: random.shuffle of the group
    # list); absent slots sort last
    u = jax.random.uniform(order_key, (L,))
    u = jnp.where(exists, u, 2.0)
    order = jnp.argsort(u)                                 # (L,) group ids

    def step(covered, g):
        ln = glen[g]
        take = (ln > 0) & (covered + ln <= num_to_predict)
        return covered + jnp.where(take, ln, 0), take

    _, taken = jax.lax.scan(step, jnp.int32(0), order)
    selected = jnp.zeros((L,), bool).at[order].set(taken)  # per-group flag
    return selected[jnp.clip(word_id, 0)] & valid_tok


def whole_word_selection(word_ids, special, rng, mlm_prob: float,
                         max_predictions: int = 512):
    """Batched whole-word mask selection.

    word_ids: (B, L) int32 (-1 on special/pad); special: (B, L) bool.
    Returns (B, L) bool."""
    keys = jax.random.split(rng, word_ids.shape[0])
    return jax.vmap(
        functools.partial(_select_row, mlm_prob=mlm_prob,
                          max_predictions=max_predictions)
    )(word_ids, special, keys)


def apply_mlm(ids, special, rng, mlm_prob: float, vocab_size: int,
              mask_token_id: int, word_ids=None,
              max_predictions: int = 512):
    """Full in-graph MLM: selection + 80/10/10 replacement + labels.

    ids: (B, L) int; special: (B, L) bool (special OR padding);
    word_ids: (B, L) int32 for whole-word mode, None for standard i.i.d.
    Returns (mlm_ids, labels) with labels IGNORE (-100) off-mask —
    exactly the host collator's mlm_input_ids / mlm_labels."""
    k_sel, k_rep, k_rnd, k_tok = jax.random.split(rng, 4)
    if word_ids is None:
        masked = (jax.random.uniform(k_sel, ids.shape) < mlm_prob) & ~special
    else:
        masked = whole_word_selection(word_ids, special, k_sel, mlm_prob,
                                      max_predictions)

    labels = jnp.where(masked, ids, IGNORE)
    replaced = masked & (jax.random.uniform(k_rep, ids.shape) < 0.8)
    randomized = masked & ~replaced & \
        (jax.random.uniform(k_rnd, ids.shape) < 0.5)
    rand_tok = jax.random.randint(k_tok, ids.shape, 0, vocab_size,
                                  dtype=ids.dtype)
    mlm_ids = jnp.where(replaced, jnp.asarray(mask_token_id, ids.dtype),
                        jnp.where(randomized, rand_tok, ids))
    return mlm_ids, labels
