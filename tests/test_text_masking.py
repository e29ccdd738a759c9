"""On-device MLM masking (ops/text_masking.py + device_mlm wiring).

The host collator (data/collators.MLMCollator) is the distribution
oracle: the device selection must implement the SAME greedy-with-skip
whole-word algorithm (HF DataCollatorForWholeWordMask semantics), so
given the same group order the masks must match EXACTLY, and the
80/10/10 replacement must hold statistically.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vl_merging_tpu.data.collators import IGNORE, MLMCollator
from vl_merging_tpu.ops import text_masking as tm


def _oracle_select(word_id, order, mlm_prob, max_predictions=512):
    """The host algorithm (collators._wwm_mask) given an explicit group
    order: take whole words in that order while they fit within
    round(n_candidates * mlm_prob)."""
    L = len(word_id)
    valid = word_id >= 0
    n_candidates = int(valid.sum())
    num_to_predict = min(max_predictions,
                         max(1, int(round(n_candidates * mlm_prob))))
    glen = np.bincount(word_id[valid], minlength=L)
    covered = 0
    mask = np.zeros(L, bool)
    for g in order:
        ln = int(glen[g]) if g < L else 0
        if ln == 0 or covered + ln > num_to_predict:
            continue
        mask |= (word_id == g)
        covered += ln
    return mask


def _random_row(rng, L=24):
    """word_id row with CLS/SEP-style specials and ##-like multi-token
    words; -1 on special/pad."""
    word_id = np.full(L, -1, np.int32)
    pos, g = 1, 0  # position 0 = CLS
    n_words = rng.randint(3, 9)
    for _ in range(n_words):
        ln = rng.randint(1, 4)
        if pos + ln >= L - 1:
            break
        word_id[pos:pos + ln] = g
        pos += ln
        g += 1
    return word_id  # pos.. = SEP + padding (-1)


def test_whole_word_selection_matches_oracle_exactly():
    """Reproduce the device shuffle host-side (same jax uniforms → same
    order), then the numpy oracle must agree bit-for-bit."""
    rng = np.random.RandomState(0)
    B, L = 16, 24
    word_ids = np.stack([_random_row(rng, L) for _ in range(B)])
    special = word_ids < 0
    key = jax.random.PRNGKey(42)
    got = np.asarray(tm.whole_word_selection(
        jnp.asarray(word_ids), jnp.asarray(special), key, 0.35))

    keys = jax.random.split(key, B)
    for i in range(B):
        u = np.asarray(jax.random.uniform(keys[i], (L,)))
        glen = np.bincount(word_ids[i][word_ids[i] >= 0], minlength=L)
        u = np.where(glen > 0, u, 2.0)
        order = np.argsort(u)
        want = _oracle_select(word_ids[i], order, 0.35)
        assert (got[i] == want).all(), f"row {i}"


def test_whole_word_selection_grouping_invariant():
    """Every selected word is selected whole; specials never selected;
    covered count <= round(n_candidates * p) and >= 1 word."""
    rng = np.random.RandomState(1)
    B, L = 32, 24
    word_ids = np.stack([_random_row(rng, L) for _ in range(B)])
    special = word_ids < 0
    sel = np.asarray(tm.whole_word_selection(
        jnp.asarray(word_ids), jnp.asarray(special),
        jax.random.PRNGKey(7), 0.15))
    assert not (sel & special).any()
    for i in range(B):
        n_cand = int((word_ids[i] >= 0).sum())
        budget = max(1, int(round(n_cand * 0.15)))
        assert 1 <= sel[i].sum() <= budget
        for g in np.unique(word_ids[i][word_ids[i] >= 0]):
            tok = word_ids[i] == g
            assert sel[i][tok].all() or not sel[i][tok].any(), \
                f"row {i} word {g} partially selected"


def test_apply_mlm_labels_and_replacement_distribution():
    rng = np.random.RandomState(2)
    B, L, V, MASK = 64, 24, 1000, 103
    ids = rng.randint(5, V, (B, L)).astype(np.int32)
    word_ids = np.stack([_random_row(rng, L) for _ in range(B)])
    special = word_ids < 0

    tot = {"mask": 0, "rand": 0, "keep": 0, "n": 0}
    for seed in range(30):
        mlm_ids, labels = tm.apply_mlm(
            jnp.asarray(ids), jnp.asarray(special),
            jax.random.PRNGKey(seed), 0.4, V, MASK,
            word_ids=jnp.asarray(word_ids))
        mlm_ids, labels = np.asarray(mlm_ids), np.asarray(labels)
        masked = labels != IGNORE
        # labels: original ids on-mask, IGNORE off-mask
        assert (labels[masked] == ids[masked]).all()
        assert not (masked & special).any()
        # off-mask positions unchanged
        assert (mlm_ids[~masked] == ids[~masked]).all()
        is_mask_tok = masked & (mlm_ids == MASK)
        kept = masked & (mlm_ids == ids) & ~is_mask_tok
        randomized = masked & ~is_mask_tok & ~kept
        tot["mask"] += int(is_mask_tok.sum())
        tot["rand"] += int(randomized.sum())
        tot["keep"] += int(kept.sum())
        tot["n"] += int(masked.sum())
    # 80/10/10 within statistical tolerance (n ≈ 30*64*~7 masked)
    assert abs(tot["mask"] / tot["n"] - 0.8) < 0.03
    assert abs(tot["rand"] / tot["n"] - 0.1) < 0.03
    assert abs(tot["keep"] / tot["n"] - 0.1) < 0.03


def test_apply_mlm_standard_iid_mode():
    rng = np.random.RandomState(3)
    B, L, V, MASK = 128, 24, 1000, 103
    ids = rng.randint(5, V, (B, L)).astype(np.int32)
    special = np.zeros((B, L), bool)
    special[:, 0] = special[:, -1] = True
    mlm_ids, labels = tm.apply_mlm(
        jnp.asarray(ids), jnp.asarray(special), jax.random.PRNGKey(0),
        0.15, V, MASK, word_ids=None)
    masked = np.asarray(labels) != IGNORE
    assert not masked[:, 0].any() and not masked[:, -1].any()
    rate = masked[:, 1:-1].mean()
    assert abs(rate - 0.15) < 0.02


class _Tok:
    pad_token_id, mask_token_id, vocab_size = 0, 103, 1000

    def convert_ids_to_tokens(self, ids):
        raise AssertionError("device mode must use enc['tokens']")


def _enc(tokens, ids):
    special = [1 if t in ("[CLS]", "[SEP]") else 0 for t in tokens]
    return {"input_ids": ids, "attention_mask": [1] * len(ids),
            "special_tokens_mask": special, "tokens": tokens}


def test_device_collator_emits_word_ids_without_rng():
    coll = MLMCollator(_Tok(), mlm_prob=0.15, whole_word=True, seed=0,
                       device=True)
    enc = _enc(["[CLS]", "the", "un", "##believ", "##able", "cat",
                "[SEP]"], [101, 5, 6, 7, 8, 9, 102])
    out = coll([enc, enc], max_length=10)
    assert set(out) == {"input_ids", "attention_mask", "word_ids"}
    w = out["word_ids"][0]
    # [CLS]=-1, the=0, un/##believ/##able=1, cat=2, [SEP]=-1, pad=-1
    assert w.tolist() == [-1, 0, 1, 1, 1, 2, -1, -1, -1, -1]
    # no RNG consumed: two identical calls agree bit-for-bit
    out2 = coll([enc, enc], max_length=10)
    assert (out["word_ids"] == out2["word_ids"]).all()


def test_device_mlm_train_step_end_to_end():
    """A train step with device_mlm=True consumes text_word_ids (no host
    mlm keys in the batch) and produces a finite mlm loss."""
    from vl_merging_tpu.config import build_config
    from vl_merging_tpu.models import make_model_spec, init_params
    from vl_merging_tpu.train import (
        init_train_state, make_optimizer, make_schedule, make_train_step)

    cfg = build_config(
        "task_test_vit_tiny_mlm_itm_ifm_square_randaug_base_vl", "ufo",
        overrides=dict(hidden_size=64, num_heads=2, num_layers=2,
                       image_size=32, patch_size=16, max_text_len=12,
                       max_text_len_of_initckpt=16,
                       vlffn_start_layer_index=2, precision="f32",
                       device_mlm=True, mask_token_id=103,
                       whole_word_masking=True, max_steps=10,
                       warmup_steps=0))
    spec = make_model_spec(cfg)
    params = init_params(spec, 0)
    sched = make_schedule(cfg, 10)
    opt = make_optimizer(params, cfg, 10, sched)
    state = init_train_state(params, opt, seed=0)
    step = make_train_step(cfg, spec, opt, donate=False)

    rng = np.random.RandomState(0)
    B, L = 4, cfg["max_text_len"]
    word_ids = np.stack([_random_row(rng, L) for _ in range(B)])
    batch = {
        "text_ids": jnp.asarray(rng.randint(5, spec.vocab_size, (B, L))),
        "text_masks": jnp.ones((B, L), jnp.int32),
        "text_word_ids": jnp.asarray(word_ids),
        "image": jnp.asarray(rng.randn(B, 3, 32, 32).astype(np.float32)),
    }
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert np.isfinite(float(metrics["mlm_loss"]))
    # a second step with the advanced rng must mask differently
    _, m2 = step(state2, batch)
    assert float(m2["mlm_loss"]) != float(metrics["mlm_loss"])
