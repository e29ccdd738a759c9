"""Loss math vs the EXECUTED reference objectives.

Each reference ``compute_*`` (src/vilt/modules/objectives.py) is
AST-extracted and executed with a faked ``pl_module`` whose infer/head
methods return canned tensors; our ``train/objectives.py`` functions run
with ``models.model`` monkeypatched to return the SAME tensors.  What is
pinned is therefore exactly the loss assembly — CE/BCE shapes,
ignore-index semantics, weighting factors, negative-batch construction —
against the actual reference code, not a re-derivation.
"""

import ast
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vl_merging_tpu.train import objectives
from vl_merging_tpu.models import model as jmodel

REF = "/root/reference/src/vilt/modules/objectives.py"
pytestmark = pytest.mark.skipif(
    not __import__("os").path.exists(REF), reason="reference not present")


class _CpuTensor(torch.Tensor):
    """Reference code calls ``.get_device()`` and ``.to(device=...)`` on
    logits (objectives.py:324, 415), which breaks on CPU tensors
    (get_device() == -1 → cuda lookup); this subclass reports 'cpu'."""

    def get_device(self):  # noqa: D102
        return "cpu"


def _cpu(t: torch.Tensor) -> torch.Tensor:
    return t.as_subclass(_CpuTensor)


class _FakeDist:
    @staticmethod
    def get_world_size():
        return 1

    @staticmethod
    def get_rank():
        return 0

    @staticmethod
    def all_gather(out, t):
        out[0] = t.clone()


def _extract(name, extra_ns=None):
    with open(REF) as f:
        tree = ast.parse(f.read())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == name)
    ns = {"torch": torch, "F": torch.nn.functional, "dist": _FakeDist,
          "print": lambda *a, **k: None}
    ns.update(extra_ns or {})
    exec(compile(ast.Module(body=[fn], type_ignores=[]), REF, "exec"), ns)
    return ns[name]


class _FakePL:
    def __init__(self, config, **attrs):
        self.hparams = types.SimpleNamespace(config=config)
        self.training = False
        self.device = "cpu"
        for k, v in attrs.items():
            setattr(self, k, v)

    def log(self, *a, **k):
        pass

    def __getattr__(self, name):
        # torchmetrics lookups (train_mlm_loss, val_ifm_i2t_accuracy, ...)
        if name.startswith("_"):
            raise AttributeError(name)
        return lambda *a, **k: (a[0] if a else None)


def _t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _close(ref_loss, ours, rtol=1e-5):
    np.testing.assert_allclose(float(ref_loss), float(ours), rtol=rtol)


# ---------------------------------------------------------------------------


def test_mlm_loss_math(monkeypatch):
    rng = np.random.RandomState(0)
    B, N, V = 3, 7, 13
    logits = rng.randn(B, N, V).astype(np.float32)
    labels = rng.randint(0, V, (B, N))
    labels[rng.rand(B, N) < 0.6] = -100
    w = 1.7

    ref = _extract("compute_mlm")
    pl = _FakePL(
        {"vocab_size": V, "vl_mlm_weight": w},
        infer=lambda batch, **kw: {"text_feats": _t(logits),
                                   "text_labels": torch.from_numpy(labels),
                                   "text_ids": torch.zeros(B, N).long()},
        mlm_score=lambda x: x)
    want = ref(pl, {})["mlm_loss"]

    monkeypatch.setattr(jmodel, "infer", lambda *a, **kw: {
        "text_feats": jnp.asarray(logits),
        "text_labels": jnp.asarray(labels)})
    monkeypatch.setattr(jmodel, "mlm_head", lambda params, x: x)
    got = objectives.compute_mlm({}, None, {}, vl_mlm_weight=w)["mlm_loss"]
    _close(want, got)


def test_ifm_loss_math(monkeypatch):
    rng = np.random.RandomState(1)
    B, H = 5, 8
    feats = {k: rng.randn(B, H).astype(np.float32)
             for k in ("ic", "tc", "iv", "tv")}
    scale = np.float32(np.log(1 / 0.07) - 0.3)
    vl_scale = np.float32(np.log(1 / 0.07) + 0.2)
    ifm_weight = 0.8

    ref = _extract("compute_ifm")
    pl = _FakePL(
        {"ifm_weight": ifm_weight},
        infer_image=lambda b, **kw: {"cls_feats": _cpu(_t(feats["ic"])),
                                     "cls_vlffn_feats": _cpu(_t(feats["iv"]))},
        infer_text=lambda b, **kw: {"cls_feats": _cpu(_t(feats["tc"])),
                                    "cls_vlffn_feats": _cpu(_t(feats["tv"]))},
        logit_scale=torch.tensor(scale),
        logit_vl_scale=torch.tensor(vl_scale))
    want = ref(pl, {})["ifm_loss"]

    monkeypatch.setattr(jmodel, "infer_image", lambda *a, **kw: {
        "cls_feats": jnp.asarray(feats["ic"]),
        "cls_vlffn_feats": jnp.asarray(feats["iv"])})
    monkeypatch.setattr(jmodel, "infer_text", lambda *a, **kw: {
        "cls_feats": jnp.asarray(feats["tc"]),
        "cls_vlffn_feats": jnp.asarray(feats["tv"])})
    params = {"logit_scale": jnp.asarray(scale),
              "logit_vl_scale": jnp.asarray(vl_scale)}
    got = objectives.compute_ifm(params, None, {},
                                 ifm_weight=ifm_weight)["ifm_loss"]
    _close(want, got)


def test_irtr_loss_math(monkeypatch):
    rng = np.random.RandomState(2)
    B, H = 6, 4
    ic = rng.randn(B, H).astype(np.float32)
    tc = rng.randn(B, H).astype(np.float32)
    scale = np.float32(1.234)

    ref = _extract("compute_irtr")
    pl = _FakePL(
        {},
        infer_image_ft=lambda b, **kw: {"cls_feats": _cpu(_t(ic))},
        infer_text_ft=lambda b, **kw: {"cls_feats": _cpu(_t(tc))},
        logit_scale=torch.tensor(scale))
    want = ref(pl, {})["irtr_loss"]

    monkeypatch.setattr(jmodel, "infer_image_ft",
                        lambda *a, **kw: {"cls_feats": jnp.asarray(ic)})
    monkeypatch.setattr(jmodel, "infer_text_ft",
                        lambda *a, **kw: {"cls_feats": jnp.asarray(tc)})
    got = objectives.compute_irtr({"logit_scale": jnp.asarray(scale)},
                                  None, {})["irtr_loss"]
    _close(want, got)


def test_vqa_loss_math(monkeypatch):
    rng = np.random.RandomState(3)
    B, L = 4, 17
    logits = rng.randn(B, L).astype(np.float32)
    vqa_labels = [[1, 5], [0], [3, 7, 9], []]
    vqa_scores = [[0.9, 0.3], [1.0], [0.6, 0.3, 0.3], []]

    ref = _extract("compute_vqa")
    pl = _FakePL(
        {"vqav2_label_size": L},
        infer=lambda b, **kw: {"cls_feats": _t(logits)},
        vqa_classifier=lambda x: x)
    ref_out = ref(pl, {"vqa_labels": vqa_labels, "vqa_scores": vqa_scores})
    want = ref_out["vqa_loss"]
    dense = ref_out["vqa_targets"].numpy()   # reference's own densify loop

    monkeypatch.setattr(jmodel, "infer",
                        lambda *a, **kw: {"cls_feats": jnp.asarray(logits)})
    monkeypatch.setattr(jmodel, "vqa_head", lambda params, x: x)
    got = objectives.compute_vqa(
        {}, None, {"vqa_targets": jnp.asarray(dense)})["vqa_loss"]
    _close(want, got)


def test_nlvr2_loss_math(monkeypatch):
    rng = np.random.RandomState(4)
    B, H = 5, 6
    c1 = rng.randn(B, H).astype(np.float32)
    c2 = rng.randn(B, H).astype(np.float32)
    W = rng.randn(2 * H, 2).astype(np.float32)
    answers = [1, 0, 1, 1, 0]

    ref = _extract("compute_nlvr2")
    pl = _FakePL(
        {},
        infer=lambda b, image_token_type_idx=1, **kw: {
            "cls_feats": _t(c1 if image_token_type_idx == 1 else c2)},
        nlvr2_classifier=lambda x: x @ torch.from_numpy(W))
    want = ref(pl, {"answers": answers, "table_name": ["dev"] * B})[
        "nlvr2_loss"]

    def fake_infer(params, spec, batch, image_token_type_idx=1, **kw):
        return {"cls_feats": jnp.asarray(
            c1 if image_token_type_idx == 1 else c2)}

    monkeypatch.setattr(jmodel, "infer", fake_infer)
    monkeypatch.setattr(jmodel, "nlvr2_head",
                        lambda params, x: x @ jnp.asarray(W))
    got = objectives.compute_nlvr2(
        {}, None, {"answers": jnp.asarray(answers)})["nlvr2_loss"]
    _close(want, got)


def test_img_cls_loss_math(monkeypatch):
    rng = np.random.RandomState(5)
    B, N, H, C = 3, 9, 4, 11
    feats = rng.randn(B, N, H).astype(np.float32)
    W = rng.randn(H, C).astype(np.float32)
    labels = [2, 7, 0]

    ref = _extract("compute_img_cls")
    pl = _FakePL(
        {},
        infer_image_ft=lambda b, **kw: {"image_feats": _t(feats)},
        img_cls_classifier=lambda x: x @ torch.from_numpy(W))
    want = ref(pl, {"class_label": torch.tensor(labels)})["cls_loss"]

    monkeypatch.setattr(jmodel, "infer_image_ft",
                        lambda *a, **kw: {"image_feats": jnp.asarray(feats)})
    monkeypatch.setattr(jmodel, "img_cls_head",
                        lambda params, x: x @ jnp.asarray(W))
    got = objectives.compute_img_cls(
        {}, None, {"class_label": jnp.asarray(labels)})["img_cls_loss"]
    _close(want, got)


def test_mim_loss_math(monkeypatch):
    rng = np.random.RandomState(6)
    B, P, V, H = 3, 8, 19, 5
    feats = rng.randn(B, P + 1, H).astype(np.float32)  # incl. cls token
    W = rng.randn(H, V).astype(np.float32)
    labels = rng.randint(0, V, (B, P))
    masked = rng.rand(B, P) < 0.5
    masked[0, 0] = True  # at least one

    ref = _extract("compute_mim")
    dvae = types.SimpleNamespace(
        get_codebook_indices=lambda img: torch.from_numpy(labels),
        decoder=types.SimpleNamespace(vocab_size=V))
    pl = _FakePL(
        {},
        infer=lambda b, **kw: {"image_feats": _t(feats)},
        mim_score=lambda x: x @ torch.from_numpy(W),
        d_vae=dvae)
    batch_ref = {
        "image_masked_pos": [torch.from_numpy(masked)],
        "image_target": [torch.zeros(B, 3, 4, 4)],
    }
    want = ref(pl, batch_ref)["mim_loss"]

    monkeypatch.setattr(jmodel, "infer",
                        lambda *a, **kw: {"image_feats": jnp.asarray(feats)})
    monkeypatch.setattr(jmodel, "mim_head",
                        lambda params, x: x @ jnp.asarray(W))
    got = objectives.compute_mim(
        {}, None,
        {"image_masked_pos": jnp.asarray(masked)},
        mim_labels=jnp.asarray(labels))["mim_loss"]
    _close(want, got)


def test_itm_hardneg_loss_math(monkeypatch):
    """Forced negative draws on both sides: pins the negative-batch
    assembly (image/text swap pattern, objectives.py:204-241) + CE."""
    rng = np.random.RandomState(7)
    B, H = 4, 6
    sim_i2t = rng.randn(B, B).astype(np.float32)
    sim_t2i = rng.randn(B, B).astype(np.float32)
    img = rng.randn(B, 3, 4, 4).astype(np.float32)
    ids = rng.randint(1, 50, (B, 5))
    masks = np.ones((B, 5), np.int64)
    Wcls = rng.randn(H, 2).astype(np.float32)
    neg_img_idx = [1, 2, 3, 0]   # draw per text row (t2i weights)
    neg_txt_idx = [3, 0, 1, 2]   # draw per image row (i2t weights)

    # cls features derived deterministically from (image, text) content so
    # the negative substitution flows through to the loss
    def cls_np(img_b, ids_b):
        a = img_b.reshape(img_b.shape[0], -1).mean(1)
        b = ids_b.astype(np.float32).mean(1)
        return (a[:, None] * np.linspace(0.5, 1.5, H)[None]
                + b[:, None] * np.linspace(-1, 1, H)[None]).astype(np.float32)

    class _TorchProxy(types.SimpleNamespace):
        def __getattr__(self, name):
            return getattr(torch, name)

    draws = iter(neg_img_idx + neg_txt_idx)
    proxy = _TorchProxy()
    proxy.multinomial = lambda w, n: torch.tensor([next(draws)])

    def ref_infer(batch, **kw):
        im = batch["image"]
        im = im[0] if isinstance(im, list) else im
        return {"cls_feats": _t(cls_np(im.numpy(), batch["text_ids"].numpy())),
                "text_ids": batch["text_ids"],
                "text_masks": batch["text_masks"],
                "image": im}

    ref = _extract("compute_itm_hardneg", extra_ns={"torch": proxy})
    pl = _FakePL({}, infer=ref_infer,
                 itm_score=lambda x: x @ torch.from_numpy(Wcls))
    batch_ref = {
        "image": torch.from_numpy(img),
        "text_ids": torch.from_numpy(ids),
        "text_ids_mlm": torch.from_numpy(ids),
        "text_labels": torch.zeros(B, 5).long(),
        "text_masks": torch.from_numpy(masks),
    }
    want = ref(pl, batch_ref, torch.from_numpy(sim_i2t),
               torch.from_numpy(sim_t2i))["itm_loss"]

    calls = {"n": 0}

    def fake_categorical(key, logits, axis=1):
        calls["n"] += 1
        # ours draws images first (r_i over w_t2i), then texts
        return jnp.asarray(neg_img_idx if calls["n"] == 1 else neg_txt_idx)

    def fake_jinfer(params, spec, batch, image=None, train=False, rng=None,
                    **kw):
        im = image if image is not None else batch["image"]
        return {"cls_feats": jnp.asarray(
            cls_np(np.asarray(im), np.asarray(batch["text_ids"])))}

    monkeypatch.setattr(jax.random, "categorical", fake_categorical)
    monkeypatch.setattr(jmodel, "infer", fake_jinfer)
    monkeypatch.setattr(jmodel, "itm_head",
                        lambda params, x: x @ jnp.asarray(Wcls))
    got = objectives.compute_itm_hardneg(
        {}, None,
        {"image": jnp.asarray(img), "text_ids": jnp.asarray(ids),
         "text_masks": jnp.asarray(masks)},
        jnp.asarray(sim_i2t), jnp.asarray(sim_t2i))["itm_loss"]
    _close(want, got)


def test_irtr_recall_ranking_vs_executed_reference():
    """Recall@k both directions (objectives.py:684-710): execute the
    reference's ranking statements on canned features and compare with
    evaluation.retrieval._topk_ids."""
    from vl_merging_tpu.evaluation.retrieval import _topk_ids

    with open(REF) as f:
        tree = ast.parse(f.read())
    fn = next(n for n in tree.body if isinstance(n, ast.FunctionDef)
              and n.name == "compute_irtr_recall")
    start = next(i for i, s in enumerate(fn.body)
                 if isinstance(s, ast.Assign)
                 and ast.unparse(s.targets[0]) == "scores")
    stmts = [s for s in fn.body[start:] if not isinstance(s, ast.Return)]

    rng = np.random.RandomState(8)
    n_img, n_txt, H = 12, 37, 6
    img = rng.randn(n_img, H).astype(np.float32)
    txt = rng.randn(n_txt, H).astype(np.float32)
    # caption->image ids: uneven grouping incl. ids that match nothing
    tiids_np = rng.randint(0, n_img + 2, n_txt)
    iids_np = np.arange(n_img)

    ns = {"torch": torch,
          "img_cls_feats": torch.from_numpy(img),
          "txt_cls_feats": torch.from_numpy(txt),
          "iids": torch.from_numpy(iids_np),
          "tiids": torch.from_numpy(tiids_np)}
    exec(compile(ast.Module(body=stmts, type_ignores=[]), REF, "exec"), ns)

    scores = jnp.asarray(img) @ jnp.asarray(txt).T
    got = _topk_ids(scores, jnp.asarray(iids_np), jnp.asarray(tiids_np))
    for k in ("ir_r1", "ir_r5", "ir_r10", "tr_r1", "tr_r5", "tr_r10"):
        np.testing.assert_allclose(float(got[k]), float(ns[k]), rtol=1e-6,
                                   err_msg=k)
