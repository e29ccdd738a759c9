"""Optimizer param groups + LR schedule vs the EXECUTED reference.

Extracts ``set_schedule`` (src/vilt/modules/vilt_utils.py:225-359) and
executes it against a faked pl_module whose named_parameters() are OUR
parameter names: the reference's own group-membership predicates and
transformers scheduler then serve as the oracle for
``train/optimizer.param_masks`` and ``train/schedule.make_schedule``.
"""

import ast
import os
import types

import numpy as np
import pytest
import torch

from vl_merging_tpu.config import build_config
from vl_merging_tpu.models import make_model_spec, param_shapes
from vl_merging_tpu.train.optimizer import param_masks
from vl_merging_tpu.train.schedule import make_schedule

REF = "/root/reference/src/vilt/modules/vilt_utils.py"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference not present")


def _extract_set_schedule():
    import transformers

    with open(REF) as f:
        tree = ast.parse(f.read())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "set_schedule")
    ns = {
        "torch": torch,
        # group/LR comparison only needs param_groups + LambdaLR; torch's
        # AdamW has the same decoupled-wd grouping as transformers'
        "AdamW": torch.optim.AdamW,
        "get_polynomial_decay_schedule_with_warmup":
            transformers.get_polynomial_decay_schedule_with_warmup,
        "get_cosine_schedule_with_warmup":
            transformers.get_cosine_schedule_with_warmup,
        "print": lambda *a, **k: None,
    }
    exec(compile(ast.Module(body=[fn], type_ignores=[]), REF, "exec"), ns)
    return ns["set_schedule"]


def _tiny_cfg(*modes, **over):
    overrides = dict(
        vit="vit_tiny_patch16_224", hidden_size=64, num_heads=2,
        num_layers=3, image_size=64, patch_size=16, max_text_len=8,
        max_text_len_of_initckpt=16, vlffn_start_layer_index=2,
        precision="f32")
    overrides.update(over)
    return build_config(*modes, overrides=overrides)


def _run_reference(cfg, names, max_steps):
    set_schedule = _extract_set_schedule()
    tensors = [torch.nn.Parameter(torch.zeros(2)) for _ in names]
    pl = types.SimpleNamespace(
        hparams=types.SimpleNamespace(config=cfg),
        named_parameters=lambda: list(zip(names, tensors)),
        trainer=types.SimpleNamespace(max_steps=max_steps),
    )
    (opt,), (sched,) = set_schedule(pl)
    id2name = {id(t): n for n, t in zip(names, tensors)}
    groups = [{id2name[id(p)] for p in g["params"]}
              for g in opt.param_groups]
    return opt, sched["scheduler"], groups


@pytest.mark.parametrize("task,mode,over", [
    ("task_finetune_vqa_square_randaug_base_image384_ufo", "ufo",
     dict(lr_mult=10)),
    ("task_mlm_itm_ifm_square_randaug_base", "all_moe", {}),
    ("task_finetune_irtr_coco_square_randaug_base_image384", "ufo",
     dict(all_mlp_mult=True, lr_mult=5)),
    ("task_finetune_imagenet_square_randaug_base_image224", "all_moe",
     dict(all_vl_mult=True, all_v_mult=True, lr_mult=2)),
])
def test_param_groups_vs_executed_reference(task, mode, over):
    cfg = _tiny_cfg(task, mode, **over)
    spec = make_model_spec(cfg)
    names = sorted(param_shapes(spec))
    _, _, ref_groups = _run_reference(cfg, names, max_steps=100)

    masks = param_masks({n: None for n in names}, cfg)
    ours = [
        {n for n in names if masks["decay_base"][n]},                  # g0
        {n for n in names
         if not masks["decay_base"][n] and not masks["head"][n]},      # g1
        {n for n in names if masks["decay_head"][n]},                  # g2
        {n for n in names
         if masks["head"][n] and not masks["decay_head"][n]},          # g3
    ]
    for i, (want, got) in enumerate(zip(ref_groups, ours)):
        assert got == want, (
            f"group {i}: extra={sorted(got - want)[:5]} "
            f"missing={sorted(want - got)[:5]}")


@pytest.mark.parametrize("decay_power,warmup,lr_mult", [
    (1, 10, 1), (1, 0.1, 10), ("cosine", 5, 1), (2, 7, 3),
])
def test_schedule_values_vs_executed_reference(decay_power, warmup, lr_mult):
    max_steps = 40
    cfg = _tiny_cfg("task_mlm_itm_ifm_square_randaug_base",
                    decay_power=decay_power, warmup_steps=warmup,
                    lr_mult=lr_mult, learning_rate=3e-4, end_lr=1e-6,
                    max_steps=max_steps)
    spec = make_model_spec(cfg)
    names = sorted(param_shapes(spec))
    opt, scheduler, _ = _run_reference(cfg, names, max_steps)

    sched_fn = make_schedule(cfg, max_steps)
    # LambdaLR rewrites group["lr"] in place; base_lrs holds the group
    # bases [lr, lr, lr*mult, lr*mult]
    base_lrs = scheduler.base_lrs
    for step in (0, 1, 3, 7, 15, 25, 39, 40):
        # transformers schedulers are LambdaLR: lr = base_lr * λ(step)
        lam = scheduler.lr_lambdas[0](step)
        ours = float(sched_fn(step))
        np.testing.assert_allclose(ours, base_lrs[0] * lam,
                                   rtol=5e-5, atol=1e-12,
                                   err_msg=f"base lr at step {step}")
        np.testing.assert_allclose(
            ours * lr_mult, base_lrs[2] * lam, rtol=5e-5, atol=1e-12,
            err_msg=f"head lr at step {step}")


# ---------------------------------------------------------------------------
# epoch_wrapup / the_metric (vilt_utils.py:56-207)
# ---------------------------------------------------------------------------


class _FakeMetric:
    def __init__(self, value):
        self._v = value

    def compute(self):
        return torch.tensor(float(self._v))

    def reset(self):
        pass


class _WrapupPL:
    """pl_module stub: metric attributes resolve from a canned dict."""

    def __init__(self, config, metrics):
        self.hparams = types.SimpleNamespace(config=config)
        self.training = False
        self.global_step = 0
        self.logger = types.SimpleNamespace(
            experiment=types.SimpleNamespace(add_scalar=lambda *a, **k: None))
        self._metrics = metrics
        self.logged = {}

    def log(self, name, value):
        self.logged[name] = float(value)

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return _FakeMetric(self._metrics.get(name, 0.0))


def _extract_epoch_wrapup(recall_tuple):
    with open(REF) as f:
        tree = ast.parse(f.read())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "epoch_wrapup")
    ns = {"torch": torch, "print": lambda *a, **k: None,
          "compute_irtr_recall":
              lambda pl, split="val": tuple(torch.tensor(float(v))
                                            for v in recall_tuple)}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), REF, "exec"), ns)
    return ns["epoch_wrapup"]


import ast      # noqa: E402  (used by the wrapup extractor)
from vl_merging_tpu.evaluation.metrics import the_metric  # noqa: E402


@pytest.mark.parametrize("losses,recall", [
    ({"mlm": 1, "itm": 1, "ifm": 1}, None),
    ({"nlvr2": 1}, None),                 # dev vs test last-assignment quirk
    ({"irtr": 1}, (0.11, 0.2, 0.3, 0.17, 0.4, 0.5)),
    ({"vqa": 1}, None),
    ({"mlm": 1, "mim": 1, "img_cls": 1}, None),
])
def test_the_metric_vs_executed_reference(losses, recall):
    rng = np.random.RandomState(9)
    vals = {}
    computed = {}
    for name in ("mlm", "mim", "itm", "img_cls", "text_only_mlm",
                 "image_only_mim"):
        v = float(rng.rand())
        vals[f"val_{name}_accuracy"] = v
        computed[f"{name}_accuracy"] = v
    vals["val_vqa_score"] = computed["vqa_score"] = float(rng.rand())
    for split in ("dev", "test"):
        v = float(rng.rand())
        vals[f"{split}_nlvr2_accuracy"] = v
        computed[f"{split}_nlvr2_accuracy"] = v
    for k in ("i2t", "t2i"):
        v = float(rng.rand())
        vals[f"val_irtr_{k}_accuracy"] = v
        computed[f"irtr_{k}_accuracy"] = v
        v = float(rng.rand())
        vals[f"val_ifm_{k}_accuracy"] = v
        computed[f"ifm_{k}_accuracy"] = v
        v = float(rng.rand())
        vals[f"val_ifm_vl_{k}_accuracy"] = v
        computed[f"ifm_vl_{k}_accuracy"] = v

    loss_names = {k: 0 for k in
                  ("itm", "ifm", "mlm", "vqa", "nlvr2", "irtr", "mim",
                   "image_only_mim", "text_only_mlm", "img_cls")}
    loss_names.update(losses)
    cfg = {"get_recall_metric": recall is not None,
           "loss_names": loss_names}

    ref = _extract_epoch_wrapup(recall or ())
    pl = _WrapupPL(cfg, vals)
    ref(pl)
    want = pl.logged["val/the_metric"]

    rec = None
    if recall is not None:
        rec = dict(zip(("ir_r1", "ir_r5", "ir_r10",
                        "tr_r1", "tr_r5", "tr_r10"), recall))
    got = the_metric(loss_names, computed, recall=rec)
    np.testing.assert_allclose(got, want, rtol=1e-6)
