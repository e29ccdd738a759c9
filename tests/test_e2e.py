"""End-to-end CLI tests on synthetic arrow fixtures (ViT-tiny scale).

The JAX-native analogue of the reference's `task_test_vit_tiny_*` fast
checks (reference config.py:535-608) — full train/val/test through the
real entry point over the 8-device CPU mesh.
"""

import json
import os

import numpy as np
import pytest

from fixtures import make_fixture_root


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return make_fixture_root(tmp_path_factory.mktemp("arrow"))


def cli_args(root, log_dir, *names, **over):
    args = list(names)
    overrides = dict(
        data_root=root, log_dir=log_dir,
        tokenizer=os.path.join(root, "vocab.txt"),
        hidden_size=32, num_heads=2, num_layers=2, image_size=64,
        patch_size=16, max_text_len=16, max_text_len_of_initckpt=16,
        vlffn_start_layer_index=1, precision="f32",
        per_device_batch_size=1, batch_size=8, num_workers=2,
        max_steps=2, warmup_steps=0, tasks=None, max_vl_text_len=None,
    )
    overrides.update(over)
    for k, v in overrides.items():
        args.append(f"{k}={v!r}" if isinstance(v, str) else f"{k}={v}")
    return args


def test_fit_pretrain_e2e(root, tmp_path):
    from vl_merging_tpu.run import main

    log_dir = str(tmp_path / "logs")
    main(cli_args(root, log_dir, datasets=["f30k"],
                  loss_names={"itm": 1, "mlm": 1, "ifm": 1}))
    # checkpoints written
    exp_dirs = os.listdir(log_dir)
    assert exp_dirs
    ckpt = os.path.join(log_dir, exp_dirs[0], "checkpoints", "last",
                        "weights.ckpt")
    assert os.path.exists(ckpt)
    # metrics logged
    mpath = os.path.join(log_dir, exp_dirs[0], "metrics.jsonl")
    lines = [json.loads(l) for l in open(mpath)]
    assert any("val/the_metric" in l for l in lines)


def test_validate_only_irtr_recall(root, tmp_path):
    from vl_merging_tpu.run import main

    log_dir = str(tmp_path / "logs")
    main(cli_args(root, log_dir, datasets=["f30k"],
                  loss_names={"irtr": 1}, get_recall_metric=True,
                  validation_only=True))


def test_nlvr2_fit(root, tmp_path):
    from vl_merging_tpu.run import main

    main(cli_args(root, str(tmp_path / "logs"), datasets=["nlvr2"],
                  loss_names={"nlvr2": 1}))


def test_nlvr2_finetune_from_pretrain_ckpt(root, tmp_path):
    """The path users actually take: 2-type pretrain → NLVR2 fine-tune.

    The pretrain checkpoint's (2, hs) token-type table must be expanded to
    (3, hs) with row 2 ← row 1 (reference vilt_module.py:332-337)."""
    import torch

    from vl_merging_tpu.run import main

    pre_dir = str(tmp_path / "pre")
    main(cli_args(root, pre_dir, datasets=["f30k"],
                  loss_names={"mlm": 1}, max_steps=1))
    exp = os.listdir(pre_dir)[0]
    ckpt = os.path.join(pre_dir, exp, "checkpoints", "last", "weights.ckpt")
    pre_tt = torch.load(ckpt, weights_only=False)["state_dict"][
        "token_type_embeddings.weight"]
    assert pre_tt.shape[0] == 2

    ft_dir = str(tmp_path / "ft")
    main(cli_args(root, ft_dir, datasets=["nlvr2"],
                  loss_names={"nlvr2": 1}, load_path=ckpt, max_steps=1))
    exp = os.listdir(ft_dir)[0]
    ft_ckpt = os.path.join(ft_dir, exp, "checkpoints", "last", "weights.ckpt")
    ft_tt = torch.load(ft_ckpt, weights_only=False)["state_dict"][
        "token_type_embeddings.weight"]
    assert ft_tt.shape[0] == 3


def test_gram_cache_cli(root, tmp_path):
    """Gram caching over an all_moe model; keys match reference naming."""
    from vl_merging_tpu.cache_gram_matrices import main

    log_dir = str(tmp_path / "gram")
    # ifm exercises all three expert paths (v, l towers + vlffn rerun), so
    # deep layers accumulate vl grams too; with irtr-only the vl experts
    # never fire and their grams are absent (same as the reference hooks)
    main(cli_args(root, log_dir, "all_moe", datasets=["f30k"],
                  loss_names={"ifm": 1},
                  representation_name="G"))
    import torch
    grams = torch.load(os.path.join(log_dir, "G.pth"), weights_only=False)
    keys = set(grams.keys())
    assert "transformer.blocks.0.attn.v" in keys
    assert "transformer.blocks.0.attn.v.proj" in keys
    assert "transformer.blocks.0.mlp.l.fc1" in keys
    assert "transformer.blocks.1.mlp.vl.fc2" in keys  # deep layer
    g = grams["transformer.blocks.0.mlp.v.fc1"]
    assert g.dtype == torch.float64
    assert g.shape == (32, 32)
    # gram is PSD-symmetric
    gn = g.numpy()
    np.testing.assert_allclose(gn, gn.T, rtol=1e-9)
    # device grams accumulate in f32 → eigenvalues PSD up to f32 rounding
    assert np.linalg.eigvalsh(gn).min() > -1e-4 * np.abs(gn).max()


def test_merge_and_finetune_cli(root, tmp_path):
    """SURVEY §3.3: train an all_moe model briefly, save, then load it into
    a ufo model through the CLI with merge_weights=True and fine-tune."""
    from vl_merging_tpu.run import main

    log1 = str(tmp_path / "moe")
    main(cli_args(root, log1, "all_moe", datasets=["f30k"],
                  loss_names={"itm": 1, "mlm": 1, "ifm": 1}))
    exp = os.listdir(log1)[0]
    ckpt = os.path.join(log1, exp, "checkpoints", "last", "weights.ckpt")
    assert os.path.exists(ckpt)

    log2 = str(tmp_path / "merged")
    main(cli_args(root, log2, "ufo", datasets=["f30k"],
                  loss_names={"irtr": 1}, load_path=ckpt,
                  merge_weights=True, merge_ratio=0.5))
    exp2 = os.listdir(log2)[0]
    assert os.path.exists(os.path.join(log2, exp2, "checkpoints", "last",
                                       "weights.ckpt"))


def test_test_only_vqa_submission(root, tmp_path):
    """test_only=True VQA path writes a submission json
    (reference objectives.py:724-769)."""
    import json as _json
    from vl_merging_tpu.run import main

    log_dir = str(tmp_path / "vqa")
    main(cli_args(root, log_dir, datasets=["vqa"],
                  loss_names={"vqa": 1}, test_only=True))
    # submission written under the experiment log dir
    found = []
    for dirpath, _, files in os.walk(log_dir):
        found += [os.path.join(dirpath, f) for f in files
                  if f.startswith("vqa_submit")]
    assert found, f"no submission under {log_dir}"
    subs = _json.load(open(found[0]))
    assert subs and {"question_id", "answer"} <= set(subs[0])


def test_imagenet1k_img_cls_fit(root, tmp_path):
    from vl_merging_tpu.run import main

    main(cli_args(root, str(tmp_path / "logs"), datasets=["imagenet1k"],
                  loss_names={"img_cls": 1}, image_only=True))


def test_validate_only_recall_with_itm_rerank(root, tmp_path):
    """Trainer wires itm_rerank_topk through to the recall pipeline."""
    from vl_merging_tpu.run import main

    # itm needs ifm's logits for hard negatives (same as the reference's
    # msrvtt config: irtr + ifm + itm)
    main(cli_args(root, str(tmp_path / "logs"), datasets=["f30k"],
                  loss_names={"irtr": 1, "ifm": 1, "itm": 1},
                  get_recall_metric=True,
                  itm_rerank_topk=2, validation_only=True))


def test_sharded_recall_equals_single_device(root, tmp_path):
    """Trainer.recall() shards tower extraction over the mesh's data axis
    (VERDICT r2 missing #1); per-row math is unchanged, so mesh(8) recall
    must equal mesh(1) recall BIT-FOR-BIT (reference objectives.py:572-710
    runs extraction redundantly per rank instead)."""
    from vl_merging_tpu.config import parse_cli
    from vl_merging_tpu.data.datamodule import MTDataModule
    from vl_merging_tpu.train.loop import Trainer

    def run(num_devices):
        cfg = parse_cli(cli_args(
            root, str(tmp_path / f"logs{num_devices}"), datasets=["f30k"],
            loss_names={"irtr": 1}, get_recall_metric=True,
            num_devices=num_devices))
        dm = MTDataModule(cfg)
        trainer = Trainer(cfg)
        assert trainer.mesh.devices.size == (num_devices or 8)
        return trainer.recall(dm, split="test")

    single = run(1)
    sharded = run(None)  # all 8 CPU devices
    assert single == sharded, (single, sharded)
    assert set(single) == {f"{d}_r{k}" for d in ("ir", "tr")
                           for k in (1, 5, 10)}


def test_sharded_vqa_predictions_equal_single_device(root, tmp_path):
    """The VQA test loop feeds padded batches with the mesh (same
    VERDICT r2 missing #1 as recall): mesh(8) must write the identical
    submission json as mesh(1)."""
    import json as _json
    from vl_merging_tpu.run import main

    def run(num_devices, scan_k=1):
        log_dir = str(tmp_path / f"vqa{num_devices}_{scan_k}")
        main(cli_args(root, log_dir, datasets=["vqa"],
                      loss_names={"vqa": 1}, test_only=True,
                      num_devices=num_devices, eval_scan_k=scan_k))
        for dirpath, _, files in os.walk(log_dir):
            for f in files:
                if f.startswith("vqa_submit"):
                    return _json.load(open(os.path.join(dirpath, f)))
        raise AssertionError(f"no submission under {log_dir}")

    single = run(1)
    sharded = run(None)  # all 8 CPU devices
    key = lambda r: r["question_id"]
    assert sorted(single, key=key) == sorted(sharded, key=key)
    # serving-loop scan (grouped dispatches + per-batch tail) must write
    # the identical submission, sharded too
    scanned = run(None, scan_k=2)
    assert sorted(scanned, key=key) == sorted(sharded, key=key)


def test_fit_with_grad_accumulation(root, tmp_path):
    """batch_size > per_device*devices → accumulation path through Trainer."""
    from vl_merging_tpu.run import main

    # 8 devices × per_device 1 = 8; batch_size 16 → accum_steps 2
    main(cli_args(root, str(tmp_path / "logs"), datasets=["f30k"],
                  loss_names={"irtr": 1}, batch_size=16, max_steps=1))


def test_msrvtt_video_irtr_recall_e2e(root, tmp_path):
    """Video retrieval config end-to-end: frame-TSV msrvtt fixture →
    datamodule → validate with recall (single-frame contract, reference
    task_finetune_irtr_msrvtt_frame_*)."""
    import base64
    import io
    import json

    import numpy as np
    from PIL import Image

    from vl_merging_tpu.data.tsv import write_tsv
    from vl_merging_tpu.run import main

    def b64(seed):
        rng = np.random.RandomState(seed)
        img = Image.fromarray(
            (rng.rand(48, 48, 3) * 255).astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="JPEG")
        return base64.b64encode(buf.getvalue()).decode()

    vdir = str(tmp_path / "video")
    for split in ("train", "val", "test"):
        rows = [[f"video{i}", "{}", b64(i), b64(i + 9), b64(i + 17)]
                for i in range(4)]
        write_tsv(rows, os.path.join(vdir, f"msrvtt_{split}.tsv"))
        caps = {f"video{i}": [f"a clip number {i}"] for i in range(4)}
        with open(os.path.join(vdir, f"msrvtt_{split}.caption.json"),
                  "w") as f:
            json.dump(caps, f)

    log_dir = str(tmp_path / "logs")
    main(cli_args(vdir, log_dir, "task_finetune_irtr_msrvtt_frame_square_randaug_base",
                  tokenizer=os.path.join(root, "vocab.txt"),
                  loss_names={"irtr": 1}, get_recall_metric=True,
                  validation_only=True))
    metrics = os.path.join(
        log_dir, os.listdir(log_dir)[0], "metrics.jsonl")
    with open(metrics) as f:
        lines = [json.loads(l) for l in f]
    assert any("val/the_metric" in l or "val/irtr_loss" in l for l in lines)
