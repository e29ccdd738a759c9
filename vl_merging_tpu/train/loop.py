"""Training orchestration: the fit/validate/test loops.

Replaces the reference's pl.Trainer wiring (reference: src/run.py:141-295)
with an explicit loop: sharded device batches, one pjit-compiled train
step, periodic validation with the_metric checkpoint selection
(save_top_k=1 + last, reference run.py:189-195), gradient accumulation
derived from the global batch size (run.py:210-212), resume support, and
JSONL + optional TensorBoard logging.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ckpt import io as ckpt_io
from ..ckpt.pipeline import load_params
from ..evaluation import (MetricAccumulator, compute_irtr_recall, the_metric,
                          vqa_predictions, write_vqa_submission)
from ..evaluation.downstream import nlvr2_split_update
from ..models import make_model_spec, model
from ..models.spec import ModelSpec
from .. import parallel
from . import train_step as ts
from .optimizer import make_optimizer
from .schedule import make_schedule

ARRAY_KEYS_EXCLUDED = ("text", "qid", "vqa_labels", "vqa_scores",
                       "vqa_answer", "table_name", "iid", "img_index",
                       "cap_index", "raw_index", "replica")


def eval_cast_params(params, spec, cfg):
    """One-time bf16 pre-cast of f32 master params for eval sweeps.

    When the compute dtype is bf16 every matmul casts its weight per use
    anyway, so pre-casting 2-D+ ``.weight`` leaves is numerically
    identical there and halves weight HBM reads (~2% tower throughput,
    tools/eval_attrib_probe.py).  Kept f32: 1-D leaves (LN scales/
    biases, gammas), the f32 rel-pos bias tables, and the
    text_embeddings.* tables (their LayerNorm runs on the f32 rows
    BEFORE the compute-dtype cast, model.text_embed) — so the output is
    bit-identical to feeding the f32 masters."""
    if (spec.compute_dtype != "bfloat16"
            or not cfg.get("eval_params_bf16", True)):
        if spec.eval_int8:
            from ..ops.int8 import quantize_eval_params

            return quantize_eval_params(params)
        return params
    out = {
        k: (v.astype(jnp.bfloat16)
            if (hasattr(v, "dtype") and v.dtype == jnp.float32
                and v.ndim >= 2 and k.endswith(".weight")
                and "bias_table" not in k
                and not k.startswith("text_embeddings."))
            else v)
        for k, v in params.items()}
    if spec.eval_int8:
        # W8A8 eval mode: add int8 companions (quantized from the f32
        # masters — exact over the bf16 cast) for the block projections;
        # mome._block_fast routes through ops/int8 when it sees them
        from ..ops.int8 import quantize_eval_params

        q = quantize_eval_params(params)
        out.update({k: v for k, v in q.items() if k not in params})
    return out


def pad_to_multiple(batch: Dict, size: int):
    """Pad every batch-leading array up to ``size`` rows by repeating the
    final row; returns ``(padded_batch, n_valid)``.

    Used by the eval loops so every feed has one static shape (one compile)
    and is divisible by the mesh device count (shardable).  Repeating a real
    row — instead of zero-filling — keeps the padded rows numerically
    ordinary (an all-zero text_mask row would softmax over -inf).  Callers
    slice outputs back to ``n_valid``.
    """
    n = next(v.shape[0] for v in batch.values()
             if isinstance(v, np.ndarray) and v.ndim >= 1)
    if size <= n:
        return batch, n
    out = {}
    for k, v in batch.items():
        if (isinstance(v, np.ndarray) and v.ndim >= 1 and v.shape[0] == n
                and v.dtype != object):
            out[k] = np.concatenate(
                [v, np.repeat(v[-1:], size - n, axis=0)], axis=0)
        else:
            out[k] = v
    return out, n


def pad_batch_for_mesh(batch: Dict, ndev: int):
    """Pad a (possibly mixed-task nested) batch to ``ndev``-divisible rows
    via :func:`pad_to_multiple`; returns ``(padded, n_valid)`` where
    ``n_valid`` is the top-level true row count (None for nested batches,
    whose sub-batches are padded independently)."""
    if any(isinstance(v, dict) for v in batch.values()):
        return {k: (pad_batch_for_mesh(v, ndev)[0] if isinstance(v, dict)
                    else v) for k, v in batch.items()}, None
    n = next((v.shape[0] for v in batch.values()
              if isinstance(v, np.ndarray) and v.ndim >= 1), None)
    if n is None:
        return batch, None
    return pad_to_multiple(batch, -(-n // ndev) * ndev)


def host_filter(batch: Dict) -> Dict:
    """Numeric host arrays only (python payloads dropped); mixed-task
    batches ({"v": …, "l": …, "vl": …}) recurse per task."""
    feed = {}
    for k, v in batch.items():
        if k in ARRAY_KEYS_EXCLUDED:
            continue
        if isinstance(v, dict):
            feed[k] = host_filter(v)
        elif isinstance(v, np.ndarray) and v.dtype != object:
            feed[k] = v
    return feed


def device_feed_global(batch: Dict, mesh) -> Dict:
    """``device_feed`` for batches where EVERY process holds the full
    global rows (``Trainer.recall`` indexes the dataset directly instead
    of going through the per-host-sharded loader): slice this process's
    contiguous row share first, then assemble.  Single-process this is
    exactly ``device_feed``."""
    feed = host_filter(batch)
    if jax.process_count() > 1:
        from ..parallel.host import process_rows

        def sl(d):
            return {k: (sl(v) if isinstance(v, dict)
                        else v[process_rows(v.shape[0])])
                    for k, v in d.items()}
        feed = sl(feed)
    return device_feed(feed, mesh)


def device_feed(batch: Dict, mesh=None) -> Dict:
    """Numeric arrays → (sharded) device arrays; python payloads dropped."""
    feed = host_filter(batch)

    def put(d):
        if mesh is None:
            return {k: (put(v) if isinstance(v, dict) else jnp.asarray(v))
                    for k, v in d.items()}
        flat = {k: v for k, v in d.items() if not isinstance(v, dict)}
        sharded = parallel.shard_batch(flat, mesh)
        return {k: (put(v) if isinstance(v, dict) else sharded[k])
                for k, v in d.items()}

    return put(feed)


def vci_to_opt_steps(vci, micro_per_epoch: int, accum_steps: int):
    """Convert ``val_check_interval`` to an optimizer-step cadence.

    Lightning semantics (reference run.py plumbs the raw config value into
    pl.Trainer): a float < 1.0 validates that fraction of the epoch into
    training; 1.0 means epoch-end only (None here — the epoch boundary
    handles it); an int validates every N LOADER batches, which at
    accum_steps micro-batches per optimizer step is N//accum optimizer
    steps."""
    if isinstance(vci, float):
        if vci >= 1.0:
            return None
        return max(1, int(micro_per_epoch * vci) // accum_steps)
    return max(1, int(vci) // accum_steps)


class JsonlLogger:
    def __init__(self, log_dir: str, name: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        try:  # optional TensorBoard (reference run.py:196-199)
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(os.path.join(log_dir, "tb", name))
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, float]) -> None:
        rec = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)


class Trainer:
    def __init__(self, cfg: Dict, mim_label_fn=None):
        self.cfg = cfg
        self.spec: ModelSpec = make_model_spec(cfg)
        if cfg["use_cpu"]:  # reference's CPU dry-run path (run.py:236-261)
            from ..utils.platform import force_cpu
            force_cpu()
        parallel.initialize_multihost()
        fsdp = 2 if (cfg["use_sharded_training"]
                     and jax.device_count() % 2 == 0) else 1
        self.mesh = parallel.make_mesh(num_devices=cfg["num_devices"],
                                       fsdp=fsdp)
        self.mim_label_fn = mim_label_fn

        params, missing, unexpected = load_params(cfg, self.spec)
        if missing:
            print(f"missing_keys: {missing}")
        if unexpected:
            print(f"unexpected_keys: {unexpected}")
        self.params = parallel.shard_params(params, self.mesh)

        per_dev = cfg["per_device_batch_size"]
        if not per_dev:
            # the reference makes per_gpu_batchsize mandatory too
            # (config.py:111 "you should define this manually"; run.py:211
            # divides by it) — silently substituting batch_size here would
            # inflate the effective batch by the device count
            raise ValueError(
                "per_device_batch_size must be set (> 0); it is the "
                "reference's per_gpu_batchsize")
        self.local_batch = per_dev * self.mesh.devices.size
        self.accum_steps = max(
            1, cfg["batch_size"] // (per_dev * jax.device_count()))

        self.eval_fn = ts.make_eval_step(cfg, self.spec,
                                         mim_label_fn=self.mim_label_fn)
        # device_augment host RNG (crop boxes / op choices); one stream,
        # offset by process index so multi-host draws decorrelate
        self._aug_rng = np.random.RandomState(
            cfg["seed"] + 7919 * jax.process_index())

        self.exp_name = (f'{cfg["exp_name"]}_seed{cfg["seed"]}'
                         f'_from_{os.path.basename(cfg["load_path"])[:-5]}'
                         if cfg["load_path"] else
                         f'{cfg["exp_name"]}_seed{cfg["seed"]}')
        self.log_dir = os.path.join(cfg["log_dir"], self.exp_name)
        self.logger = JsonlLogger(self.log_dir, "metrics")
        self.best_metric = -float("inf")

    # -- loop construction -------------------------------------------------
    def _resolve_max_steps(self, opt_steps_per_epoch: int) -> int:
        cfg = self.cfg
        if cfg["max_steps"] is not None:
            return cfg["max_steps"]
        return opt_steps_per_epoch * cfg["max_epoch"]

    def _build_step(self, max_steps: int):
        cfg = self.cfg
        sched = make_schedule(cfg, max_steps)
        self.optimizer = make_optimizer(self.params, cfg, max_steps, sched)
        self.state = ts.init_train_state(self.params, self.optimizer,
                                         seed=cfg["seed"])
        dp_scale = 1.0 / jax.device_count()
        self.step_fn = ts.make_train_step(
            cfg, self.spec, self.optimizer, dp_scale=dp_scale,
            accum_steps=self.accum_steps, mim_label_fn=self.mim_label_fn)

    def _bind_tokenizer(self, datamodule) -> None:
        """device_mlm mode: resolve mask_token_id from the datamodule's
        tokenizer before any step traces (the jitted closures capture the
        cfg DICT, so mutating the key here is visible at trace time)."""
        if self.cfg.get("device_mlm") and \
                self.cfg.get("mask_token_id") is None:
            coll = getattr(datamodule, "mlm_collator", None)
            self.cfg["mask_token_id"] = (
                coll.tokenizer.mask_token_id if coll is not None else 103)

    # -- fit ----------------------------------------------------------------
    def fit(self, datamodule) -> None:
        cfg = self.cfg
        self._bind_tokenizer(datamodule)
        train_loader = datamodule.train_loader(self.local_batch)
        # two step units: the loader yields MICRO-batches; the optimizer
        # advances once per accum_steps of them.  `step`/`max_steps`/
        # val cadence are OPTIMIZER steps; per-epoch loader caps are micro.
        micro_per_epoch = max(1, int(len(train_loader) *
                                     cfg["limit_train_batches"]))
        opt_steps_per_epoch = max(1, micro_per_epoch // self.accum_steps)
        max_steps = self._resolve_max_steps(opt_steps_per_epoch)
        self._build_step(max_steps)
        self._maybe_resume()

        vci_opt = vci_to_opt_steps(cfg["val_check_interval"],
                                   micro_per_epoch, self.accum_steps)

        step = int(self.state.step)
        t_last = time.time()
        train_metrics = MetricAccumulator()
        pending = []  # device-resident per-step metrics; fetched in bulk

        def flush_metrics():
            """ONE host fetch for all buffered steps (a per-metric float()
            every step costs one device->host round-trip each — ~125 ms on
            the axon tunnel — and stalls the donated-buffer pipeline)."""
            if not pending:
                return None
            keys = sorted(pending[0])
            vals = np.asarray(jnp.stack(
                [jnp.stack([jnp.asarray(m[k], jnp.float32) for k in keys])
                 for m in pending]))
            for row in vals:
                train_metrics.update(dict(zip(keys, row)))
            pending.clear()
            return dict(zip(keys, vals[-1]))

        epoch = 0
        done = False
        while not done and epoch < cfg["max_epoch"] * 10:
            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(epoch)
            elif hasattr(train_loader, "batch_sampler"):
                train_loader.batch_sampler.set_epoch(epoch)
            micro_buf = []
            for i, batch in enumerate(train_loader):
                if i >= micro_per_epoch:
                    break
                if cfg["fast_dev_run"] and step >= 1:
                    done = True
                    break
                if cfg.get("device_augment"):
                    # host side of the in-graph augment: sample the scalar
                    # random choices; pixels move once, as uint8
                    batch = ts.attach_augment_params(batch, cfg,
                                                     self._aug_rng)
                micro_buf.append(batch)
                if len(micro_buf) < self.accum_steps:
                    continue
                feed = self._stack_micro(micro_buf)
                micro_buf = []

                self.state, metrics = self.step_fn(self.state, feed)
                step += 1
                pending.append(metrics)

                if step % 10 == 0:
                    dt = time.time() - t_last
                    t_last = time.time()
                    scalars = {k: float(v)
                               for k, v in (flush_metrics() or {}).items()}
                    scalars["steps_per_sec"] = 10 / dt
                    self.logger.log(step, scalars)
                    print(f"step {step}/{max_steps} "
                          f"loss={scalars.get('total_loss', 0):.4f} "
                          f"({scalars['steps_per_sec']:.2f} it/s)")

                if step >= max_steps:
                    done = True
                    break
                if vci_opt is not None and step % vci_opt == 0:
                    flush_metrics()
                    self._validate_and_checkpoint(datamodule, step)
            epoch += 1
            if not done or cfg["fast_dev_run"]:
                flush_metrics()
                self._wrapup_train_epoch(train_metrics, step)
                self._validate_and_checkpoint(datamodule, step)
        flush_metrics()
        self._validate_and_checkpoint(datamodule, step, final=True)

    def _stack_micro(self, micro_buf):
        if self.accum_steps == 1:
            return device_feed(micro_buf[0], self.mesh)
        from jax.sharding import PartitionSpec as P

        feeds = [host_filter(b) for b in micro_buf]
        # (accum, micro, …): batch axis 1 shards over the mesh;
        # parallel.global_put assembles from process-local slices on
        # multi-host runs (each host stacks only its own batch share)
        spec = P(None, (parallel.DATA_AXIS, parallel.FSDP_AXIS))

        def stack(sub):  # mixed-task feeds nest one dict level per task
            return {k: (stack([f[k] for f in sub])
                        if isinstance(sub[0][k], dict) else
                        parallel.global_put(np.stack([f[k] for f in sub]),
                                            self.mesh, spec))
                    for k in sub[0]}

        return stack(feeds)

    def _wrapup_train_epoch(self, acc: MetricAccumulator, step: int) -> None:
        computed = acc.compute()
        if computed:
            self.logger.log(step, {f"train/{k}": v
                                   for k, v in computed.items()
                                   if v is not None})
        acc.reset()

    # -- validation ----------------------------------------------------------
    def _validate_and_checkpoint(self, datamodule, step: int,
                                 final: bool = False) -> None:
        metrics = self.validate(datamodule)
        tm = metrics.get("val/the_metric", 0.0)
        self.logger.log(step, metrics)
        self._save_checkpoint("last")
        if tm >= self.best_metric:
            self.best_metric = tm
            self._save_checkpoint("best")

    def validate(self, datamodule) -> Dict[str, float]:
        cfg = self.cfg
        self._bind_tokenizer(datamodule)
        try:
            loader = datamodule.val_loader(self.local_batch)
        except FileNotFoundError:
            return {}
        acc = MetricAccumulator()
        rng = jax.random.PRNGKey(0)
        limit = (int(len(loader) * cfg["limit_val_batches"])
                 if cfg["limit_val_batches"] != 1.0 else None)
        params = self.state.params if hasattr(self, "state") else self.params
        ndev = self.mesh.devices.size
        for i, batch in enumerate(loader):
            if limit is not None and i >= limit:
                break
            # Pad the tail batch to device divisibility by repeating the
            # final row; the duplicated rows enter the scalar loss metrics,
            # which matches the reference's DistributedSampler wrap
            # duplication on multi-rank eval.  Per-example paths below
            # slice back to n_valid.
            padded, n_valid = pad_batch_for_mesh(batch, ndev)
            feed = device_feed(padded, self.mesh)
            rng, key = jax.random.split(rng)
            metrics = self.eval_fn(params, feed, key)
            # one stacked fetch per batch (per-key np.asarray would pay
            # one ~125 ms tunnel round-trip per metric per batch)
            keys = sorted(metrics)
            if jax.process_count() > 1:
                # jit scalars are fully replicated → float() is legal on
                # multi-host, where the eager jnp.stack would raise
                vals = np.asarray([float(metrics[k]) for k in keys],
                                  np.float32)
            else:
                vals = np.asarray(jnp.stack(
                    [jnp.asarray(metrics[k], jnp.float32) for k in keys]))
            metrics = dict(zip(keys, vals))
            if "table_name" in batch and "nlvr2_loss" in metrics:
                logits_fn = self._nlvr2_logits_fn()
                # global (B_global, 2) logits; THIS host's loader share is
                # the contiguous rows_per_host block starting at its rank
                # offset (answers/table_name are host-local payloads)
                lg = parallel.fetch_global(logits_fn(params, feed))
                lo = parallel.process_rows(lg.shape[0]).start
                nlvr2_split_update(acc, lg[lo:lo + n_valid],
                                   np.asarray(batch["answers"]),
                                   batch["table_name"])
            acc.update(metrics)

        if any("_nlvr2_" in k for k in acc.sums):
            # the only HOST-side tallies (fed from each process's loader
            # share); every jit metric is already a global-batch value
            acc.cross_process_reduce(
                [f"{s}_nlvr2_{t}" for s in ("dev", "test")
                 for t in ("correct", "count")])
        computed = acc.compute()
        recall = None
        out = {}
        if cfg["get_recall_metric"]:
            # reference computes recall on BOTH splits: val first (logged as
            # recalls/val_avg), then test — the_metric uses the TEST-split
            # r1s (vilt_utils.py:66-79, 101)
            try:
                val_recall = self.recall(datamodule, split="val")
            except FileNotFoundError:
                val_recall = {}
            if val_recall:
                out["recalls/val_avg"] = float(
                    np.mean([val_recall[f"{d}_r{k}"]
                             for d in ("ir", "tr") for k in (1, 5, 10)]))
            recall = self.recall(datamodule, split="test")
            out["recalls/test_avg"] = float(
                np.mean([recall[f"{d}_r{k}"]
                         for d in ("ir", "tr") for k in (1, 5, 10)]))
            computed.update(recall)
        tm = the_metric(cfg["loss_names"], computed, recall)
        out.update({f"val/{k}": v for k, v in computed.items()
                    if v is not None})
        out["val/the_metric"] = tm
        return out

    def _nlvr2_logits_fn(self):
        if not hasattr(self, "_nlvr2_fn"):
            spec = self.spec

            @jax.jit
            def fn(params, batch):
                i1 = model.infer(params, spec, batch, image_token_type_idx=1)
                i2 = model.infer(params, spec, batch, image_token_type_idx=2)
                cls = jnp.concatenate(
                    [i1["cls_feats"], i2["cls_feats"]], axis=-1)
                return model.nlvr2_head(params, cls)
            self._nlvr2_fn = fn
        return self._nlvr2_fn

    # -- retrieval recall ----------------------------------------------------
    def recall(self, datamodule, split: str = "test") -> Dict[str, float]:
        """Tower extraction SHARDED over the mesh's data axis: each batch is
        padded to one static, device-divisible shape and fed with
        ``device_feed(b, self.mesh)``, so all chips split the forward work;
        ``compute_irtr_recall`` slices features back to the true counts.
        (reference runs extraction redundantly per rank,
        objectives.py:572-710; SURVEY §7.5 calls for data-axis sharding.)"""
        dm = datamodule.dms[0]
        make = (dm.make_no_false_val_dset if split == "val"
                else dm.make_no_false_test_dset)
        text_dset = make()
        image_dset = make(image_only=True)
        params = self._eval_cast(
            self.state.params if hasattr(self, "state") else self.params)

        ndev = self.mesh.devices.size

        def collect(dset):
            # one static, device-divisible batch shape per tower
            bs = min(max(256 // ndev * ndev, ndev),
                     -(-len(dset) // ndev) * ndev)
            batches, ids = [], []
            for start in range(0, len(dset), bs):
                idx = range(start, min(start + bs, len(dset)))
                b = dset.collate([dset[i] for i in idx], dm.mlm_collator)
                ids += list(b["img_index"])
                b, _ = pad_to_multiple(b, bs)  # one shape → one compile
                # ids stay GLOBAL; each process feeds only its row share
                batches.append(device_feed_global(b, self.mesh))
            return batches, ids

        text_batches, tiids = collect(text_dset)
        image_batches, iids = collect(image_dset)

        out = compute_irtr_recall(
            params, self.spec, text_batches, image_batches,
            np.asarray(tiids), np.asarray(iids),
            itm_rerank_topk=self.cfg["itm_rerank_topk"])
        return out

    def _eval_cast(self, params):
        return eval_cast_params(params, self.spec, self.cfg)

    # -- test ----------------------------------------------------------------
    def test(self, datamodule) -> Dict[str, float]:
        cfg = self.cfg
        self._bind_tokenizer(datamodule)
        params = self._eval_cast(
            self.state.params if hasattr(self, "state") else self.params)
        results: Dict[str, float] = {}
        if cfg["loss_names"]["vqa"] > 0:
            id2answer = getattr(datamodule.dms[0], "id2answer", None)
            if id2answer is not None:
                ndev = self.mesh.devices.size

                def feeds():
                    # STREAM batches through the predict fn — materializing
                    # the whole test split on device first (447k images at
                    # real scale) would OOM HBM before inference starts
                    for batch in datamodule.test_loader(self.local_batch):
                        padded, n_valid = pad_to_multiple(
                            batch, -(-len(batch["qid"]) // ndev) * ndev)
                        feed = device_feed(padded, self.mesh)
                        # unpadded → predictions are sliced to n_valid
                        feed["qid"] = batch["qid"][:n_valid]
                        yield feed

                rets = vqa_predictions(
                    params, self.spec, feeds(), id2answer,
                    scan_k=int(cfg.get("eval_scan_k", 1)))
                model_name = os.path.basename(cfg["load_path"])[:-5] \
                    if cfg["load_path"] else self.exp_name
                path = write_vqa_submission(rets, model_name, self.log_dir)
                print(f"vqa submission: {path}")
        results.update(self.validate(datamodule))
        return results

    # -- checkpointing -------------------------------------------------------
    def _ckpt_dir(self, tag: str) -> str:
        return os.path.join(self.log_dir, "checkpoints", tag)

    def _save_checkpoint(self, tag: str) -> None:
        # Param materialization is a COLLECTIVE on multi-host fsdp runs
        # (shards live on other hosts' devices), so every process must
        # reach it — only the file writes are rank-0-only.
        params = self.state.params
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            params = {k: multihost_utils.process_allgather(v, tiled=True)
                      for k, v in params.items()}
        if jax.process_index() != 0:
            return
        sd = ckpt_io.params_to_state_dict(params)
        os.makedirs(self._ckpt_dir(tag), exist_ok=True)
        ckpt_io.save_torch_checkpoint(
            sd, os.path.join(self._ckpt_dir(tag), "weights.ckpt"))
        with open(os.path.join(self._ckpt_dir(tag), "meta.json"), "w") as f:
            json.dump({"step": int(self.state.step),
                       "best_metric": self.best_metric}, f)
        # full-state (opt/rng) resume point; single-process only — the
        # orbax save here is not a multi-controller collective, and
        # calling it from proc 0 alone on sharded state would deadlock
        if tag == "last" and jax.process_count() == 1:
            from .checkpointing import save_train_state
            try:
                save_train_state(self.state,
                                 os.path.join(self._ckpt_dir(tag), "state"))
            except Exception as e:
                print(f"full-state checkpoint failed ({e}); weights saved")

    def _maybe_resume(self) -> None:
        cfg = self.cfg
        path = None
        if cfg["resume_from"]:
            path = cfg["resume_from"]
        elif cfg["resume_during_pretraining"]:
            cand = os.path.join(self._ckpt_dir("last"), "weights.ckpt")
            if os.path.exists(cand):
                path = cand
        if path:
            # prefer the orbax full state (opt/rng) next to the weights
            full = os.path.join(os.path.dirname(path), "state")
            if os.path.isdir(full):
                from .checkpointing import restore_train_state
                self.state = restore_train_state(full, self.state)
                print(f"resumed full state from {full} "
                      f"at step {int(self.state.step)}")
                return
            sd = ckpt_io.load_torch_checkpoint(path)
            loaded, missing, _ = ckpt_io.state_dict_to_params(sd, self.spec)
            params = dict(self.state.params)
            params.update(parallel.shard_params(loaded, self.mesh))
            meta_path = os.path.join(os.path.dirname(path), "meta.json")
            step = 0
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    step = json.load(f).get("step", 0)
            self.state = ts.TrainState(
                params=params, opt_state=self.state.opt_state,
                step=jnp.asarray(step, jnp.int32), rng=self.state.rng)
            print(f"resumed weights from {path} at step {step}")
