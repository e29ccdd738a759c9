"""Two-process jax.distributed smoke: multi-host paths on a CPU 'cluster'.

The multi-host code paths (torchrun-style env bootstrap via
``parallel.initialize_multihost``, per-process batch assembly via
``parallel.global_put`` / ``make_array_from_process_local_data``, the
checkpoint param allgather, and the per-rank VQA submission merge) are
exercised in the single-process suite only by construction arguments —
no test actually runs ``jax.process_count() > 1``.  This tool does: it
launches TWO OS processes, each with 2 virtual CPU devices (4 global),
rendezvoused through ``jax.distributed`` exactly like a 2-host TPU pod
slice would be (reference analogue: the OpenMPI rank bootstrap + DDP over
hosts, src/run.py:70-138,204-288).

Checks (all hard asserts):
  1. ``parallel.initialize_multihost`` boots from torchrun-style env vars.
  2. ``shard_batch``/``global_put`` assemble a global batch from per-host
     slices — verified element-exact against the single-process value.
  3. Two optimizer steps of the REAL train step (ufo mode, fsdp=2 sharded
     params) match a single-process 4-device run: losses to 1e-4, updated
     params to the same tolerance ladder the in-suite mesh-equivalence
     test uses.
  4. The checkpoint allgather path (every process materializes sharded
     params; rank 0 writes) round-trips: gathered == initial - update,
     finite, and identical across ranks.
  5. ``write_vqa_submission`` merges per-rank records through the shared
     dir + barrier into one json containing every rank's rows.

Run:  python tools/multiprocess_smoke.py            (launcher; ~2-6 min)
      python tools/multiprocess_smoke.py --rank N   (internal child)
      python tools/multiprocess_smoke.py --single   (internal reference)

The launcher exits 0 and prints MULTIPROCESS SMOKE OK on success.
tests/test_multiprocess.py wraps this under @pytest.mark.slow.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PORT = int(os.environ.get("SMOKE_PORT", "29511"))


# ---------------------------------------------------------------------------
# workload (runs inside children — single-process and per-rank identically)
# ---------------------------------------------------------------------------

def _force_cpu(n_local_devices: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count="
        f"{n_local_devices}").strip()


def _tiny_cfg():
    from vl_merging_tpu.config import build_config

    # threefry: partitionable bits are identical under any sharding, so the
    # 2-proc and 1-proc runs draw the same dropout masks (same rationale as
    # tests/test_train.py::test_multi_device_step_equals_single_device)
    return build_config("ufo", overrides=dict(
        hidden_size=32, num_heads=2, num_layers=2, image_size=32,
        patch_size=16, max_text_len=8, max_text_len_of_initckpt=16,
        vlffn_start_layer_index=1, precision="f32", max_steps=100,
        warmup_steps=0, learning_rate=5e-3, tasks=None,
        use_sharded_training=True, train_rng_impl="threefry"))


def _make_batch(spec, bsz=16, seed=3):
    import numpy as np

    rng = np.random.RandomState(seed)
    ids = rng.randint(0, spec.vocab_size, (bsz, spec.max_text_len))
    labels = np.full((bsz, spec.max_text_len), -100)
    mask_pos = rng.rand(bsz, spec.max_text_len) < 0.15
    labels[mask_pos] = ids[mask_pos]
    ids_mlm = ids.copy()
    ids_mlm[mask_pos] = 103
    return {
        "text_ids": ids,
        "text_ids_mlm": ids_mlm,
        "text_labels": np.full((bsz, spec.max_text_len), -100, np.int32),
        "text_labels_mlm": labels.astype(np.int32),
        "text_masks": np.ones((bsz, spec.max_text_len), np.int32),
        "image": rng.randn(bsz, 3, spec.image_size, spec.image_size)
                    .astype(np.float32),
    }


def _digest(params) -> dict:
    """Order-independent per-param summaries for cross-process compare."""
    import numpy as np

    out = {}
    for k, v in params.items():
        a = np.asarray(v, np.float64)
        out[k] = [float(a.sum()), float(np.abs(a).sum()),
                  float((a * a).sum())]
    return out


def run_workload(out_json: str, local_slice) -> None:
    """local_slice: None (single-process) or (lo, hi) rows of the global
    batch this process holds (the ShardedBatchSampler contract)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", True)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from vl_merging_tpu import parallel
    from vl_merging_tpu.models import make_model_spec, init_params
    from vl_merging_tpu.train import (
        make_optimizer, make_schedule, make_train_step, init_train_state)

    cfg = _tiny_cfg()
    spec = make_model_spec(cfg)
    mesh = parallel.make_mesh(fsdp=2)  # 4 global devices → data=2 × fsdp=2
    assert mesh.devices.size == 4, mesh

    params = parallel.shard_params(init_params(spec, 0), mesh)
    init_digest = None
    if local_slice is not None:
        # checkpoint-materialization path: collective allgather of the
        # fsdp-sharded params — every process must reach it (loop.py
        # _save_checkpoint); identical across ranks by construction
        from jax.experimental import multihost_utils
        gathered = {k: multihost_utils.process_allgather(v, tiled=True)
                    for k, v in params.items()}
        init_digest = _digest(gathered)
    else:
        init_digest = _digest({k: np.asarray(v) for k, v in params.items()})

    full = _make_batch(spec)
    batch_np = (full if local_slice is None else
                {k: v[local_slice[0]:local_slice[1]] for k, v in full.items()})

    # --- check 2: global batch assembly matches the single-process array
    sharded = parallel.shard_batch(dict(batch_np), mesh)
    if local_slice is not None:
        from jax.experimental import multihost_utils
        img = multihost_utils.process_allgather(sharded["image"], tiled=True)
        np.testing.assert_array_equal(np.asarray(img), full["image"])

    # --- check 3: two real optimizer steps
    sched = make_schedule(cfg, cfg["max_steps"])
    opt = make_optimizer(params, cfg, cfg["max_steps"], sched)
    state = init_train_state(params, opt, seed=0)
    step_fn = make_train_step(cfg, spec, opt, dp_scale=1 / 8, donate=False)
    state2, metrics = step_fn(state, sharded)
    state3, metrics2 = step_fn(state2, sharded)
    losses = [float(metrics["total_loss"]), float(metrics2["total_loss"])]
    assert all(np.isfinite(losses)), losses

    # --- check 4: checkpoint allgather of the UPDATED sharded params
    if local_slice is not None:
        from jax.experimental import multihost_utils
        final = {k: multihost_utils.process_allgather(v, tiled=True)
                 for k, v in state3.params.items()}
    else:
        final = {k: np.asarray(v) for k, v in state3.params.items()}
    for k, v in final.items():
        assert np.isfinite(np.asarray(v)).all(), k

    result = dict(process_count=jax.process_count(),
                  losses=losses, init=init_digest, final=_digest(final))

    # --- check 6: retrieval recall pipeline over GLOBAL-built batches
    # (Trainer.recall indexes the dataset directly on every process;
    # device_feed_global slices each process's row share before assembly,
    # and the concat/score/topk pipeline runs jitted on global arrays)
    from vl_merging_tpu.evaluation.retrieval import compute_irtr_recall
    from vl_merging_tpu.train.loop import device_feed_global

    rngr = np.random.RandomState(7)
    n_txt, n_img = 12, 8
    text_batches = []
    for _ in range(2):  # 12 texts padded into two global batches of 8
        ids = rngr.randint(0, spec.vocab_size, (8, spec.max_text_len))
        text_batches.append({"text_ids": ids,
                             "text_masks": np.ones_like(ids, np.int32)})
    image_batches = [{
        "image": rngr.randn(n_img, 3, spec.image_size, spec.image_size)
                     .astype(np.float32)}]
    tiids = np.asarray([i % n_img for i in range(n_txt)])
    iids = np.arange(n_img)
    rec = compute_irtr_recall(
        params, spec,
        [device_feed_global(b, mesh) for b in text_batches],
        [device_feed_global(b, mesh) for b in image_batches],
        tiids, iids)
    result["recall"] = rec

    # --- check 7: fetch_global + process_rows (the eval fetch mechanism:
    # per-example jit outputs are batch-sharded global arrays on
    # multi-host; vqa_predictions / the NLVR2 logits path gather then
    # slice this host's contiguous share)
    if local_slice is not None:
        from vl_merging_tpu import parallel as par
        doubled = jax.jit(lambda a: a * 2.0)(sharded["image"])
        fetched = par.fetch_global(doubled)
        np.testing.assert_array_equal(fetched, full["image"] * 2.0)
        rows = par.process_rows(fetched.shape[0])
        np.testing.assert_array_equal(fetched[rows], batch_np["image"] * 2.0)
        result["fetch_global"] = "ok"

        # --- check 8: ragged picklable-object gather (the reference's
        # dist_utils.all_gather pickle+pad protocol)
        rank = jax.process_index()
        objs = par.all_gather_objects(
            {"rank": rank, "tag": "x" * (5 + 10 * rank)})
        assert [o["rank"] for o in objs] == [0, 1], objs
        assert [len(o["tag"]) for o in objs] == [5, 15], objs
        result["obj_gather"] = "ok"

    # --- check 5: per-rank VQA submission merge (multi-process only)
    if local_slice is not None:
        from vl_merging_tpu.evaluation.downstream import write_vqa_submission
        rank = jax.process_index()
        sub_dir = os.path.dirname(out_json)
        rets = [{"question_id": 100 * rank + i, "answer": f"a{rank}_{i}"}
                for i in range(3 + rank)]  # unequal lengths on purpose
        path = write_vqa_submission(rets, "smoke", sub_dir)
        if rank == 0:
            with open(path) as fp:
                merged = json.load(fp)
            got = sorted(r["question_id"] for r in merged)
            assert got == [0, 1, 2, 100, 101, 102, 103], got
            result["vqa_merge"] = "ok"

    if local_slice is None or jax.process_index() == 0:
        with open(out_json, "w") as fp:
            json.dump(result, fp)
    print(f"workload done: losses={losses}")


# ---------------------------------------------------------------------------
# child entry points
# ---------------------------------------------------------------------------

def child_single(out_json: str) -> None:
    _force_cpu(4)
    run_workload(out_json, None)


def child_rank(rank: int, out_json: str) -> None:
    _force_cpu(2)
    # torchrun-style env → exercises parallel.initialize_multihost's
    # cluster_spec_from_env mapping end-to-end (mesh.py:64-71)
    os.environ.update(WORLD_SIZE="2", RANK=str(rank),
                      MASTER_ADDR="localhost", MASTER_PORT=str(PORT))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vl_merging_tpu import parallel

    assert parallel.initialize_multihost() is True
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()
    lo = rank * 8
    run_workload(out_json, (lo, lo + 8))


# ---------------------------------------------------------------------------
# launcher
# ---------------------------------------------------------------------------

def launch() -> int:
    import numpy as np

    tmp = tempfile.mkdtemp(prefix="mp_smoke_")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "WORLD_SIZE", "RANK")}
    me = os.path.abspath(__file__)

    single_json = os.path.join(tmp, "single.json")
    r = subprocess.run([sys.executable, me, "--single", single_json],
                       env=env, timeout=900)
    if r.returncode != 0:
        print("FAIL: single-process reference run", file=sys.stderr)
        return 1

    multi_json = os.path.join(tmp, "multi", "multi.json")
    os.makedirs(os.path.dirname(multi_json))
    procs = [subprocess.Popen(
        [sys.executable, me, "--rank", str(rank), multi_json], env=env)
        for rank in (0, 1)]
    try:
        codes = [p.wait(timeout=1200) for p in procs]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    if any(codes):
        print(f"FAIL: multi-process ranks exited {codes}", file=sys.stderr)
        return 1

    with open(single_json) as fp:
        single = json.load(fp)
    with open(multi_json) as fp:
        multi = json.load(fp)
    assert multi["process_count"] == 2
    assert multi.get("vqa_merge") == "ok"
    assert multi.get("fetch_global") == "ok"
    assert multi.get("obj_gather") == "ok"
    # recall ratios are quantized (k/N): any difference is a rank flip
    assert multi["recall"] == single["recall"], (single["recall"],
                                                 multi["recall"])
    for a, b in zip(single["losses"], multi["losses"]):
        assert abs(a - b) < 1e-4 * max(1.0, abs(a)), (a, b)
    for phase in ("init", "final"):
        for k, s in single[phase].items():
            m = multi[phase][k]
            # tolerance scales with the leaf's MAGNITUDE (abs-sum), not the
            # digest entry itself: the plain sum cancels to ~0 on zero-mean
            # weights, so f32 reduction-order noise across the two runs is
            # tiny relative to abs-sum but huge relative to the sum
            scale = max(1.0, s[1])
            for x, y in zip(s, m):
                assert abs(x - y) <= 2e-5 * scale, (phase, k, s, m)
    print(f"MULTIPROCESS SMOKE OK  losses={multi['losses']}")
    return 0


if __name__ == "__main__":
    if "--single" in sys.argv:
        child_single(sys.argv[sys.argv.index("--single") + 1])
    elif "--rank" in sys.argv:
        i = sys.argv.index("--rank")
        child_rank(int(sys.argv[i + 1]), sys.argv[i + 2])
    else:
        sys.exit(launch())
