"""Child process for the multi-process `jax.distributed` integration test
(driven by tests/test_multihost.py; not collected by pytest).

Each process owns 4 virtual CPU devices and its 1/process_count shard of
every global batch (BatchLoader process sharding, the DistributedSampler
semantics of dataloaders/dataloader.py:14); `shard_batch` assembles the
global jax.Array via jax.make_array_from_process_local_data and the jitted
fine-tune step runs over the dp mesh — the full --multihost path
(runner.py) minus the real DCN fabric. A second phase runs two MoCo
pretrain steps to prove queue/ptr/EMA consistency across process counts
(the dist_collect-before-enqueue contract of modeling.py:244-284). The
single-process invocation (nproc=1, 8 local devices) produces the ground
truth the 2-process run must reproduce exactly.

argv: proc_id nproc coordinator local_devices out_json [barrier_prefix]
"""

import json
import os
import sys
import time


class SynthDataset:
    """Deterministic per-index samples — identical on every process."""

    def __init__(self, n, frames=2, res=16, ctx=8, vocab=64):
        self.n, self.frames, self.res, self.ctx, self.vocab = (
            n, frames, res, ctx, vocab)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import numpy as np

        g = np.random.default_rng(1000 + i)
        ids = g.integers(2, self.vocab, size=self.ctx).astype(np.int32)
        ids[0] = 1
        ids[-2:] = 0
        mask = (ids != 0).astype(np.int32)
        video = g.normal(size=(self.frames, self.res, self.res, 3)).astype(
            np.float32)
        return {"query_ids": ids, "query_mask": mask, "video": video,
                "idx": np.int32(i)}


def main():
    proc_id, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, local_devices, out_path = (
        sys.argv[3], int(sys.argv[4]), sys.argv[5])

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
        # same 1-core rendezvous-timeout guard as tests/conftest.py
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    cache = os.environ.get("_HMMC_MH_CACHE")
    import jax

    jax.config.update("jax_platforms", "cpu")
    # keep ASYNC cpu dispatch — sync dispatch deadlocks multi-device
    # collectives (capacity-1 inflight semaphore vs blocking rendezvous,
    # see tests/conftest.py point 1)
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    barrier_prefix = sys.argv[6] if len(sys.argv) > 6 else None

    def barrier(stage: str) -> None:
        """File-sentinel barrier: on a loaded 1-core host the children's
        heavy phases (imports, per-program compiles) serialize, so without
        alignment one process reaches a cross-process rendezvous minutes
        before its sibling — Gloo's KV-store connect window at the FIRST
        COLLECTIVE EXECUTION is a hard-coded 30 s, and the coordination
        service's shutdown barrier has its own deadline. Align before
        every such rendezvous; all processes then enter within one poll
        interval."""
        if not barrier_prefix or nproc == 1:
            return
        open(f"{barrier_prefix}.{stage}.{proc_id}", "w").close()
        deadline = time.monotonic() + 570
        while any(not os.path.exists(f"{barrier_prefix}.{stage}.{j}")
                  for j in range(nproc)):
            if time.monotonic() > deadline:
                raise RuntimeError(f"barrier timeout at stage {stage}")
            time.sleep(0.05)

    if nproc > 1:
        barrier("imports")
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=nproc, process_id=proc_id,
                                   initialization_timeout=600)
    assert jax.process_count() == nproc
    assert jax.device_count() == 8, jax.device_count()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax.numpy as jnp
    import numpy as np

    from hmmc_tpu.config import ClipArch, CrossConfig
    from hmmc_tpu.data.loader import BatchLoader
    from hmmc_tpu.models.retrieval import BirdModel
    from hmmc_tpu.parallel.mesh import MeshSpec, make_mesh, shard_batch
    from hmmc_tpu.train.optimization import build_optimizer
    from hmmc_tpu.train.trainer import FinetuneState, make_finetune_step

    VOCAB, CTX, RES, F = 64, 8, 16, 2
    arch = ClipArch(
        embed_dim=32, image_resolution=RES, vision_layers=2,
        vision_width=64, vision_patch_size=8, context_length=CTX,
        vocab_size=VOCAB, transformer_width=64, transformer_heads=1,
        transformer_layers=2)
    cross = CrossConfig(temporal_hidden_size=32, temporal_attention_heads=2,
                        temporal_hidden_layers=1, max_position_embeddings=8)
    model = BirdModel(arch, cross)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, CTX), jnp.int32),
        jnp.ones((1, CTX), jnp.int32),
        jnp.zeros((1, F, RES, RES, 3), jnp.float32))["params"]
    tx = build_optimizer(params, lr=1e-3, text_lr=1e-4, coef_lr=1.0,
                         weight_decay=0.01, warmup_proportion=0.1,
                         t_total=4)
    state = FinetuneState.create(params, tx)
    step = make_finetune_step(model, tx, cross, use_frame_fea=True)

    mesh = make_mesh(MeshSpec(dp=8))
    loader = BatchLoader(
        SynthDataset(32, frames=F, res=RES, ctx=CTX, vocab=VOCAB),
        batch_size=16, shuffle=True, drop_last=True, num_workers=1,
        seed=5, process_index=jax.process_index(),
        process_count=jax.process_count())
    loader.set_epoch(0)

    losses, gnorms = [], []
    compiled_step = None
    for batch in loader:
        dev = shard_batch(mesh, batch)
        if compiled_step is None:
            # AOT-compile BEFORE the compile barrier: compilation is
            # process-local, execution is the first cross-process
            # rendezvous (Gloo context creation) — align right before it
            compiled_step = step.lower(state, dev).compile()
            barrier("ft_compiled")
        state, m = compiled_step(state, dev)
        losses.append(float(m["loss"]))
        gnorms.append(float(m["grad_norm"]))

    # parameter fingerprint AFTER the optimizer updates (replicated
    # global arrays — identical on every process)
    fp = float(sum(
        float(jnp.sum(jnp.abs(x.astype(jnp.float64))))
        for x in jax.tree_util.tree_leaves(state.params)))

    # ---- pretrain phase: MoCo queue consistency across processes ----
    # The reference gathers keys with dist_collect before enqueueing so
    # every rank holds identical queues (modeling.py:244-284), and its
    # ptr arithmetic assumes a deterministic global enqueue order. Here
    # the enqueue is a dynamic_update_slice on the globally-sharded key
    # array inside ONE jitted step, so the order is fixed by the global
    # array layout — this run proves queues, ptr and losses are
    # process-count invariant by execution.
    from hmmc_tpu.config import TaskConfig
    from hmmc_tpu.models.pretrain import BirdPretrainModel, MoCoQueues
    from hmmc_tpu.train.trainer import PretrainState, make_pretrain_step

    task = TaskConfig(do_pretrain=True, dataset="msrvtt",
                      contrast_num_negative=32, max_frames=F,
                      contrast_temperature=0.07, contrast_momentum=0.9)
    pmodel = BirdPretrainModel(arch, cross, vocab_size=VOCAB)
    variables = pmodel.init(
        jax.random.PRNGKey(0), jnp.zeros((1, CTX), jnp.int32),
        jnp.ones((1, CTX), jnp.int32),
        jnp.zeros((1, F, RES, RES, 3), jnp.float32))
    ptx = build_optimizer(variables["params"], lr=1e-3, text_lr=1e-4,
                          coef_lr=1.0, weight_decay=0.01,
                          warmup_proportion=0.1, t_total=4)
    queues = MoCoQueues.create(jax.random.PRNGKey(1), arch.embed_dim,
                               task.contrast_num_negative, F)
    pstate = PretrainState.create(variables, ptx, queues)
    pstep = make_pretrain_step(pmodel, ptx, cross, task, mask_token_id=62,
                               pad_token_id=0, cls_token_id=1)
    loader.set_epoch(1)
    plosses = []
    compiled_pstep = None
    for k, batch in enumerate(loader):
        dev = shard_batch(mesh, {"title_ids": batch["query_ids"],
                                 "title_mask": batch["query_mask"],
                                 "video": batch["video"]})
        rng_k = jax.random.PRNGKey(100 + k)
        if compiled_pstep is None:
            compiled_pstep = pstep.lower(pstate, dev, rng_k).compile()
            barrier("pt_compiled")
        pstate, pm = compiled_pstep(pstate, dev, rng_k)
        plosses.append(float(pm["loss"]))
    queue_fp = float(sum(
        float(jnp.sum(jnp.abs(x.astype(jnp.float64))))
        for x in jax.tree_util.tree_leaves(pstate.queues)
        if x.dtype != jnp.int32))  # ptr compared exactly, separately
    key_fp = float(sum(
        float(jnp.sum(jnp.abs(x.astype(jnp.float64))))
        for x in jax.tree_util.tree_leaves(pstate.params_k)))

    if jax.process_index() == 0:
        with open(out_path, "w") as f:
            json.dump({"losses": losses, "gnorms": gnorms,
                       "fingerprint": fp,
                       "pretrain_losses": plosses,
                       "queue_fingerprint": queue_fp,
                       "queue_ptr": int(pstate.queues.ptr),
                       "key_fingerprint": key_fp,
                       "process_count": int(jax.process_count())}, f)
    if nproc > 1:
        # on a 1-core host the two children serialize, so one can reach
        # shutdown minutes before the other and trip the coordination
        # service's shutdown barrier deadline — sync on a real collective
        # first so both arrive together, and treat shutdown-teardown
        # noise as non-fatal (the numerical results are already on disk)
        try:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("hmmc-mh-done")
        except Exception as e:
            print(f"pre-shutdown sync failed: {e}", file=sys.stderr)
        try:
            jax.distributed.shutdown()
        except Exception as e:
            print(f"shutdown noise: {e}", file=sys.stderr)
        os._exit(0)


if __name__ == "__main__":
    main()
