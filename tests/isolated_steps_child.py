"""Child process for tests that must run in a fresh interpreter
(driven by tests/test_trainer.py; not collected by pytest).

Why a subprocess: after ~100 in-process tests, jaxlib 0.9.0's XLA:CPU
executable materialization can segfault on the suite's largest program —
core-dump forensics (docs/design.md, "Test-gate reliability") show a
libc memcpy READ landing in an unmapped gap between JIT section
mappings (use-after-unmap inside jaxlib; trapno=14, err=0x4, the same
test crashed once on the compile path and once on the persistent-cache
deserialize path). The program is correct — it passes every time in a
fresh process (which is also how production uses it: one program, one
process). So the scenario runs here, in a clean interpreter, sharing
the suite's persistent compile cache.

argv: scenario_name
env: _HMMC_ISO_CACHE (optional persistent compile-cache dir)
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1200")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
cache = os.environ.get("_HMMC_ISO_CACHE")
if cache:
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def wide_steps():
    """Body of test_steps_run_when_embed_dim_differs_from_temporal_hidden:
    fine-tune + pretrain MoCo steps on a tower whose embed_dim (48) differs
    from temporal_hidden_size — the geometry the reference cannot run at
    all (module_cross.py:198)."""
    from hmmc_tpu.config import ClipArch, CrossConfig, TaskConfig
    from hmmc_tpu.models.pretrain import BirdPretrainModel, MoCoQueues
    from hmmc_tpu.models.retrieval import BirdModel
    from hmmc_tpu.train.optimization import build_optimizer
    from hmmc_tpu.train.trainer import (
        FinetuneState, PretrainState, make_finetune_step, make_pretrain_step)

    L, F = 8, 4
    cross = CrossConfig(temporal_hidden_size=32, temporal_attention_heads=2,
                        temporal_hidden_layers=2, max_position_embeddings=8)
    wide = ClipArch(
        embed_dim=48, image_resolution=32, vision_layers=2, vision_width=64,
        vision_patch_size=16, context_length=16, vocab_size=256,
        transformer_width=32, transformer_heads=2, transformer_layers=2)
    rng = np.random.default_rng(5)
    b = 8
    qids = rng.integers(1, 200, size=(b, L)).astype(np.int32)
    qids[:, -1] = 255  # EOT-ish max token
    qmask = np.ones((b, L), np.int32)
    video = rng.normal(size=(b, F, 32, 32, 3)).astype(np.float32)
    batch = {"query_ids": jnp.asarray(qids), "query_mask": jnp.asarray(qmask),
             "video": jnp.asarray(video)}
    model = BirdModel(wide, cross)
    params = model.init(jax.random.PRNGKey(0), batch["query_ids"],
                        batch["query_mask"], batch["video"])["params"]
    pe = params["visual_encoder"]["frame_position_embeddings"]
    assert pe.shape[-1] == 48, pe.shape  # sized from the tower
    tx = build_optimizer(params, lr=1e-3, text_lr=1e-4, coef_lr=1.0,
                         weight_decay=0.2, warmup_proportion=0.1, t_total=50)
    state = FinetuneState.create(params, tx)
    step = make_finetune_step(model, tx, cross, use_frame_fea=True)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))

    task = TaskConfig(do_pretrain=True, dataset="msrvtt",
                      contrast_num_negative=32, max_frames=F,
                      contrast_temperature=0.07, contrast_momentum=0.9)
    pmodel = BirdPretrainModel(wide, cross, vocab_size=256)
    variables = pmodel.init(
        jax.random.PRNGKey(0), batch["query_ids"], batch["query_mask"],
        batch["video"])
    ptx = build_optimizer(variables["params"], lr=1e-3, text_lr=1e-4,
                          coef_lr=1.0, weight_decay=0.2,
                          warmup_proportion=0.1, t_total=50)
    queues = MoCoQueues.create(jax.random.PRNGKey(1), wide.embed_dim,
                               task.contrast_num_negative, F)
    pstate = PretrainState.create(variables, ptx, queues)
    pstep = make_pretrain_step(
        pmodel, ptx, cross, task, mask_token_id=254, pad_token_id=255,
        cls_token_id=1)
    pbatch = {"title_ids": batch["query_ids"],
              "title_mask": batch["query_mask"], "video": batch["video"]}
    pstate, pm = pstep(pstate, pbatch, jax.random.PRNGKey(3))
    for k in ("loss", "loss_FAM", "loss_VTM", "loss_FTM", "loss_MLM"):
        assert np.isfinite(float(pm[k])), k
    print("wide_steps OK")


def accum_queue():
    """Body of test_pretrain_grad_accumulation_per_micro_queue: the
    n_accum=2 MoCo step (EMA -> key forward -> enqueue PER MICRO-BATCH,
    reference modeling.py:368-412) vs the unaccumulated step. The second
    repeat offender of the jaxlib materialization segfault: two full-suite
    runs died at this statement (once on the compile path, once on the
    persistent-cache deserialize), both only after ~140 in-process tests;
    it passes every time in a fresh interpreter."""
    import test_trainer as tt
    from hmmc_tpu.models.pretrain import BirdPretrainModel
    from hmmc_tpu.parallel import MeshSpec, make_mesh, shard_batch

    B = tt.B
    state, step2, batch = tt._pretrain_setup(n_accum=2)
    mesh = make_mesh(MeshSpec(dp=8))
    batch = shard_batch(mesh, batch)
    ptr0 = int(state.queues.ptr)

    model = BirdPretrainModel(tt.TINY, tt.TINY_CROSS, vocab_size=256)
    title_k = model.apply(
        {"params": {"text_encoder": state.params["text_encoder"]}},
        batch["title_ids"], batch["title_mask"], method="encode_text")
    expect = np.asarray(title_k)
    expect = expect / np.linalg.norm(expect, axis=-1, keepdims=True)

    state2, m2 = step2(state, batch, jax.random.PRNGKey(3))
    for k in ("loss", "loss_FAM", "loss_VTM", "loss_FTM", "loss_MLM"):
        assert np.isfinite(float(m2[k])), k
    # ptr advances by the FULL batch
    assert int(state2.queues.ptr) == (ptr0 + B) % 32
    # enqueued columns equal the normalized title keys in batch order
    # (the first EMA is identity since params_k starts as a copy)
    got = np.asarray(state2.queues.title_cross)[:, ptr0:ptr0 + B].T
    np.testing.assert_allclose(got, expect, atol=1e-5)

    # fresh identical setup, no accumulation: VTM must differ (same
    # queues at micro 1, but micro 2 contrasts against micro 1's keys)
    state1, step1, batch1 = tt._pretrain_setup(n_accum=1)
    batch1 = shard_batch(mesh, batch1)
    _, m1 = step1(state1, batch1, jax.random.PRNGKey(3))
    assert not np.isclose(float(m1["loss_VTM"]), float(m2["loss_VTM"]))
    print("accum_queue OK")


SCENARIOS = {"wide_steps": wide_steps, "accum_queue": accum_queue}

if __name__ == "__main__":
    SCENARIOS[sys.argv[1]]()
