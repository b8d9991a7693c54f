"""End-to-end train-step tests on a tiny architecture over an 8-device CPU
mesh (SURVEY §4: data-parallel semantics testable without a TPU)."""

import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from hmmc_tpu.config import ClipArch, CrossConfig, TaskConfig
from hmmc_tpu.models.pretrain import (
    BirdPretrainModel, MoCoQueues, mask_tokens, momentum_update)
from hmmc_tpu.models.retrieval import BirdModel
from hmmc_tpu.parallel import MeshSpec, make_mesh, shard_batch
from hmmc_tpu.train.optimization import build_optimizer
from hmmc_tpu.train.trainer import (
    FinetuneState, PretrainState, make_finetune_step, make_pretrain_step)

TINY = ClipArch(
    embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
    vision_patch_size=16, context_length=16, vocab_size=256,
    transformer_width=32, transformer_heads=2, transformer_layers=2)

TINY_CROSS = CrossConfig(
    temporal_hidden_size=32, temporal_attention_heads=2,
    temporal_hidden_layers=2, max_position_embeddings=8)

B, F, L = 16, 4, 8


def _text_batch(rng, n, length):
    ids = rng.integers(1, 200, size=(n, length)).astype(np.int32)
    ids[:, -1] = 255  # EOT-ish max token
    mask = np.ones((n, length), np.int32)
    return ids, mask


def test_finetune_step_runs_and_descends():
    rng = np.random.default_rng(0)
    model = BirdModel(TINY, TINY_CROSS)
    qids, qmask = _text_batch(rng, B, L)
    video = rng.normal(size=(B, F, 32, 32, 3)).astype(np.float32)
    batch = {"query_ids": jnp.asarray(qids), "query_mask": jnp.asarray(qmask),
             "video": jnp.asarray(video)}

    params = model.init(jax.random.PRNGKey(0), batch["query_ids"],
                        batch["query_mask"], batch["video"])["params"]
    tx = build_optimizer(params, lr=1e-3, text_lr=1e-4, coef_lr=1.0,
                         weight_decay=0.2, warmup_proportion=0.1, t_total=50)
    state = FinetuneState.create(params, tx)
    step = make_finetune_step(model, tx, TINY_CROSS, use_frame_fea=True)

    mesh = make_mesh(MeshSpec(dp=8))
    batch = shard_batch(mesh, batch)
    state, m0 = step(state, batch)
    first = float(m0["loss"])
    for _ in range(5):
        state, m = step(state, batch)
    assert np.isfinite(first)
    assert float(m["loss"]) < first  # same batch -> loss must drop
    assert int(state.step) == 6


def test_finetune_grad_accumulation_matches():
    """accum=2 on a batch == average of grads of the halves; loss metrics
    finite and step applies."""
    rng = np.random.default_rng(1)
    model = BirdModel(TINY, TINY_CROSS)
    qids, qmask = _text_batch(rng, B, L)
    video = rng.normal(size=(B, F, 32, 32, 3)).astype(np.float32)
    batch = {"query_ids": jnp.asarray(qids), "query_mask": jnp.asarray(qmask),
             "video": jnp.asarray(video)}
    params = model.init(jax.random.PRNGKey(0), batch["query_ids"],
                        batch["query_mask"], batch["video"])["params"]
    tx = build_optimizer(params, lr=1e-3, text_lr=1e-4, coef_lr=1.0,
                         weight_decay=0.2, warmup_proportion=0.1, t_total=50)
    state = FinetuneState.create(params, tx)
    step = make_finetune_step(model, tx, TINY_CROSS, n_accum=2)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def _pretrain_setup(dataset="msrvtt", n_accum=1, **step_kwargs):
    rng = np.random.default_rng(2)
    task = TaskConfig(do_pretrain=True, dataset=dataset,
                      contrast_num_negative=32, max_frames=F,
                      contrast_temperature=0.07, contrast_momentum=0.9)
    model = BirdPretrainModel(TINY, TINY_CROSS, vocab_size=256)
    tids, tmask = _text_batch(rng, B, L)
    video = rng.normal(size=(B, F, 32, 32, 3)).astype(np.float32)
    batch = {"title_ids": jnp.asarray(tids),
             "title_mask": jnp.asarray(tmask),
             "video": jnp.asarray(video)}
    if dataset == "bird":
        gids, gmask = _text_batch(rng, B, L)
        batch["tag_ids"] = jnp.asarray(gids)
        batch["tag_mask"] = jnp.asarray(gmask)
    variables = model.init(
        jax.random.PRNGKey(0), batch["title_ids"], batch["title_mask"],
        batch["video"])
    tx = build_optimizer(variables["params"], lr=1e-3, text_lr=1e-4,
                         coef_lr=1.0, weight_decay=0.2,
                         warmup_proportion=0.1, t_total=50)
    queues = MoCoQueues.create(
        jax.random.PRNGKey(1), TINY_CROSS.temporal_hidden_size,
        task.contrast_num_negative, F)
    state = PretrainState.create(variables, tx, queues)
    step = make_pretrain_step(
        model, tx, TINY_CROSS, task, mask_token_id=254, pad_token_id=255,
        cls_token_id=1, n_accum=n_accum, **step_kwargs)
    return state, step, batch


def test_pretrain_step_runs_and_updates_queue():
    state, step, batch = _pretrain_setup()
    mesh = make_mesh(MeshSpec(dp=8))
    batch = shard_batch(mesh, batch)
    ptr0 = int(state.queues.ptr)
    q_before = np.asarray(state.queues.title_cross)
    state, m = step(state, batch, jax.random.PRNGKey(3))
    for k in ("loss", "loss_FAM", "loss_VTM", "loss_FTM", "loss_MLM"):
        assert np.isfinite(float(m[k])), k
    # ptr advanced by global batch
    assert int(state.queues.ptr) == (ptr0 + B) % 32
    q_after = np.asarray(state.queues.title_cross)
    changed = ~np.isclose(q_before, q_after)
    # exactly B columns replaced
    assert changed.any(axis=0).sum() == B
    # enqueued columns are unit-norm
    cols = np.linalg.norm(q_after[:, ptr0:ptr0 + B], axis=0)
    np.testing.assert_allclose(cols, 1.0, rtol=1e-5)


def test_pretrain_sp_mesh_consistency():
    """Frame-axis sequence parallelism under the MoCo step: dp4 x sp2
    must reproduce the dp8 run exactly — all four losses, the post-step
    queues (including the FAM frame queues, whose enqueued keys are
    computed from the seq-SHARDED frame axis), the queue ptr, the EMA'd
    key towers, and the projector BN batch stats. The reference's queue
    machinery assumes the frame axis never leaves a rank
    (modeling.py:244-284)."""
    outs = {}
    for name, spec in (("dp8", MeshSpec(dp=8)),
                       ("dp4sp2", MeshSpec(dp=4, sp=2))):
        state, step, batch = _pretrain_setup()
        mesh = make_mesh(spec)
        state, m = step(state, shard_batch(mesh, batch),
                        jax.random.PRNGKey(3))
        float(m["loss"])
        outs[name] = (m, state)
    m8, s8 = outs["dp8"]
    msp, ssp = outs["dp4sp2"]
    for k in ("loss", "loss_FAM", "loss_VTM", "loss_FTM", "loss_MLM"):
        np.testing.assert_allclose(float(m8[k]), float(msp[k]), rtol=2e-5,
                                   err_msg=k)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s8.queues, ssp.queues)
    assert int(s8.queues.ptr) == int(ssp.queues.ptr)
    np.testing.assert_allclose(
        np.asarray(s8.params_k["visual_encoder"]["visual"]["proj"]),
        np.asarray(ssp.params_k["visual_encoder"]["visual"]["proj"]),
        rtol=1e-5, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        s8.batch_stats["v_projector"], ssp.batch_stats["v_projector"])


def test_pretrain_queue_wraparound():
    state, step, batch = _pretrain_setup()
    # K=32, B=16 -> two steps wrap to 0
    state, _ = step(state, batch, jax.random.PRNGKey(3))
    state, _ = step(state, batch, jax.random.PRNGKey(4))
    assert int(state.queues.ptr) == 0


def test_pretrain_momentum_update_direction():
    state, step, batch = _pretrain_setup()
    p0 = np.asarray(
        state.params["text_encoder"]["logit_scale"])
    k0 = np.asarray(state.params_k["text_encoder"]["logit_scale"])
    np.testing.assert_allclose(p0, k0)  # key init == query
    kn = momentum_update(state.params, state.params_k, 0.5)
    k1 = np.asarray(kn["text_encoder"]["logit_scale"])
    np.testing.assert_allclose(k1, 0.5 * k0 + 0.5 * p0)


@pytest.mark.parametrize("n_accum", [1, 2])
def test_fused_ema_trajectory_equals_unfused(n_accum):
    """--fused_ema moves each step's momentum EMA across the step
    boundary (trainer.make_pretrain_step): by induction the fresh-run
    trajectories coincide exactly — k_0 = copy(p_1) makes the first
    step's EMA the identity, and both recurrences are
    k' = m*k + (1-m)*p thereafter. Verified over 4 steps for params,
    params_k, AND queues (the key forwards consume params_k, so any
    EMA-placement mistake shows up in the enqueued keys immediately)."""
    state_a, step_a, batch = _pretrain_setup(n_accum=n_accum)
    state_b, step_b, _ = _pretrain_setup(n_accum=n_accum, fused_ema=True)
    for i in range(4):
        r = jax.random.PRNGKey(10 + i)
        state_a, m_a = step_a(state_a, batch, r)
        state_b, m_b = step_b(state_b, batch, r)
        float(m_a["loss"]), float(m_b["loss"])
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                                   rtol=1e-6)
    # Stored convention: fused carries params_k "pre-EMA'd for the next
    # forward" — one EMA application AHEAD of the unfused convention
    # (K_{T+1} = m*k_T + (1-m)*p_{T+1}); params/losses/queues are equal
    # directly.
    expected_k = momentum_update(state_a.params, state_a.params_k, 0.9)
    for name, a, b in (("params", state_a.params, state_b.params),
                       ("params_k", expected_k, state_b.params_k)):
        flat_a = jax.tree_util.tree_leaves(a)
        flat_b = jax.tree_util.tree_leaves(b)
        for la, lb in zip(flat_a, flat_b):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-6, atol=1e-7, err_msg=name)
    # queue columns are key-tower features: compile-level fp variation
    # (fma/fusion differences between the two step programs) amplifies
    # through the tower forward to ~1e-5 relative on a few columns over
    # 4 steps — same tolerance class as the sp-consistency test above
    np.testing.assert_allclose(
        np.asarray(state_a.queues.title_cross),
        np.asarray(state_b.queues.title_cross), rtol=1e-4, atol=1e-6)
    assert int(state_a.queues.ptr) == int(state_b.queues.ptr)


def test_pretrain_bird_dataset_with_tags():
    state, step, batch = _pretrain_setup(dataset="bird")
    state, m = step(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(m["loss"]))


def test_mask_tokens_semantics():
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(2, 200, size=(64, 32)),
        jnp.int32)
    ids = ids.at[:, 0].set(1)    # cls
    ids = ids.at[:, -1].set(255)  # pad id
    masked, labels = mask_tokens(
        rng, ids, vocab_size=256, mask_token_id=254, pad_token_id=255,
        cls_token_id=1, mlm_probability=0.5)
    m = np.asarray(masked)
    l = np.asarray(labels)
    # protected positions never masked
    assert (l[:, 0] == -100).all() and (l[:, -1] == -100).all()
    assert (m[:, 0] == 1).all() and (m[:, -1] == 255).all()
    sel = l != -100
    assert 0.3 < sel.mean() < 0.7
    # labels hold original ids on masked positions
    np.testing.assert_array_equal(l[sel], np.asarray(ids)[sel])
    # ~80% of masked positions replaced by [MASK]
    frac_mask = (m[sel] == 254).mean()
    assert 0.7 < frac_mask < 0.9
    # unmasked positions unchanged
    np.testing.assert_array_equal(m[~sel], np.asarray(ids)[~sel])


def test_finetune_step_tensor_parallel():
    """dp=4 x tp=2 mesh: params TP-sharded (Megatron placement), batch
    DP-sharded; one full step must compile and run."""
    from hmmc_tpu.parallel import shard_params

    rng = np.random.default_rng(7)
    model = BirdModel(TINY, TINY_CROSS)
    qids, qmask = _text_batch(rng, B, L)
    video = rng.normal(size=(B, F, 32, 32, 3)).astype(np.float32)
    batch = {"query_ids": jnp.asarray(qids), "query_mask": jnp.asarray(qmask),
             "video": jnp.asarray(video)}
    params = model.init(jax.random.PRNGKey(0), batch["query_ids"],
                        batch["query_mask"], batch["video"])["params"]
    tx = build_optimizer(params, lr=1e-3, text_lr=1e-4, coef_lr=1.0,
                         weight_decay=0.2, warmup_proportion=0.1, t_total=50)
    mesh = make_mesh(MeshSpec(dp=4, tp=2))
    params = shard_params(mesh, params)
    state = FinetuneState.create(params, tx)
    step = make_finetune_step(model, tx, TINY_CROSS)
    batch = shard_batch(mesh, batch)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    # a TP-sharded kernel really is split over the model axis
    fc = state.params["visual_encoder"]["visual"]["transformer"][
        "resblocks"]["block"]["c_fc"]["kernel"]
    assert "model" in str(fc.sharding.spec)


def test_pretrain_loss_descends():
    state, step, batch = _pretrain_setup()
    first = None
    for i in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(100 + i))
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first  # same batch -> loss must drop


def test_finetune_step_with_frame_mask():
    """use_frame_mask: padded frames must not affect the loss path shape;
    differs numerically from the unmasked (reference-quirk) path."""
    rng = np.random.default_rng(9)
    model = BirdModel(TINY, TINY_CROSS)
    qids, qmask = _text_batch(rng, B, L)
    video = rng.normal(size=(B, F, 32, 32, 3)).astype(np.float32)
    nframes = np.full((B,), F - 2, np.int32)
    batch = {"query_ids": jnp.asarray(qids), "query_mask": jnp.asarray(qmask),
             "video": jnp.asarray(video), "nframes": jnp.asarray(nframes)}
    params = model.init(jax.random.PRNGKey(0), batch["query_ids"],
                        batch["query_mask"], batch["video"])["params"]
    tx = build_optimizer(params, lr=1e-3, text_lr=1e-4, coef_lr=1.0,
                         weight_decay=0.2, warmup_proportion=0.1, t_total=50)
    s_masked = FinetuneState.create(
        jax.tree_util.tree_map(jnp.copy, params), tx)
    s_plain = FinetuneState.create(params, tx)
    step_m = make_finetune_step(model, tx, TINY_CROSS, use_frame_mask=True)
    step_p = make_finetune_step(model, tx, TINY_CROSS, use_frame_mask=False)
    _, mm = step_m(s_masked, dict(batch))
    _, mp = step_p(s_plain, dict(batch))
    assert np.isfinite(float(mm["loss"]))
    assert float(mm["loss"]) != float(mp["loss"])


def _run_isolated_scenario(name: str, marker: str):
    """Launch tests/isolated_steps_child.py in a fresh interpreter.

    Why: after ~100-140 in-process tests, jaxlib 0.9.0's XLA:CPU
    executable materialization can segfault on the suite's LARGEST
    programs — on the compile path or the persistent-cache deserialize
    path (core-dump forensics in docs/design.md, "Test-gate
    reliability"). The affected scenarios pass every time in a clean
    interpreter, which is also the production shape (one program, one
    process). The child shares the suite's persistent compile cache."""
    import subprocess
    import sys as _sys

    child = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "isolated_steps_child.py")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    cache = jax.config.jax_compilation_cache_dir
    if cache:
        env["_HMMC_ISO_CACHE"] = cache
    proc = subprocess.run([_sys.executable, child, name], env=env,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\n{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}")
    assert marker in proc.stdout


def test_pretrain_grad_accumulation_per_micro_queue():
    """n_accum=2 must run EMA -> key forward -> enqueue PER MICRO-BATCH
    (the reference's _momentum_update/_dequeue_and_enqueue live inside
    forward, modeling.py:368-412, so the queue steps once per forward even
    under accumulation). Checks: ptr advances by the FULL batch; enqueued
    columns equal the normalized title keys in batch order (the first EMA
    is identity since params_k starts as a copy of params); the VTM loss
    differs from the unaccumulated step because micro 2's negatives
    include micro 1's keys.

    Runs in a fresh subprocess (scenario ``accum_queue``): two full-suite
    runs segfaulted at exactly this step's materialization — the second
    repeat offender after ``wide_steps`` — see _run_isolated_scenario."""
    _run_isolated_scenario("accum_queue", "accum_queue OK")


def test_pretrain_reference_checkpoint_roundtrip(tmp_path):
    """The reference keeps momentum towers, projector MLPs (+BN stats),
    the MLM head, and the MoCo queues in ONE pretrain state_dict
    (modeling.py:88-157). Export a stepped PretrainState to that format
    and restore it: key towers and queues must round-trip exactly."""
    import logging

    from hmmc_tpu.runner import _apply_pretrain_import
    from hmmc_tpu.train import checkpoint as ckpt
    from hmmc_tpu.train.orbax_io import save_reference_checkpoint

    state, step, batch = _pretrain_setup()
    mesh = make_mesh(MeshSpec(dp=8))
    state, _ = step(state, shard_batch(mesh, batch), jax.random.PRNGKey(3))

    path = str(tmp_path / "pytorch_model.bin.0")
    save_reference_checkpoint(path, state.params, language="english",
                              pretrain_state=state)

    sd = ckpt.load_torch_state_dict(path)
    # reference pretrain buffers present
    for key in ("text_encoder_k.token_embedding.weight",
                "visual_encoder_k.visual.proj", "queue_title_cross_ng",
                "queue_ptr", "v_projector.linear_hidden.1.weight",
                "cls.decoder.weight"):
        assert key in sd, key
    imported = ckpt.import_hmmc_state_dict(sd, pretrain=True)
    extras = {
        "params_k": {
            "text_encoder": imported["params"].pop("text_encoder_k"),
            "visual_encoder": imported["params"].pop("visual_encoder_k"),
            "t_projector": imported["params"].pop("t_projector_k"),
            "v_projector": imported["params"].pop("v_projector_k"),
        },
        "queues": imported["queues"],
    }

    fresh, _, _ = _pretrain_setup()   # identical seeds -> pre-step state
    restored = _apply_pretrain_import(fresh, extras,
                                      logging.getLogger("t"))
    np.testing.assert_allclose(
        np.asarray(restored.params_k["text_encoder"]["logit_scale"]),
        np.asarray(state.params_k["text_encoder"]["logit_scale"]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored.params_k["visual_encoder"]["visual"]["proj"]),
        np.asarray(state.params_k["visual_encoder"]["visual"]["proj"]),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(restored.queues.title_cross),
        np.asarray(state.queues.title_cross), atol=1e-6)
    assert int(restored.queues.ptr) == int(state.queues.ptr)


def test_steps_run_when_embed_dim_differs_from_temporal_hidden():
    """Towers whose embed_dim != temporal_hidden_size (RN50: 1024,
    ViT-L/14: 768, vs the config constant 512) must still train. The
    reference crashes there (module_cross.py:198 adds 512-wide frame
    position embeddings onto the tower output); here every
    feature-width consumer (frame pos-emb, projector MLPs, queues)
    derives from arch.embed_dim.

    Runs in a fresh subprocess (scenario ``wide_steps``): this scenario
    compiles/loads one of the suite's largest XLA:CPU programs and
    segfaulted twice in-suite (compile path AND persistent-cache
    deserialize path) — see _run_isolated_scenario."""
    _run_isolated_scenario("wide_steps", "wide_steps OK")


def test_async_checkpoint_writer_snapshots_before_donation(tmp_path):
    """CheckpointWriter(async_save=True) must snapshot the state to host
    BEFORE returning: the training loop donates the state buffers to the
    next step immediately after save(), so a by-reference async save
    would serialize reused memory. Overwrite the arrays through a
    donating jit right after save() and verify the restored checkpoint
    holds the pre-overwrite values (plus the progress-meta sidecar)."""
    from hmmc_tpu.train import orbax_io

    state = {
        "w": jnp.arange(128, dtype=jnp.float32).reshape(8, 16),
        "m": jnp.full((4, 4), 3.25, jnp.float32),
        "step": jnp.int32(7),
    }
    expect = jax.tree_util.tree_map(np.array, state)

    clobber = jax.jit(
        lambda s: jax.tree_util.tree_map(lambda a: a * 0 - 1, s),
        donate_argnums=0)

    d = str(tmp_path / "ckpt")
    with orbax_io.CheckpointWriter(d, async_save=True) as w:
        w.save(3, state, meta={"epoch": 1, "batch_in_epoch": 2})
        clobber(state)  # reuses the donated buffers while the write runs

    assert orbax_io.latest_step(d) == 3
    got = orbax_io.restore_state(d, expect, 3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        got, expect)
    meta = orbax_io.load_progress_meta(d, 3)
    assert meta == {"epoch": 1, "batch_in_epoch": 2}


def test_async_checkpoint_writer_sequential_saves(tmp_path):
    """Back-to-back async saves retain max_to_keep steps, each restorable
    to its own values (the writer is one long-lived manager, unlike
    save_state's per-call manager)."""
    from hmmc_tpu.train import orbax_io

    d = str(tmp_path / "ckpt")
    vals = {}
    with orbax_io.CheckpointWriter(d, max_to_keep=2,
                                   async_save=True) as w:
        for s in (1, 2, 3):
            st = {"w": jnp.full((8,), float(s))}
            vals[s] = jax.tree_util.tree_map(np.array, st)
            w.save(s, st)

    assert orbax_io.latest_step(d) == 3
    for s in (2, 3):
        got = orbax_io.restore_state(d, vals[s], s)
        np.testing.assert_array_equal(np.asarray(got["w"]), vals[s]["w"])
