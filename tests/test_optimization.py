"""BertAdam-equivalent optimizer tests: schedule shapes, update math
(independent numpy recomputation of the documented reference formulas), and
the name-based group classification."""

import jax
import jax.numpy as jnp
import numpy as np

from hmmc_tpu.train.optimization import (
    bert_adam, build_optimizer, decay_mask, lr_tree, scheduled_lr,
    warmup_constant, warmup_cosine, warmup_linear)


def test_schedules():
    # warmup phase is linear in all three
    np.testing.assert_allclose(float(warmup_cosine(0.05, 0.1)), 0.5)
    np.testing.assert_allclose(float(warmup_constant(0.05, 0.1)), 0.5)
    np.testing.assert_allclose(float(warmup_linear(0.05, 0.1)), 0.5)
    # reference quirk: cosine phase ignores warmup offset -> 0.5(1+cos(pi x))
    x = 0.5
    np.testing.assert_allclose(
        float(warmup_cosine(x, 0.1)), 0.5 * (1 + np.cos(np.pi * x)),
        rtol=1e-6)
    np.testing.assert_allclose(float(warmup_constant(0.5, 0.1)), 1.0)
    np.testing.assert_allclose(
        float(warmup_linear(0.5, 0.1)), (0.5 - 1) / (0.1 - 1), rtol=1e-6)


def test_scheduled_lr_matches_reference_get_lr():
    # reference optimization.py:86-97: lr_scheduled =
    #   lr * schedule_fct(step / t_total, warmup); logged at
    #   main_task_retrieval.py:311
    lr, t_total, warmup = 1e-4, 100, 0.1
    # warmup phase
    np.testing.assert_allclose(
        scheduled_lr(lr, 5, t_total, warmup=warmup),
        lr * (0.05 / warmup), rtol=1e-6)
    # cosine phase (ignores warmup offset — reference quirk)
    np.testing.assert_allclose(
        scheduled_lr(lr, 50, t_total, warmup=warmup),
        lr * 0.5 * (1 + np.cos(np.pi * 0.5)), atol=1e-12)
    # t_total<=0 degenerates to the flat lr
    assert scheduled_lr(lr, 5, 0, warmup=warmup) == lr


def test_bert_adam_update_math():
    """One step vs a numpy recomputation: per-param clip, no bias
    correction, decoupled wd, scheduled lr."""
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(4, 4)).astype(np.float32)
    g0 = (10 * rng.normal(size=(4, 4))).astype(np.float32)  # norm > 1
    params = {"w": jnp.asarray(p0)}
    lr, wd, warmup, t_total = 1e-2, 0.2, 0.1, 100
    tx = bert_adam(
        lr_leaves={"w": lr}, schedule="warmup_cosine", warmup=warmup,
        t_total=t_total, b1=0.9, b2=0.98, eps=1e-6,
        decay_leaves={"w": True}, weight_decay=wd, max_grad_norm=1.0)
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray(g0)}, state, params)

    # numpy reference
    g = g0 * min(1.0, 1.0 / np.linalg.norm(g0))
    m = 0.1 * g
    v = 0.02 * g * g
    upd = m / (np.sqrt(v) + 1e-6) + wd * p0
    lr_t = lr * (0.0 / t_total) / warmup  # step 0 progress=0 -> multiplier 0
    expect = -lr_t * upd
    np.testing.assert_allclose(np.asarray(updates["w"]), expect, atol=1e-7)

    # second step: progress=1/100 < warmup -> multiplier 0.1
    updates2, state = tx.update({"w": jnp.asarray(g0)}, state, params)
    m2 = 0.9 * m + 0.1 * g
    v2 = 0.98 * v + 0.02 * g * g
    upd2 = m2 / (np.sqrt(v2) + 1e-6) + wd * p0
    expect2 = -lr * ((1 / t_total) / warmup) * upd2
    np.testing.assert_allclose(
        np.asarray(updates2["w"]), expect2, rtol=1e-5, atol=1e-9)


def test_decay_and_lr_classification():
    params = {
        "text_encoder": {
            "logit_scale": jnp.zeros(()),
            "clip_text": {
                "ln_final": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
                "token_embedding": jnp.zeros((8, 4)),
            },
            "chinese_encoder": {
                "embeddings_ln": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
            },
        },
        "visual_encoder": {
            "visual": {
                "ln_pre": {"scale": jnp.ones(4), "bias": jnp.zeros(4)},
                "proj": jnp.zeros((4, 4)),
            },
            "frame_position_embeddings": jnp.zeros((8, 4)),
        },
        "cls": {"transform_ln": {"scale": jnp.ones(4), "bias": jnp.zeros(4)}},
        "v_projector": {"bn_0": {"scale": jnp.ones(4), "bias": jnp.zeros(4)}},
    }
    dm = decay_mask(params)
    # biases never decay
    assert dm["text_encoder"]["clip_text"]["ln_final"]["bias"] is False
    # CLIP ln scales DO decay (reference quirk: 'ln_final.weight' does not
    # match the 'LayerNorm.weight' substring)
    assert dm["text_encoder"]["clip_text"]["ln_final"]["scale"] is True
    assert dm["visual_encoder"]["visual"]["ln_pre"]["scale"] is True
    # HF-style LayerNorms do not decay
    assert dm["text_encoder"]["chinese_encoder"]["embeddings_ln"]["scale"] is False
    assert dm["cls"]["transform_ln"]["scale"] is False
    # BatchNorm scale decays (torch BatchNorm1d.weight not in no_decay)
    assert dm["v_projector"]["bn_0"]["scale"] is True
    # embeddings decay
    assert dm["visual_encoder"]["frame_position_embeddings"] is True

    lt = lr_tree(params, lr=1e-4, text_lr=1e-5, coef_lr=1e-3)
    assert lt["visual_encoder"]["visual"]["proj"] == 1e-4 * 1e-3
    assert lt["visual_encoder"]["frame_position_embeddings"] == 1e-4
    assert lt["text_encoder"]["clip_text"]["token_embedding"] == 1e-5
    assert lt["cls"]["transform_ln"]["scale"] == 1e-4


def test_bf16_state_dtype_and_trajectory():
    """--optim_bf16_state: moments carried in bf16, math in fp32; a short
    trajectory stays close to the fp32-state run (bf16 keeps fp32's exponent
    range, so only ~2^-8 relative mantissa noise enters each step)."""
    rng = np.random.default_rng(7)
    params = {"w": jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32)),
              "b": jnp.asarray(rng.normal(size=(16,)).astype(np.float32))}
    kw = dict(lr=1e-3, text_lr=1e-4, coef_lr=1.0, weight_decay=0.01,
              warmup_proportion=0.1, t_total=100)
    tx32 = build_optimizer(params, **kw)
    tx16 = build_optimizer(params, state_dtype=jnp.bfloat16, **kw)
    s32, s16 = tx32.init(params), tx16.init(params)
    # bf16 carried moments (inner bert_adam state is chain element 1)
    assert s16[1].m["w"].dtype == jnp.bfloat16
    assert s16[1].v["w"].dtype == jnp.bfloat16
    assert s32[1].m["w"].dtype == jnp.float32

    p32 = p16 = params
    for i in range(8):
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(
                rng.normal(size=p.shape).astype(np.float32)) + 0.1 * p, p32)
        u32, s32 = tx32.update(g, s32, p32)
        u16, s16 = tx16.update(g, s16, p16)
        p32 = jax.tree_util.tree_map(lambda p, u: p + u, p32, u32)
        p16 = jax.tree_util.tree_map(lambda p, u: p + u, p16, u16)
        # updates stay fp32 regardless of state dtype
        assert u16["w"].dtype == jnp.float32
    rel = np.abs(np.asarray(p16["w"]) - np.asarray(p32["w"])) / (
        np.abs(np.asarray(p32["w"])) + 1e-6)
    assert rel.max() < 0.05, rel.max()


def test_build_optimizer_end_to_end():
    params = {"visual_encoder": {"visual": {"proj": jnp.ones((4, 4))}},
              "head": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros(4)}}
    tx = build_optimizer(params, lr=1e-4, text_lr=1e-5, coef_lr=1e-3,
                         weight_decay=0.2, warmup_proportion=0.1,
                         t_total=10)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
    assert np.isfinite(
        np.asarray(jax.tree_util.tree_leaves(updates)[0])).all()
