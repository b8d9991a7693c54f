"""factory.build_model with a synthetic OpenAI-CLIP-format torch checkpoint:
the full name map (visual/text towers, resblocks, logit_scale) must be
consumed, and the loaded weights must flow through the model."""

import json

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import hmmc_tpu.config as config_mod
from hmmc_tpu.config import CrossConfig, TaskConfig
from hmmc_tpu import factory

TINY_NAME = "ViT-Factory-Test/16"
W, LAYERS, EMB, CTX, VOCAB = 64, 2, 32, 16, 512
RES, PATCH = 32, 16
GRID = RES // PATCH


@pytest.fixture(autouse=True)
def tiny_arch():
    config_mod.CLIP_ARCH[TINY_NAME] = dict(
        embed_dim=EMB, image_resolution=RES, vision_layers=LAYERS,
        vision_width=W, vision_patch_size=PATCH, context_length=CTX,
        vocab_size=VOCAB, transformer_width=W, transformer_heads=2,
        transformer_layers=LAYERS)
    yield
    config_mod.CLIP_ARCH.pop(TINY_NAME, None)


def _clip_state_dict():
    """Synthetic checkpoint in OpenAI CLIP's exact naming
    (module_clip.py param names)."""
    g = np.random.default_rng(0)

    def t(*shape):
        return torch.tensor(g.normal(size=shape).astype(np.float32) * 0.05)

    sd = {
        "visual.conv1.weight": t(W, 3, PATCH, PATCH),
        "visual.class_embedding": t(W),
        "visual.positional_embedding": t(GRID * GRID + 1, W),
        "visual.proj": t(W, EMB),
        "visual.ln_pre.weight": t(W), "visual.ln_pre.bias": t(W),
        "visual.ln_post.weight": t(W), "visual.ln_post.bias": t(W),
        "token_embedding.weight": t(VOCAB, W),
        "positional_embedding": t(CTX, W),
        "text_projection": t(W, EMB),
        "ln_final.weight": t(W), "ln_final.bias": t(W),
        "logit_scale": torch.tensor(np.float32(4.0)),
    }
    for tower, n in (("visual.transformer", LAYERS), ("transformer", LAYERS)):
        for i in range(n):
            b = f"{tower}.resblocks.{i}"
            sd.update({
                f"{b}.attn.in_proj_weight": t(3 * W, W),
                f"{b}.attn.in_proj_bias": t(3 * W),
                f"{b}.attn.out_proj.weight": t(W, W),
                f"{b}.attn.out_proj.bias": t(W),
                f"{b}.ln_1.weight": t(W), f"{b}.ln_1.bias": t(W),
                f"{b}.ln_2.weight": t(W), f"{b}.ln_2.bias": t(W),
                f"{b}.mlp.c_fc.weight": t(4 * W, W),
                f"{b}.mlp.c_fc.bias": t(4 * W),
                f"{b}.mlp.c_proj.weight": t(W, 4 * W),
                f"{b}.mlp.c_proj.bias": t(W),
            })
    return sd


def test_build_model_with_clip_checkpoint(tmp_path):
    sd = _clip_state_dict()
    path = str(tmp_path / "ViT-Tiny.pt")
    torch.save(sd, path)

    cross_json = tmp_path / "cross.json"
    cross_json.write_text(json.dumps({
        "pretrained_clip_name": TINY_NAME, "temporal_hidden_size": EMB,
        "temporal_attention_heads": 2, "temporal_hidden_layers": 1,
        "max_position_embeddings": 8}))
    task = TaskConfig(do_eval=True, language="english",
                      cross_model=str(cross_json), max_words=CTX,
                      max_frames=2, compute_dtype="float32")
    cross = CrossConfig.from_json(str(cross_json))
    model, variables = factory.build_model(
        task, cross, vocab_size=VOCAB, clip_model_path=path)

    p = variables["params"]
    # weights actually landed (not init values)
    np.testing.assert_allclose(
        np.asarray(p["text_encoder"]["logit_scale"]), 4.0)
    np.testing.assert_allclose(
        np.asarray(p["visual_encoder"]["visual"]["proj"]),
        sd["visual.proj"].numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p["text_encoder"]["clip_text"]["transformer"][
            "resblocks"]["block"]["c_fc"]["kernel"][1]),
        sd["transformer.resblocks.1.mlp.c_fc.weight"].numpy().T, atol=1e-6)
    # conv kernel transposed to NHWC layout
    np.testing.assert_allclose(
        np.asarray(p["visual_encoder"]["visual"]["conv1"]["kernel"]),
        sd["visual.conv1.weight"].numpy().transpose(2, 3, 1, 0), atol=1e-6)

    # a forward pass runs with the imported weights
    ids = jnp.zeros((1, CTX), jnp.int32).at[0, 0].set(5).at[0, 1].set(
        VOCAB - 1)
    mask = jnp.ones((1, CTX), jnp.int32)
    video = jnp.zeros((1, 2, RES, RES, 3), jnp.float32)
    q, v, f, scale = model.apply(variables, ids, mask, video)
    assert np.isfinite(np.asarray(q)).all()
    np.testing.assert_allclose(float(scale), np.exp(4.0), rtol=1e-4)


def test_count_params():
    params = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros(5)}}
    assert factory.count_params(params) == 17


# ---------------------------------------------------------------------------
# pretrained Chinese tower at build (module_cross.py:260-265)
# ---------------------------------------------------------------------------

ZH_VOCAB, ZH_H, ZH_LAYERS, ZH_HEADS, ZH_INTER = 50, 32, 2, 2, 64


def _hf_bert_state_dict():
    """Synthetic checkpoint in HF BertModel's exact naming."""
    g = np.random.default_rng(7)

    def t(*shape):
        return torch.tensor(g.normal(size=shape).astype(np.float32) * 0.05)

    sd = {
        "embeddings.word_embeddings.weight": t(ZH_VOCAB, ZH_H),
        "embeddings.position_embeddings.weight": t(512, ZH_H),
        "embeddings.token_type_embeddings.weight": t(2, ZH_H),
        "embeddings.LayerNorm.weight": t(ZH_H),
        "embeddings.LayerNorm.bias": t(ZH_H),
        "pooler.dense.weight": t(ZH_H, ZH_H),
        "pooler.dense.bias": t(ZH_H),
    }
    for i in range(ZH_LAYERS):
        b = f"encoder.layer.{i}"
        sd.update({
            f"{b}.attention.self.query.weight": t(ZH_H, ZH_H),
            f"{b}.attention.self.query.bias": t(ZH_H),
            f"{b}.attention.self.key.weight": t(ZH_H, ZH_H),
            f"{b}.attention.self.key.bias": t(ZH_H),
            f"{b}.attention.self.value.weight": t(ZH_H, ZH_H),
            f"{b}.attention.self.value.bias": t(ZH_H),
            f"{b}.attention.output.dense.weight": t(ZH_H, ZH_H),
            f"{b}.attention.output.dense.bias": t(ZH_H),
            f"{b}.attention.output.LayerNorm.weight": t(ZH_H),
            f"{b}.attention.output.LayerNorm.bias": t(ZH_H),
            f"{b}.intermediate.dense.weight": t(ZH_INTER, ZH_H),
            f"{b}.intermediate.dense.bias": t(ZH_INTER),
            f"{b}.output.dense.weight": t(ZH_H, ZH_INTER),
            f"{b}.output.dense.bias": t(ZH_H),
            f"{b}.output.LayerNorm.weight": t(ZH_H),
            f"{b}.output.LayerNorm.bias": t(ZH_H),
        })
    return sd


def _zh_task_and_cross(tmp_path, pretrained_text):
    cross_json = tmp_path / "cross_zh.json"
    cross_json.write_text(json.dumps({
        "pretrained_clip_name": TINY_NAME, "temporal_hidden_size": EMB,
        "temporal_attention_heads": 2, "temporal_hidden_layers": 1,
        "max_position_embeddings": 8,
        "chinese_hidden_size": ZH_H, "chinese_num_layers": ZH_LAYERS,
        "chinese_num_heads": ZH_HEADS,
        "chinese_intermediate_size": ZH_INTER}))
    task = TaskConfig(do_eval=True, language="chinese",
                      cross_model=str(cross_json), max_words=CTX,
                      max_frames=2, compute_dtype="float32",
                      pretrained_text=pretrained_text)
    return task, CrossConfig.from_json(str(cross_json))


def test_build_chinese_loads_pretrained_roberta(tmp_path):
    """--language chinese without --init_model must overlay the local HF
    checkpoint onto the Chinese tower (the reference builds the tower via
    AutoModel.from_pretrained, module_cross.py:260-265)."""
    sd = _hf_bert_state_dict()
    hf_dir = tmp_path / "hf"
    hf_dir.mkdir()
    torch.save(sd, str(hf_dir / "pytorch_model.bin"))

    task, cross = _zh_task_and_cross(tmp_path, str(hf_dir))
    model, variables = factory.build_model(task, cross, vocab_size=ZH_VOCAB)
    enc = variables["params"]["text_encoder"]["chinese_encoder"]
    np.testing.assert_allclose(
        np.asarray(enc["word_embeddings"]),
        sd["embeddings.word_embeddings.weight"].numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(enc["pooler"]["kernel"]),
        sd["pooler.dense.weight"].numpy().T, atol=1e-6)

    # the pretrained tower must actually change the text features vs a
    # random-init build (hub-name pretrained_text resolves to nothing here)
    task_rand, _ = _zh_task_and_cross(tmp_path, "hfl/chinese-roberta-wwm-ext")
    _, var_rand = factory.build_model(task_rand, cross, vocab_size=ZH_VOCAB)
    ids = jnp.arange(CTX, dtype=jnp.int32)[None, :] % ZH_VOCAB
    mask = jnp.ones((1, CTX), jnp.int32)
    out_pre = model.apply(variables, ids, mask, method="encode_text")
    out_rand = model.apply(var_rand, ids, mask, method="encode_text")
    assert not np.allclose(np.asarray(out_pre), np.asarray(out_rand))


def test_init_model_accepts_orbax_dir(tmp_path):
    """--init_model pointed at a native Orbax checkpoint directory (or the
    output_dir containing ckpt/) restores params without a torch export
    (from_pretrained semantics, modeling.py:48-67)."""
    from hmmc_tpu.train import orbax_io
    from hmmc_tpu.train.optimization import build_optimizer
    from hmmc_tpu.train.trainer import FinetuneState

    cross_json = tmp_path / "cross.json"
    cross_json.write_text(json.dumps({
        "pretrained_clip_name": TINY_NAME, "temporal_hidden_size": EMB,
        "temporal_attention_heads": 2, "temporal_hidden_layers": 1,
        "max_position_embeddings": 8}))
    task = TaskConfig(do_eval=True, language="english",
                      cross_model=str(cross_json), max_words=CTX,
                      max_frames=2, compute_dtype="float32")
    cross = CrossConfig.from_json(str(cross_json))
    model, variables = factory.build_model(task, cross, vocab_size=VOCAB)

    # perturb, save as a full training state under out/ckpt
    trained = jax.tree_util.tree_map(
        lambda p: np.asarray(p) + 1.0, variables["params"])
    tx = build_optimizer(trained, lr=1e-4, text_lr=1e-5, coef_lr=1.0,
                         weight_decay=0.0, warmup_proportion=0.1, t_total=4)
    state = FinetuneState.create(trained, tx)
    out_dir = tmp_path / "out"
    orbax_io.save_state(str(out_dir / "ckpt"), state, step=3)

    _, restored = factory.build_model(
        task, cross, vocab_size=VOCAB, init_model_path=str(out_dir))
    np.testing.assert_allclose(
        np.asarray(restored["params"]["visual_encoder"]["visual"]["proj"]),
        np.asarray(trained["visual_encoder"]["visual"]["proj"]), atol=1e-6)


def test_factory_pretrain_import_stash(tmp_path):
    """factory.build_model(pretrain=True, init_model=<reference pretrain
    checkpoint>) must stash the momentum towers + queues for the runner
    (_pretrain_import) and _apply_pretrain_import must consume them."""
    import logging

    from hmmc_tpu.models.pretrain import MoCoQueues
    from hmmc_tpu.runner import _apply_pretrain_import
    from hmmc_tpu.train.optimization import build_optimizer
    from hmmc_tpu.train.orbax_io import save_reference_checkpoint
    from hmmc_tpu.train.trainer import PretrainState

    cross_json = tmp_path / "cross.json"
    cross_json.write_text(json.dumps({
        "pretrained_clip_name": TINY_NAME, "temporal_hidden_size": EMB,
        "temporal_attention_heads": 2, "temporal_hidden_layers": 1,
        "max_position_embeddings": 8}))
    task = TaskConfig(do_pretrain=True, language="english",
                      cross_model=str(cross_json), max_words=CTX,
                      max_frames=2, compute_dtype="float32",
                      contrast_num_negative=8)
    cross = CrossConfig.from_json(str(cross_json))
    model, variables = factory.build_model(task, cross, vocab_size=VOCAB,
                                           pretrain=True)
    tx = build_optimizer(variables["params"], lr=1e-4, text_lr=1e-5,
                         coef_lr=1.0, weight_decay=0.0,
                         warmup_proportion=0.1, t_total=4)
    queues = MoCoQueues.create(jax.random.PRNGKey(2), EMB, 8, 2)
    state = PretrainState.create(variables, tx, queues)
    path = str(tmp_path / "pytorch_model.bin.0")
    save_reference_checkpoint(path, variables["params"],
                              language="english", pretrain_state=state)

    _, vars2 = factory.build_model(task, cross, vocab_size=VOCAB,
                                   init_model_path=path, pretrain=True)
    extra = vars2.pop("_pretrain_import")
    assert set(extra["params_k"]) >= {"text_encoder", "visual_encoder"}
    assert "queues" in extra

    queues_fresh = MoCoQueues.create(jax.random.PRNGKey(9), EMB, 8, 2)
    state2 = PretrainState.create(vars2, tx, queues_fresh)
    state2 = _apply_pretrain_import(state2, extra,
                                    logging.getLogger("t"))
    np.testing.assert_allclose(
        np.asarray(state2.queues.title_cross),
        np.asarray(state.queues.title_cross), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state2.params_k["visual_encoder"]["visual"]["proj"]),
        np.asarray(state.params_k["visual_encoder"]["visual"]["proj"]),
        atol=1e-6)
