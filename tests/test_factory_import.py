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
