"""Attention capture (sow_attn) + visualization-tool math.

Covers the qualitative-figure path of the reference (README.md:177-181 —
published as images there, with no code): rollout aggregation, the towers'
attention-probability capture, and the end-to-end tool output files.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from hmmc_tpu.config import ClipArch, CrossConfig, TaskConfig
from hmmc_tpu.models.text import TextEncoder
from hmmc_tpu.models.visual import VisualEncoder
from tools.visualize_attention import (
    attention_rollout, cls_patch_scores, colorize, overlay_heatmap,
    token_relevance, temporal_frame_weights, visualize)

TINY = ClipArch(
    embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
    vision_patch_size=16, context_length=16, vocab_size=256,
    transformer_width=32, transformer_heads=2, transformer_layers=2)

TINY_CROSS = CrossConfig(
    temporal_hidden_size=32, temporal_attention_heads=2,
    temporal_hidden_layers=2, max_position_embeddings=8,
    chinese_hidden_size=48)


def _softmax_rows(rng, layers, b, h, l):
    logits = rng.normal(size=(layers, b, h, l, l))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return (e / e.sum(-1, keepdims=True)).astype(np.float32)


def test_rollout_identity_layers():
    # attention == I at every layer => rollout == I
    l = 5
    w = np.broadcast_to(np.eye(l, dtype=np.float32), (3, 2, 4, l, l)).copy()
    r = attention_rollout(w)
    assert np.allclose(r, np.eye(l), atol=1e-6)


def test_rollout_rows_are_distributions():
    rng = np.random.default_rng(0)
    r = attention_rollout(_softmax_rows(rng, layers=3, b=2, h=4, l=6))
    assert r.shape == (2, 6, 6)
    assert np.allclose(r.sum(-1), 1.0, atol=1e-5)
    assert (r >= 0).all()


def test_cls_patch_scores_normalized():
    rng = np.random.default_rng(1)
    r = attention_rollout(_softmax_rows(rng, 2, 3, 2, 5))  # 4 patches + CLS
    s = cls_patch_scores(r, grid=2)
    assert s.shape == (3, 2, 2)
    assert np.allclose(s.max(axis=(1, 2)), 1.0, atol=1e-6)
    assert np.allclose(s.min(axis=(1, 2)), 0.0, atol=1e-6)


def test_temporal_weights_and_token_relevance():
    rng = np.random.default_rng(2)
    tw = temporal_frame_weights(_softmax_rows(rng, 2, 1, 2, 4))
    assert tw.shape == (1, 4)
    assert np.allclose(tw.sum(-1), 1.0, atol=1e-5)

    ids = np.array([[3, 7, 9, 0, 0]])  # EOT=9 at position 2, then padding
    rel = token_relevance(_softmax_rows(rng, 2, 1, 2, 5), ids)
    assert rel.shape == (1, 5)
    assert rel[0, 3] == 0.0 and rel[0, 4] == 0.0  # padding zeroed
    assert np.isclose(rel.sum(), 1.0, atol=1e-5)


def test_colorize_and_overlay_shapes():
    heat = np.linspace(0, 1, 16, dtype=np.float32).reshape(4, 4)
    rgb = colorize(heat)
    assert rgb.shape == (4, 4, 3) and rgb.dtype == np.uint8
    frame = np.full((32, 32, 3), 128, np.uint8)
    out = overlay_heatmap(frame, heat)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8


def test_visual_sow_capture_matches_plain_forward():
    video = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 3, 32, 32, 3)),
        jnp.float32)
    plain = VisualEncoder(TINY, TINY_CROSS, use_temp=True)
    variables = plain.init(jax.random.PRNGKey(0), video)
    v0, f0 = plain.apply(variables, video)

    sowing = VisualEncoder(TINY, TINY_CROSS, use_temp=True, sow_attn=True)
    (v1, f1), state = sowing.apply(variables, video,
                                   mutable=["intermediates"])
    # identical forward — the capture must not perturb the math
    assert np.allclose(np.asarray(v0), np.asarray(v1), atol=0)
    assert np.allclose(np.asarray(f0), np.asarray(f1), atol=0)

    inter = state["intermediates"]
    vit_w = inter["visual"]["transformer"]["resblocks"]["block"]["attn"][
        "attn_weights"][0]
    # [layers, B*F, H, L, L]; L = 4 patches + CLS; H = width/64 = 1
    assert vit_w.shape == (2, 6, 1, 5, 5)
    assert np.allclose(np.asarray(vit_w).sum(-1), 1.0, atol=1e-5)
    temp_w = inter["temporal_transformer"]["resblocks"]["block"]["attn"][
        "attn_weights"][0]
    assert temp_w.shape == (2, 2, 2, 3, 3)


def test_text_sow_capture():
    ids = jnp.asarray([[5, 17, 200, 0, 0, 0]], jnp.int32)
    enc = TextEncoder(TINY, TINY_CROSS, language="english", sow_attn=True)
    variables = enc.init(jax.random.PRNGKey(0), ids)
    pooled, state = enc.apply(variables, ids, mutable=["intermediates"])
    w = state["intermediates"]["clip_text"]["transformer"]["resblocks"][
        "block"]["attn"]["attn_weights"][0]
    assert w.shape == (2, 1, 2, 6, 6)
    # causal: token 0 attends only to itself
    assert np.allclose(np.asarray(w)[:, :, :, 0, 1:], 0.0, atol=1e-6)


def test_load_frames_dir(tmp_path):
    from PIL import Image

    from tools.visualize_attention import _load_frames

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(5)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)).save(
            str(d / f"{i:03d}.png"))

    class Args:
        frames_dir = str(d)
        framepack = None
        video_id = None
        resolution = 32
        max_frames = 2

    frames = _load_frames(Args())
    # max_frames cap + eval preprocessing to [F, res, res, 3] uint8
    assert frames.shape == (2, 32, 32, 3)
    assert frames.dtype == np.uint8


def test_visualize_end_to_end(tmp_path):
    rng = np.random.default_rng(4)
    frames = rng.integers(0, 255, size=(3, 32, 32, 3), dtype=np.uint8)
    ids = np.zeros(8, np.int32)
    ids[:4] = [1, 40, 60, 200]  # 200 = row max = "EOT" for pooling
    mask = (ids > 0).astype(np.int32)

    video = jnp.zeros((1, 3, 32, 32, 3), jnp.float32)
    venc = VisualEncoder(TINY, TINY_CROSS, use_temp=True)
    vparams = venc.init(jax.random.PRNGKey(0), video)["params"]
    tenc = TextEncoder(TINY, TINY_CROSS, language="english")
    tparams = tenc.init(jax.random.PRNGKey(1), jnp.asarray(ids)[None])[
        "params"]
    params = {"visual_encoder": vparams, "text_encoder": tparams}

    task = TaskConfig(do_eval=True, dataset="msrvtt", language="english",
                      use_temp=True, max_frames=3)
    out = str(tmp_path / "viz")
    summary = visualize(TINY, TINY_CROSS, task, params, frames, ids, mask,
                        out, tokens=["<s>", "a", "b", "</s>"])

    for i in range(3):
        assert os.path.exists(os.path.join(out, f"frame_{i:02d}.png"))
        assert os.path.exists(os.path.join(out, f"frame_{i:02d}_attn.png"))
    with open(os.path.join(out, "summary.json")) as fh:
        loaded = json.load(fh)
    assert loaded == summary
    assert len(summary["frame_query_cosine"]) == 3
    assert len(summary["temporal_frame_weights"]) == 3
    assert abs(sum(summary["temporal_frame_weights"]) - 1.0) < 1e-4
    assert len(summary["token_relevance"]) == 4
    assert summary["tokens"] == ["<s>", "a", "b", "</s>"]
    assert 0 <= summary["best_frame"] < 3
