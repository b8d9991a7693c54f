"""Shape/behavior tests for the encoder stack on a tiny architecture."""

import jax
import jax.numpy as jnp
import numpy as np

from hmmc_tpu.config import ClipArch, CrossConfig
from hmmc_tpu.models import (
    MLMHead, ProjectorMLP, TextEncoder, VisionTransformer, VisualEncoder)
from hmmc_tpu.models.text import ClipTextTower

TINY = ClipArch(
    embed_dim=32, image_resolution=32, vision_layers=2, vision_width=64,
    vision_patch_size=16, context_length=16, vocab_size=256,
    transformer_width=32, transformer_heads=2, transformer_layers=2)

TINY_CROSS = CrossConfig(
    temporal_hidden_size=32, temporal_attention_heads=2,
    temporal_hidden_layers=2, max_position_embeddings=8,
    chinese_hidden_size=48)


def test_vit_shapes():
    vit = VisionTransformer(TINY)
    x = jnp.ones((3, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), x)
    pooled = vit.apply(params, x)
    assert pooled.shape == (3, 32)
    pooled2, hidden = vit.apply(params, x, return_hidden=True)
    assert hidden.shape == (3, 5, 32)  # 4 patches + cls
    np.testing.assert_allclose(pooled, pooled2, rtol=1e-6)
    np.testing.assert_allclose(pooled, hidden[:, 0, :], rtol=1e-6)


def test_clip_text_eot_pooling():
    tower = ClipTextTower(TINY)
    ids = jnp.array([[5, 7, 255, 0, 0, 0, 0, 0],
                     [5, 7, 9, 11, 255, 0, 0, 0]], dtype=jnp.int32)
    params = tower.init(jax.random.PRNGKey(0), ids)
    pooled, hidden = tower.apply(params, ids, return_hidden=True)
    assert pooled.shape == (2, 32) and hidden.shape == (2, 8, 32)
    # pooled must equal the hidden state at the EOT (max-id) position
    np.testing.assert_allclose(pooled[0], hidden[0, 2], rtol=1e-6)
    np.testing.assert_allclose(pooled[1], hidden[1, 4], rtol=1e-6)


def test_causal_mask_independence():
    """Tokens after EOT must not influence the pooled feature (causality)."""
    tower = ClipTextTower(TINY)
    ids1 = jnp.array([[5, 7, 255, 0, 0, 0, 0, 0]], dtype=jnp.int32)
    ids2 = jnp.array([[5, 7, 255, 9, 13, 2, 2, 2]], dtype=jnp.int32)
    params = tower.init(jax.random.PRNGKey(0), ids1)
    p1 = tower.apply(params, ids1)
    p2 = tower.apply(params, ids2)
    # ids2's max is still 255 at position 2; suffix differs but is masked
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_visual_encoder_outputs():
    enc = VisualEncoder(TINY, TINY_CROSS, use_temp=True)
    video = jnp.ones((2, 4, 32, 32, 3))
    params = enc.init(jax.random.PRNGKey(0), video)
    v_fea, frame_fea = enc.apply(params, video)
    assert v_fea.shape == (2, 32)
    assert frame_fea.shape == (2, 4, 32)
    # video feature is a mean of unit vectors -> norm <= 1
    norms = np.linalg.norm(np.asarray(v_fea), axis=-1)
    assert np.all(norms <= 1.0 + 1e-5)


def test_visual_encoder_no_temp():
    enc = VisualEncoder(TINY, TINY_CROSS, use_temp=False)
    video = jnp.ones((2, 4, 32, 32, 3))
    params = enc.init(jax.random.PRNGKey(0), video)
    v_fea, frame_fea = enc.apply(params, video)
    # without the temporal transformer, v_fea is the mean of normalized
    # frame features
    normed = np.asarray(frame_fea)
    normed = normed / np.linalg.norm(normed, axis=-1, keepdims=True)
    np.testing.assert_allclose(v_fea, normed.mean(axis=1), rtol=1e-5)


def test_text_encoder_english_hidden():
    enc = TextEncoder(TINY, TINY_CROSS, language="english")
    ids = jnp.array([[5, 7, 255, 0]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 0]], dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)
    pooled = enc.apply(params, ids, mask)
    hidden = enc.apply(params, ids, mask, return_hidden=True)
    assert pooled.shape == (1, 32)
    assert hidden.shape == (1, 4, 32)
    assert "logit_scale" in params["params"]


def test_text_encoder_chinese():
    enc = TextEncoder(
        TINY, TINY_CROSS, language="chinese", chinese_vocab_size=128)
    ids = jnp.array([[3, 9, 2, 0]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 0]], dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids, mask)
    pooled = enc.apply(params, ids, mask)
    assert pooled.shape == (1, TINY_CROSS.temporal_hidden_size)
    hidden = enc.apply(params, ids, mask, return_hidden=True)
    assert hidden.shape == (1, 4, TINY_CROSS.temporal_hidden_size)


def test_chinese_padding_mask_effective():
    enc = TextEncoder(
        TINY, TINY_CROSS, language="chinese", chinese_vocab_size=128)
    ids1 = jnp.array([[3, 9, 2, 0, 0]], dtype=jnp.int32)
    ids2 = jnp.array([[3, 9, 2, 55, 77]], dtype=jnp.int32)
    mask = jnp.array([[1, 1, 1, 0, 0]], dtype=jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), ids1, mask)
    p1 = enc.apply(params, ids1, mask)
    p2 = enc.apply(params, ids2, mask)
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_mlm_head():
    head = MLMHead(vocab_size=256)
    x = jnp.ones((2, 4, 32))
    params = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(params, x)
    assert logits.shape == (2, 4, 256)


def test_projector_mlp_batchnorm():
    mlp = ProjectorMLP(num_layers=2, in_dim=32, inner_dim=64, out_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32))
    variables = mlp.init(jax.random.PRNGKey(0), x)
    out, updates = mlp.apply(
        variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (8, 32)
    assert "batch_stats" in updates


def test_bf16_compute():
    vit = VisionTransformer(TINY, dtype=jnp.bfloat16)
    x = jnp.ones((2, 32, 32, 3))
    params = vit.init(jax.random.PRNGKey(0), x)
    pooled = vit.apply(params, x)
    # outputs cast to fp32, params stored fp32
    assert pooled.dtype == jnp.float32
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == jnp.float32
